"""Event-time window operators over unordered batch data.

Ray Data has no streaming window semantics (and neither does the reference —
SURVEY §2.3 "streaming-only features: none"); these are the batch-native
equivalents used by training-data/event pipelines:

- ``time_bucket``: truncate timestamps to fixed windows (map-only, no shuffle;
  aggregate with a normal groupby afterwards).
- ``sessionize``: gap-based session windows per key — the one windowing shape
  that genuinely needs co-located per-key ordering. Implemented as
  ``groupby(key).map_groups`` (hash shuffle on the key, per-group sort);
  partitioning assumption: one key's events fit one group task (true for
  user-event data; salt + two-phase merge if a key is pathological).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def time_bucket(ds: Dataset, ts_col: str, unit: str = "hour", out_col: str = "bucket") -> Dataset:
    """Add a truncated-timestamp window column (map-only)."""

    def trunc(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, pc.floor_temporal(t.column(ts_col), unit=unit))

    return ds.map_batches(trunc, batch_format="pyarrow")


def sessionize(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    gap: pd.Timedelta | str = "30min",
    stats: bool = True,
) -> Dataset:
    """Gap-based sessions per key.

    stats=True → one row per key: ``(key, n_sessions, n_events)``.
    stats=False → one row per event with a ``session_id`` column
    (``<key>#<session_index>``) for downstream joins.
    """
    gap = pd.Timedelta(gap)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_sess = g[ts_col].diff() > gap
        sess_idx = new_sess.cumsum()
        if stats:
            return pd.DataFrame(
                {
                    key_col: [g[key_col].iloc[0]],
                    "n_sessions": [int(sess_idx.iloc[-1]) + 1],
                    "n_events": [len(g)],
                }
            )
        out = g.copy()
        out["session_id"] = sess_idx.astype(np.int64)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def sliding_window_agg(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    window: pd.Timedelta | str = "5min",
    out_count: str = "w_count",
    out_sum: str | None = None,
) -> Dataset:
    """Per-row sliding event-time window: for each row, count (and optionally
    sum ``value_col``) over the same key's rows in ``[ts - window, ts]``.

    The SQL equivalent is a range window frame (``... OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``). Ray Data
    has no window functions; this is ``groupby(key).map_groups`` with a
    vectorized two-pointer (searchsorted over the sorted ts array) per group —
    O(n log n) per key, one hash shuffle total.

    Rows with identical (key, ts) all receive the same frame (every peer row
    included), matching SQL RANGE frame semantics. Partitioning assumption:
    one key's rows fit one group task (salt + merge if a key is pathological).
    """
    window = pd.Timedelta(window)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col], kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy()
        lo = np.searchsorted(ts, ts - window.to_numpy(), side="left")
        # RANGE frames include ts-peers: frame end = last index with equal ts
        hi = np.searchsorted(ts, ts, side="right")
        out = g.copy()
        out[out_count] = (hi - lo).astype(np.int64)
        if value_col is not None and out_sum is not None:
            csum = np.concatenate([[0.0], np.cumsum(g[value_col].to_numpy(dtype=np.float64))])
            out[out_sum] = csum[hi] - csum[lo]
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
