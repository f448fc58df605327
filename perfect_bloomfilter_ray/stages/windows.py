"""Event-time window operators over unordered batch data.

Ray Data has no streaming window semantics (and neither does the reference —
SURVEY §2.3 "streaming-only features: none"); these are the batch-native
equivalents used by training-data/event pipelines:

- ``time_bucket``: truncate timestamps to fixed windows (map-only, no shuffle;
  aggregate with a normal groupby afterwards).
- ``sessionize``: gap-based session windows per key.
- ``sliding_window_agg``: per-row trailing window count/sum (SQL RANGE frame).

The keyed operators share one execution shape: a coarse hash partition on the
key (``hash(key) % num_blocks`` — NOT one group per key: Ray's map_groups
pays a Python call per group, catastrophic at millions of keys) and ONE
vectorized pass per partition, with per-key boundaries resolved by sorting on
a packed ``(key-code << ts_bits) | ts`` int64 composite so every kernel is a
``searchsorted``/``reduceat`` over contiguous key runs. Partitioning
assumption: one partition's rows fit one task (num_blocks scales with the
cluster; a pathological single hot key can be salted upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.functions.hashing import hash64
from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks


def time_bucket(ds: Dataset, ts_col: str, unit: str = "hour", out_col: str = "bucket") -> Dataset:
    """Add a truncated-timestamp window column (map-only)."""

    def trunc(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, pc.floor_temporal(t.column(ts_col), unit=unit))

    return ds.map_batches(trunc, batch_format="pyarrow")


def _add_part(ds: Dataset, key_col: str, num_blocks: int) -> Dataset:
    def part(t: pa.Table) -> pa.Table:
        h = hash64(t.column(key_col), 0x5E55)
        return t.append_column("_part", pa.array((h % np.uint64(num_blocks)).astype(np.int32)))

    return ds.map_batches(part, batch_format="pyarrow")


def _ts_i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    else:
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _key_runs(t: pa.Table, key_col: str, ts_col: str):
    """Sort one partition by (key, ts) and return (order, ts_sorted,
    run_starts, run_ids) where runs are contiguous per-key slices."""
    keys = t.column(key_col)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
    ts = _ts_i64(t.column(ts_col))
    order = np.lexsort((ts, codes))
    codes_s, ts_s = codes[order], ts[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(codes_s))[0] + 1]) if len(codes_s) else np.array([], np.int64)
    return order, codes_s, ts_s, starts


def sessionize(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    gap: pd.Timedelta | str = "30min",
    stats: bool = True,
    num_blocks: int | None = None,
) -> Dataset:
    """Gap-based sessions per key.

    stats=True → one row per key: ``(key, n_sessions, n_events)``.
    stats=False → one row per event with a ``session_id`` column
    (session index within the key) for downstream joins.
    """
    gap_us = int(pd.Timedelta(gap).value // 1000)

    def per_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            t = t.drop_columns(["_part"])
            if stats:
                return pa.table(
                    {
                        key_col: pa.array([], t.schema.field(key_col).type),
                        "n_sessions": pa.array([], pa.int64()),
                        "n_events": pa.array([], pa.int64()),
                    }
                )
            return t.append_column("session_id", pa.array([], pa.int64()))
        order, codes_s, ts_s, starts = _key_runs(t, key_col, ts_col)
        n = len(order)
        new_key = np.zeros(n, dtype=bool)
        new_key[starts] = True
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts_s[1:] - ts_s[:-1]) > gap_us
        new_sess = new_key | gap_break
        if stats:
            sess_counts = np.add.reduceat(new_sess.astype(np.int64), starts)
            run_lens = np.diff(np.concatenate([starts, [n]]))
            keys_sorted = pc.take(t.column(key_col), pa.array(order[starts], pa.int64()))
            return pa.table(
                {
                    key_col: keys_sorted,
                    "n_sessions": pa.array(sess_counts),
                    "n_events": pa.array(run_lens),
                }
            )
        # session index within key = running count of new_sess minus the
        # running count at the key's first row
        cum = np.cumsum(new_sess.astype(np.int64)) - 1
        key_first_cum = np.repeat(cum[starts], np.diff(np.concatenate([starts, [n]])))
        sess_idx_sorted = cum - key_first_cum
        sess_idx = np.empty(n, dtype=np.int64)
        sess_idx[order] = sess_idx_sorted
        return t.drop_columns(["_part"]).append_column("session_id", pa.array(sess_idx))

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def lag_lead_cum(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    lag_col: str = "lag_value",
    lead_col: str = "lead_value",
    cum_col: str = "cum_value",
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key ordered window functions: previous value (lag 1), next value
    (lead 1), and running sum — the SQL ``lag()/lead()/sum() OVER (PARTITION
    BY key ORDER BY ts ROWS UNBOUNDED PRECEDING)`` trio. Deterministic order:
    (ts, value) within each key, mirroring an ORDER BY ts, value frame.

    Same execution shape as the other keyed window ops: coarse hash
    partition, one vectorized pass per partition (shift + cumsum over
    contiguous key runs), no per-key Python.
    """

    def per_part(t: pa.Table) -> pa.Table:
        t_out = t.drop_columns(["_part"])
        if len(t) == 0:
            for c in (lag_col, lead_col, cum_col):
                t_out = t_out.append_column(c, pa.array([], pa.float64()))
            return t_out
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, ts, codes))
        codes_s, vals_s = codes[order], vals[order]
        n = len(order)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = codes_s[1:] != codes_s[:-1]
        last = np.roll(first, -1)

        lag = np.empty(n)
        lag[0] = np.nan
        lag[1:] = vals_s[:-1]
        lag[first] = np.nan
        lead = np.empty(n)
        lead[-1] = np.nan
        lead[:-1] = vals_s[1:]
        lead[last] = np.nan
        csum = np.cumsum(vals_s)
        # running sum within key = global cumsum minus cumsum before key start
        starts = np.nonzero(first)[0]
        base = np.repeat(csum[starts] - vals_s[starts], np.diff(np.concatenate([starts, [n]])))
        cum = csum - base

        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        for name, arr in ((lag_col, lag), (lead_col, lead), (cum_col, cum)):
            t_out = t_out.append_column(name, pa.array(arr[inv]))
        return t_out

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def ranked(
    ds: Dataset,
    key_col: str,
    order_col: str,
    descending: bool = False,
    tie_cols: list[str] | None = None,
    rank_col: str = "rank",
    dense_rank_col: str | None = None,
    row_number_col: str | None = None,
    ntile: int | None = None,
    ntile_col: str = "ntile",
    percent_rank_col: str | None = None,
    cume_dist_col: str | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key ranking window functions: SQL ``rank() / dense_rank() /
    row_number() / ntile(B) OVER (PARTITION BY key ORDER BY order_col
    [DESC])``.

    ``rank``/``dense_rank`` tie on equal ``order_col`` values;
    ``row_number``/``ntile`` break ties by ``tie_cols`` (pass a unique
    column for a deterministic, oracle-comparable result). ``ntile`` uses
    the SQL sizing rule: with m rows and B buckets the first ``m % B``
    buckets get ``m // B + 1`` rows. Same execution shape as the other
    keyed window ops: coarse hash partition, ONE vectorized pass per
    partition (lexsort + run-boundary cumsums), no per-key Python.

    ``percent_rank`` = (rank−1)/(m−1) (0 when m == 1) and ``cume_dist`` =
    (# peers ≤ current value)/m are float64 — each an exact IEEE division
    of small ints, so they compare bitwise against a SQL engine.
    """
    tie_cols = list(tie_cols or [])

    def per_part(t: pa.Table) -> pa.Table:
        t_out = t.drop_columns(["_part"])
        if len(t) == 0:
            for c in (rank_col, dense_rank_col, row_number_col, ntile_col if ntile else None):
                if c:
                    t_out = t_out.append_column(c, pa.array([], pa.int64()))
            for c in (percent_rank_col, cume_dist_col):
                if c:
                    t_out = t_out.append_column(c, pa.array([], pa.float64()))
            return t_out
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = t.column(order_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        # order values by dictionary code so any orderable dtype works and
        # DESC is a code negation, not a dtype-specific negation
        val_uniq = pc.unique(vals).sort(order="descending" if descending else "ascending")
        vcodes = pc.index_in(vals, value_set=val_uniq).to_numpy(zero_copy_only=False).astype(np.int64)
        tie_arrays = []
        for c in tie_cols:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            tie_arrays.append(
                pc.index_in(col, value_set=pc.unique(col).sort()).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        order = np.lexsort(tuple(reversed(tie_arrays)) + (vcodes, codes))
        codes_s, vcodes_s = codes[order], vcodes[order]
        n = len(order)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.nonzero(first)[0]
        run_lens = np.diff(np.concatenate([starts, [n]]))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, run_lens)  # 0-based row_number
        new_val = np.empty(n, dtype=bool)
        new_val[0] = True
        new_val[1:] = (vcodes_s[1:] != vcodes_s[:-1]) | first[1:]
        # rank = row_number of the first row of the current value-run; the
        # accumulate tracks that run's global start index, and key starts are
        # always value-run starts, so it can never leak across keys
        gidx = np.maximum.accumulate(np.where(new_val, np.arange(n, dtype=np.int64), -1))
        rank_s = pos[gidx] + 1
        dense_cum = np.cumsum(new_val.astype(np.int64))
        dense_s = dense_cum - np.repeat(dense_cum[starts] - 1, run_lens)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        outputs = [(rank_col, rank_s), (dense_rank_col, dense_s), (row_number_col, pos + 1)]
        if ntile:
            # SQL sizing: first (m % B) buckets get m//B + 1 rows
            m = np.repeat(run_lens, run_lens)
            qq, rr = m // ntile, m % ntile
            thresh = rr * (qq + 1)
            nt = np.where(
                pos < thresh,
                pos // np.maximum(qq + 1, 1),
                rr + (pos - thresh) // np.maximum(qq, 1),
            )
            outputs.append((ntile_col, nt + 1))
        for name, arr in outputs:
            if name:
                t_out = t_out.append_column(name, pa.array(arr[inv].astype(np.int64)))
        if percent_rank_col or cume_dist_col:
            m = np.repeat(run_lens, run_lens).astype(np.float64)
            if percent_rank_col:
                pr = np.where(m > 1, (rank_s - 1) / np.maximum(m - 1.0, 1.0), 0.0)
                t_out = t_out.append_column(percent_rank_col, pa.array(pr[inv]))
            if cume_dist_col:
                vstarts = np.flatnonzero(new_val)
                vlens = np.diff(np.append(vstarts, n))
                vend = np.repeat(vstarts + vlens, vlens)  # exclusive end of value-run
                cd = (vend - np.repeat(starts, run_lens)) / m
                t_out = t_out.append_column(cume_dist_col, pa.array(cd[inv]))
        return t_out

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def sliding_window_agg(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    window: pd.Timedelta | str = "5min",
    out_count: str = "w_count",
    out_sum: str | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-row sliding event-time window: for each row, count (and optionally
    sum ``value_col``) over the same key's rows in ``[ts - window, ts]``.

    SQL equivalent: a RANGE window frame (``... OVER (PARTITION BY key ORDER
    BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``); rows with
    identical (key, ts) all receive the same frame (RANGE peer semantics).
    One vectorized searchsorted over a packed (key-code, ts) composite per
    coarse partition — no per-key Python, windows cannot cross keys because
    the key code dominates the composite ordering.

    Precision: ``out_sum`` is a prefix-sum difference, so its absolute error
    is bounded by eps × (running-sum magnitude) rather than eps × (frame
    sum) — values spanning >15 orders of magnitude within one key can lose
    the small ones. Counts are exact.
    """
    window_us = int(pd.Timedelta(window).value // 1000)

    def per_part(t: pa.Table) -> pa.Table:
        t_out = t.drop_columns(["_part"])
        if len(t) == 0:
            out = t_out.append_column(out_count, pa.array([], pa.int64()))
            if value_col is not None and out_sum is not None:
                out = out.append_column(out_sum, pa.array([], pa.float64()))
            return out
        order, codes_s, ts_s, starts = _key_runs(t, key_col, ts_col)
        n = len(order)
        tmin = int(ts_s.min())
        span = int(ts_s.max()) - tmin + 1
        code_bits = max(int(codes_s.max() + 1).bit_length(), 1)
        ts_bits = 63 - code_bits
        if span + window_us >= (1 << ts_bits):
            raise ValueError("sliding window ts span too large for packed search")
        comp = (codes_s << ts_bits) | (ts_s - tmin)
        lo = np.searchsorted(comp, (codes_s << ts_bits) | np.maximum(ts_s - tmin - window_us, 0), side="left")
        hi = np.searchsorted(comp, comp, side="right")
        counts = (hi - lo).astype(np.int64)
        out_cnt = np.empty(n, dtype=np.int64)
        out_cnt[order] = counts
        t_out = t_out.append_column(out_count, pa.array(out_cnt))
        if value_col is not None and out_sum is not None:
            vals = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)[order]
            csum = np.concatenate([[0.0], np.cumsum(vals)])
            sums = csum[hi] - csum[lo]
            out_s = np.empty(n, dtype=np.float64)
            out_s[order] = sums
            t_out = t_out.append_column(out_sum, pa.array(out_s))
        return t_out

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def rolling_row_agg(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_rows: int = 5,
    tie_cols: list[str] | None = None,
    out_mean: str | None = "roll_mean",
    out_sum: str | None = None,
    out_median: str | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-row trailing ROWS-frame aggregate: mean / sum / median of
    ``value_col`` over the same key's last ``n_rows`` rows (current
    included), ordered by ``(ts, *tie_cols)`` — SQL ``avg(v) OVER (PARTITION
    BY key ORDER BY ts, ties ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW)``.
    The row-count frame complements :func:`sliding_window_agg`'s RANGE
    (time) frame; pass a unique tie column for a deterministic,
    oracle-comparable result.

    Same execution shape as the other keyed window ops: coarse hash
    partition, ONE vectorized pass per partition (lexsort + prefix-sum
    difference over contiguous key runs; the median via a masked
    sliding-window view + nanmedian — O(n·n_rows) memory, no per-key
    Python). Precision caveat matches sliding_window_agg: sums are
    prefix-sum differences.
    """
    tie_cols = list(tie_cols or [])

    def per_part(t: pa.Table) -> pa.Table:
        t_out = t.drop_columns(["_part"])
        if len(t) == 0:
            for c in (out_mean, out_sum, out_median):
                if c:
                    t_out = t_out.append_column(c, pa.array([], pa.float64()))
            return t_out
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        ties = []
        for c in tie_cols:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ties.append(
                pc.index_in(col, value_set=pc.unique(col).sort()).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        order = np.lexsort(tuple(reversed(ties)) + (ts, codes))
        codes_s = codes[order]
        vals_s = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)[order]
        n = len(order)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(first)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, n)))
        lo = np.arange(n, dtype=np.int64) - np.minimum(pos, n_rows - 1)
        csum = np.concatenate([[0.0], np.cumsum(vals_s)])
        sums = csum[np.arange(1, n + 1)] - csum[lo]
        cnts = (np.arange(n, dtype=np.int64) + 1 - lo).astype(np.float64)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        if out_mean:
            t_out = t_out.append_column(out_mean, pa.array((sums / cnts)[inv]))
        if out_sum:
            t_out = t_out.append_column(out_sum, pa.array(sums[inv]))
        if out_median:
            ext = np.concatenate([np.full(n_rows - 1, np.nan), vals_s])
            win = np.lib.stride_tricks.sliding_window_view(ext, n_rows)
            gidx = np.arange(n)[:, None] - (n_rows - 1) + np.arange(n_rows)[None, :]
            med = np.nanmedian(np.where(gidx >= lo[:, None], win, np.nan), axis=1)
            t_out = t_out.append_column(out_median, pa.array(med[inv]))
        return t_out

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def funnel_counts(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    max_gaps: list[int] | None = None,
    num_blocks: int | None = None,
) -> "pd.DataFrame":
    """Ordered-sequence funnel: how many keys (users) reached each stage,
    where stage k requires an event of type ``stages[k]`` STRICTLY after
    the earliest qualifying stage-(k−1) event (the standard greedy funnel —
    earliest A, then earliest B after it, …). With ``max_gaps`` (one
    microsecond deadline per transition) stage k must ALSO occur within
    ``max_gaps[k-1]`` of stage k−1 — the time-constrained conversion
    funnel. Greedy earliest-pick stays exact under deadlines: an earlier
    stage-k time never shrinks a later stage's window.

    Keys co-locate via the usual coarse hash partition; each partition
    resolves every stage with vectorized segment-min passes (masked
    ``minimum.reduceat`` per stage — O(stages × rows), no per-key Python).
    Partitions emit one tiny count row per stage; the driver sums them.
    Returns a small pandas frame ``(stage_idx, stage, users)``.
    """
    from ray.data.aggregate import Sum

    nb = choose_num_blocks(ds, num_blocks)

    def add_part(t: pa.Table) -> pa.Table:
        h = hash64(t.column(key_col), 0xF0E1)
        return t.append_column("_part", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "stage_idx": pa.array(np.arange(len(stages), dtype=np.int64)),
                    "pn": pa.array(np.zeros(len(stages), dtype=np.int64)),
                }
            )
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        ty = t.column(type_col).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k_s, ts_s, ty_s = k[order], ts[order], ty[order]
        new = np.ones(len(k_s), dtype=bool)
        new[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(new)
        run_lens = np.diff(np.append(starts, len(k_s)))
        seg = np.repeat(np.arange(len(starts)), run_lens)
        INF = np.iinfo(np.int64).max
        prev = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)  # stage 0: no lower bound
        counts = []
        for si, s in enumerate(stages):
            ok = (ty_s == s) & (ts_s > prev[seg])
            if max_gaps is not None and si > 0:
                # prev may hold INF for keys that missed a stage; the ts_s >
                # prev check already excludes them, the deadline only tightens
                with np.errstate(over="ignore"):
                    ok &= ts_s <= prev[seg] + np.int64(max_gaps[si - 1])
            cand = np.where(ok, ts_s, INF)
            cur = np.minimum.reduceat(cand, starts)
            counts.append(int((cur < INF).sum()))
            prev = cur  # keys that missed this stage hold INF → never match later
        return pa.table(
            {
                "stage_idx": pa.array(np.arange(len(stages), dtype=np.int64)),
                "pn": pa.array(np.array(counts, dtype=np.int64)),
            }
        )

    parts = (
        ds.select_columns([key_col, ts_col, type_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("stage_idx")
        .aggregate(Sum("pn", alias_name="users"))
        .to_pandas()
        .sort_values("stage_idx")
        .reset_index(drop=True)
    )
    parts["stage"] = [stages[i] for i in parts["stage_idx"]]
    parts["users"] = parts["users"].astype("int64")
    return parts[["stage_idx", "stage", "users"]]


def grouped_path_string(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    val_col: str,
    sep: str = "->",
    tie_cols: list[str] | None = None,
    out_col: str = "path",
    max_steps: int | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key ordered concatenation — SQL ``string_agg(val, sep ORDER BY
    ts[, ties])`` — the path-mining / clickstream-sequence primitive.

    Output: one row per key ``(key_col, n_steps, out_col)``. ``max_steps``
    truncates to the first k events (keeps row width bounded when a bot key
    has millions of events). Same shape as every keyed op here: coarse hash
    partition, ONE vectorized polars sort + group_by + str.join per
    partition.
    """
    import polars as pl

    tie_cols = list(tie_cols or [])

    def per_part(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        df = df.sort([key_col, ts_col, *tie_cols], nulls_last=True)  # match SQL NULLS LAST
        g = df.group_by(key_col, maintain_order=True).agg(
            pl.col(val_col).len().cast(pl.Int64).alias("n_steps"),
            (
                pl.col(val_col).head(max_steps) if max_steps else pl.col(val_col)
            ).str.join(sep).alias(out_col),
        )
        return g.to_arrow()

    return (
        _add_part(ds.select_columns([key_col, ts_col, val_col, *tie_cols]), key_col, choose_num_blocks(ds, num_blocks))
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def transition_counts(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    state_col: str,
    tie_cols: list[str] | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """First-order Markov transition counts: for each ordered pair of
    consecutive ``state_col`` values within a key's ``(ts, *tie_cols)``
    ordered event sequence, the number of occurrences across all keys —
    ``(state_from, state_to, n)``, the sequence-mining / next-event-model
    input. SQL equivalent: ``lead(state) OVER (PARTITION BY key ORDER BY
    ts, ties)`` then a pair count.

    Same shape as every keyed window op here: coarse hash partition, one
    vectorized polars sort + within-key shift per partition, partial pair
    counts out (the shuffle carries one row per distinct pair per
    partition), tiny final groupby-sum.
    """
    import polars as pl
    from ray.data.aggregate import Sum

    tie_cols = list(tie_cols or [])

    def per_part(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        if not len(df):
            return pa.table(
                {
                    "state_from": pa.array([], t.schema.field(state_col).type),
                    "state_to": pa.array([], t.schema.field(state_col).type),
                    "pn": pa.array([], pa.int64()),
                }
            )
        df = df.sort([key_col, ts_col, *tie_cols], nulls_last=True)  # match SQL NULLS LAST
        out = (
            df.select(
                pl.col(state_col).alias("state_from"),
                pl.col(state_col).shift(-1).over(key_col).alias("state_to"),
            )
            .drop_nulls("state_to")
            .group_by(["state_from", "state_to"])
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
        )
        return out.to_arrow()

    cols = [key_col, ts_col, state_col, *tie_cols]
    return (
        _add_part(ds.select_columns(cols), key_col, choose_num_blocks(ds, num_blocks))
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(["state_from", "state_to"])
        .aggregate(Sum("pn", alias_name="n"))
    )


def ewma(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tie_cols: list[str] | None = None,
    out_col: str = "ewma",
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key exponential moving average over the ``(ts, *tie_cols)``
    ordered stream: ``e_0 = x_0; e_t = (1-α)·e_{t-1} + α·x_t`` (pandas
    ``ewm(alpha, adjust=False)`` semantics). No SQL oracle — the recursion
    is not portably expressible in SQL; pandas parity is property-tested.

    Same coarse-partition shape as every keyed window op; the per-key
    recursion itself runs in polars' native ``ewm_mean(...).over(key)``
    (Rust, no per-key Python).
    """
    import polars as pl

    tie_cols = list(tie_cols or [])

    def per_part(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        if not len(df):
            return df.with_columns(pl.Series(out_col, [], dtype=pl.Float64)).to_arrow()
        df = df.sort([key_col, ts_col, *tie_cols], nulls_last=True)
        df = df.with_columns(
            pl.col(value_col)
            .ewm_mean(alpha=alpha, adjust=False)
            .over(key_col)
            .alias(out_col)
        )
        return df.to_arrow()

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def grouped_ffill(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    fill_cols: list[str],
    tie_cols: list[str] | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key forward fill: carry the last non-null value of each
    ``fill_cols`` column forward along ``(ts, *tie_cols)`` order within each
    key — SQL ``last_value(col IGNORE NULLS) OVER (PARTITION BY key ORDER BY
    ts, ties ROWS UNBOUNDED PRECEDING)``. The state-propagation primitive
    behind attribution (last touch), gap-filling sensor streams, and
    slowly-changing dimensions.

    Same execution shape as the other keyed windows: coarse hash partition,
    one vectorized pass per partition (lexsort; fill source = running
    ``maximum.accumulate`` of valid row indices, nulled where the source
    falls before the key run's start). Fill columns keep their dtype; rows
    before a key's first non-null stay null.
    """
    tie_cols = list(tie_cols or [])
    # remember the declared fill-column types: Ray's sort exchange degrades a
    # partition whose column is ALL null to arrow `null` type, which would
    # otherwise leak into the output schema
    in_schema = ds.schema()
    fill_types = dict(zip(in_schema.names, in_schema.types))

    def _typed(col: pa.ChunkedArray | pa.Array, name: str):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type) and not pa.types.is_null(fill_types[name]):
            col = pa.nulls(len(col), fill_types[name])
        return col

    def per_part(t: pa.Table) -> pa.Table:
        t_out = t.drop_columns(["_part"])
        if len(t) == 0:
            for c in fill_cols:
                t_out = t_out.set_column(
                    t_out.schema.get_field_index(c), c, _typed(t_out.column(c), c)
                )
            return t_out
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        ties = []
        for c in tie_cols:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ties.append(
                pc.index_in(col, value_set=pc.unique(col).sort()).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        order = np.lexsort(tuple(reversed(ties)) + (ts, codes))
        codes_s = codes[order]
        n = len(order)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(first)
        run_start = np.repeat(starts, np.diff(np.append(starts, n)))
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        for c in fill_cols:
            col = _typed(t.column(c), c)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)[order]
            src = np.maximum.accumulate(np.where(valid, np.arange(n), -1))
            ok = src >= run_start
            src_c = np.where(ok, src, 0)
            filled_sorted = col.take(pa.array(order[src_c]))
            filled_sorted = pc.if_else(pa.array(ok), filled_sorted, pa.nulls(n, col.type))
            t_out = t_out.set_column(
                t_out.schema.get_field_index(c), c, filled_sorted.take(pa.array(inv))
            )
        return t_out

    return _add_part(ds, key_col, choose_num_blocks(ds, num_blocks)).groupby("_part").map_groups(per_part, batch_format="pyarrow")


def peak_concurrency(
    intervals: Dataset,
    start_col: str,
    end_col: str,
    bucket_us: int = 3_600_000_000,
) -> pd.DataFrame:
    """Per-time-bucket peak number of concurrently open intervals
    (closed [start, end]; at equal timestamps opens are ordered before
    closes), e.g. peak concurrent sessions per hour.

    Scale shape — a segmented sweep, not a global sort: every interval
    emits two boundary rows (+1/-1) tagged with its time bucket; one hash
    exchange co-locates each bucket, whose boundaries reduce to ``(net
    change, local max prefix)`` with a vectorized lexsort + cumsum. The
    driver folds the O(#buckets) partials with a running carry — valid
    because ``max prefix of (carry + local prefix) == carry + local max
    prefix`` — so driver state is bucket-count-sized, never corpus-sized.
    Buckets with no boundary are omitted (concurrency there is flat).

    ``start_col`` / ``end_col`` must be int64 epoch-microseconds columns.
    Returns a pandas frame ``(bucket_us, n_bound, peak)`` sorted by bucket.
    """

    def boundaries(t: pa.Table) -> pa.Table:
        s = t.column(start_col).to_numpy().astype(np.int64)
        e = t.column(end_col).to_numpy().astype(np.int64)
        ts = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64), -np.ones(len(e), np.int64)])
        return pa.table({"t": ts, "d": d, "bucket": (ts // bucket_us) * bucket_us})

    def per_bucket(t: pa.Table) -> pa.Table:
        ts = t.column("t").to_numpy().astype(np.int64)
        d = t.column("d").to_numpy().astype(np.int64)
        order = np.lexsort((-d, ts))  # time asc, opens (+1) before closes
        run = np.cumsum(d[order])
        return pa.table(
            {
                "bucket": t.column("bucket").slice(0, 1),
                "n_bound": pa.array([len(ts)], pa.int64()),
                "net": pa.array([int(run[-1])], pa.int64()),
                "local_peak": pa.array([int(run.max())], pa.int64()),
            }
        )

    parts = (
        intervals.map_batches(boundaries, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    carry = parts["net"].cumsum().shift(1, fill_value=0)
    out = pd.DataFrame(
        {
            "bucket_us": parts["bucket"].astype("int64"),
            "n_bound": parts["n_bound"].astype("int64"),
            "peak": (carry + parts["local_peak"]).astype("int64"),
        }
    )
    return out


def ordered_running_max(
    ds: Dataset,
    order_col: str,
    tie_col: str,
    value_col: str,
    out_col: str = "running_max",
    num_buckets: int | None = None,
) -> Dataset:
    """EXCLUSIVE global running maximum of ``value_col`` over the total
    order ``(order_col, tie_col)`` — the streaming-watermark shape:
    ``out_col[i] = max(value of every row strictly before i)``, null for
    the global first row (SQL: ``max(v) OVER (ORDER BY o, t ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``).

    Scale shape — a segmented scan, not a global sort: rows route once by
    ``order_col`` value-range bucket, per-bucket maxima fold into
    O(num_buckets) exclusive-prefix carries on the driver, and each bucket
    finishes independently (sort inside the bucket, shifted cummax seeded
    with its carry). ``order_col``/``tie_col`` must be int64-castable;
    ``value_col`` must be int64-castable (cast timestamps upstream).
    Returns the input rows (original columns + ``out_col``); row order is
    by bucket, sorted within each bucket.
    """
    import ray
    from ray.data.aggregate import Max, Min

    nb = num_buckets or choose_num_blocks(ds)
    mm = ds.aggregate(Min(order_col), Max(order_col))
    omin, omax = mm[f"min({order_col})"], mm[f"max({order_col})"]
    if omin is None:
        return ds  # empty input: nothing to annotate
    omin, omax = int(omin), int(omax)
    span = max(1, omax - omin + 1)
    _sent = np.int64(np.iinfo(np.int64).min)

    # width-first bucketing: (o-omin)*nb overflows int64 when the order key
    # spans most of the int64 range (packed keys do), // width does not;
    # above 2^62 even the subtraction can wrap, so route through float64
    # (monotonic, and equal values always land in the same bucket — bucket
    # BOUNDARIES only affect balance, never correctness of the scan)
    width = max(1, span // nb)
    huge = span > (1 << 62)

    def route(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if huge:
            rel = (o.astype(np.float64) - float(omin)) / float(width)
            bkt = np.minimum(np.floor(rel), nb - 1).astype(np.int32)
        else:
            bkt = np.minimum((o - omin) // width, nb - 1).astype(np.int32)
        return t.append_column("_bkt", pa.array(bkt))

    routed = ds.map_batches(route, batch_format="pyarrow").materialize()

    partials = (
        routed.map_batches(
            lambda t: _bucket_maxima(t, value_col), batch_format="pyarrow"
        )
        .groupby("_bkt")
        .aggregate(Max("_mx", alias_name="mx"))
        .to_pandas()
        .sort_values("_bkt")
        .reset_index(drop=True)
    )
    carry_vals = np.concatenate(
        [[_sent], np.maximum.accumulate(partials["mx"].to_numpy().astype(np.int64))[:-1]]
    )
    carries = ray.put(dict(zip(partials["_bkt"].astype(int), carry_vals)))

    def finish(t: pa.Table) -> pa.Table:
        carry = ray.get(carries)[int(t.column("_bkt")[0].as_py())]
        o = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ti = t.column(tie_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ti, o))
        t = t.take(pa.array(order)).drop_columns(["_bkt"])
        cm = np.maximum.accumulate(v[order])
        wm = np.concatenate([[carry], cm[:-1]])
        wm = np.maximum(wm, carry)
        return t.append_column(
            out_col, pa.array(wm, pa.int64(), mask=(wm == _sent))
        )

    return routed.groupby("_bkt").map_groups(finish, batch_format="pyarrow")


def _bucket_maxima(t: pa.Table, value_col: str) -> pa.Table:
    """Per-(batch, bucket) max partials when a batch spans buckets."""
    import polars as pl

    return (
        pl.from_arrow(t.select(["_bkt", value_col]))
        .group_by("_bkt")
        .agg(pl.col(value_col).max().cast(pl.Int64).alias("_mx"))
        .to_arrow()
    )


def running_distinct(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "running_distinct",
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key running COUNT(DISTINCT ``value_col``) in event-time order —
    the windowed form SQL cannot express directly (``count(DISTINCT) OVER``
    is unsupported); the standard rewrite is a first-occurrence flag
    (``row_number() OVER (PARTITION BY key, value ORDER BY ts, id) = 1``)
    summed with a running window, and this operator reproduces that exact
    arithmetic. Deterministic total order within a key: ``(ts, id)``.

    Scale shape: one hash exchange on ``key_col`` (each key's history lands
    in one partition — the same co-location every keyed window op here
    uses), then a single vectorized pass per partition: factorize key and
    value, ``np.unique`` over packed (key, value) codes in time order marks
    first occurrences, and a segmented cumsum (global cumsum minus per-key
    base) yields the running count. No per-key Python, no global sort.
    """

    def per_part(t: pa.Table) -> pa.Table:
        t_out = t.drop_columns(["_part"])
        if len(t) == 0:
            return t_out.append_column(out_col, pa.array([], pa.int64()))
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = t.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        kc = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        vc = pc.index_in(vals, value_set=pc.unique(vals)).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, ts, kc))
        n = len(order)
        kc_s = kc[order]
        # packed (key, value) code — nv = #distinct values in this partition,
        # so kc*nv+vc < n*nv fits int64 for any realistic partition
        nv = np.int64(vc.max()) + 1
        pair = kc_s * nv + vc[order]
        flag = np.zeros(n, dtype=np.int64)
        _, first_idx = np.unique(pair, return_index=True)
        flag[first_idx] = 1
        csum = np.cumsum(flag)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = kc_s[1:] != kc_s[:-1]
        starts = np.nonzero(first)[0]
        base = np.repeat(csum[starts] - flag[starts], np.diff(np.concatenate([starts, [n]])))
        run = csum - base
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        return t_out.append_column(out_col, pa.array(run[inv]))

    return (
        _add_part(ds, key_col, choose_num_blocks(ds, num_blocks))
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def resample_linear_hourly(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    cents: int = 100,
    out_col: str = "value_interp",
) -> Dataset:
    """Hourly time-grid resampling with linear interpolation per key: the
    dense hour spine (corpus min..max hour — GENERATED, never scanned)
    carries each key's hourly mean where observations exist, and the
    linear interpolation between the nearest observed hours elsewhere;
    hours outside a key's observed range stay null.

    Exactness contract: hourly means come from BIGINT cent sums + counts
    (one corpus-sized groupby — the only big exchange), so the lerp
    ``yb + (yf − yb)·(h − hb)/(hf − hb)`` is ONE fixed float expression
    over integers, mirrored verbatim by the dual-ASOF SQL oracle. The
    per-key fill runs on the BOUNDED hourly domain (calendar-bounded, same
    contract as the gap-fill and Theil-Sen queries).
    """
    import polars as pl

    from ray.data.aggregate import Max, Min, Sum

    def to_hour(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        h = pc.cast(ts, pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = np.floor(v * cents).astype(np.int64)
        keep = ~np.isnan(v)
        return pa.table(
            {
                key_col: t.column(key_col).filter(pa.array(keep)),
                "h": pa.array(h[keep]),
                "sy": pa.array(y[keep]),
                "c": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )

    hourly = (
        ds.map_batches(to_hour, batch_format="pyarrow")
        .groupby([key_col, "h"])
        .aggregate(Sum("sy", alias_name="sy"), Sum("c", alias_name="c"))
        .materialize()
    )
    mm = hourly.aggregate(Min("h"), Max("h"))
    if mm["min(h)"] is None:
        return hourly.map_batches(
            lambda t: pa.table(
                {key_col: t.column(key_col), "h": t.column("h"),
                 out_col: pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )
    hmin, hmax = int(mm["min(h)"]), int(mm["max(h)"])
    grid = np.arange(hmin, hmax + 1, dtype=np.int64)

    def per_key(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort("h")
        key = t.column(key_col)[0].as_py()
        hs = df["h"].to_numpy()
        sy = df["sy"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        ymean = sy / (c * float(cents))
        # back/forward nearest observed hour per grid point
        bi = np.searchsorted(hs, grid, side="right") - 1
        fi = np.searchsorted(hs, grid, side="left")
        out = np.full(len(grid), np.nan)
        inside = (bi >= 0) & (fi < len(hs))
        same = inside & (bi >= 0) & (fi < len(hs)) & (np.where(inside, hs[np.clip(bi, 0, None)] == hs[np.clip(fi, None, len(hs) - 1)], False))
        b = np.clip(bi, 0, len(hs) - 1)
        f = np.clip(fi, 0, len(hs) - 1)
        out[same] = ymean[b[same]]
        lerp = inside & ~same
        hb, hf = hs[b[lerp]], hs[f[lerp]]
        yb, yf = ymean[b[lerp]], ymean[f[lerp]]
        out[lerp] = yb + (yf - yb) * (grid[lerp] - hb) / (hf - hb)
        kt = t.schema.field(key_col).type
        return pa.table(
            {
                key_col: pa.array([key] * len(grid), type=kt),
                "h": pa.array(grid),
                out_col: pa.array(out, mask=np.isnan(out)),
            }
        )

    return hourly.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def longest_value_streak(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    num_blocks: int | None = None,
) -> Dataset:
    """Longest run of consecutive identical ``value_col`` per key in
    (ts, id) order — the gaps-and-islands MAX the SQL oracle computes with
    the row_number-difference trick. Tie between equal-length streaks →
    the one that STARTS earliest (smallest (ts, id) of its first row);
    output one row per key: ``(key, streak_len, streak_value)``.

    Same one-exchange shape as the other keyed window ops: coarse hash
    partition on the key, one vectorized pass per partition (boundary
    flags + segmented run lengths via np.diff over run starts — no per-key
    Python)."""

    def per_part(t: pa.Table) -> pa.Table:
        kt = t.schema.field(key_col).type
        vt = t.schema.field(value_col).type
        if len(t) == 0:
            return pa.table(
                {
                    key_col: pa.array([], kt),
                    "streak_len": pa.array([], pa.int64()),
                    "streak_value": pa.array([], vt),
                }
            )
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = t.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        kc = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        vc = pc.index_in(vals, value_set=pc.unique(vals)).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, ts, kc))
        kc_s, vc_s = kc[order], vc[order]
        n = len(order)
        # streak boundaries: new key OR value change
        brk = np.zeros(n, dtype=bool)
        brk[0] = True
        brk[1:] = (kc_s[1:] != kc_s[:-1]) | (vc_s[1:] != vc_s[:-1])
        starts = np.nonzero(brk)[0]
        lens = np.diff(np.concatenate([starts, [n]]))
        run_key = kc_s[starts]
        # per key: argmax run length; first (earliest-start) wins ties since
        # runs are already in (ts, id) order within each key
        best: dict[int, int] = {}
        # vectorized per-key argmax: sort runs by (key, -len, start) and
        # take the first run of each key
        rorder = np.lexsort((starts, -lens, run_key))
        rk = run_key[rorder]
        first = np.zeros(len(rorder), dtype=bool)
        if len(rorder):
            first[0] = True
            first[1:] = rk[1:] != rk[:-1]
        sel = rorder[first]
        key_take = pa.array(order[starts[sel]], pa.int64())
        return pa.table(
            {
                key_col: pc.take(keys, key_take),
                "streak_len": pa.array(lens[sel]),
                "streak_value": pc.take(vals, key_take),
            }
        )

    return (
        _add_part(ds, key_col, choose_num_blocks(ds, num_blocks))
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )
