"""Broadcast-lookup joins — the small-side join pattern for 100 TB pipelines.

``Dataset.join`` (Ray-native hash join) shuffles BOTH sides; for a dimension
table of a few thousand rows joined against a 10^12-row fact table that is
the wrong shape. Here the small side is materialized once, shipped to the
object store once (``ray.put``), and every map task resolves it zero-copy and
probes it vectorized (``pyarrow.compute.index_in`` + ``take``) — no shuffle
of the big side at all, preserving streaming execution.

Semi/anti membership variants with sub-bloom-size key sets should also use
this; for key sets too large to broadcast exactly, use
``stages.membership.bloom_semi_join`` (compact sketch broadcast) instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _small_side_table(small: Dataset | pa.Table, columns: list[str] | None = None) -> pa.Table:
    if isinstance(small, pa.Table):
        t = small
    else:
        t = pa.concat_tables(
            [pa.Table.from_pydict(b) if isinstance(b, dict) else b for b in small.iter_batches(batch_format="pyarrow")]
        )
    return t.select(columns) if columns else t


def broadcast_lookup_join(
    big: Dataset,
    small: Dataset | pa.Table,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    small_columns: list[str] | None = None,
) -> Dataset:
    """Join ``big`` (streaming) against a broadcast ``small`` side.

    ``how``: "inner" (drop unmatched) or "left" (keep, null-fill). The small
    side's key column must be unique (dimension-table semantics; duplicated
    keys raise). Output columns: big's columns + small's non-key columns.
    """
    import ray

    right_on = right_on or on
    t_small = _small_side_table(small, small_columns)
    if pc.count_distinct(t_small.column(right_on)).as_py() != len(t_small):
        raise ValueError(f"broadcast join small side has duplicate keys in {right_on!r}")
    payload_cols = [c for c in t_small.column_names if c != right_on]
    small_ref = ray.put(t_small)

    def probe(t: pa.Table) -> pa.Table:
        s: pa.Table = ray.get(small_ref)  # zero-copy plasma resolve, once per task
        idx = pc.index_in(t.column(on), value_set=s.column(right_on))
        if how == "inner":
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            idx = idx.filter(keep)
        for c in payload_cols:
            t = t.append_column(c, pc.take(s.column(c), idx))
        return t

    return big.map_batches(probe, batch_format="pyarrow")


def broadcast_semi_join(
    big: Dataset,
    small: Dataset | pa.Table,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
) -> Dataset:
    """Exact semi/anti join against a broadcast key set (no shuffle).

    For key sets small enough to ship exactly. The approximate counterpart
    (arbitrarily large build side, compact broadcast) is
    ``membership.bloom_semi_join``.
    """
    import ray

    right_on = right_on or on
    t_small = _small_side_table(small, [right_on])
    keys = t_small.column(right_on)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys_ref = ray.put(pc.unique(keys))

    def probe(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pc.is_in(t.column(on), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return big.map_batches(probe, batch_format="pyarrow")


def asof_join_broadcast(
    big: Dataset,
    small: Dataset | pa.Table,
    on: str,
    big_ts: str,
    right_on: str | None = None,
    small_ts: str | None = None,
    how: str = "left",
    strict: bool = False,
    tie_col: str | None = None,
    prefix: str = "asof_",
) -> Dataset:
    """As-of join: for each ``big`` row, the ``small`` row with equal key and
    the greatest ``small_ts`` ≤ ``big_ts`` (< when ``strict``).

    Ray Data has no native as-of join; this is the broadcast variant — the
    build side is materialized once, sorted by (key, ts), shipped via
    ``ray.put``, and each map task resolves matches with one vectorized
    ``np.searchsorted`` over a packed (key-code, ts) composite. No shuffle of
    the probe side; streaming execution preserved.

    Determinism with duplicate (key, ts) on the build side: rows are sorted by
    (key, ts, ``tie_col``) and the LAST wins — pass a unique ``tie_col``
    (e.g. the build side's primary key) for reproducible payloads.

    Partitioning assumption / scale path: the build side must fit in one
    object-store entry (dimension-scale). For big-big as-of joins, hash both
    sides on the key (`repartition(keys=[on])`), sort within partitions, and
    run this same searchsorted kernel per co-partition — the composite-key
    kernel below is partition-agnostic, so only the routing changes.

    ``how``: "left" (null-fill payload) or "inner" (drop unmatched).
    Output: big's columns + ``prefix``-renamed small payload columns.
    """
    import ray

    right_on = right_on or on
    small_ts = small_ts or big_ts
    t_small = _small_side_table(small)

    import polars as pl

    sdf = pl.from_arrow(t_small)
    sort_by = [right_on, small_ts] + ([tie_col] if tie_col else [])
    sdf = sdf.sort(sort_by)
    t_small = sdf.to_arrow()

    skeys = t_small.column(right_on)
    if isinstance(skeys, pa.ChunkedArray):
        skeys = skeys.combine_chunks()
    uniq = pc.unique(skeys)
    # code each build key 0..K-1 (positions in `uniq`); build rows are sorted
    # by key so codes are non-decreasing
    scodes = pc.index_in(skeys, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)

    def _ts_i64(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            col = col.cast(pa.int64())
        return col.to_numpy(zero_copy_only=False)

    sts = _ts_i64(t_small.column(small_ts))
    ts_min = int(sts.min()) if len(sts) else 0
    # pack (code, ts) into one int64: ts offset to min, down-shifted until the
    # span fits the bits left under the key code
    span = int(sts.max()) - ts_min + 1 if len(sts) else 1
    code_bits = max(int(np.int64(len(uniq) - 1)).bit_length(), 1) if len(uniq) else 1
    ts_bits = 63 - code_bits
    if span >= (1 << ts_bits):
        # packing would coarsen timestamps and break exact as-of semantics;
        # only reachable with >2^52 µs span (~143 years) at 2^11 keys
        raise ValueError("as-of ts span too large for packed search; coarsen ts upstream or reduce key cardinality")
    shift = 0
    s_comp = (scodes << ts_bits) | (sts - ts_min)

    payload_cols = [c for c in t_small.column_names if c not in (right_on, small_ts)] + [small_ts]
    bundle = ray.put((uniq, s_comp, t_small.select(payload_cols), ts_bits, ts_min, shift))

    def probe(t: pa.Table) -> pa.Table:
        u, comp, payload, tbits, tmin, sh = ray.get(bundle)
        bcodes = pc.index_in(t.column(on), value_set=u).to_numpy(zero_copy_only=False)
        valid_key = ~pd.isna(bcodes)
        bcodes_i = np.where(valid_key, bcodes, 0).astype(np.int64)
        bts = _ts_i64(t.column(big_ts))
        # clamp below (ts before every build ts → no match) AND above: a probe
        # ts past the packed span must not overflow the OR into the key-code
        # bits — clamping to the max packable offset makes it correctly match
        # the key's last build row instead of corrupting the composite.
        off = np.minimum(np.maximum(bts - tmin, -1), (1 << tbits) - 1)
        b_comp = (bcodes_i << tbits) | np.maximum(off >> sh, 0)
        side = "left" if strict else "right"
        idx = np.searchsorted(comp, b_comp, side=side) - 1
        matched = valid_key & (off >= 0) & (idx >= 0)
        # the found row must belong to the same key (searchsorted may land in
        # the previous key's range when this key has no early-enough row)
        safe_idx = np.where(matched, idx, 0)
        matched &= (comp[safe_idx] >> tbits) == bcodes_i
        if how == "inner":
            t = t.filter(pa.array(matched))
            safe_idx = safe_idx[matched]
            matched = np.ones(len(safe_idx), dtype=bool)
        take_idx = pa.array(np.where(matched, safe_idx, -1), type=pa.int64())
        take_idx = pc.if_else(pc.greater_equal(take_idx, 0), take_idx, pa.scalar(None, type=pa.int64()))
        for c in payload.column_names:
            t = t.append_column(prefix + c, pc.take(payload.column(c), take_idx))
        return t

    return big.map_batches(probe, batch_format="pyarrow")


def range_join_broadcast(
    big: Dataset,
    intervals: Dataset | pa.Table,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "left",
    closed: str = "left",
    prefix: str = "",
) -> Dataset:
    """Interval-lookup join: each ``big`` row matched to the interval row with
    ``lo <= value < hi`` ("left", default) or ``lo <= value <= hi`` ("both").

    The SQL equivalent is ``JOIN ... ON value BETWEEN lo AND hi`` — an
    inequality join that hash-join engines (Ray's included) cannot express
    without a cross product. Here intervals are broadcast sorted by ``lo`` and
    each map task resolves matches with one vectorized ``np.searchsorted`` —
    O(batch × log #intervals), probe side streams, no shuffle.

    Intervals must be non-overlapping (validated at build; overlap raises) —
    the bucketing/banding shape: histogram bins, price bands, date epochs,
    IP→geo ranges. ``how``: "left" (null payload on no match) or "inner".
    """
    import ray

    t_int = _small_side_table(intervals)
    import polars as pl

    sdf = pl.from_arrow(t_int).sort(lo_col)
    t_int = sdf.to_arrow()
    lo = t_int.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
    hi = t_int.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
    overlap = np.any(hi[:-1] > lo[1:]) if closed == "left" else np.any(hi[:-1] >= lo[1:])
    if overlap:
        raise ValueError("range join intervals overlap")
    if np.any(lo > hi):
        raise ValueError("range join has lo > hi")
    bundle = ray.put((lo, hi, t_int))

    def probe(t: pa.Table) -> pa.Table:
        l, h, payload = ray.get(bundle)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(l, v, side="right") - 1
        safe = np.maximum(idx, 0)
        if closed == "left":
            matched = (idx >= 0) & (v < h[safe])
        else:
            matched = (idx >= 0) & (v <= h[safe])
        if how == "inner":
            t = t.filter(pa.array(matched))
            safe = safe[matched]
            matched = np.ones(len(safe), dtype=bool)
        take_idx = pa.array(np.where(matched, safe, -1), type=pa.int64())
        take_idx = pc.if_else(pc.greater_equal(take_idx, 0), take_idx, pa.scalar(None, type=pa.int64()))
        for c in payload.column_names:
            if c in (lo_col, hi_col):
                continue
            t = t.append_column(prefix + c, pc.take(payload.column(c), take_idx))
        return t

    return big.map_batches(probe, batch_format="pyarrow")
