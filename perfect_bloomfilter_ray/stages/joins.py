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
        batches = [
            pa.Table.from_pydict(b) if isinstance(b, dict) else b
            for b in small.iter_batches(batch_format="pyarrow")
        ]
        # an empty small side is a valid degenerate input (e.g. a filter that
        # matched nothing) — keep the schema so the probe still types out
        if batches:
            t = pa.concat_tables(batches)
        elif small.schema() is not None:
            t = _arrow_schema_of(small).empty_table()
        else:
            raise ValueError(
                "broadcast join small side is empty AND schema-less (a row-based "
                "filter erased it) — produce it via map_batches so the schema survives"
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
    object-store entry (dimension-scale). For big-big as-of joins use
    ``asof_join_partitioned`` below — both sides hash-co-partitioned on the
    key, the SAME pack/probe kernel per co-partition.

    ``how``: "left" (null-fill payload) or "inner" (drop unmatched).
    Output: big's columns + ``prefix``-renamed small payload columns.
    """
    import ray

    right_on = right_on or on
    small_ts = small_ts or big_ts
    t_small = _small_side_table(small)
    bundle = ray.put(_asof_pack_build(t_small, right_on, small_ts, tie_col))

    def probe(t: pa.Table) -> pa.Table:
        return _asof_probe(t, on, big_ts, ray.get(bundle), how, strict, prefix)

    return big.map_batches(probe, batch_format="pyarrow")


def _asof_ts_i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    else:
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _asof_pack_build(t_small: pa.Table, right_on: str, small_ts: str, tie_col: str | None):
    """Sort the build side by (key, ts, tie) and pack (key-code, DENSE ts
    rank) into one sorted int64 composite for the searchsorted probe.

    Ranks, not raw offsets: the composite needs ``log2(keys) +
    log2(distinct ts)`` bits — bounded by 2·log2(build rows), so ANY
    broadcastable build side fits (the earlier raw-offset packing ran out
    of bits at ~150k keys × a multi-year µs span — an sf1.0 latent bug).
    Probes map their ts to a rank with one searchsorted against the sorted
    distinct-ts array (returned in the bundle), preserving exact ≤ / <
    semantics."""
    import polars as pl

    sdf = pl.from_arrow(t_small)
    sort_by = [right_on, small_ts] + ([tie_col] if tie_col else [])
    t_small = sdf.sort(sort_by).to_arrow()

    skeys = t_small.column(right_on)
    if isinstance(skeys, pa.ChunkedArray):
        skeys = skeys.combine_chunks()
    uniq = pc.unique(skeys)
    # code each build key 0..K-1 (positions in `uniq`); build rows are sorted
    # by key so codes are non-decreasing
    scodes = pc.index_in(skeys, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    sts = _asof_ts_i64(t_small.column(small_ts))
    uniq_ts = np.unique(sts)  # sorted distinct build timestamps
    ranks = np.searchsorted(uniq_ts, sts)  # dense rank per build row
    code_bits = max(int(np.int64(len(uniq) - 1)).bit_length(), 1) if len(uniq) else 1
    # rank values up to len(uniq_ts) (one-past-last is a valid probe rank)
    rank_bits = max(int(np.int64(len(uniq_ts))).bit_length(), 1)
    if code_bits + rank_bits > 63:
        # needs keys × distinct-ts > 2^63 — unreachable for a broadcast side
        raise ValueError("as-of build side too large to pack (keys x distinct ts)")
    s_comp = (scodes << rank_bits) | ranks
    payload_cols = [c for c in t_small.column_names if c not in (right_on, small_ts)] + [small_ts]
    return (uniq, s_comp, t_small.select(payload_cols), rank_bits, uniq_ts)


def _asof_probe(
    t: pa.Table, on: str, big_ts: str, packed, how: str, strict: bool, prefix: str
) -> pa.Table:
    """Resolve one probe batch against a packed build side (see
    ``_asof_pack_build``); shared by the broadcast and co-partitioned paths."""
    u, comp, payload, rbits, uniq_ts = packed
    bcodes = pc.index_in(t.column(on), value_set=u).to_numpy(zero_copy_only=False)
    valid_key = ~pd.isna(bcodes)
    bcodes_i = np.where(valid_key, bcodes, 0).astype(np.int64)
    bts = _asof_ts_i64(t.column(big_ts))
    # probe ts → dense build-ts rank: strictness lives in this mapping
    # (rank of last build ts ≤ / < probe ts; −1 = before every build ts)
    pr = np.searchsorted(uniq_ts, bts, side="left" if strict else "right") - 1
    b_comp = (bcodes_i << rbits) | np.maximum(pr, 0)
    idx = np.searchsorted(comp, b_comp, side="right") - 1
    matched = valid_key & (pr >= 0) & (idx >= 0)
    # the found row must belong to the same key (searchsorted may land in
    # the previous key's range when this key has no early-enough row)
    safe_idx = np.where(matched, idx, 0)
    matched &= (comp[safe_idx] >> rbits) == bcodes_i
    if how == "inner":
        t = t.filter(pa.array(matched))
        safe_idx = safe_idx[matched]
        matched = np.ones(len(safe_idx), dtype=bool)
    take_idx = pa.array(np.where(matched, safe_idx, -1), type=pa.int64())
    take_idx = pc.if_else(pc.greater_equal(take_idx, 0), take_idx, pa.scalar(None, type=pa.int64()))
    for c in payload.column_names:
        t = t.append_column(prefix + c, pc.take(payload.column(c), take_idx))
    return t


def _arrow_schema_of(ds: Dataset) -> pa.Schema:
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    # PandasBlockSchema (from_pandas inputs): names + numpy dtypes
    fields = []
    for n, t in zip(base.names, base.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((n, pa.string()))
    return pa.schema(fields)


def _tagged_union(big: Dataset, build: Dataset, on: str, right_on: str, nb: int):
    """Co-partition machinery shared by the big-big as-of and band joins:
    tag probe rows (_side=0) and build rows (_side=1) with a unified
    null-padded schema (build columns prefixed ``_b_``) plus a ``_part``
    hash-of-key column, and union them — ONE shuffle moves each row once.
    Returns (tagged_ds, probe_cols, build_cols, probe_schema, build_schema).
    """
    from perfect_bloomfilter_ray.functions.hashing import hash64

    probe_schema = _arrow_schema_of(big)
    build_schema = _arrow_schema_of(build)
    probe_cols = probe_schema.names
    build_cols = build_schema.names

    def tag_probe(t: pa.Table) -> pa.Table:
        h = hash64(t.column(on), 0xA50F)
        cols = {c: t.column(c) for c in probe_cols}
        n = len(t)
        for c in build_cols:
            cols["_b_" + c] = pa.nulls(n, build_schema.field(c).type)
        cols["_part"] = pa.array((h % np.uint64(nb)).astype(np.int32))
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def tag_build(t: pa.Table) -> pa.Table:
        h = hash64(t.column(right_on), 0xA50F)
        n = len(t)
        cols = {c: pa.nulls(n, probe_schema.field(c).type) for c in probe_cols}
        for c in build_cols:
            cols["_b_" + c] = t.column(c)
        cols["_part"] = pa.array((h % np.uint64(nb)).astype(np.int32))
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    tagged = big.map_batches(tag_probe, batch_format="pyarrow").union(
        build.map_batches(tag_build, batch_format="pyarrow")
    )
    return tagged, probe_cols, build_cols, probe_schema, build_schema


def asof_join_partitioned(
    big: Dataset,
    build: Dataset,
    on: str,
    big_ts: str,
    right_on: str | None = None,
    small_ts: str | None = None,
    how: str = "left",
    strict: bool = False,
    tie_col: str | None = None,
    prefix: str = "asof_",
    num_blocks: int | None = None,
) -> Dataset:
    """Big-big as-of join: both sides hash-co-partitioned on the key, then the
    SAME packed-composite searchsorted kernel as ``asof_join_broadcast`` runs
    per co-partition — the scale path the broadcast variant's docstring
    promises, for build sides too large for one object-store entry.

    Shuffle shape: one union + groupby(hash(key) % num_blocks) moves each row
    once; within a partition the build sub-table is packed once and the probe
    rows resolve in one vectorized searchsorted. Skewed keys can be salted
    upstream; a single key's rows must fit one task (same assumption as every
    keyed window operator, windows.py module doc).

    Semantics identical to ``asof_join_broadcast`` (greatest build ts ≤ probe
    ts, < when ``strict``; ties broken by ``tie_col``, last wins).
    """
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    right_on = right_on or on
    small_ts = small_ts or big_ts
    nb = choose_num_blocks(big, num_blocks)
    tagged, probe_cols, build_cols, probe_schema, build_schema = _tagged_union(
        big, build, on, right_on, nb
    )

    def resolve(t: pa.Table) -> pa.Table:
        side = t.column("_side").to_numpy()
        probe = t.filter(pa.array(side == 0)).select(probe_cols)
        bt = t.filter(pa.array(side == 1))
        b_tbl = pa.table({c: bt.column("_b_" + c) for c in build_cols})
        if len(probe) == 0:
            out = probe
            # keep the output schema stable: payload columns exist even here
            payload_cols = [c for c in build_cols if c not in (right_on, small_ts)] + [small_ts]
            for c in payload_cols:
                out = out.append_column(prefix + c, pa.nulls(0, build_schema.field(c).type))
            return out
        if len(b_tbl) == 0:
            payload_cols = [c for c in build_cols if c not in (right_on, small_ts)] + [small_ts]
            if how == "inner":
                probe = probe.slice(0, 0)
            for c in payload_cols:
                probe = probe.append_column(prefix + c, pa.nulls(len(probe), build_schema.field(c).type))
            return probe
        packed = _asof_pack_build(b_tbl, right_on, small_ts, tie_col)
        return _asof_probe(probe, on, big_ts, packed, how, strict, prefix)

    return tagged.groupby("_part").map_groups(resolve, batch_format="pyarrow")


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


# Default hot-key budget for skew_join. adaptive_join's precounted hot frame
# is sized DEFAULT_HOT_TOP_K + 1 (the +1 row is the cold_known_nonempty
# overflow signal) — share the constant so the two stay in sync.
DEFAULT_HOT_TOP_K = 64


def skew_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    hot_count_threshold: int = 100_000,
    hot_top_k: int = DEFAULT_HOT_TOP_K,
    num_partitions: int | None = None,
    precounted_hot: "pd.DataFrame | None" = None,
) -> Dataset:
    """Skew-aware hybrid inner join of two large Datasets.

    ``precounted_hot``: an already-computed hot-candidate frame with
    columns ``(on, cnt)`` (every key with left count ≥ the threshold,
    sorted descending, possibly with one overflow row past ``hot_top_k``)
    — lets a caller that already paid the detect scan (stages/adaptive)
    skip this function's own pass over the left side.

    A plain hash join routes every row of a hot key to ONE reducer; with a
    zipfian left side (a bot user, an empty-string key) that single task
    gets an O(corpus) partition and the join stalls or OOMs. The classic
    fix, implemented here:

    1. **Detect hot keys** with a map-side pre-aggregated count (one row per
       distinct key per batch leaves each task — vocabulary-sized shuffle,
       never row-sized) and keep the ≤ ``hot_top_k`` keys whose left count
       ≥ ``hot_count_threshold``.
    2. **Hot slice → broadcast join**: the right side's rows for hot keys
       ship once via ``ray.put`` and every left task expands matches
       vectorized (searchsorted ranges + ``np.repeat``) — hot keys never
       enter a shuffle, so the skew cannot concentrate on one reducer.
       Assumption (documented contract): the RIGHT side's hot-key payload is
       broadcastable (skew lives on the left); both-sides-hot would need
       salted replication instead.
    3. **Cold remainder → ordinary hash join** (``Dataset.join``), now free
       of the keys that would have skewed it.
    4. Union of the two legs; columns = left's + right's non-key payload.

    The whole operator is streaming except the bounded hot-key count table
    and hot right slice. Output row set equals the plain inner join's.
    """
    import ray
    from ray.data.aggregate import Sum

    from perfect_bloomfilter_ray.stages.partitioning import choose_join_partitions

    right_on = right_on or on
    if num_partitions is None:
        num_partitions = choose_join_partitions()

    def partial_counts(t: pa.Table) -> pa.Table:
        tv = pc.value_counts(t.column(on).combine_chunks() if isinstance(t.column(on), pa.ChunkedArray) else t.column(on))
        return pa.table({on: tv.field("values"), "pcnt": tv.field("counts").cast(pa.int64())})

    # threshold filter BEFORE the sort: the sort input shrinks from the full
    # key vocabulary to just the hot candidates (at web scale: 10^9 distinct
    # keys → a handful of rows). limit(k+1): an overflow row proves keys
    # beyond the cap exist, so the cold leg is known-nonempty without a probe
    if precounted_hot is not None:
        counts = precounted_hot.head(hot_top_k + 1)
    else:
        counts = (
            left.select_columns([on])
            .map_batches(partial_counts, batch_format="pyarrow")
            .groupby(on)
            .aggregate(Sum("pcnt", alias_name="cnt"))
            .filter(expr=f"cnt >= {int(hot_count_threshold)}")
            .sort("cnt", descending=True)
            .limit(hot_top_k + 1)
            .to_pandas()
        )
    cold_known_nonempty = len(counts) > hot_top_k
    # an all-filtered Dataset comes back as a 0-column frame — treat as no hot keys
    base = getattr(right.schema(), "base_schema", None)
    key_type = base.field(right_on).type if isinstance(base, pa.Schema) else None
    if len(counts) == 0:
        # an all-filtered counts Dataset comes back 0-column; a plain Python
        # [] keeps pa.array from fighting a float64 np.empty over string keys
        hot_arr = pa.array([], type=key_type or pa.null())
    else:
        hot_vals = counts[on].to_numpy()[:hot_top_k]
        # key_type None → pandas-block input: infer the Arrow type from values
        hot_arr = pa.array(hot_vals, type=key_type) if key_type else pa.array(hot_vals)
    hot_ref = ray.put(hot_arr)

    payload_cols = [c for c in right.schema().names if c != right_on]
    out_cols = list(left.schema().names) + payload_cols

    def split(t: pa.Table, keep_hot: bool, col: str) -> pa.Table:
        ks = ray.get(hot_ref)
        if len(ks) == 0:
            return t if not keep_hot else t.slice(0, 0)
        mask = pc.is_in(t.column(col), value_set=ks)
        return t.filter(mask if keep_hot else pc.invert(mask))

    def cold_join(l: Dataset, r: Dataset) -> Dataset:
        return l.join(
            r, "inner", num_partitions=num_partitions, on=(on,), right_on=(right_on,)
        ).map_batches(
            lambda t: (
                t.drop_columns([right_on]) if right_on != on and right_on in t.column_names else t
            ).select(out_cols),
            batch_format="pyarrow",
        )

    if len(hot_arr) == 0:
        return cold_join(left, right)

    # hot leg: broadcast the right side's hot rows, sorted by key
    rh_batches = [
        b
        for b in right.map_batches(lambda t: split(t, True, right_on), batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    if not rh_batches:
        # hot keys have no right-side rows → no matches; keep them out of the
        # shuffle anyway (that's the whole point) and join the remainder
        return cold_join(
            left.map_batches(lambda t: split(t, False, on), batch_format="pyarrow"), right
        )
    right_hot_t = pa.concat_tables(rh_batches).sort_by(right_on)
    rh_keys = right_hot_t.column(right_on).to_numpy(zero_copy_only=False)
    rh_ref = ray.put((rh_keys, right_hot_t.select(payload_cols)))

    def probe_hot(t: pa.Table) -> pa.Table:
        rk, payload = ray.get(rh_ref)
        x = t.column(on).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rk, x, side="left")
        hi = np.searchsorted(rk, x, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        li = np.repeat(np.arange(len(t), dtype=np.int64), cnt)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        within = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], cnt)
        ri = np.repeat(lo, cnt) + within
        out = t.take(pa.array(li, type=pa.int64()))
        for c in payload_cols:
            out = out.append_column(c, pc.take(payload.column(c), pa.array(ri, type=pa.int64())))
        return out.select(out_cols)

    hot_leg = left.map_batches(lambda t: split(t, True, on), batch_format="pyarrow").map_batches(
        probe_hot, batch_format="pyarrow"
    )

    # cold leg: ordinary hash join on the de-skewed remainder. An all-empty
    # side would reach Ray's hash-join aggregator schemaless (ArrowInvalid),
    # and inner-join semantics make it a no-op anyway — probe with take(1)
    # (streaming short-circuit; with real data the first batch has cold rows)
    left_cold = left.map_batches(lambda t: split(t, False, on), batch_format="pyarrow")
    right_cold = right.map_batches(lambda t: split(t, False, right_on), batch_format="pyarrow")
    if not cold_known_nonempty and not left_cold.take(1):
        return hot_leg
    if not right_cold.take(1):
        return hot_leg
    return hot_leg.union(cold_join(left_cold, right_cold))


def band_join_partitioned(
    big: Dataset,
    build: Dataset,
    on: str,
    big_ts: str,
    window,
    right_on: str | None = None,
    small_ts: str | None = None,
    prefix: str = "band_",
    num_blocks: int | None = None,
) -> Dataset:
    """Big-big temporal band join: for each ``big`` row, ALL ``build`` rows
    with equal key and ``small_ts`` in ``[big_ts - window, big_ts]`` — the
    feature-generation join ("every order in the 7 days before this event"),
    1:N where the as-of join is 1:1. SQL: ``JOIN ... ON key = key AND
    r.ts BETWEEN l.ts - window AND l.ts`` (inclusive both ends). Inner
    semantics: probe rows with no build row in the band are dropped.

    Same scale shape as ``asof_join_partitioned`` (shared ``_tagged_union``
    machinery): both sides hash-co-partitioned on the key in ONE shuffle;
    within a partition the build side is packed into a sorted (key-code, ts)
    int64 composite and each probe row expands to its matches with two
    ``searchsorted`` calls + one ``np.repeat`` — no per-key Python, no
    cross product. Band width × per-key build density bounds the output
    blow-up; a single key's rows must fit one task (windows.py contract).
    """
    import pandas as _pd

    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    right_on = right_on or on
    small_ts = small_ts or big_ts
    window_us = int(_pd.Timedelta(window).value // 1000)
    nb = choose_num_blocks(big, num_blocks)
    tagged, probe_cols, build_cols, probe_schema, build_schema = _tagged_union(
        big, build, on, right_on, nb
    )
    payload_cols = [c for c in build_cols if c not in (right_on, small_ts)] + [small_ts]

    def resolve(t: pa.Table) -> pa.Table:
        side = t.column("_side").to_numpy()
        probe = t.filter(pa.array(side == 0)).select(probe_cols)
        bt = t.filter(pa.array(side == 1))
        b_tbl = pa.table({c: bt.column("_b_" + c) for c in build_cols})

        def empty() -> pa.Table:
            out = probe.slice(0, 0)
            for c in payload_cols:
                out = out.append_column(prefix + c, pa.nulls(0, build_schema.field(c).type))
            return out

        if len(probe) == 0 or len(b_tbl) == 0:
            return empty()
        uniq, s_comp, payload, rank_bits, uniq_ts = _asof_pack_build(b_tbl, right_on, small_ts, None)
        pcodes = pc.index_in(
            probe.column(on).combine_chunks()
            if isinstance(probe.column(on), pa.ChunkedArray)
            else probe.column(on),
            value_set=uniq,
        ).to_numpy(zero_copy_only=False)
        known = ~np.isnan(pcodes.astype(np.float64)) if pcodes.dtype.kind == "f" else pcodes != None  # noqa: E711
        pcodes = np.where(known, pcodes, 0).astype(np.int64)
        bts = _asof_ts_i64(probe.column(big_ts))
        # window [bts − w, bts] in dense-rank space: lo = first rank with
        # ts ≥ bts − w, hi_rank = last rank with ts ≤ bts (−1 = none)
        rank_lo = np.searchsorted(uniq_ts, bts - window_us, side="left")
        rank_hi = np.searchsorted(uniq_ts, bts, side="right") - 1
        base = pcodes << rank_bits
        lo = np.searchsorted(s_comp, base | rank_lo, side="left")
        hi = np.searchsorted(s_comp, base | np.maximum(rank_hi, 0), side="right")
        hi = np.where(rank_hi < 0, lo, hi)  # probe ts before every build ts
        cnt = np.where(known, hi - lo, 0)
        total = int(cnt.sum())
        li = np.repeat(np.arange(len(probe), dtype=np.int64), cnt)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        within = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], cnt)
        ri = np.repeat(lo, cnt) + within
        out = probe.take(pa.array(li, type=pa.int64()))
        for c in payload_cols:
            out = out.append_column(
                prefix + c, pc.take(payload.column(c), pa.array(ri, type=pa.int64()))
            )
        return out

    return tagged.groupby("_part").map_groups(resolve, batch_format="pyarrow")


def cross_join_broadcast(
    big: Dataset, small: Dataset | pa.Table, small_columns: list[str] | None = None
) -> Dataset:
    """Cartesian product with a broadcast small side (dimension enumeration:
    every row × every variant/config/date-bucket). The ONLY sane distributed
    cross-join shape — the small side is ``ray.put`` once and tiled per
    batch with numpy repeat/take; output rows = |big| × |small|, so callers
    must keep the small side genuinely small (it is validated ≤ 64k rows)."""
    import ray

    t_small = _small_side_table(small, small_columns)
    if len(t_small) > 65536:
        raise ValueError(f"cross join small side has {len(t_small)} rows (cap 65536)")
    small_ref = ray.put(t_small)

    def expand(t: pa.Table) -> pa.Table:
        s: pa.Table = ray.get(small_ref)
        n, m = len(t), len(s)
        if n == 0 or m == 0:
            cols = {c: t.column(c).take(pa.array([], pa.int64())) for c in t.column_names}
            cols.update({c: s.column(c).take(pa.array([], pa.int64())) for c in s.column_names})
            return pa.table(cols)
        big_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
        small_idx = pa.array(np.tile(np.arange(m, dtype=np.int64), n))
        cols = {c: t.column(c).take(big_idx) for c in t.column_names}
        cols.update({c: s.column(c).take(small_idx) for c in s.column_names})
        return pa.table(cols)

    return big.map_batches(expand, batch_format="pyarrow")


def asof_join_nearest(
    big: Dataset,
    small: Dataset | pa.Table,
    on: str,
    big_ts: str,
    right_on: str | None = None,
    small_ts: str | None = None,
    tie_col: str | None = None,
    prefix: str = "nearest_",
) -> Dataset:
    """Nearest-in-time join: for each ``big`` row, the ``small`` row with
    equal key minimizing ``|small_ts − big_ts|``; an equidistant tie goes to
    the EARLIER build row (the backward candidate), matching the SQL
    ``(big_ts − back_ts) <= (fwd_ts − big_ts)`` tiebreak. Left semantics:
    unmatched keys null-fill.

    Same broadcast packed-searchsorted machinery as
    :func:`asof_join_broadcast` — ONE pack, TWO binary searches per probe
    batch (backward: rightmost composite ≤, forward: leftmost composite >),
    then a vectorized distance compare picks the side. No probe shuffle; the
    build side must be dimension-scale (broadcast budget), same assumption
    as the backward variant.
    """
    import ray

    right_on = right_on or on
    small_ts = small_ts or big_ts
    t_small = _small_side_table(small)
    bundle = ray.put(_asof_pack_build(t_small, right_on, small_ts, tie_col))

    def probe(t: pa.Table) -> pa.Table:
        u, comp, payload, rbits, uniq_ts = ray.get(bundle)
        bcodes = pc.index_in(t.column(on), value_set=u).to_numpy(zero_copy_only=False)
        valid_key = ~pd.isna(bcodes)
        bcodes_i = np.where(valid_key, bcodes, 0).astype(np.int64)
        bts = _asof_ts_i64(t.column(big_ts))
        rank_mask = np.int64((1 << rbits) - 1)
        # rank of last build ts ≤ probe ts (−1 = before every build ts)
        pr = np.searchsorted(uniq_ts, bts, side="right") - 1
        key_base = bcodes_i << rbits

        # backward: rightmost build composite ≤ (key, pr)
        b_idx = np.searchsorted(comp, key_base | np.maximum(pr, 0), side="right") - 1
        b_ok = valid_key & (pr >= 0) & (b_idx >= 0)
        b_safe = np.where(b_ok, b_idx, 0)
        b_ok &= (comp[b_safe] >> rbits) == bcodes_i

        # forward: leftmost build composite with rank > pr (strictly after
        # the probe ts); pr = −1 naturally lands on the key's first row
        f_idx = np.searchsorted(comp, key_base + pr + 1, side="left")
        f_ok = valid_key & (f_idx < len(comp))
        f_safe = np.where(f_ok, f_idx, 0)
        f_ok &= (comp[f_safe] >> rbits) == bcodes_i

        b_ts = uniq_ts[comp[b_safe] & rank_mask] if len(uniq_ts) else np.zeros(len(b_safe), np.int64)
        f_ts = uniq_ts[comp[f_safe] & rank_mask] if len(uniq_ts) else np.zeros(len(f_safe), np.int64)
        take_back = b_ok & (~f_ok | ((bts - b_ts) <= (f_ts - bts)))
        matched = b_ok | f_ok
        idx = np.where(take_back, b_safe, f_safe)
        take_idx = pa.array(np.where(matched, idx, -1), type=pa.int64())
        take_idx = pc.if_else(
            pc.greater_equal(take_idx, 0), take_idx, pa.scalar(None, type=pa.int64())
        )
        for c in payload.column_names:
            t = t.append_column(prefix + c, pc.take(payload.column(c), take_idx))
        return t

    return big.map_batches(probe, batch_format="pyarrow")
