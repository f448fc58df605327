"""Grouped top-k — per-key top-k rows without a global sort.

The scale-correct shape for "top k rows per group" over a huge fact table:

1. **Partial top-k per block** (`map_batches`, vectorized via polars): each
   block keeps at most ``k`` rows per key it has seen, so the shuffle that
   follows moves ≤ ``k × distinct_keys_per_block`` rows instead of the whole
   table. This is the combiner pattern from SURVEY.md §2.3 applied to order
   statistics (top-k of a group is mergeable: topk(A ∪ B) = topk(topk(A) ∪
   topk(B))).
2. **Final top-k per coarse partition** (`groupby(hash(keys) % num_blocks)
   .map_groups`): the residual shuffle is tiny, and the per-partition pass is
   ONE vectorized polars sort + group_by().head(k) — not one Python call per
   distinct key, which would dominate at millions of keys (e.g.
   latest_event_per_user) despite the combiner.

Compare `Dataset.sort(...).limit(k)` (global top-k, see
queries.top_orders_by_revenue): a per-group limit cannot be expressed with
sort+limit, and a full sort would be an all-to-all over the whole table.

Reference parity note: the reference engine has no grouped operators at all
(single Bloom accumulator, /root/reference/src/filter.rs); this operator is
part of the [RULE] analytics surface (SURVEY.md §2.3 "Sorts / limits /
top-k").
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.functions.hashing import hash64
from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

_U64 = np.uint64


def _multi_key_part(t: pa.Table, keys: list[str], num_blocks: int, seed: int = 0x709C) -> pa.Table:
    """Append a ``_part`` column = combined hash of ``keys`` mod num_blocks."""
    h = hash64(t.column(keys[0]), seed)
    with np.errstate(over="ignore"):
        for i, c in enumerate(keys[1:], 1):
            h = h * _U64(0x9E3779B97F4A7C15) + hash64(t.column(c), seed + i)
    return t.append_column("_part", pa.array((h % _U64(num_blocks)).astype(np.int32)))


def _partial_topk(keys: list[str], order_col: str, k: int, descending: bool, tie_cols: list[str]):
    by = [order_col, *tie_cols]
    desc = [descending] + [False] * len(tie_cols)

    def fn(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = df.sort(by, descending=desc).group_by(keys, maintain_order=True).head(k)
        return out.to_arrow()

    return fn


def grouped_top_k(
    ds: Dataset,
    keys: list[str] | str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Top ``k`` rows per ``keys`` group ordered by ``order_col``.

    ``tie_cols`` (ascending) make the result deterministic when ``order_col``
    has duplicates — always pass a unique-ish column here; the matching SQL
    oracle is ``row_number() OVER (PARTITION BY keys ORDER BY order_col
    [DESC], tie_cols)``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    tie_cols = list(tie_cols or [])
    part = _partial_topk(keys, order_col, k, descending, tie_cols)
    nb = choose_num_blocks(ds, num_blocks)
    by = [order_col, *tie_cols]
    desc = [descending] + [False] * len(tie_cols)

    def add_part(t: pa.Table) -> pa.Table:
        return _multi_key_part(t, keys, nb)

    def final_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        return df.sort(by, descending=desc).group_by(keys, maintain_order=True).head(k).to_arrow()

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final_block, batch_format="pyarrow")
    )


def stratified_sample(
    ds: Dataset,
    keys: list[str] | str,
    id_col: str,
    k: int,
    mult: int = 2654435761,
    mod: int = 1_000_000_007,
) -> Dataset:
    """Deterministic k-per-group sample: the k rows with the smallest
    multiplicative-hash residue of ``id_col`` within each group.

    Engine-portable and reproducible (same rows every run and on every
    engine — the SQL equivalent is ``row_number() OVER (PARTITION BY keys
    ORDER BY (id*mult) % mod, id) <= k``), unlike ``Dataset.random_sample``.
    Runs as a grouped top-k, so the shuffle moves at most k rows per group
    per block. The ``_sample_key`` column is retained in the output for
    oracle comparison; drop it downstream if unwanted.

    Supported id range: non-negative int64. The residue is computed as
    ``((id % mod) * (mult % mod)) % mod`` — both factors < 2^31, product
    < 2^62 — so it equals the unbounded-arithmetic SQL expression for ALL
    non-negative ids (a plain int64 ``id * mult`` would wrap above ~3.5e9
    and silently diverge from the oracle). Negative ids raise: C-style and
    floored ``%`` disagree there, so portability would be a lie.
    """

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("stratified_sample requires non-negative ids (see docstring)")
        hk = ((ids % mod) * (mult % mod)) % mod
        return t.append_column("_sample_key", pa.array(hk))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return grouped_top_k(keyed, keys, "_sample_key", k, descending=False, tie_cols=[id_col])


def weighted_sample(
    ds: Dataset,
    keys: list[str] | str,
    id_col: str,
    weight_col: str,
    k: int,
    mult: int = 2654435761,
    mod: int = 1_000_000_007,
) -> Dataset:
    """Deterministic weight-proportional k-per-group sample
    (Efraimidis & Spirakis 2006, A-ES): each row gets a reproducible uniform
    ``u`` from a multiplicative hash of its id, sample key = ``u^(1/w)``, and
    the k largest keys per group win — inclusion probability proportional to
    ``weight_col`` (the training-data mixing primitive: sample documents by
    quality/length score, reproducibly across engines and runs).

    Same portability contract as ``stratified_sample``: non-negative int64
    ids, modular hash arithmetic, SQL equivalent ``row_number() OVER
    (PARTITION BY keys ORDER BY pow(u, 1.0/greatest(w,1)) DESC, id) <= k``
    with ``u = ((id % mod)*(mult % mod) % mod + 1) / (mod + 1.0)``.
    Weights are floored at 1 (zero/negative weights would degenerate).
    The ``_es_key`` column is retained for oracle comparison.
    """

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("weighted_sample requires non-negative ids (see docstring)")
        w = np.maximum(t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
        u = (((ids % mod) * (mult % mod)) % mod + 1) / (mod + 1.0)
        return t.append_column("_es_key", pa.array(u ** (1.0 / w)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return grouped_top_k(keyed, keys, "_es_key", k, descending=True, tie_cols=[id_col])


def grouped_mode(
    ds: Dataset,
    key_col: str,
    value_col: str,
    mode_col: str | None = None,
    cnt_col: str = "mode_count",
    num_blocks: int | None = None,
) -> Dataset:
    """Most frequent ``value_col`` per ``key_col`` group, with its count —
    deterministic ties (highest count wins, equal counts break to the
    smallest value), so the result is engine-reproducible (SQL oracle:
    ``row_number() OVER (PARTITION BY key ORDER BY cnt DESC, value)``,
    NOT SQL ``mode()`` whose tie rule is unspecified).

    Scale shape: per-batch ``(key, value, pcnt)`` partial counts (the
    shuffle carries one row per distinct pair per batch), then ONE
    vectorized polars pass per coarse key partition summing partials and
    taking the per-key argmax. No per-key Python, one shuffle.
    """
    mode_col = mode_col or f"{value_col}_mode"

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key_col, value_col]))
        return (
            df.group_by([key_col, value_col])
            .len(name="pcnt")
            .with_columns(pl.col("pcnt").cast(pl.Int64))
            .to_arrow()
        )

    nb = choose_num_blocks(ds, num_blocks)

    def add_part(t: pa.Table) -> pa.Table:
        return _multi_key_part(t, [key_col], nb)

    def final_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        out = (
            df.group_by([key_col, value_col])
            .agg(pl.col("pcnt").sum().alias(cnt_col))
            .sort([cnt_col, value_col], descending=[True, False])
            .group_by(key_col, maintain_order=True)
            .head(1)
            .rename({value_col: mode_col})
        )
        return out.to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final_block, batch_format="pyarrow")
    )


def global_top_k(
    ds: Dataset,
    order_col: str,
    k: int,
    descending: bool = False,
    tie_cols: list[str] | None = None,
) -> Dataset:
    """Exact global top-``k`` without a full sort.

    Per-block partial head-k (``map_batches``) shrinks every block to ≤ k
    rows, then ONE final task merges the ≤ blocks×k survivors — the
    priority-queue shape that replaces ``Dataset.sort().limit(k)``'s
    all-to-all range shuffle with a tree-reduce. For k × num_blocks too big
    for one merge task, chain an extra ``repartition(√blocks)`` + head level;
    at sane k (≤10^5) the single merge is the right call even at 10^12 rows.

    With ``order_col`` = a deterministic key hash this is exact-size uniform
    sampling without replacement (bottom-k / priority sampling) — mergeable
    and rerun-stable, unlike reservoir sampling under re-partitioning.
    """
    tie_cols = list(tie_cols or [])
    by = [order_col, *tie_cols]
    desc = [descending] + [False] * len(tie_cols)

    def head(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).sort(by, descending=desc).head(k).to_arrow()

    return (
        ds.map_batches(head, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
    )


def pps_systematic_sample(
    ds,
    key_col: str,
    weight_col: str,
    m: int,
    num_blocks: int | None = None,
):
    """Probability-proportional-to-size SYSTEMATIC sampling (the classic
    survey-sampling PPS design, Madow 1949) — deterministic, rerun-stable,
    and integer-exact: order the population by ``key_col``, take the
    running weight total ``cum``, and select every row whose weight span
    crosses one of ``m`` equally spaced strata of the total weight:

        selected  ⟺  (cum · m) // W  >  ((cum − w) · m) // W

    (integer floor divisions; a row heavier than one stratum is selected
    once, so the sample size is ≤ m). Heavier rows are proportionally more
    likely to cross a boundary — PPS without any randomness, the sampling
    twin of the hash-residue designs in this module.

    Distributed shape — a global ORDERED prefix sum WITHOUT a global sort:
    rows route to order-PRESERVING range buckets (``key · nb // (max+1)``),
    one bucket-keyed groupby computes per-bucket weight subtotals
    (bucket-cardinality driver state), exclusive bucket offsets broadcast
    back, and each bucket finishes its own exact cumsum + selection rule
    in place. Keys must be unique non-negative integers; weights positive
    int64 (use the micro-cents idiom for money).

    Returns a pandas DataFrame (key, w, cum) of the selected rows, ordered
    by key.
    """
    import ray
    from ray.data.aggregate import Max, Sum

    nb = choose_num_blocks(ds, num_blocks)

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t.column(key_col), pa.int64()),
                "w": pc.cast(t.column(weight_col), pa.int64()),
            }
        )

    kw = ds.map_batches(slim, batch_format="pyarrow").materialize()
    kmax = int(kw.aggregate(Max("k"))["max(k)"])

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        b = (k * nb) // (kmax + 1)
        return t.append_column("_b", pa.array(b.astype(np.int32)))

    bk = kw.map_batches(bucketize, batch_format="pyarrow")
    subs = (
        bk.groupby("_b")
        .aggregate(Sum("w", alias_name="bw"))
        .to_pandas()
        .sort_values("_b")
        .reset_index(drop=True)
    )
    total = int(subs["bw"].sum())
    offs = np.concatenate([[0], subs["bw"].to_numpy().astype(np.int64).cumsum()[:-1]])
    off_ref = ray.put(
        (subs["_b"].to_numpy().astype(np.int64), offs.astype(np.int64), total)
    )

    def select(t: pa.Table) -> pa.Table:
        bs, os_, tot = ray.get(off_ref)
        b = int(t.column("_b")[0].as_py())
        off = int(os_[np.searchsorted(bs, b)])
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k)
        k, w = k[order], w[order]
        cum = off + w.cumsum()
        sel = (cum * m) // tot > ((cum - w) * m) // tot
        return pa.table(
            {
                "k": pa.array(k[sel]),
                "w": pa.array(w[sel]),
                "cum": pa.array(cum[sel]),
            }
        )

    out = bk.groupby("_b").map_groups(select, batch_format="pyarrow").to_pandas()
    return out.sort_values("k").reset_index(drop=True)
