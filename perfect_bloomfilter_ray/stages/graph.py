"""Iterative graph algorithms over edge-list Datasets.

``pagerank``: fixed-iteration power method — PR_0 = 1/N; PR_{k+1}(v) =
(1-d)/N + d·Σ_{u→v} PR_k(u)/outdeg(u) (no dangling-mass redistribution:
dangling nodes leak their mass, the textbook simplification; the SQL
oracle states the same recurrence, so results compare exactly).

Scale shape: the EDGE LIST is the big side and streams through one
``map_batches`` + dst-groupby per iteration (pre-aggregated per batch —
the shuffle carries one partial row per distinct dst per batch); the RANK
vector is node-cardinality and is broadcast each iteration (``ray.put``),
the same bounded-small-side contract as every lookup join in this repo.
For web-graph node counts that exceed broadcast, swap the rank resolve
for a co-partitioned join (the asof/band `_tagged_union` machinery) — the
iteration structure is unchanged.

Connected components (hash-to-min label propagation) lives in
stages/dedup.connected_components_pairs; this module adds the weighted /
real-valued iterative family the rule's "iterative algorithms" row needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum


def pagerank(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> pd.DataFrame:
    """PageRank after ``iters`` power iterations. Returns a small pandas
    frame ``(node, rank)`` (node-cardinality — the documented driver
    altitude). Edges are directed and deduplicated before use."""
    import polars as pl
    import ray

    def dedup(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([src_col, dst_col])).unique().to_arrow()
        )

    # the edge list is loop-invariant: cache it in the object store once
    # (spillable) — a lazy Dataset would re-execute its whole upstream
    # lineage (shuffles included) on EVERY iteration's contribution pass
    e = edges.map_batches(dedup, batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([src_col]))
            .group_by(src_col)
            .len(name="pd")
            .with_columns(pl.col("pd").cast(pl.Int64))
            .to_arrow()
        )

    deg = (
        e.map_batches(deg_partial, batch_format="pyarrow")
        .groupby(src_col)
        .aggregate(Sum("pd", alias_name="outdeg"))
        .to_pandas()
    )

    def nodes_partial(t: pa.Table) -> pa.Table:
        a = pl.from_arrow(t.select([src_col])).rename({src_col: "node"})
        b = pl.from_arrow(t.select([dst_col])).rename({dst_col: "node"})
        return pl.concat([a, b]).unique().to_arrow()

    nodes = (
        e.map_batches(nodes_partial, batch_format="pyarrow")
        .groupby("node")
        .count()
        .to_pandas()["node"]
        .to_numpy()
    )
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    ranks = pd.Series(np.full(n, 1.0 / n), index=nodes)
    outdeg = pd.Series(deg["outdeg"].to_numpy(), index=deg[src_col].to_numpy())

    for _ in range(iters):
        share = (ranks / outdeg.reindex(ranks.index)).dropna()  # PR(u)/outdeg(u)
        lut = ray.put((share.index.to_numpy(), share.to_numpy()))

        def contrib(t: pa.Table) -> pa.Table:
            keys, vals = ray.get(lut)
            order = np.argsort(keys)
            ks, vs = keys[order], vals[order]
            s = t.column(src_col).to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, s), 0, len(ks) - 1)
            w = np.where(ks[pos] == s, vs[pos], 0.0)
            return (
                pl.from_arrow(t.select([dst_col]))
                .with_columns(pl.Series("w", w))
                .group_by(dst_col)
                .agg(pl.col("w").sum().alias("pw"))
                .to_arrow()
            )

        sums = (
            e.map_batches(contrib, batch_format="pyarrow")
            .groupby(dst_col)
            .aggregate(Sum("pw", alias_name="w"))
            .to_pandas()
        )
        incoming = pd.Series(sums["w"].to_numpy(), index=sums[dst_col].to_numpy())
        ranks = pd.Series(
            (1.0 - damping) / n + damping * incoming.reindex(ranks.index).fillna(0.0).to_numpy(),
            index=ranks.index,
        )

    out = pd.DataFrame({"node": ranks.index, "rank": ranks.to_numpy()})
    return out.sort_values("node").reset_index(drop=True)
