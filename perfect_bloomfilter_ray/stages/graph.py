"""Iterative graph algorithms over edge-list Datasets.

``pagerank``: fixed-iteration power method — PR_0 = 1/N; PR_{k+1}(v) =
(1-d)/N + d·Σ_{u→v} PR_k(u)/outdeg(u) (no dangling-mass redistribution:
dangling nodes leak their mass, the textbook simplification; the SQL
oracle states the same recurrence, so results compare exactly).

Scale shape: the EDGE LIST is the big side and streams through one
``map_batches`` + dst-groupby per iteration (pre-aggregated per batch —
the shuffle carries one partial row per distinct dst per batch). The RANK
vector has two resolves, gated on node count (``broadcast_max_nodes``):

- bounded node count → broadcast each iteration (``ray.put``), the same
  bounded-small-side contract as every lookup join in this repo;
- web-graph node counts → ``pagerank_dataset``: ranks stay a Dataset and
  each iteration is exactly two co-partitioning shuffles — a tagged-union
  groupby that co-locates each node's (rank, outdeg) state with the edges
  leaving it (share resolve, hash(src) partitions), then a dst-keyed sum
  that simultaneously rebuilds the full node state (state rows re-emitted
  as zero contributions, so no third pass for rankless nodes). No stage
  ever holds the node set in one process.

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
    broadcast_max_nodes: int = 5_000_000,
    weight_col: str | None = None,
    seeds: "list | None" = None,
) -> pd.DataFrame:
    """PageRank after ``iters`` power iterations. Returns a small pandas
    frame ``(node, rank)`` (node-cardinality — the documented driver
    altitude). Edges are directed and deduplicated before use.

    ``weight_col`` switches to WEIGHTED PageRank: rank flows out of a node
    proportionally to edge weight — share(u→v) = r(u) · w(u,v) / W(u) with
    W(u) the weighted out-degree (duplicate (src, dst) rows sum their
    weights). The weighted mode is broadcast-resolve only (node-bounded
    contract); extend ``pagerank_dataset``'s tagged join with a weight
    column for corpus-cardinality weighted graphs.

    ``seeds`` switches to PERSONALIZED PageRank (Page et al. 1999 §6 /
    Haveliwala 2002): the teleport mass lands uniformly on the seed set
    instead of all nodes — r_0 = s, r_{k+1}(v) = (1-d)·s_v + d·Σ shares,
    with s_v = 1/|S| on seeds, 0 elsewhere. Broadcast-resolve only (the
    seed vector is node-bounded by definition of the mode).

    Node counts above ``broadcast_max_nodes`` switch to the fully
    distributed ``pagerank_dataset`` resolve (the caller still asked for a
    DataFrame, so the final ranks do come back to the driver — use
    ``pagerank_dataset`` directly to keep them distributed)."""
    import polars as pl
    import ray

    def dedup(t: pa.Table) -> pa.Table:
        if weight_col is not None:
            return (
                pl.from_arrow(t.select([src_col, dst_col, weight_col]))
                .group_by([src_col, dst_col])
                .agg(pl.col(weight_col).sum())
                .to_arrow()
            )
        return (
            pl.from_arrow(t.select([src_col, dst_col])).unique().to_arrow()
        )

    # the edge list is loop-invariant: cache it in the object store once
    # (spillable) — a lazy Dataset would re-execute its whole upstream
    # lineage (shuffles included) on EVERY iteration's contribution pass
    e = edges.map_batches(dedup, batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        if weight_col is not None:
            return (
                pl.from_arrow(t.select([src_col, weight_col]))
                .group_by(src_col)
                .agg(pl.col(weight_col).sum().cast(pl.Float64).alias("pd"))
                .to_arrow()
            )
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
    if seeds is not None:
        s_on = np.isin(nodes, np.asarray(list(seeds)))
        n_seed = int(s_on.sum())
        if n_seed == 0:
            raise ValueError("no seed appears in the graph")
        s_vec = np.where(s_on, 1.0 / n_seed, 0.0)
        ranks = pd.Series(s_vec.copy(), index=nodes)
    elif weight_col is None and n > broadcast_max_nodes and nodes.dtype.kind in "iu":
        # string ids above the gate would need an upstream hash64 — a graph
        # that big is always hashed-id in this repo's pipelines
        out = pagerank_dataset(
            e, src_col=src_col, dst_col=dst_col, iters=iters, damping=damping, _deduped=True
        ).to_pandas()
        return out.sort_values("node").reset_index(drop=True)
    if seeds is None:
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
            if weight_col is not None:
                w = w * t.column(weight_col).to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
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
        inc = incoming.reindex(ranks.index).fillna(0.0).to_numpy()
        if seeds is not None:
            # teleport mass lands on the seed vector, term-for-term with the
            # oracle's (1-d)*s_v + d*w
            ranks = pd.Series((1.0 - damping) * s_vec + damping * inc, index=ranks.index)
        else:
            ranks = pd.Series((1.0 - damping) / n + damping * inc, index=ranks.index)

    out = pd.DataFrame({"node": ranks.index, "rank": ranks.to_numpy()})
    return out.sort_values("node").reset_index(drop=True)


def pagerank_dataset(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    num_blocks: int | None = None,
    _deduped: bool = False,
    checkpoint_dir: str | None = None,
    tol: float | None = None,
) -> Dataset:
    """Fully distributed PageRank: ranks stay a ``(node, rank)`` Dataset.

    ``tol`` enables CONVERGENCE early stop: iteration ends when the L1
    rank change Σ|PR_k − PR_{k−1}| drops below ``tol`` (each state row
    carries its previous rank through the resolve, so the delta is one
    cheap map-side partial sum over the already-materialized state — no
    extra old-vs-new join or shuffle).  ``iters`` stays the hard cap.

    ``checkpoint_dir`` makes the iteration RESUMABLE: after every
    iteration the (node, outdeg, rank) state is published atomically as
    ``iter_K/`` parquet (write to a dot-tmp dir, then one rename), and a
    rerun pointed at the same directory restarts from the highest
    complete iteration instead of iteration 0 — a web-graph job killed at
    iteration 47/50 redoes 3 iterations, not 47.  The same per-partition
    contract as stages/checkpoint.py: no driver materialization, the
    state lands as sharded parquet.

    Node ids must be int64-castable (hash string urls upstream with
    ``functions.hashing.hash64`` — the id space is already hashed in every
    dedup pipeline here). Per iteration exactly two shuffles:

    1. **share resolve** — node state ``(node, outdeg, rank)`` and edges
       ``(src, dst)`` are tagged with ``hash(key) % num_blocks`` (key =
       node / src) and unioned; one groupby co-locates each node's state
       with every edge leaving it, so the per-group searchsorted maps
       ``src → rank/outdeg`` with no broadcast. Contributions are
       pre-aggregated per dst inside the group (one row per distinct dst).
    2. **state rebuild** — the same group ALSO re-emits each state row as a
       zero contribution carrying its outdeg, so one dst-keyed
       ``groupby(node).aggregate(Sum, Max)`` both sums incoming mass and
       reconstitutes the full node set (nodes with no incoming mass
       included). New rank = (1-d)/n + d·Σ.

    The state is materialized per iteration (spillable object store), never
    on the driver. Same recurrence as ``pagerank`` — dangling nodes leak
    mass; float sums differ from the broadcast path only by addition order.
    """
    import polars as pl
    import ray.data as rd
    from ray.data.aggregate import Max

    from perfect_bloomfilter_ray.functions.hashing import splitmix64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    _u64 = np.uint64

    if _deduped:
        e = edges
    else:

        def dedup(t: pa.Table) -> pa.Table:
            return pl.from_arrow(t.select([src_col, dst_col])).unique().to_arrow()

        e = edges.map_batches(dedup, batch_format="pyarrow").materialize()

    nb = choose_num_blocks(e, num_blocks)

    # initial state: node set with out-degrees (map-side partials → one sum)
    def state_partial(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        us, cnt = np.unique(s, return_counts=True)
        ud = np.unique(d)
        return pa.table(
            {
                "node": pa.array(np.concatenate([us, ud])),
                "od": pa.array(np.concatenate([cnt.astype(np.int64), np.zeros(len(ud), np.int64)])),
            }
        )

    state = (
        e.map_batches(state_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("od", alias_name="outdeg"))
        .materialize()
    )
    n = state.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )
    r0 = 1.0 / n
    base = (1.0 - damping) / n

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "outdeg": t.column("outdeg").cast(pa.int64()),
                "rank": pa.array(np.full(len(t), r0)),
            }
        )

    state = state.map_batches(init_rank, batch_format="pyarrow").materialize()

    def part_of(keys: np.ndarray) -> pa.Array:
        return pa.array((splitmix64(keys.view(_u64)) % _u64(nb)).astype(np.int32))

    def tag_state(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        zeros = np.zeros(len(t), np.int64)
        return pa.table(
            {
                "_part": part_of(node),
                "side": pa.array(np.ones(len(t), np.int8)),
                "key": pa.array(node),
                "dst": pa.array(zeros),
                "outdeg": t.column("outdeg"),
                "rank": t.column("rank"),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_part": part_of(s),
                "side": pa.array(np.zeros(len(t), np.int8)),
                "key": pa.array(s),
                "dst": pa.array(d),
                "outdeg": pa.array(np.zeros(len(t), np.int64)),
                "rank": pa.array(np.zeros(len(t))),
            }
        )

    tagged_edges = e.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def resolve(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy()
        key = t.column("key").to_numpy()
        st = side == 1
        order = np.argsort(key[st])
        ks = key[st][order]
        od = t.column("outdeg").to_numpy()[st][order]
        share = np.where(od > 0, t.column("rank").to_numpy()[st][order] / np.maximum(od, 1), 0.0)
        src = key[~st]
        dst = t.column("dst").to_numpy()[~st]
        if len(ks) and len(src):
            pos = np.clip(np.searchsorted(ks, src), 0, len(ks) - 1)
            w = np.where(ks[pos] == src, share[pos], 0.0)
        else:
            w = np.zeros(len(src))
        ud, inv = np.unique(dst, return_inverse=True)
        pw = np.bincount(inv, weights=w) if len(dst) else np.zeros(0)
        # contributions (od = -1 sentinel) + re-emitted state rows (pw = 0);
        # state rows also carry the PREVIOUS rank so convergence |Δ| can be
        # read off the next state without an extra old-vs-new join
        prev = t.column("rank").to_numpy()[st][order]
        return pa.table(
            {
                "node": pa.array(np.concatenate([ud, ks])),
                "pw": pa.array(np.concatenate([pw, np.zeros(len(ks))])),
                "od": pa.array(np.concatenate([np.full(len(ud), -1, np.int64), od])),
                "prev": pa.array(np.concatenate([np.zeros(len(ud)), prev])),
            }
        )

    def new_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "outdeg": t.column("outdeg").cast(pa.int64()),
                "rank": pa.array(base + damping * t.column("pw").to_numpy(zero_copy_only=False)),
                "prev": t.column("prev"),
            }
        )

    start_iter = 0
    if checkpoint_dir:
        import json
        import os
        import re as _re

        import ray.data as _rd

        os.makedirs(checkpoint_dir, exist_ok=True)

        # Manifest guard: iter_K state is only valid for the exact (edges,
        # damping, nb) it was computed from — resuming a changed run from a
        # stale directory would silently produce ranks of the OLD graph.
        # Fingerprint = wrap-sum of per-edge mixed hashes (order-independent,
        # one cheap pass over the already-materialized edge list).
        def fp_partial(t: pa.Table) -> pa.Table:
            s = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
            h = splitmix64(s.view(_u64) ^ splitmix64(d.view(_u64)))
            with np.errstate(over="ignore"):
                f = int(h.sum(dtype=np.uint64))
            return pa.table({"f": pa.array([f], pa.uint64()), "m": pa.array([len(s)], pa.int64())})

        fp = e.map_batches(fp_partial, batch_format="pyarrow").to_pandas()
        with np.errstate(over="ignore"):
            manifest = {
                "edge_count": int(fp["m"].sum()),
                "edge_fingerprint": int(fp["f"].to_numpy().astype(np.uint64).sum(dtype=np.uint64)),
                "n_nodes": int(n),
                "damping": float(damping),
                "num_blocks": int(nb),
            }
        mpath = os.path.join(checkpoint_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                prev_manifest = json.load(fh)
            if prev_manifest != manifest:
                raise ValueError(
                    f"pagerank checkpoint_dir {checkpoint_dir!r} holds state for "
                    f"different inputs ({prev_manifest} != {manifest}); "
                    "use a fresh directory or delete the stale checkpoints"
                )
        else:
            # refuse orphan checkpoints: iter_K dirs with no manifest are
            # from an unknown (possibly different) input — writing a fresh
            # manifest and resuming them would bypass the guard entirely
            orphans = [d for d in os.listdir(checkpoint_dir) if _re.fullmatch(r"iter_(\d+)", d)]
            if orphans:
                raise ValueError(
                    f"pagerank checkpoint_dir {checkpoint_dir!r} holds checkpoints "
                    f"({sorted(orphans)[:3]}...) but no manifest.json — provenance "
                    "unknown; use a fresh directory or delete the stale checkpoints"
                )
            with open(mpath + ".tmp", "w") as fh:
                json.dump(manifest, fh)
            os.rename(mpath + ".tmp", mpath)

        done = sorted(
            int(m.group(1))
            for d in os.listdir(checkpoint_dir)
            if (m := _re.fullmatch(r"iter_(\d+)", d))
        )
        usable = [k for k in done if k <= iters]
        if usable:
            start_iter = usable[-1]
            state = _rd.read_parquet(
                os.path.join(checkpoint_dir, f"iter_{start_iter}")
            ).materialize()

    for it in range(start_iter, iters):
        state = (
            state.map_batches(tag_state, batch_format="pyarrow")
            .union(tagged_edges)
            .groupby("_part")
            .map_groups(resolve, batch_format="pyarrow")
            .groupby("node")
            .aggregate(
                Sum("pw", alias_name="pw"),
                Max("od", alias_name="outdeg"),
                Max("prev", alias_name="prev"),
            )
            .map_batches(new_rank, batch_format="pyarrow")
            .materialize()
        )
        if tol is not None:
            def l1_partial(t: pa.Table) -> pa.Table:
                d = np.abs(
                    t.column("rank").to_numpy(zero_copy_only=False)
                    - t.column("prev").to_numpy(zero_copy_only=False)
                )
                return pa.table({"d": pa.array([float(d.sum())])})

            delta = float(
                state.map_batches(l1_partial, batch_format="pyarrow").sum("d")
            )
            if delta < tol:
                if checkpoint_dir:
                    import os

                    final_dir = os.path.join(checkpoint_dir, f"iter_{it + 1}")
                    if not os.path.exists(final_dir):
                        tmp = os.path.join(checkpoint_dir, f".tmp_iter_{it + 1}")
                        if os.path.exists(tmp):  # stale partial from a crash
                            import shutil

                            shutil.rmtree(tmp)
                        state.write_parquet(tmp)
                        os.rename(tmp, final_dir)
                break
        if checkpoint_dir:
            import os

            final_dir = os.path.join(checkpoint_dir, f"iter_{it + 1}")
            if not os.path.exists(final_dir):
                tmp = os.path.join(checkpoint_dir, f".tmp_iter_{it + 1}")
                if os.path.exists(tmp):
                    import shutil

                    shutil.rmtree(tmp)
                state.write_parquet(tmp)
                os.rename(tmp, final_dir)  # atomic publish

    def final(t: pa.Table) -> pa.Table:
        return t.select(["node", "rank"])

    return state.map_batches(final, batch_format="pyarrow")


def triangle_count(
    edges: Dataset,
    a_col: str = "item_a",
    b_col: str = "item_b",
    num_blocks: int | None = None,
    broadcast_max_edges: int = 10_000_000,
    per_node: bool = False,
) -> pd.DataFrame:
    """Exact triangle count over a distinct undirected edge list — the
    degree-ordered "forward" algorithm (Schank-Wagner 2005 / Latapy 2008):

    1. orient every edge from the lower to the higher (degree, node) rank —
       each triangle then has exactly ONE apex with two outgoing edges, and
       every out-degree is O(sqrt(m)) regardless of skew (a hub's edges
       almost all point INTO it);
    2. wedges = rank-ordered pairs of out-neighbors, generated by a polars
       self-join inside hash(src) partitions (the cooccur.py shape);
    3. closure, size-gated like every small-side resolve in this repo:
       - m <= ``broadcast_max_edges`` and 32-bit-packable node ids → the
         oriented edge set broadcasts ONCE as a sorted packed-uint64 array
         (8 B/edge) and each wedge block probes it in place with
         searchsorted — wedges NEVER leave their partition, the closure
         costs zero shuffle rows;
       - above the gate → a tagged co-partitioned membership probe of
         wedge rows against edge rows on the (v, w) key (id-only rows,
         integer count partials).

    The degree table is the bounded-node-dimension contract (same gate
    story as ``pagerank``; use ``pagerank_dataset``'s join shape for
    corpus-cardinality node sets). Returns one row
    (n_nodes, n_edges, n_triangles) — exact ints, algorithm-independent.

    ``per_node=True`` instead returns the triangle census PER NODE —
    ``(node, deg, tri)`` with ``tri`` the exact number of triangles the
    node participates in (each closed wedge credits its apex and both
    endpoints; sum(tri) == 3 * n_triangles) — the local-clustering-
    coefficient numerator. Same two closure paths; the only extra cost is
    the wedge rows carrying their apex id and the count partials being
    keyed by node instead of scalar.
    """
    import polars as pl
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    nb = choose_num_blocks(edges, num_blocks)
    # the edge list feeds the degree pass AND the orientation pass: pin the
    # id-only rows in the (spillable) object store once, or each consumer
    # re-executes the whole upstream lineage (pagerank:64 precedent)
    edges = edges.materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([a_col, b_col]))
        return pl.concat(
            [df.select(pl.col(a_col).alias("node")), df.select(pl.col(b_col).alias("node"))]
        ).group_by("node").len(name="pd").with_columns(pl.col("pd").cast(pl.Int64)).to_arrow()

    deg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("pd", alias_name="deg"))
        .to_pandas()
    )
    n_nodes = len(deg)
    if n_nodes == 0:
        if per_node:
            return pd.DataFrame(
                {"node": np.array([], dtype="int64"), "deg": np.array([], dtype="int64"), "tri": np.array([], dtype="int64")}
            )
        return pd.DataFrame(
            {"n_nodes": np.array([0], dtype="int64"), "n_edges": np.array([0], dtype="int64"), "n_triangles": np.array([0], dtype="int64")}
        )
    n_edges = int(deg["deg"].sum()) // 2
    nodes_np = deg["node"].to_numpy()
    deg_ref = ray.put(pl.DataFrame({"node": nodes_np, "deg": deg["deg"].to_numpy().astype(np.int64)}))

    def orient(t: pa.Table) -> pa.Table:
        dl: pl.DataFrame = ray.get(deg_ref)
        df = pl.from_arrow(t.select([a_col, b_col]))
        df = (
            df.join(dl.rename({"node": a_col, "deg": "_da"}), on=a_col, how="left")
            .join(dl.rename({"node": b_col, "deg": "_db"}), on=b_col, how="left")
        )
        a_first = (pl.col("_da") < pl.col("_db")) | ((pl.col("_da") == pl.col("_db")) & (pl.col(a_col) < pl.col(b_col)))
        df = df.select(
            pl.when(a_first).then(pl.col(a_col)).otherwise(pl.col(b_col)).alias("src"),
            pl.when(a_first).then(pl.col(b_col)).otherwise(pl.col(a_col)).alias("dst"),
            pl.when(a_first).then(pl.col("_db")).otherwise(pl.col("_da")).alias("ddst"),
        )
        h = hash64(df["src"], 0x7A1)
        return df.with_columns(pl.Series("_part", (h % np.uint64(nb)).astype(np.int32))).to_arrow()

    # consumed twice on the broadcast path (pack + probe): pin it too
    oriented = edges.map_batches(orient, batch_format="pyarrow").materialize()

    packable = (
        np.issubdtype(nodes_np.dtype, np.integer)
        and n_nodes > 0
        and int(nodes_np.min()) >= 0
        and int(nodes_np.max()) < 2**32
    )

    def _wedge_pairs(df: "pl.DataFrame") -> "pl.DataFrame":
        """Rank-ordered out-neighbor pairs per src, by direct triangular
        index generation — the polars self-join materializes n^2 rows per
        src and filters half away; this emits exactly the n(n-1)/2 kept
        rows (measured ~2x on the wedge stage at 70M wedges)."""
        if len(df) == 0:
            cols = {"v": np.array([], np.int64), "w": np.array([], np.int64)}
            if per_node:
                cols = {"u": np.array([], np.int64), **cols}
            return pl.DataFrame(cols)
        s = df["src"].to_numpy()
        d = df["dst"].to_numpy()
        dd = df["ddst"].to_numpy()
        order = np.lexsort((d, dd, s))  # src groups, (ddst, dst) rank inside
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        sizes = np.diff(np.append(starts, len(s)))
        pc = sizes * (sizes - 1) // 2
        tot = int(pc.sum())
        if tot == 0:
            cols = {"v": np.array([], d.dtype), "w": np.array([], d.dtype)}
            if per_node:
                cols = {"u": np.array([], s.dtype), **cols}
            return pl.DataFrame(cols)
        grp = np.repeat(np.arange(len(sizes)), pc)
        p = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(pc)[:-1]]), pc
        )
        ng = sizes[grp]
        tmp = (2 * ng - 1).astype(np.float64)
        i = ((tmp - np.sqrt(tmp * tmp - 8.0 * p)) // 2).astype(np.int64)
        i = np.clip(i, 0, ng - 2)
        # float sqrt can land one row off at triangular boundaries: adjust
        for _ in range(3):
            base = i * (2 * ng - i - 1) // 2
            over = base > p
            under = (i + 1) * (2 * ng - i - 2) // 2 <= p
            if not (over.any() or under.any()):
                break
            i = i - over.astype(np.int64) + under.astype(np.int64)
        base = i * (2 * ng - i - 1) // 2
        j = p - base + i + 1
        off = starts[grp]
        cols = {"v": d[off + i], "w": d[off + j]}
        if per_node:
            cols = {"u": s[off], **cols}
        return pl.DataFrame(cols)

    def _node_partials(u: np.ndarray, v: np.ndarray, w: np.ndarray) -> pa.Table:
        un, cn = np.unique(np.concatenate([u, v, w]), return_counts=True)
        return pa.table({"node": pa.array(un), "pt": pa.array(cn.astype(np.int64))})

    def _per_node_result(parts) -> pd.DataFrame:
        tri_pn = parts.groupby("node").aggregate(Sum("pt", alias_name="tri")).to_pandas()
        out = deg.merge(tri_pn, on="node", how="left")
        out["tri"] = out["tri"].fillna(0).astype("int64")
        out["deg"] = out["deg"].astype("int64")
        return out.sort_values("node").reset_index(drop=True)

    if packable and n_edges <= broadcast_max_edges:
        # ---- broadcast closure: wedges probed in place, zero shuffle ----
        def pack_block(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            k = (df["src"].to_numpy().astype(np.uint64) << np.uint64(32)) | df["dst"].to_numpy().astype(np.uint64)
            return pa.table({"k": pa.array(k)})

        packed = np.sort(
            oriented.map_batches(pack_block, batch_format="pyarrow").to_pandas()["k"].to_numpy().astype(np.uint64)
        )
        edge_ref = ray.put(packed)

        def count_block(t: pa.Table) -> pa.Table:
            es: np.ndarray = ray.get(edge_ref)
            wd = _wedge_pairs(pl.from_arrow(t.drop_columns(["_part"])))
            if len(wd) == 0 and not per_node:
                return pa.table({"pt": pa.array([0], pa.int64())})
            k = (wd["v"].to_numpy().astype(np.uint64) << np.uint64(32)) | wd["w"].to_numpy().astype(np.uint64)
            idx = np.searchsorted(es, k)
            idx[idx >= len(es)] = len(es) - 1
            m = es[idx] == k
            if per_node:
                return _node_partials(
                    wd["u"].to_numpy()[m], wd["v"].to_numpy()[m], wd["w"].to_numpy()[m]
                )
            return pa.table({"pt": pa.array([int(m.sum())], pa.int64())})

        closed = oriented.groupby("_part").map_groups(count_block, batch_format="pyarrow")
        if per_node:
            return _per_node_result(closed)
        tri = closed.sum("pt")
    else:
        # ---- co-partitioned closure: tagged membership probe ----
        def wedges_block(t: pa.Table) -> pa.Table:
            return _wedge_pairs(pl.from_arrow(t.drop_columns(["_part"]))).to_arrow()

        wedges = oriented.groupby("_part").map_groups(wedges_block, batch_format="pyarrow")

        wedge_cols = (["u"] if per_node else []) + ["v", "w"]

        def tag_edges(t: pa.Table) -> pa.Table:
            df = (
                pl.from_arrow(t.drop_columns(["_part", "ddst"]))
                .select(pl.col("src").alias("v"), pl.col("dst").alias("w"))
                .with_columns(pl.lit(1, pl.Int8).alias("_is_edge"))
            )
            if per_node:
                df = df.with_columns(pl.lit(None).cast(df.schema["v"]).alias("u"))
            h = hash64(df["v"], 0xC105) * np.uint64(0x9E3779B97F4A7C15) + hash64(df["w"], 0xC106)
            return df.with_columns(
                pl.Series("_part", (h % np.uint64(nb)).astype(np.int32))
            ).select(wedge_cols + ["_is_edge", "_part"]).to_arrow()

        def tag_wedges(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t).with_columns(pl.lit(0, pl.Int8).alias("_is_edge"))
            h = hash64(df["v"], 0xC105) * np.uint64(0x9E3779B97F4A7C15) + hash64(df["w"], 0xC106)
            return df.with_columns(
                pl.Series("_part", (h % np.uint64(nb)).astype(np.int32))
            ).select(wedge_cols + ["_is_edge", "_part"]).to_arrow()

        def close_block(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t.drop_columns(["_part"]))
            e = df.filter(pl.col("_is_edge") == 1).select(["v", "w"]).unique()
            wd = df.filter(pl.col("_is_edge") == 0).select(wedge_cols)
            m = wd.join(e, on=["v", "w"], how="semi")
            if per_node:
                return _node_partials(m["u"].to_numpy(), m["v"].to_numpy(), m["w"].to_numpy())
            return pa.table({"pt": pa.array([len(m)], pa.int64())})

        tagged = oriented.map_batches(tag_edges, batch_format="pyarrow").union(
            wedges.map_batches(tag_wedges, batch_format="pyarrow")
        )
        closed = tagged.groupby("_part").map_groups(close_block, batch_format="pyarrow")
        if per_node:
            return _per_node_result(closed)
        tri = closed.sum("pt")

    return pd.DataFrame(
        {
            "n_nodes": np.array([n_nodes], dtype="int64"),
            "n_edges": np.array([n_edges], dtype="int64"),
            "n_triangles": np.array([int(tri or 0)], dtype="int64"),
        }
    )


def bfs_levels(
    edges: Dataset,
    src: int,
    a_col: str = "item_a",
    b_col: str = "item_b",
    max_depth: int = 6,
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Single-source BFS levels (unweighted shortest paths) over an
    undirected edge list: one distributed edge scan per round. The frontier
    broadcasts once per round as a sorted array (``ray.put``), every edge
    block emits its frontier-adjacent endpoints as distinct partials, and a
    node-keyed groupby collapses them — rows never gather on the driver
    beyond the node dimension. Frontier/visited are node-dimension state,
    the same bounded-node contract as ``pagerank``'s default resolve; for
    corpus-cardinality node sets swap in ``pagerank_dataset``'s tagged
    co-partitioned join shape.

    Edge lists at or below ``local_max_edges`` take a LOCAL fast path —
    the identical round logic over driver-held arrays (a tiny graph pays
    more in per-round scheduling than in compute; the same size-gated
    small-side rule as every broadcast join here). Results are identical.

    Returns ``(node, dist)`` for every node reachable within
    ``max_depth`` (the source at dist 0), sorted by (dist, node).
    """
    import ray
    from ray.data.aggregate import Count

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)

    def _members(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if len(sorted_arr) == 0 or len(vals) == 0:
            return np.zeros(len(vals), dtype=bool)
        idx = np.searchsorted(sorted_arr, vals)
        idx[idx >= len(sorted_arr)] = len(sorted_arr) - 1
        return sorted_arr[idx] == vals

    visited = np.array([src], dtype=np.int64)
    frontier = visited
    nodes_out = [visited]
    dist_out = [np.zeros(1, dtype=np.int64)]

    for d in range(1, max_depth + 1):
        f_sorted = np.sort(frontier)
        if local:
            cand_nodes = np.unique(
                np.concatenate([lb[_members(f_sorted, la)], la[_members(f_sorted, lb)]])
            )
        else:
            f_ref = ray.put(f_sorted)

            def nbrs(t: pa.Table, _f=f_ref) -> pa.Table:
                f: np.ndarray = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                cand = np.unique(np.concatenate([b[_members(f, a)], a[_members(f, b)]]))
                return pa.table({"node": pa.array(cand)})

            cand = (
                edges.map_batches(nbrs, batch_format="pyarrow")
                .groupby("node")
                .aggregate(Count(alias_name="_c"))
                .to_pandas()
            )
            if len(cand) == 0:
                break
            cand_nodes = cand["node"].to_numpy().astype(np.int64)
        if len(cand_nodes) == 0:
            break
        new = cand_nodes[~_members(visited, cand_nodes)]
        if len(new) == 0:
            break
        new = np.sort(new)
        nodes_out.append(new)
        dist_out.append(np.full(len(new), d, dtype=np.int64))
        visited = np.sort(np.concatenate([visited, new]))
        frontier = new

    return pd.DataFrame(
        {"node": np.concatenate(nodes_out), "dist": np.concatenate(dist_out)}
    ).sort_values(["dist", "node"]).reset_index(drop=True)


def sssp_bellman_ford(
    edges: Dataset,
    src: int,
    a_col: str = "item_a",
    b_col: str = "item_b",
    w_col: str = "w",
    max_dist: int = 12,
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Single-source shortest paths with positive INTEGER edge weights
    (undirected), by distributed Bellman-Ford frontier relaxation: each
    round broadcasts only the nodes IMPROVED last round (sorted array +
    their tentative distances), one edge scan emits per-block min-reduced
    relaxation candidates, and a node-keyed groupby-min collapses them.
    Positive weights bound the rounds at ``max_dist`` (a path of total
    weight <= max_dist has <= max_dist edges); nodes whose true distance
    exceeds ``max_dist`` are excluded — the same truncation contract as the
    recursive-CTE oracle. Node-dimension driver state (bounded-node
    contract, see ``bfs_levels``); edge lists at or below
    ``local_max_edges`` run the identical rounds over driver-held arrays
    (see ``bfs_levels``). Returns ``(node, dist)`` sorted by (dist, node)."""
    import polars as pl
    import ray
    from ray.data.aggregate import Min

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)
        lw = _df[w_col].to_numpy().astype(np.int64)

    def _relax_arrays(fn, fd, a, b, w):
        outs = []
        for u, v in ((a, b), (b, a)):
            idx = np.searchsorted(fn, u)
            idx[idx >= len(fn)] = len(fn) - 1
            m = fn[idx] == u
            outs.append((v[m], fd[idx[m]] + w[m]))
        return (
            np.concatenate([o[0] for o in outs]),
            np.concatenate([o[1] for o in outs]),
        )

    dist_nodes = np.array([src], dtype=np.int64)
    dist_vals = np.array([0], dtype=np.int64)
    frontier_nodes, frontier_vals = dist_nodes, dist_vals

    for _ in range(max_dist):
        order = np.argsort(frontier_nodes)
        fn_s, fd_s = frontier_nodes[order], frontier_vals[order]
        if local:
            node, dv = _relax_arrays(fn_s, fd_s, la, lb, lw)
            if len(node) == 0:
                break
            so = np.argsort(node)
            node, dv = node[so], dv[so]
            starts = np.flatnonzero(
                np.concatenate([[True], node[1:] != node[:-1]])
            )
            cn = node[starts]
            cd = np.minimum.reduceat(dv, starts)
        else:
            f_ref = ray.put((fn_s, fd_s))

            def relax(t: pa.Table, _f=f_ref) -> pa.Table:
                fn, fd = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
                node, d = _relax_arrays(fn, fd, a, b, w)
                return (
                    pl.DataFrame({"node": node, "d": d})
                    .group_by("node")
                    .agg(pl.col("d").min())
                    .to_arrow()
                )

            cand = (
                edges.map_batches(relax, batch_format="pyarrow")
                .groupby("node")
                .aggregate(Min("d", alias_name="d"))
                .to_pandas()
            )
            if len(cand) == 0:
                break
            cn = cand["node"].to_numpy().astype(np.int64)
            cd = cand["d"].to_numpy().astype(np.int64)
        keep = cd <= max_dist
        cn, cd = cn[keep], cd[keep]
        # merge: improved = candidate strictly better than current (or new)
        idx = np.searchsorted(dist_nodes, cn)
        idx_c = np.clip(idx, 0, len(dist_nodes) - 1)
        known = dist_nodes[idx_c] == cn
        better = ~known | (cd < np.where(known, dist_vals[idx_c], 0))
        if not better.any():
            break
        imp_n, imp_d = cn[better], cd[better]
        upd = known & better
        dist_vals[idx_c[upd]] = cd[upd]
        new_mask = better & ~known
        dist_nodes = np.concatenate([dist_nodes, cn[new_mask]])
        dist_vals = np.concatenate([dist_vals, cd[new_mask]])
        order = np.argsort(dist_nodes)
        dist_nodes, dist_vals = dist_nodes[order], dist_vals[order]
        frontier_nodes, frontier_vals = imp_n, imp_d

    return (
        pd.DataFrame({"node": dist_nodes, "dist": dist_vals})
        .sort_values(["dist", "node"])
        .reset_index(drop=True)
    )


def multi_source_bfs(
    edges: Dataset,
    sources: list[int],
    a_col: str = "item_a",
    b_col: str = "item_b",
    max_depth: int = 6,
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """BFS levels from up to 63 sources SIMULTANEOUSLY: each node's visited
    set is one int64 bitmask, so every round is still ONE distributed edge
    scan (per-block bitwise-OR partials by node, one node-keyed groupby-OR)
    no matter how many sources — the shape that makes exact closeness /
    harmonic centrality over a source sample affordable. Node-dimension
    driver state (bounded-node contract, see ``bfs_levels``); edge lists
    at or below ``local_max_edges`` run the identical rounds over
    driver-held arrays (see ``bfs_levels``).

    Returns long-form ``(source, node, dist)`` — one row per source that
    reaches ``node`` within ``max_depth`` (dist 0 rows included), sorted.
    """
    import ray

    if not 0 < len(sources) <= 63:
        raise ValueError("multi_source_bfs supports 1..63 sources")
    src_arr = np.array(sorted(set(int(s) for s in sources)), dtype=np.int64)
    n_src = len(src_arr)

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)

    def _or_reduce(nodes: np.ndarray, masks: np.ndarray):
        order = np.argsort(nodes)
        nn, mm = nodes[order], masks[order]
        starts = np.flatnonzero(np.concatenate([[True], nn[1:] != nn[:-1]]))
        return nn[starts], np.bitwise_or.reduceat(mm, starts)

    # visited/frontier state: sorted node array + bitmask array
    v_nodes = src_arr.copy()
    v_mask = (np.int64(1) << np.arange(n_src, dtype=np.int64)).astype(np.int64)
    v_nodes, v_mask = _or_reduce(v_nodes, v_mask)  # collapse duplicate sources
    f_nodes, f_mask = v_nodes.copy(), v_mask.copy()

    out_src = [src_arr.copy()]
    out_node = [src_arr.copy()]
    out_dist = [np.zeros(n_src, dtype=np.int64)]

    def _spread_arrays(fn, fm, a, b):
        tgt, msk = [], []
        for u, v in ((a, b), (b, a)):
            idx = np.searchsorted(fn, u)
            idx[idx >= len(fn)] = len(fn) - 1
            m = fn[idx] == u
            tgt.append(v[m])
            msk.append(fm[idx[m]])
        return np.concatenate(tgt), np.concatenate(msk)

    for d in range(1, max_depth + 1):
        if local:
            nodes, masks = _spread_arrays(f_nodes, f_mask, la, lb)
            if len(nodes) == 0:
                break
            an, am = _or_reduce(nodes, masks)
        else:
            ref = ray.put((f_nodes, f_mask))

            def spread(t: pa.Table, _f=ref) -> pa.Table:
                fn, fm = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                nodes, masks = _spread_arrays(fn, fm, a, b)
                if len(nodes) == 0:
                    return pa.table(
                        {"node": pa.array([], pa.int64()), "m": pa.array([], pa.int64())}
                    )
                nn, mm = _or_reduce(nodes, masks)
                return pa.table({"node": pa.array(nn), "m": pa.array(mm)})

            def or_group(t: pa.Table) -> pa.Table:
                nn, mm = _or_reduce(
                    t.column("node").to_numpy(zero_copy_only=False),
                    t.column("m").to_numpy(zero_copy_only=False),
                )
                return pa.table({"node": pa.array(nn), "m": pa.array(mm)})

            arrived = (
                edges.map_batches(spread, batch_format="pyarrow")
                .groupby("node")
                .map_groups(or_group, batch_format="pyarrow")
                .to_pandas()
            )
            if len(arrived) == 0:
                break
            an = arrived["node"].to_numpy().astype(np.int64)
            am = arrived["m"].to_numpy().astype(np.int64)
        idx = np.searchsorted(v_nodes, an)
        idx_c = np.clip(idx, 0, len(v_nodes) - 1)
        known = (len(v_nodes) > 0) & (v_nodes[idx_c] == an)
        prev = np.where(known, v_mask[idx_c], 0)
        new_bits = am & ~prev
        has_new = new_bits != 0
        if not has_new.any():
            break
        nn, nb = an[has_new], new_bits[has_new]
        for bit in range(n_src):
            hit = (nb >> bit) & 1 == 1
            if hit.any():
                out_src.append(np.full(int(hit.sum()), src_arr[bit], dtype=np.int64))
                out_node.append(nn[hit])
                out_dist.append(np.full(int(hit.sum()), d, dtype=np.int64))
        # update visited: merge masks
        v_mask[idx_c[known & has_new]] |= new_bits[known & has_new]
        fresh = has_new & ~known
        v_nodes = np.concatenate([v_nodes, an[fresh]])
        v_mask = np.concatenate([v_mask, am[fresh]])
        order = np.argsort(v_nodes)
        v_nodes, v_mask = v_nodes[order], v_mask[order]
        f_nodes, f_mask = nn, nb

    return (
        pd.DataFrame(
            {
                "source": np.concatenate(out_src),
                "node": np.concatenate(out_node),
                "dist": np.concatenate(out_dist),
            }
        )
        .sort_values(["source", "dist", "node"])
        .reset_index(drop=True)
    )


def kcore_peel(
    edges: Dataset,
    k: int,
    a_col: str = "item_a",
    b_col: str = "item_b",
    rounds: int = 8,
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Bounded-round k-core peel over an undirected distinct edge list:
    every round keeps the nodes whose degree WITHIN the surviving subgraph
    is >= k, for exactly ``rounds`` rounds (or until the set stabilizes —
    whichever comes first). With enough rounds this is the true k-core
    fixpoint (each round strictly shrinks the set or stops); the fixed
    round budget is the determinism contract shared with the unrolled SQL
    oracle. One distributed edge scan per round (alive set broadcast as a
    sorted array, per-block degree partials, node-keyed sum); edge lists
    at or below ``local_max_edges`` run the identical rounds over
    driver-held arrays (see ``bfs_levels``). Returns
    ``(node, deg)`` — the surviving nodes and their within-subgraph
    degrees, sorted by node."""
    import polars as pl
    import ray
    from ray.data.aggregate import Sum as _Sum

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)

    def _members(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if len(sorted_arr) == 0 or len(vals) == 0:
            return np.zeros(len(vals), dtype=bool)
        idx = np.searchsorted(sorted_arr, vals)
        idx[idx >= len(sorted_arr)] = len(sorted_arr) - 1
        return sorted_arr[idx] == vals

    alive: np.ndarray | None = None  # None = all nodes alive (round 0)
    deg = pd.DataFrame({"node": np.array([], dtype=np.int64), "deg": np.array([], dtype=np.int64)})

    for _ in range(rounds):
        if local:
            if alive is not None:
                m = _members(alive, la) & _members(alive, lb)
                aa, bb = la[m], lb[m]
            else:
                aa, bb = la, lb
            nodes, cnts = np.unique(np.concatenate([aa, bb]), return_counts=True)
            deg = pd.DataFrame({"node": nodes, "deg": cnts.astype(np.int64)})
        else:
            ref = ray.put(alive)

            def degrees(t: pa.Table, _a=ref) -> pa.Table:
                al = ray.get(_a)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                if al is not None:
                    m = _members(al, a) & _members(al, b)
                    a, b = a[m], b[m]
                return (
                    pl.DataFrame({"node": np.concatenate([a, b])})
                    .group_by("node")
                    .len(name="pd")
                    .with_columns(pl.col("pd").cast(pl.Int64))
                    .to_arrow()
                )

            deg = (
                edges.map_batches(degrees, batch_format="pyarrow")
                .groupby("node")
                .aggregate(_Sum("pd", alias_name="deg"))
                .to_pandas()
            )
        keep = deg[deg["deg"] >= k]
        new_alive = np.sort(keep["node"].to_numpy().astype(np.int64))
        if alive is not None and len(new_alive) == len(alive):
            # degree filtering can only shrink the set: equal size = fixpoint
            alive = new_alive
            break
        alive = new_alive
        if len(alive) == 0:
            break

    if alive is None or len(alive) == 0:
        return pd.DataFrame(
            {"node": np.array([], dtype=np.int64), "deg": np.array([], dtype=np.int64)}
        )
    out = deg[deg["node"].isin(alive)].copy()
    out["deg"] = out["deg"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def ktruss_peel(
    edges: Dataset,
    k: int,
    a_col: str = "item_a",
    b_col: str = "item_b",
    rounds: int = 8,
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Bounded-round k-truss peel over an undirected distinct edge list:
    every round keeps the edges that participate in >= k-2 triangles WITHIN
    the surviving subgraph, for ``rounds`` rounds or until stable — the
    edge-level analogue of ``kcore_peel`` (Cohen 2008). Node ids must be
    non-negative and < 2^32 (edges pack into one uint64 key).

    Each round is one triangle pass crediting the three EDGES of every
    closed wedge (the degree-ordered forward algorithm of
    ``triangle_count``): oriented wedges probe the packed edge set and emit
    per-edge support partials; an edge-keyed sum + filter keeps
    support >= k-2. Edge lists at or below ``local_max_edges`` run the
    identical rounds over driver-held arrays (the same small-side gate as
    ``bfs_levels``); above it, wedges stay in their hash(src) partitions
    and the support table stays a Dataset until the (bounded) survivor set
    is resolved. Returns the surviving ``(x, y, support)`` rows (x < y by
    node id), sorted — support measured within the PREVIOUS round's
    subgraph, the same convention as ``kcore_peel``'s degrees.
    """
    import polars as pl
    import ray
    from ray.data.aggregate import Sum as _Sum

    _u64 = np.uint64

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame(
            {"x": np.array([], dtype=np.int64), "y": np.array([], dtype=np.int64),
             "support": np.array([], dtype=np.int64)}
        )
    local = n_edges <= local_max_edges

    def _norm(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"x": pa.array(x), "y": pa.array(y)})

    # NOTE: both paths hold the PACKED edge keys on the driver per round
    # (8 B/edge — the triangle_count broadcast-closure contract); on the
    # distributed path the wedge rows never leave their partitions.
    cur = edges.map_batches(_norm, batch_format="pyarrow").to_pandas()
    x = cur["x"].to_numpy().astype(np.int64)
    y = cur["y"].to_numpy().astype(np.int64)
    if (x < 0).any() or (y >= 2**32).any():
        raise ValueError("ktruss_peel needs node ids in [0, 2^32)")

    def _support_local(xe: np.ndarray, ye: np.ndarray) -> np.ndarray:
        """Per-edge triangle support via the forward algorithm, locally."""
        m = len(xe)
        if m == 0:
            return np.zeros(0, dtype=np.int64)
        nodes, deg = np.unique(np.concatenate([xe, ye]), return_counts=True)
        pos_x = np.searchsorted(nodes, xe)
        pos_y = np.searchsorted(nodes, ye)
        dx, dy = deg[pos_x], deg[pos_y]
        a_first = (dx < dy) | ((dx == dy) & (xe < ye))
        src = np.where(a_first, xe, ye)
        dst = np.where(a_first, ye, xe)
        ddst = np.where(a_first, dy, dx)
        # wedges: rank-ordered out-neighbor pairs per src (triangular gen)
        order = np.lexsort((dst, ddst, src))
        s, d = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        sizes = np.diff(np.append(starts, len(s)))
        pc = sizes * (sizes - 1) // 2
        tot = int(pc.sum())
        packed = np.sort((xe.astype(_u64) << _u64(32)) | ye.astype(_u64))
        sup = np.zeros(m, dtype=np.int64)
        if tot == 0:
            return sup
        grp = np.repeat(np.arange(len(sizes)), pc)
        p = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(pc)[:-1]]), pc
        )
        ng = sizes[grp]
        tmp = (2 * ng - 1).astype(np.float64)
        i = ((tmp - np.sqrt(tmp * tmp - 8.0 * p)) // 2).astype(np.int64)
        i = np.clip(i, 0, ng - 2)
        for _ in range(3):
            base = i * (2 * ng - i - 1) // 2
            over = base > p
            under = (i + 1) * (2 * ng - i - 2) // 2 <= p
            if not (over.any() or under.any()):
                break
            i = i - over.astype(np.int64) + under.astype(np.int64)
        j = p - i * (2 * ng - i - 1) // 2 + i + 1
        off = starts[grp]
        u, v, w = s[off], d[off + i], d[off + j]
        vv, ww = np.minimum(v, w), np.maximum(v, w)
        key = (vv.astype(_u64) << _u64(32)) | ww.astype(_u64)
        idx = np.searchsorted(packed, key)
        idx[idx >= len(packed)] = len(packed) - 1
        closed = packed[idx] == key
        if not closed.any():
            return sup
        # credit the three edges of each closed triangle
        eu, ev, ew = u[closed], vv[closed], ww[closed]
        ekeys = np.concatenate(
            [
                (np.minimum(eu, ev).astype(_u64) << _u64(32)) | np.maximum(eu, ev).astype(_u64),
                (np.minimum(eu, ew).astype(_u64) << _u64(32)) | np.maximum(eu, ew).astype(_u64),
                key[closed],
            ]
        )
        uk, cnt = np.unique(ekeys, return_counts=True)
        my = (xe.astype(_u64) << _u64(32)) | ye.astype(_u64)
        pos = np.searchsorted(uk, my)
        pos_c = np.clip(pos, 0, len(uk) - 1)
        hit = (len(uk) > 0) & (uk[pos_c] == my)
        sup[hit] = cnt[pos_c[hit]]
        return sup

    def _support_distributed(xe: np.ndarray, ye: np.ndarray) -> np.ndarray:
        """Same support, with the wedge pass distributed: the current edge
        set ships once as a packed sorted array; every partition generates
        its wedges and emits per-edge-key count partials."""
        import ray.data as rd

        from perfect_bloomfilter_ray.functions.hashing import hash64
        from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

        nodes, deg = np.unique(np.concatenate([xe, ye]), return_counts=True)
        pos_x = np.searchsorted(nodes, xe)
        pos_y = np.searchsorted(nodes, ye)
        dx, dy = deg[pos_x], deg[pos_y]
        a_first = (dx < dy) | ((dx == dy) & (xe < ye))
        src = np.where(a_first, xe, ye)
        dst = np.where(a_first, ye, xe)
        ddst = np.where(a_first, dy, dx)
        packed = np.sort((xe.astype(_u64) << _u64(32)) | ye.astype(_u64))
        pref = ray.put(packed)
        oriented = rd.from_arrow(
            pa.table({"src": pa.array(src), "dst": pa.array(dst), "ddst": pa.array(ddst)})
        )
        nb = choose_num_blocks(oriented)

        def route(t: pa.Table) -> pa.Table:
            h = hash64(pl.from_arrow(t)["src"], 0x7B2)
            return t.append_column("_part", pa.array((h % _u64(nb)).astype(np.int32)))

        def credit(t: pa.Table) -> pa.Table:
            es: np.ndarray = ray.get(pref)
            df = pl.from_arrow(t.drop_columns(["_part"]))
            s = df["src"].to_numpy()
            d = df["dst"].to_numpy()
            dd = df["ddst"].to_numpy()
            order = np.lexsort((d, dd, s))
            s, d = s[order], d[order]
            starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
            sizes = np.diff(np.append(starts, len(s)))
            pc2 = sizes * (sizes - 1) // 2
            tot = int(pc2.sum())
            if tot == 0:
                return pa.table({"ek": pa.array([], pa.uint64()), "pt": pa.array([], pa.int64())})
            grp = np.repeat(np.arange(len(sizes)), pc2)
            p = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(pc2)[:-1]]), pc2
            )
            ng = sizes[grp]
            tmp = (2 * ng - 1).astype(np.float64)
            i = ((tmp - np.sqrt(tmp * tmp - 8.0 * p)) // 2).astype(np.int64)
            i = np.clip(i, 0, ng - 2)
            for _ in range(3):
                base = i * (2 * ng - i - 1) // 2
                over = base > p
                under = (i + 1) * (2 * ng - i - 2) // 2 <= p
                if not (over.any() or under.any()):
                    break
                i = i - over.astype(np.int64) + under.astype(np.int64)
            j = p - i * (2 * ng - i - 1) // 2 + i + 1
            off = starts[grp]
            u, v, w = s[off], d[off + i], d[off + j]
            vv, ww = np.minimum(v, w), np.maximum(v, w)
            key = (vv.astype(_u64) << _u64(32)) | ww.astype(_u64)
            idx = np.searchsorted(es, key)
            idx[idx >= len(es)] = len(es) - 1
            closed = es[idx] == key
            if not closed.any():
                return pa.table({"ek": pa.array([], pa.uint64()), "pt": pa.array([], pa.int64())})
            eu, ev, ew = u[closed], vv[closed], ww[closed]
            ekeys = np.concatenate(
                [
                    (np.minimum(eu, ev).astype(_u64) << _u64(32)) | np.maximum(eu, ev).astype(_u64),
                    (np.minimum(eu, ew).astype(_u64) << _u64(32)) | np.maximum(eu, ew).astype(_u64),
                    key[closed],
                ]
            )
            uk, cnt = np.unique(ekeys, return_counts=True)
            return pa.table({"ek": pa.array(uk), "pt": pa.array(cnt.astype(np.int64))})

        sup_tbl = (
            oriented.map_batches(route, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(credit, batch_format="pyarrow")
            .groupby("ek")
            .aggregate(_Sum("pt", alias_name="sup"))
            .to_pandas()
        )
        sup = np.zeros(len(xe), dtype=np.int64)
        if len(sup_tbl):
            uk = sup_tbl["ek"].to_numpy().astype(_u64)
            cnt = sup_tbl["sup"].to_numpy().astype(np.int64)
            order = np.argsort(uk)
            uk, cnt = uk[order], cnt[order]
            my = (xe.astype(_u64) << _u64(32)) | ye.astype(_u64)
            pos = np.clip(np.searchsorted(uk, my), 0, len(uk) - 1)
            hit = uk[pos] == my
            sup[hit] = cnt[pos[hit]]
        return sup

    support = np.zeros(len(x), dtype=np.int64)
    for _ in range(rounds):
        support = _support_local(x, y) if local else _support_distributed(x, y)
        keep = support >= (k - 2)
        if keep.all():
            break
        x, y, support = x[keep], y[keep], support[keep]
        if len(x) == 0:
            break

    out = pd.DataFrame({"x": x, "y": y, "support": support})
    return out.sort_values(["x", "y"]).reset_index(drop=True)


def hits(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
) -> pd.DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) after ``iters`` mutual-
    recursion rounds, SUM-normalized (each vector divides by its sum —
    no sqrt, so an unrolled SQL oracle states the identical IEEE ops):
    a'(v) = Σ_{u→v} h(u), normalize; then h'(u) = Σ_{u→v} a(v), normalize.
    Same scale shape as ``pagerank``'s broadcast resolve: the edge list
    streams through one pre-aggregated ``map_batches`` + groupby per
    half-step while the node-cardinality vectors broadcast (bounded-node
    contract). Returns ``(node, hub, authority)`` sorted by node."""
    import polars as pl
    import ray

    def dedup(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t.select([src_col, dst_col])).unique().to_arrow()

    e = edges.map_batches(dedup, batch_format="pyarrow").materialize()

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
        return pd.DataFrame({"node": [], "hub": [], "authority": []})
    order = np.argsort(nodes)
    nodes = nodes[order]
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)

    def _push(vec: np.ndarray, key_col: str, out_col: str) -> np.ndarray:
        """One half-step: out(x) = Σ over edges keyed by key_col of
        vec[other end]; returns the new node-aligned vector (unnormalized)."""
        from ray.data.aggregate import Sum as _Sum

        lut = ray.put((nodes, vec))
        src_is_key = key_col == src_col
        val_col = dst_col if src_is_key else src_col

        def contrib(t: pa.Table) -> pa.Table:
            ks, vs = ray.get(lut)
            v = t.column(val_col).to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, v), 0, len(ks) - 1)
            w = np.where(ks[pos] == v, vs[pos], 0.0)
            return (
                pl.from_arrow(t.select([key_col]))
                .with_columns(pl.Series("w", w))
                .group_by(key_col)
                .agg(pl.col("w").sum().alias("pw"))
                .to_arrow()
            )

        sums = (
            e.map_batches(contrib, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(_Sum("pw", alias_name="w"))
            .to_pandas()
        )
        out = np.zeros(n)
        if len(sums):
            kk = sums[key_col].to_numpy()
            ww = sums["w"].to_numpy()
            pos = np.clip(np.searchsorted(nodes, kk), 0, n - 1)
            hit = nodes[pos] == kk
            out[pos[hit]] = ww[hit]
        return out

    for _ in range(iters):
        auth = _push(hub, dst_col, "authority")  # a'(v) = sum_{u->v} h(u)
        s = auth.sum()
        if s > 0:
            auth = auth / s
        hub = _push(auth, src_col, "hub")  # h'(u) = sum_{u->v} a(v)
        s = hub.sum()
        if s > 0:
            hub = hub / s

    return pd.DataFrame({"node": nodes, "hub": hub, "authority": auth})


def label_propagation(
    edges: Dataset,
    iters: int = 4,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
    num_blocks: int | None = None,
) -> pd.DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over an undirected distinct edge list: label_0(v) = v; every round each
    node adopts the most frequent label among its neighbors, ties broken by
    the smallest label. Runs EXACTLY ``iters`` rounds — synchronous LPA can
    oscillate on bipartite-ish structure, so the fixed round budget (not a
    convergence heuristic) is the determinism contract the unrolled SQL
    oracle states verbatim.

    Scale shape: two co-partitioning exchanges per round, never a
    node-keyed fine groupby and never a driver-held label vector on the
    distributed path — (1) a tagged union co-locates each node's current
    label with the edges leaving it (hash(src) partitions; per-partition
    searchsorted LUT emits pre-aggregated (dst, label) partial counts),
    (2) a hash(dst) exchange sums partials and takes the per-node argmax
    vectorized inside each coarse partition (sort + keep-first, the
    repo-standard skew-safe argmax). Edge lists at or below
    ``local_max_edges`` run the IDENTICAL rounds on driver arrays (the
    round-dominated-op gate shared with ``kcore_peel``/``bfs_levels``).
    Returns ``(node, label)`` sorted by node."""
    import polars as pl
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame(
            {"node": np.array([], dtype=np.int64), "label": np.array([], dtype=np.int64)}
        )
    local = n_edges <= local_max_edges

    def _argmax_block(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.sort(["node", "c", "label"], descending=[False, True, False])
            .unique(subset=["node"], keep="first", maintain_order=True)
            .select(["node", "label"])
        )

    if local:
        _df = edges.to_pandas()
        a = _df[a_col].to_numpy().astype(np.int64)
        b = _df[b_col].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        nodes = np.unique(src)
        lab = nodes.copy()
        for _ in range(iters):
            contrib = (
                pl.DataFrame({"node": dst, "label": lab[np.searchsorted(nodes, src)]})
                .group_by(["node", "label"])
                .len(name="c")
            )
            upd = _argmax_block(contrib)
            # every node has >=1 neighbor, so upd covers all of `nodes`
            lab = upd.sort("node")["label"].to_numpy().astype(np.int64)
        return pd.DataFrame({"node": nodes, "label": lab})

    nb = choose_num_blocks(edges, num_blocks)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        part = (hash64(src, 0x19A7) % np.uint64(nb)).astype(np.int32)
        lab = np.zeros(len(src), dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "label": pa.array(lab),
                "_side": pa.array(np.zeros(len(src), dtype=np.int8)),
                "_part": pa.array(part),
            }
        )

    ed = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def seed_labels(t: pa.Table) -> pa.Table:
        # side-1 label state seeded from the edge endpoints themselves
        src = t.column("src").to_numpy(zero_copy_only=False)
        u = np.unique(src)
        part = (hash64(u, 0x19A7) % np.uint64(nb)).astype(np.int32)
        return pa.table(
            {
                "src": pa.array(u),
                "dst": pa.array(np.zeros(len(u), dtype=np.int64)),
                "label": pa.array(u.copy()),
                "_side": pa.array(np.ones(len(u), dtype=np.int8)),
                "_part": pa.array(part),
            }
        )

    # distinct nodes as the initial label state (node, label=node)
    lab_ds = (
        ed.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda t: pl.from_arrow(t).unique(subset=["src"]).to_arrow(),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def resolve(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        st = df.filter(pl.col("_side") == 1).sort("src")
        eg = df.filter(pl.col("_side") == 0)
        keys = st["src"].to_numpy()
        vals = st["label"].to_numpy()
        s = eg["src"].to_numpy()
        d = eg["dst"].to_numpy()
        l = vals[np.searchsorted(keys, s)]
        out = (
            pl.DataFrame({"dst": d, "label": l})
            .group_by(["dst", "label"])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .select(["dst", "label", "c"])
        )
        d2 = out["dst"].to_numpy()
        p2 = (hash64(d2, 0x19A8) % np.uint64(nb)).astype(np.int32)
        return out.with_columns(pl.Series("_p2", p2)).to_arrow()

    def argmax_part(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .group_by(["dst", "label"])
            .agg(pl.col("c").sum())
            .rename({"dst": "node"})
        )
        upd = _argmax_block(df)
        u = upd["node"].to_numpy()
        part = (hash64(u, 0x19A7) % np.uint64(nb)).astype(np.int32)
        n = len(u)
        return pa.table(
            {
                "src": pa.array(u),
                "dst": pa.array(np.zeros(n, dtype=np.int64)),
                "label": pa.array(upd["label"].to_numpy().astype(np.int64)),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
                "_part": pa.array(part),
            }
        )

    for _ in range(iters):
        lab_ds = (
            ed.union(lab_ds)
            .groupby("_part")
            .map_groups(resolve, batch_format="pyarrow")
            .groupby("_p2")
            .map_groups(argmax_part, batch_format="pyarrow")
            .materialize()
        )

    out = lab_ds.to_pandas()
    return (
        pd.DataFrame({"node": out["src"].astype("int64"), "label": out["label"].astype("int64")})
        .sort_values("node")
        .reset_index(drop=True)
    )


def simrank(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    c: float = 0.8,
    iters: int = 3,
    max_nodes: int = 10_000,
) -> pd.DataFrame:
    """All-pairs SimRank (Jeh & Widom 2002) over a directed edge list:
    s(a,b) = c/(|I(a)|·|I(b)|) · Σ_{u∈I(a), v∈I(b)} s(u,v), s(a,a)=1 —
    "two nodes are similar if their in-neighbors are similar", the
    structural-similarity companion to PageRank's importance.

    Node-pair similarity is inherently node²-state, so this operator is
    LABEL-cardinality altitude by contract (event types, categories, hosts
    — never document/user ids; ``max_nodes`` enforces it). The big side —
    reducing the corpus to the distinct edge list — happens upstream /
    per-batch; the k iterations are dense (nodes²) matrix products on the
    driver, matching the unrolled SQL-join recurrence term-for-term.

    Returns pandas (node_a, node_b, sim) for node_a < node_b (diagonal is
    identically 1). Nodes with no in-neighbors have similarity 0 to every
    other node, SQL NULL→0 semantics.
    """
    import polars as pl

    def _uniq(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).unique().to_arrow()

    dist = (
        edges.select_columns([src_col, dst_col])
        .map_batches(_uniq, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    nodes = np.unique(np.concatenate([dist[src_col].to_numpy(), dist[dst_col].to_numpy()]))
    n = len(nodes)
    if n > max_nodes:
        raise ValueError(f"simrank is label-cardinality only: {n} nodes > {max_nodes}")
    si = np.searchsorted(nodes, dist[src_col].to_numpy())
    di = np.searchsorted(nodes, dist[dst_col].to_numpy())
    A = np.zeros((n, n), dtype=np.float64)
    A[si, di] = 1.0
    din = A.sum(axis=0)
    denom = np.outer(din, din)
    S = np.eye(n)
    for _ in range(iters):
        W = A.T @ S @ A
        with np.errstate(invalid="ignore", divide="ignore"):
            S = np.where(denom > 0, (c / denom) * W, 0.0)
        np.fill_diagonal(S, 1.0)
    ia, ib = np.triu_indices(n, k=1)
    return pd.DataFrame(
        {"node_a": nodes[ia], "node_b": nodes[ib], "sim": S[ia, ib]}
    )


def degree_assortativity(
    edges: Dataset,
    x_col: str = "x",
    y_col: str = "y",
    max_nodes: int = 5_000_000,
) -> dict:
    """Degree-assortativity coefficient of an undirected edge list (Newman
    2002): the Pearson correlation of (deg(u), deg(v)) over all ORIENTED
    edge incidences — positive means hubs link to hubs. Degrees are exact
    integer counts (one distributed endpoint groupby, per-batch partials);
    a second edge scan accumulates int64 moment partials with the degree
    LUT broadcast (node-cardinality side, gated by ``max_nodes`` — the
    co-partitioned join shape of pagerank_dataset is the web-scale escape
    hatch). By x/y symmetry only (n, Σdx, Σdx², Σdx·dy) are needed and r
    is ONE fixed float expression over exact Python ints, mirrored with
    HUGEINT casts in SQL.

    Returns ``{n, sx, sxx, sxy, assortativity}``.
    """
    import polars as pl
    import ray

    def deg_partial(t: pa.Table) -> pa.Table:
        df = pl.concat(
            [
                pl.from_arrow(t.select([x_col])).rename({x_col: "node"}),
                pl.from_arrow(t.select([y_col])).rename({y_col: "node"}),
            ]
        )
        return df.group_by("node").agg(pl.len().cast(pl.Int64).alias("pd")).to_arrow()

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("pd", alias_name="d"))
        .to_pandas()
    )
    if len(deg) > max_nodes:
        raise ValueError(
            f"degree_assortativity broadcast gate: {len(deg)} nodes > {max_nodes}"
        )
    nodes = deg["node"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    ref = ray.put((nodes[order], deg["d"].to_numpy().astype(np.int64)[order]))

    def moments(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "pn": pa.array([], pa.int64()),
                    "psx": pa.array([], pa.int64()),
                    "psxx": pa.array([], pa.int64()),
                    "psxy": pa.array([], pa.int64()),
                }
            )
        lut_nodes, lut_deg = ray.get(ref)
        xs = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ys = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        dx = lut_deg[np.searchsorted(lut_nodes, xs)]
        dy = lut_deg[np.searchsorted(lut_nodes, ys)]
        # both orientations: Σ over (dx,dy) and (dy,dx)
        n = 2 * len(xs)
        sx = int(dx.sum() + dy.sum())
        sxx = int((dx * dx).sum() + (dy * dy).sum())
        sxy = int(2 * (dx * dy).sum())
        return pa.table(
            {
                "pn": pa.array([n], pa.int64()),
                "psx": pa.array([sx], pa.int64()),
                "psxx": pa.array([sxx], pa.int64()),
                "psxy": pa.array([sxy], pa.int64()),
            }
        )

    s = edges.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, sx = int(s["pn"]), int(s["psx"])
    sxx, sxy = int(s["psxx"]), int(s["psxy"])
    den = n * sxx - sx * sx
    r = float(n * sxy - sx * sx) / float(den) if den != 0 else float("nan")
    return {"n": n, "sx": sx, "sxx": sxx, "sxy": sxy, "assortativity": r}


def link_prediction_scores(
    edges: Dataset,
    a_col: str = "item_a",
    b_col: str = "item_b",
    k: int = 25,
    num_blocks: int | None = None,
    max_nodes: int = 5_000_000,
    max_neighbors_per_apex: int | None = None,
) -> pd.DataFrame:
    """Common-neighbor link prediction over a distinct undirected edge list
    (Liben-Nowell & Kleinberg 2003): for every 2-hop pair (a, b) NOT already
    connected, score the missing link by

    - ``cn``          = |N(a) ∩ N(b)| (exact integer),
    - ``jaccard``     = cn / (deg(a) + deg(b) - cn) (one IEEE division of
      exact ints),
    - ``pref_attach`` = deg(a) · deg(b) (exact integer),

    and return the top ``k`` by (cn DESC, node_a, node_b).

    Scale shape: candidate pairs come from apex-partitioned wedge
    generation — the adjacency (both directions) hash-partitions by apex,
    each partition emits its neighbor pairs by direct triangular indexing
    (no self-join blowup), and per-partition polars partials feed ONE
    global (a, b) groupby. Existing edges are removed in the SAME groupby:
    edge rows union in carrying an ``is_edge`` marker, so the anti-filter
    costs zero extra shuffles and no broadcast of the edge set. Only the
    degree LUT broadcasts (node-cardinality, gated by ``max_nodes`` — the
    co-partitioned join shape of ``pagerank_dataset`` is the web-scale
    escape hatch), and the top-k resolve is per-block partial top-k with a
    k·num_blocks driver finish.

    Hub skew: wedge volume is Σ deg(z)², so one web-scale hub can dominate
    a partition. ``max_neighbors_per_apex`` (None = unlimited) caps each
    apex's neighbor list DETERMINISTICALLY (the lowest-id neighbors — the
    dedup hot-bucket-cap convention): counts through capped hubs become
    documented lower bounds, and the blowup is bounded by apex·cap².
    """
    import polars as pl
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    nb = choose_num_blocks(edges, num_blocks)
    edges = edges.materialize()  # consumed by degree, adjacency, and marker passes

    def endpoints(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([a_col, b_col]))
        return (
            pl.concat(
                [df.select(pl.col(a_col).alias("node")), df.select(pl.col(b_col).alias("node"))]
            )
            .group_by("node")
            .len(name="pd")
            .with_columns(pl.col("pd").cast(pl.Int64))
            .to_arrow()
        )

    deg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("pd", alias_name="deg"))
        .to_pandas()
    )
    if len(deg) == 0:
        return pd.DataFrame(
            {
                "node_a": np.array([], dtype="int64"),
                "node_b": np.array([], dtype="int64"),
                "cn": np.array([], dtype="int64"),
                "deg_a": np.array([], dtype="int64"),
                "deg_b": np.array([], dtype="int64"),
                "pref_attach": np.array([], dtype="int64"),
                "jaccard": np.array([], dtype="float64"),
            }
        )
    if len(deg) > max_nodes:
        raise ValueError(
            f"link_prediction_scores degree-LUT gate: {len(deg)} nodes > {max_nodes}"
        )

    def adjacency(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([a_col, b_col]))
        adj = pl.concat(
            [
                df.select(pl.col(a_col).alias("z"), pl.col(b_col).alias("n")),
                df.select(pl.col(b_col).alias("z"), pl.col(a_col).alias("n")),
            ]
        )
        h = hash64(adj["z"], 0x2B7)
        return adj.with_columns(
            pl.Series("_part", (h % np.uint64(nb)).astype(np.int32))
        ).to_arrow()

    def wedge_partials(t: pa.Table) -> pa.Table:
        """Per-apex neighbor pairs by direct triangular indexing, partial-
        counted inside the partition before the global (a, b) groupby."""
        z = t.column("z").to_numpy(zero_copy_only=False)
        d = t.column("n").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "pa_": pa.array([], pa.int64()),
                "pb_": pa.array([], pa.int64()),
                "pcn": pa.array([], pa.int64()),
                "pedge": pa.array([], pa.int64()),
            }
        )
        if len(z) == 0:
            return empty
        order = np.lexsort((d, z))
        z, d = z[order], d[order]
        if max_neighbors_per_apex is not None:
            # deterministic hub cap: keep each apex's lowest-id neighbors
            # (list already sorted by (z, d)); rank-within-apex via cumcount
            firsts = np.concatenate([[True], z[1:] != z[:-1]])
            idx = np.arange(len(z))
            rank = idx - np.maximum.accumulate(np.where(firsts, idx, 0))
            keep = rank < max_neighbors_per_apex
            z, d = z[keep], d[keep]
        starts = np.flatnonzero(np.concatenate([[True], z[1:] != z[:-1]]))
        sizes = np.diff(np.append(starts, len(z)))
        pcnt = sizes * (sizes - 1) // 2
        tot = int(pcnt.sum())
        if tot == 0:
            return empty
        grp = np.repeat(np.arange(len(sizes)), pcnt)
        p = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(pcnt)[:-1]]), pcnt
        )
        ng = sizes[grp]
        tmp = (2 * ng - 1).astype(np.float64)
        i = ((tmp - np.sqrt(tmp * tmp - 8.0 * p)) // 2).astype(np.int64)
        i = np.clip(i, 0, ng - 2)
        for _ in range(3):  # float sqrt can land one row off at boundaries
            base = i * (2 * ng - i - 1) // 2
            over = base > p
            under = (i + 1) * (2 * ng - i - 2) // 2 <= p
            if not (over.any() or under.any()):
                break
            i = i - over.astype(np.int64) + under.astype(np.int64)
        base = i * (2 * ng - i - 1) // 2
        j = p - base + i + 1
        off = starts[grp]
        pairs = pl.DataFrame({"pa_": d[off + i], "pb_": d[off + j]})
        out = (
            pairs.group_by(["pa_", "pb_"])
            .len(name="pcn")
            .with_columns(
                pl.col("pcn").cast(pl.Int64),
                pl.lit(0, dtype=pl.Int64).alias("pedge"),
            )
        )
        h = hash64(out["pa_"], 0x3C9) ^ hash64(out["pb_"], 0x5E3)
        return out.with_columns(
            pl.Series("_p2", (h % np.uint64(nb)).astype(np.int32))
        ).to_arrow()

    def edge_markers(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([a_col, b_col]))
        out = df.select(
            pl.col(a_col).alias("pa_"),
            pl.col(b_col).alias("pb_"),
            pl.lit(0, dtype=pl.Int64).alias("pcn"),
            pl.lit(1, dtype=pl.Int64).alias("pedge"),
        )
        h = hash64(out["pa_"], 0x3C9) ^ hash64(out["pb_"], 0x5E3)
        return out.with_columns(
            pl.Series("_p2", (h % np.uint64(nb)).astype(np.int32))
        ).to_arrow()

    def reduce_topk(t: pa.Table) -> pa.Table:
        """All partials for a pair land in ONE coarse partition: sum the
        counts, drop existing edges, take the partition-local top-k — one
        shuffle instead of a fine-key aggregate plus a second pass."""
        df = (
            pl.from_arrow(t.drop_columns(["_p2"]))
            .group_by(["pa_", "pb_"])
            .agg(pl.col("pcn").sum().alias("cn"), pl.col("pedge").sum().alias("is_edge"))
            .filter((pl.col("is_edge") == 0) & (pl.col("cn") > 0))
        )
        if len(df) == 0:
            return pa.table(
                {
                    "node_a": pa.array([], pa.int64()),
                    "node_b": pa.array([], pa.int64()),
                    "cn": pa.array([], pa.int64()),
                }
            )
        cn = df["cn"].to_numpy().astype(np.int64)
        a = df["pa_"].to_numpy().astype(np.int64)
        b = df["pb_"].to_numpy().astype(np.int64)
        sel = np.lexsort((b, a, -cn))[:k]
        return pa.table(
            {"node_a": pa.array(a[sel]), "node_b": pa.array(b[sel]), "cn": pa.array(cn[sel])}
        )

    cand = (
        edges.map_batches(adjacency, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(wedge_partials, batch_format="pyarrow")
        .union(edges.map_batches(edge_markers, batch_format="pyarrow"))
        .groupby("_p2")
        .map_groups(reduce_topk, batch_format="pyarrow")
        .to_pandas()
    )

    nodes = deg["node"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    deg_ref = ray.put((nodes[order], deg["deg"].to_numpy().astype(np.int64)[order]))
    if len(cand) == 0:
        return pd.DataFrame(
            {
                "node_a": np.array([], dtype="int64"),
                "node_b": np.array([], dtype="int64"),
                "cn": np.array([], dtype="int64"),
                "deg_a": np.array([], dtype="int64"),
                "deg_b": np.array([], dtype="int64"),
                "pref_attach": np.array([], dtype="int64"),
                "jaccard": np.array([], dtype="float64"),
            }
        )
    cand = (
        cand.sort_values(["cn", "node_a", "node_b"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )
    lut_nodes, lut_deg = ray.get(deg_ref)
    da = lut_deg[np.searchsorted(lut_nodes, cand["node_a"].to_numpy())]
    db = lut_deg[np.searchsorted(lut_nodes, cand["node_b"].to_numpy())]
    cn = cand["cn"].to_numpy()
    cand["deg_a"] = da
    cand["deg_b"] = db
    cand["pref_attach"] = da * db
    cand["jaccard"] = cn.astype(np.float64) / (da + db - cn).astype(np.float64)
    return cand[["node_a", "node_b", "cn", "deg_a", "deg_b", "pref_attach", "jaccard"]]


def stress_centrality(
    edges: Dataset,
    sources: "list[int]",
    a_col: str = "item_a",
    b_col: str = "item_b",
    max_depth: int = 3,
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """K-bounded stress centrality (Shimbel 1953; the exact-INTEGER cousin of
    betweenness) from a source sample: for every node v,

        stress(v) = sum over s in sources, targets t with
                    d(s,t) = d(s,v) + d(v,t) <= max_depth, v != s, t
                    of sigma_st(v)   (the NUMBER of shortest s-t paths via v)

    By the Brandes decomposition sigma_st(v) = sigma_sv * sigma_vt, so two
    passes suffice, both in pure int64 (no float summation order anywhere,
    unlike betweenness's sigma ratios):

      1. forward BFS with path counting: per round, every frontier node u
         at depth d-1 sends sigma(u) along its edges; arrivals NOT yet
         visited get dist d and sigma(v) = sum of incoming sigma — one
         edge scan + one (node, source)-keyed sum per round for ALL
         sources together;
      2. backward DAG accumulation: P(v) = sum over DAG-successors w
         (dist(w) = dist(v)+1) of (1 + P(w)) = number of shortest-path
         continuations from v to any deeper target; stress contribution is
         sigma(v) * P(v).

    Frontier/visited/level state is (node x sources)-dimension driver state
    (the bounded-node contract of ``bfs_levels``/``pagerank``); edge lists
    at or below ``local_max_edges`` run identical rounds over driver arrays.
    ``max_depth`` defaults to 3: path counts grow with the graph's branching
    factor ^ depth, and depth 3 keeps sigma * P products far inside int64 on
    dense co-occurrence graphs (asserted at runtime).

    Returns ``(node, stress)`` for nodes with stress > 0, sorted by
    (-stress, node).
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    src_arr = np.array(sorted(set(int(s) for s in sources)), dtype=np.int64)
    n_src = len(src_arr)
    if not 0 < n_src <= 64:
        raise ValueError("stress_centrality supports 1..64 sources")

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)

    def _expand(f_nodes, f_src, f_val, u, v):
        """Join frontier rows (node,src,val) against edge endpoints u -> v:
        emits (v, src, val) for every (frontier row, incident edge)."""
        order = np.argsort(f_nodes, kind="stable")
        fn, fs, fv = f_nodes[order], f_src[order], f_val[order]
        lo = np.searchsorted(fn, u, side="left")
        hi = np.searchsorted(fn, u, side="right")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return (np.empty(0, np.int64),) * 3
        lo, cnt, vv = lo[keep], cnt[keep], v[keep]
        total = int(cnt.sum())
        idx = np.repeat(lo, cnt) + (np.arange(total) - np.repeat(cnt.cumsum() - cnt, cnt))
        return np.repeat(vv, cnt), fs[idx], fv[idx]

    def _spread_local(f_nodes, f_src, f_val):
        outs = [_expand(f_nodes, f_src, f_val, la, lb), _expand(f_nodes, f_src, f_val, lb, la)]
        return tuple(np.concatenate(parts) for parts in zip(*outs))

    def _spread_dist(f_nodes, f_src, f_val):
        ref = ray.put((f_nodes, f_src, f_val))

        def spread(t: pa.Table, _f=ref) -> pa.Table:
            fn, fs, fv = ray.get(_f)
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            outs = [_expand(fn, fs, fv, a, b), _expand(fn, fs, fv, b, a)]
            node, s, val = (np.concatenate(parts) for parts in zip(*outs))
            # per-block partial: pre-sum by (node, src) before the shuffle
            pk = node * np.int64(64) + s
            uk, inv = np.unique(pk, return_inverse=True)
            sums = np.bincount(inv, weights=val.astype(np.float64)).astype(np.int64)
            return pa.table({"k": pa.array(uk), "v": pa.array(sums)})

        out = (
            edges.map_batches(spread, batch_format="pyarrow")
            .groupby("k")
            .aggregate(_Sum("v", alias_name="v"))
            .to_pandas()
        )
        k = out["k"].to_numpy().astype(np.int64)
        v = out["v"].to_numpy().astype(np.int64)
        return k // 64, k % 64, v

    def _agg(node, s, val):
        pk = node * np.int64(64) + s
        uk, inv = np.unique(pk, return_inverse=True)
        sums = np.bincount(inv, weights=val.astype(np.float64))
        assert sums.max(initial=0) < 2**53, "path counts exceed exact-integer range"
        return uk // 64, uk % 64, sums.astype(np.int64)

    # ---- forward: per-(node, src) dist + sigma ---------------------------
    lv_node = [src_arr.copy()]
    lv_src = [np.arange(n_src, dtype=np.int64)]
    lv_dist = [np.zeros(n_src, dtype=np.int64)]
    lv_sig = [np.ones(n_src, dtype=np.int64)]
    visited_pk = np.sort(src_arr * np.int64(64) + np.arange(n_src, dtype=np.int64))
    f_nodes, f_src, f_sig = lv_node[0], lv_src[0], lv_sig[0]

    for d in range(1, max_depth + 1):
        if local:
            node, s, val = _spread_local(f_nodes, f_src, f_sig)
            if len(node) == 0:
                break
            node, s, val = _agg(node, s, val)
        else:
            node, s, val = _spread_dist(f_nodes, f_src, f_sig)
            if len(node) == 0:
                break
        pk = node * np.int64(64) + s
        idx = np.searchsorted(visited_pk, pk)
        idx[idx >= len(visited_pk)] = max(len(visited_pk) - 1, 0)
        fresh = visited_pk[idx] != pk if len(visited_pk) else np.ones(len(pk), bool)
        if not fresh.any():
            break
        node, s, val = node[fresh], s[fresh], val[fresh]
        lv_node.append(node)
        lv_src.append(s)
        lv_dist.append(np.full(len(node), d, dtype=np.int64))
        lv_sig.append(val)
        visited_pk = np.sort(np.concatenate([visited_pk, node * np.int64(64) + s]))
        f_nodes, f_src, f_sig = node, s, val

    depth_reached = len(lv_node) - 1

    # ---- backward: P(v) = sum over DAG successors (1 + P(w)) -------------
    p_by_level: list[np.ndarray] = [np.zeros(len(lv_node[i]), np.int64) for i in range(depth_reached + 1)]
    for d in range(depth_reached - 1, 0, -1):
        wn, ws = lv_node[d + 1], lv_src[d + 1]
        wval = 1 + p_by_level[d + 1]
        if local:
            node, s, val = _spread_local(wn, ws, wval)
        else:
            node, s, val = _spread_dist(wn, ws, wval)
        if len(node) == 0:
            continue
        node, s, val = _agg(node, s, val)
        # keep only arrivals that are level-d nodes for that source
        tgt_pk = lv_node[d] * np.int64(64) + lv_src[d]
        order = np.argsort(tgt_pk)
        tgt_sorted = tgt_pk[order]
        pk = node * np.int64(64) + s
        idx = np.searchsorted(tgt_sorted, pk)
        idx[idx >= len(tgt_sorted)] = max(len(tgt_sorted) - 1, 0)
        m = tgt_sorted[idx] == pk
        p = np.zeros(len(tgt_pk), np.int64)
        p[order[idx[m]]] = val[m]
        p_by_level[d] = p

    # ---- combine: stress(v) = sum_s sigma * P --------------------------
    nodes = np.concatenate(lv_node[1:depth_reached + 1]) if depth_reached else np.empty(0, np.int64)
    contrib = (
        np.concatenate([lv_sig[i] * p_by_level[i] for i in range(1, depth_reached + 1)])
        if depth_reached
        else np.empty(0, np.int64)
    )
    assert (contrib >= 0).all()
    if len(nodes) == 0:
        return pd.DataFrame({"node": np.empty(0, np.int64), "stress": np.empty(0, np.int64)})
    un, inv = np.unique(nodes, return_inverse=True)
    stress = np.bincount(inv, weights=contrib.astype(np.float64)).astype(np.int64)
    keep = stress > 0
    out = pd.DataFrame({"node": un[keep], "stress": stress[keep]})
    return out.sort_values(["stress", "node"], ascending=[False, True]).reset_index(drop=True)


def luby_mis(
    edges: Dataset,
    rounds: int = 6,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Fixed-round Luby maximal-independent-set (Luby 1986) with
    DETERMINISTIC priorities: pri(v) = (v * 2654435761) mod 2^32 (Knuth's
    multiplicative hash — reproducible in ANSI SQL, unlike a seeded
    process-local hash), ties broken by node id. Per round, every ACTIVE
    node with a strictly smaller (pri, id) than all its active neighbors
    joins the MIS; winners and their neighbors deactivate. With fixed
    priorities the fixpoint is the unique greedy-by-priority MIS; a bounded
    ``rounds`` keeps the computation exactly mirrorable by an unrolled SQL
    oracle — nodes still active after the last round are reported as
    undecided (round = -1).

    Per round: ONE edge scan emitting (node, min active-neighbor priority)
    partials + one node-keyed min-groupby. Active/priority state is
    node-dimension driver state (the ``bfs_levels`` bounded-node contract);
    edge lists <= ``local_max_edges`` run identical rounds on driver arrays.

    Returns ``(node, round)``: MIS members with the 1-based round they were
    decided in, then undecided nodes with round -1; sorted by (round, node).
    """
    import ray
    from ray.data.aggregate import Min as _Min

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)
    else:
        la = lb = None

    def pri_of(v: np.ndarray) -> np.ndarray:
        return (v.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(4294967296)

    if local:
        all_nodes = np.unique(np.concatenate([la, lb]))
    else:
        from ray.data.aggregate import Count as _Count

        def ends(t: pa.Table) -> pa.Table:
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

        all_nodes = np.sort(
            edges.map_batches(ends, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Count(alias_name="_c"))
            .to_pandas()["node"]
            .to_numpy()
            .astype(np.int64)
        )

    # packed comparable priority key: (pri << 21 | rank) fits int64 for
    # node ranks < 2^21; fall back to lexicographic pairs beyond that
    pri = pri_of(all_nodes)
    rank = np.arange(len(all_nodes), dtype=np.uint64)
    if len(all_nodes) >= (1 << 21):
        raise ValueError("luby_mis node set exceeds the packed-key budget")
    key = ((pri << np.uint64(21)) | rank).astype(np.int64)

    active = np.ones(len(all_nodes), dtype=bool)
    decided = np.full(len(all_nodes), -1, dtype=np.int64)

    def _min_nbr_local(act_key: np.ndarray) -> np.ndarray:
        """act_key: per-node packed key, +inf-sentinel where inactive."""
        ia = np.searchsorted(all_nodes, la)
        ib = np.searchsorted(all_nodes, lb)
        both = active[ia] & active[ib]
        u = np.concatenate([ia[both], ib[both]])
        w = np.concatenate([act_key[ib[both]], act_key[ia[both]]])
        out = np.full(len(all_nodes), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(out, u, w)
        return out

    for r in range(1, rounds + 1):
        if not active.any():
            break
        act_key = key.copy()
        if local:
            min_nbr = _min_nbr_local(act_key)
        else:
            ref = ray.put((all_nodes, active, key))

            def nbr_min(t: pa.Table, _f=ref) -> pa.Table:
                nodes, act, k = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ia = np.searchsorted(nodes, a)
                ib = np.searchsorted(nodes, b)
                both = act[ia] & act[ib]
                u = np.concatenate([a[both], b[both]])
                w = np.concatenate([k[ib[both]], k[ia[both]]])
                if len(u) == 0:
                    return pa.table({"node": pa.array([], pa.int64()), "m": pa.array([], pa.int64())})
                un, inv = np.unique(u, return_inverse=True)
                mins = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mins, inv, w)
                return pa.table({"node": pa.array(un), "m": pa.array(mins)})

            got = (
                edges.map_batches(nbr_min, batch_format="pyarrow")
                .groupby("node")
                .aggregate(_Min("m", alias_name="m"))
                .to_pandas()
            )
            min_nbr = np.full(len(all_nodes), np.iinfo(np.int64).max, dtype=np.int64)
            if len(got):
                idx = np.searchsorted(all_nodes, got["node"].to_numpy().astype(np.int64))
                min_nbr[idx] = got["m"].to_numpy().astype(np.int64)

        winners = active & (key < min_nbr)
        if not winners.any():
            break
        decided[winners] = r
        # deactivate winners and their neighbors
        if local:
            ia = np.searchsorted(all_nodes, la)
            ib = np.searchsorted(all_nodes, lb)
            nbr_of_win = np.zeros(len(all_nodes), dtype=bool)
            wa = winners[ia]
            wb = winners[ib]
            nbr_of_win[ib[wa]] = True
            nbr_of_win[ia[wb]] = True
        else:
            wref = ray.put((all_nodes, winners))

            def win_nbrs(t: pa.Table, _f=wref) -> pa.Table:
                nodes, win = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ia = np.searchsorted(nodes, a)
                ib = np.searchsorted(nodes, b)
                out = np.unique(np.concatenate([b[win[ia]], a[win[ib]]]))
                return pa.table({"node": pa.array(out)})

            got = (
                edges.map_batches(win_nbrs, batch_format="pyarrow")
                .groupby("node")
                .aggregate(_Count(alias_name="_c"))
                .to_pandas()
            )
            nbr_of_win = np.zeros(len(all_nodes), dtype=bool)
            if len(got):
                nbr_of_win[np.searchsorted(all_nodes, got["node"].to_numpy().astype(np.int64))] = True
        active &= ~(winners | nbr_of_win)

    out = pd.DataFrame({"node": all_nodes, "round": decided})
    out.loc[active, "round"] = -1  # still-active nodes are undecided
    out = out[(out["round"] > 0) | active]
    return out.sort_values(["round", "node"]).reset_index(drop=True)


def densest_subgraph_peel(
    edges: Dataset,
    rounds: int = 8,
    eps_num: int = 3,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Parallel densest-subgraph peel (Bahmani, Kumar & Vassilvitskii
    VLDB'12, the canonical MapReduce algorithm; 2(1+eps)-approximation):
    each round computes the surviving subgraph's (V, E, degrees) and peels
    every node with deg * V <= eps_num * E (eps_num = 2(1+eps); 3 = eps 0.5
    — EXACT integer comparison, no float threshold), guaranteeing
    O(log V) rounds. The answer is the densest ROUND: density E/V is one
    exact int->double division per round and the argmax tie-breaks to the
    earliest round.

    One distributed edge scan per round (alive set broadcast sorted,
    per-block degree partials, node-keyed sum — the ``kcore_peel`` shape);
    edge lists at or below ``local_max_edges`` run identical rounds on
    driver arrays. Returns one row PER ROUND while the subgraph is
    non-empty: (round, n_nodes, n_edges, density, id_sum, id_min, id_max,
    is_best) — the id columns are the surviving-node checksum the oracle
    verifies in place of materializing members.
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)

    def _members(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if len(sorted_arr) == 0 or len(vals) == 0:
            return np.zeros(len(vals), dtype=bool)
        idx = np.searchsorted(sorted_arr, vals)
        idx[idx >= len(sorted_arr)] = len(sorted_arr) - 1
        return sorted_arr[idx] == vals

    def _round_stats(alive):
        """(nodes, degs, n_edges) of the subgraph induced by ``alive``."""
        if local:
            if alive is not None:
                m = _members(alive, la) & _members(alive, lb)
                aa, bb = la[m], lb[m]
            else:
                aa, bb = la, lb
            nodes, cnts = np.unique(np.concatenate([aa, bb]), return_counts=True)
            return nodes, cnts.astype(np.int64), int(len(aa))
        ref = ray.put(alive)

        def degrees(t: pa.Table, _a=ref) -> pa.Table:
            al = ray.get(_a)
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if al is not None:
                m = _members(al, a) & _members(al, b)
                a, b = a[m], b[m]
            nodes, cnts = np.unique(np.concatenate([a, b]), return_counts=True)
            out = pa.table(
                {
                    "node": pa.array(np.concatenate([nodes, [-1]])),
                    "d": pa.array(np.concatenate([cnts.astype(np.int64), [len(a)]])),
                }
            )
            return out

        got = (
            edges.map_batches(degrees, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Sum("d", alias_name="d"))
            .to_pandas()
        )
        e_row = got[got["node"] == -1]
        n_edges = int(e_row["d"].iloc[0]) if len(e_row) else 0
        got = got[got["node"] != -1]
        return (
            got["node"].to_numpy().astype(np.int64),
            got["d"].to_numpy().astype(np.int64),
            n_edges,
        )

    alive = None
    rows = []
    for r in range(rounds + 1):
        nodes, degs, n_edges = _round_stats(alive)
        if len(nodes) == 0:
            break
        v = int(len(nodes))
        rows.append(
            {
                "round": r,
                "n_nodes": v,
                "n_edges": n_edges,
                "density": float(n_edges) / v,
                "id_sum": int(nodes.sum()),
                "id_min": int(nodes.min()),
                "id_max": int(nodes.max()),
            }
        )
        if r == rounds:
            break
        keep = degs * np.int64(v) > np.int64(eps_num) * np.int64(n_edges)
        alive = np.sort(nodes[keep])
        if len(alive) == len(nodes):
            break  # stable: no node peels, later rounds are identical

    out = pd.DataFrame(rows)
    if len(out):
        best = out["density"].max()
        out["is_best"] = (out["density"] == best) & (
            out[out["density"] == best]["round"].min() == out["round"]
        )
    return out


def greedy_maximal_matching(
    edges: Dataset,
    rounds: int = 8,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Distributed greedy maximal matching by LOCALLY-LIGHTEST edges
    (the deterministic Israeli-Itai / Preis scheme, the symmetric dual of
    ``luby_mis``): give every edge the unique priority tuple
    ``(pri, u, v)`` with pri(e) = (u*2654435761 + v*40503) mod 2^20
    (Knuth multiplicative — ANSI-SQL-reproducible); per round every ACTIVE
    edge (both endpoints unmatched) that is the strict minimum among
    active edges at BOTH its endpoints joins the matching, and its
    endpoints leave the graph. With fixed priorities the fixpoint is the
    unique greedy-by-priority maximal matching; a bounded ``rounds`` keeps
    every round exactly mirrorable by an unrolled SQL oracle (leftover
    active edges are reported with round = -1). The matched-endpoint set
    is the classic 2-approximate minimum VERTEX COVER (Gavril): it covers
    every edge once the matching is maximal, and any cover needs one
    endpoint per matched edge.

    Scale shape: matched flags are node-dimension driver state (the
    ``luby_mis``/``bfs_levels`` bounded-node contract); each round is ONE
    distributed edge scan emitting per-batch (node, min active-edge key)
    partials + a node-keyed min-groupby, then one winner-marking edge scan
    against the broadcast per-node minima (winners <= V/2 rows). Edge
    lists at or below ``local_max_edges`` run identical rounds on driver
    arrays. Edge keys pack (pri << 42 | rank_u << 21 | rank_v) into one
    int64 — node ranks share the 2^21 budget with luby_mis, and rank order
    equals id order so the packed comparison matches the oracle's
    (pri, u, v) tuple comparison.

    Returns ``(node_u, node_v, round)``: matched edges with the 1-based
    round they were decided in, then still-active edges with round -1;
    sorted by (round, node_u, node_v).
    """
    import ray
    from ray.data.aggregate import Min as _Min

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)
        all_nodes = np.unique(np.concatenate([la, lb]))
    else:
        la = lb = None
        from ray.data.aggregate import Count as _Count

        def ends(t: pa.Table) -> pa.Table:
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

        all_nodes = np.sort(
            edges.map_batches(ends, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Count(alias_name="_c"))
            .to_pandas()["node"]
            .to_numpy()
            .astype(np.int64)
        )
    if len(all_nodes) >= (1 << 21):
        raise ValueError("greedy_maximal_matching node set exceeds the packed-key budget")

    def edge_keys(a: np.ndarray, b: np.ndarray, nodes: np.ndarray) -> tuple:
        """(packed int64 key, rank_a, rank_b) for canonical a<b edges."""
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        pri = (
            a.astype(np.uint64) * np.uint64(2654435761)
            + b.astype(np.uint64) * np.uint64(40503)
        ) % np.uint64(1 << 20)
        key = ((pri << np.uint64(42)) | (ia.astype(np.uint64) << np.uint64(21)) | ib.astype(np.uint64)).astype(np.int64)
        return key, ia, ib

    matched = np.zeros(len(all_nodes), dtype=bool)
    sent = np.iinfo(np.int64).max
    rows: list[pd.DataFrame] = []
    if local:
        key, ia, ib = edge_keys(la, lb, all_nodes)
        decided_round = np.zeros(len(la), dtype=np.int64)
        for r in range(1, rounds + 1):
            act = ~matched[ia] & ~matched[ib]
            if not act.any():
                break
            node_min = np.full(len(all_nodes), sent, dtype=np.int64)
            np.minimum.at(node_min, ia[act], key[act])
            np.minimum.at(node_min, ib[act], key[act])
            win = act & (key == node_min[ia]) & (key == node_min[ib])
            if not win.any():
                break
            matched[ia[win]] = True
            matched[ib[win]] = True
            decided_round[win] = r
        act = ~matched[ia] & ~matched[ib]
        keep = (decided_round > 0) | act
        out = pd.DataFrame(
            {
                "node_u": la[keep],
                "node_v": lb[keep],
                "round": np.where(act[keep], np.int64(-1), decided_round[keep]),
            }
        )
    else:
        undecided: pd.DataFrame | None = None
        parts: list[pd.DataFrame] = []
        for r in range(1, rounds + 1):
            ref = ray.put((all_nodes, matched))

            def nbr_min(t: pa.Table, _f=ref) -> pa.Table:
                nodes, m = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                k, ja, jb = edge_keys(a, b, nodes)
                act_ = ~m[ja] & ~m[jb]
                if not act_.any():
                    return pa.table({"node": pa.array([], pa.int64()), "m": pa.array([], pa.int64())})
                u = np.concatenate([a[act_], b[act_]])
                w = np.concatenate([k[act_], k[act_]])
                un, inv = np.unique(u, return_inverse=True)
                mins = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mins, inv, w)
                return pa.table({"node": pa.array(un), "m": pa.array(mins)})

            got = (
                edges.map_batches(nbr_min, batch_format="pyarrow")
                .groupby("node")
                .aggregate(_Min("m", alias_name="m"))
                .to_pandas()
            )
            if not len(got):
                break
            node_min = np.full(len(all_nodes), sent, dtype=np.int64)
            idx = np.searchsorted(all_nodes, got["node"].to_numpy().astype(np.int64))
            node_min[idx] = got["m"].to_numpy().astype(np.int64)
            wref = ray.put((all_nodes, matched, node_min))

            def winners(t: pa.Table, _f=wref) -> pa.Table:
                nodes, m, nm = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                k, ja, jb = edge_keys(a, b, nodes)
                win_ = ~m[ja] & ~m[jb] & (k == nm[ja]) & (k == nm[jb])
                return pa.table({"node_u": pa.array(a[win_]), "node_v": pa.array(b[win_])})

            wdf = edges.map_batches(winners, batch_format="pyarrow").to_pandas()
            if not len(wdf):
                break
            matched[np.searchsorted(all_nodes, wdf["node_u"].to_numpy().astype(np.int64))] = True
            matched[np.searchsorted(all_nodes, wdf["node_v"].to_numpy().astype(np.int64))] = True
            wdf["round"] = np.int64(r)
            parts.append(wdf)
        mref = ray.put((all_nodes, matched))

        def leftovers(t: pa.Table, _f=mref) -> pa.Table:
            nodes, m = ray.get(_f)
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            act_ = ~m[np.searchsorted(nodes, a)] & ~m[np.searchsorted(nodes, b)]
            return pa.table({"node_u": pa.array(a[act_]), "node_v": pa.array(b[act_])})

        undecided = edges.map_batches(leftovers, batch_format="pyarrow").to_pandas()
        if len(undecided):
            undecided["round"] = np.int64(-1)
            parts.append(undecided)
        out = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"node_u": np.empty(0, np.int64), "node_v": np.empty(0, np.int64), "round": np.empty(0, np.int64)})
        )
    out["round"] = out["round"].astype(np.int64)
    return out.sort_values(["round", "node_u", "node_v"]).reset_index(drop=True)


def jones_plassmann_coloring(
    edges: Dataset,
    rounds: int = 10,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
    max_colors: int = 62,
) -> pd.DataFrame:
    """Distributed greedy graph coloring by Jones-Plassmann rounds (Jones
    & Plassmann 1993) with DETERMINISTIC priorities: pri(v) =
    (v * 2654435761) mod 2^32, ties by node id — the same ANSI-SQL-
    reproducible total order as ``luby_mis``. Per round every UNCOLORED
    node whose (pri, id) is strictly smallest among its uncolored
    neighbors takes the SMALLEST color not used by its already-colored
    neighbors; same-round winners are an independent set (two adjacent
    local minima are impossible), so parallel assignment is race-free and
    the fixpoint is the unique sequential greedy-by-priority coloring.
    Bounded ``rounds`` keeps every round mirrorable by an unrolled SQL
    oracle (still-uncolored nodes report color = round = -1).

    The used-color set rides in ONE int64 bitmask per node (colors are
    bounded by max degree + 1; raises beyond ``max_colors`` — re-bucket
    the graph rather than widening the mask); smallest-missing-color is
    the trailing-ones count, computed branch-free as
    ``bit_count(mask XOR (mask+1)) - 1`` on both engines.

    Per round: one edge scan + node-keyed min-groupby for the local-min
    test, then one winner-adjacent scan emitting DISTINCT (node, color)
    pairs OR-folded on the driver. Colors/priorities are node-dimension
    driver state (the ``bfs_levels`` bounded-node contract); edge lists
    at or below ``local_max_edges`` run identical rounds on driver
    arrays.

    Returns ``(node, color, round)`` for every node, colored ones with
    their 1-based decision round, sorted by node.
    """
    import ray
    from ray.data.aggregate import Count as _Count, Min as _Min

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)
        all_nodes = np.unique(np.concatenate([la, lb]))
    else:
        la = lb = None

        def ends(t: pa.Table) -> pa.Table:
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

        all_nodes = np.sort(
            edges.map_batches(ends, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Count(alias_name="_c"))
            .to_pandas()["node"]
            .to_numpy()
            .astype(np.int64)
        )

    if len(all_nodes) >= (1 << 21):
        raise ValueError("jones_plassmann_coloring node set exceeds the packed-key budget")
    pri = (all_nodes.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(4294967296)
    key = ((pri << np.uint64(21)) | np.arange(len(all_nodes), dtype=np.uint64)).astype(
        np.int64
    )
    sent = np.iinfo(np.int64).max
    color = np.full(len(all_nodes), -1, dtype=np.int64)
    dec_round = np.full(len(all_nodes), -1, dtype=np.int64)

    def smallest_missing(mask: np.ndarray) -> np.ndarray:
        m = mask.astype(np.uint64)
        t = (m ^ (m + np.uint64(1))) + np.uint64(1)  # 2^(trailing_ones+1), a power of two
        c = np.rint(np.log2(t.astype(np.float64))).astype(np.int64) - 1
        if (c >= max_colors).any():
            raise ValueError("color bitmask budget exceeded; re-bucket the graph")
        return c

    if local:
        ia = np.searchsorted(all_nodes, la)
        ib = np.searchsorted(all_nodes, lb)
        for r in range(1, rounds + 1):
            unc = color < 0
            if not unc.any():
                break
            both = unc[ia] & unc[ib]
            node_min = np.full(len(all_nodes), sent, dtype=np.int64)
            np.minimum.at(node_min, ia[both], key[ib[both]])
            np.minimum.at(node_min, ib[both], key[ia[both]])
            win = unc & (key < node_min)
            if not win.any():
                break
            mask = np.zeros(len(all_nodes), dtype=np.int64)
            s1 = win[ia] & (color[ib] >= 0)
            np.bitwise_or.at(mask, ia[s1], np.int64(1) << color[ib[s1]])
            s2 = win[ib] & (color[ia] >= 0)
            np.bitwise_or.at(mask, ib[s2], np.int64(1) << color[ia[s2]])
            color[win] = smallest_missing(mask[win])
            dec_round[win] = r
    else:
        for r in range(1, rounds + 1):
            unc = color < 0
            if not unc.any():
                break
            ref = ray.put((all_nodes, unc, key))

            def nbr_min(t: pa.Table, _f=ref) -> pa.Table:
                nodes, u_, k = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ja = np.searchsorted(nodes, a)
                jb = np.searchsorted(nodes, b)
                both = u_[ja] & u_[jb]
                if not both.any():
                    return pa.table(
                        {"node": pa.array([], pa.int64()), "m": pa.array([], pa.int64())}
                    )
                u = np.concatenate([a[both], b[both]])
                w = np.concatenate([k[jb[both]], k[ja[both]]])
                un, inv = np.unique(u, return_inverse=True)
                mins = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mins, inv, w)
                return pa.table({"node": pa.array(un), "m": pa.array(mins)})

            got = (
                edges.map_batches(nbr_min, batch_format="pyarrow")
                .groupby("node")
                .aggregate(_Min("m", alias_name="m"))
                .to_pandas()
            )
            node_min = np.full(len(all_nodes), sent, dtype=np.int64)
            if len(got):
                idx = np.searchsorted(all_nodes, got["node"].to_numpy().astype(np.int64))
                node_min[idx] = got["m"].to_numpy().astype(np.int64)
            win = unc & (key < node_min)
            if not win.any():
                break
            wref = ray.put((all_nodes, win, color))

            def used_colors(t: pa.Table, _f=wref) -> pa.Table:
                nodes, w_, col = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ja = np.searchsorted(nodes, a)
                jb = np.searchsorted(nodes, b)
                s1 = w_[ja] & (col[jb] >= 0)
                s2 = w_[jb] & (col[ja] >= 0)
                node = np.concatenate([a[s1], b[s2]])
                c = np.concatenate([col[jb[s1]], col[ja[s2]]])
                pairs = np.unique(np.stack([node, c], axis=1), axis=0)
                return pa.table(
                    {"node": pa.array(pairs[:, 0]), "c": pa.array(pairs[:, 1])}
                )

            up = (
                edges.map_batches(used_colors, batch_format="pyarrow")
                .groupby(["node", "c"])
                .aggregate(_Count(alias_name="_n"))
                .to_pandas()
            )
            mask = np.zeros(len(all_nodes), dtype=np.int64)
            if len(up):
                idx = np.searchsorted(all_nodes, up["node"].to_numpy().astype(np.int64))
                np.bitwise_or.at(
                    mask, idx, np.int64(1) << up["c"].to_numpy().astype(np.int64)
                )
            color[win] = smallest_missing(mask[win])
            dec_round[win] = r

    return (
        pd.DataFrame({"node": all_nodes, "color": color, "round": dec_round})
        .sort_values("node")
        .reset_index(drop=True)
    )


def wl_refinement(
    edges: Dataset,
    rounds: int = 3,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Weisfeiler-Lehman color refinement (1-WL, the graph-isomorphism /
    role-equivalence workhorse behind WL graph kernels and GNN expressivity
    bounds): every node starts at its degree class and each round rehashes
    its own color together with the MULTISET of neighbor colors. The
    multiset hash is order-independent integer arithmetic both engines
    reproduce exactly —

        c_{r+1}(v) = (c_r(v) * 2654435761 + sum_{o in N(v)} (c_r(o) * 40503
                      + 2246822519)) mod 1048573

    (sum commutes across any shuffle order; all intermediates < 2^52, so
    int64/BIGINT-safe; hash collisions are deterministic and identical on
    both sides — the refinement is the standard hashed-WL approximation).
    Two nodes keeping equal colors across rounds are 1-WL-indistinguishable;
    the per-round distinct-color count is the refinement profile.

    Per round: ONE edge scan emitting per-batch (node, partial contribution
    sum) + a node-keyed sum-groupby. Colors are node-dimension driver state
    (the ``bfs_levels`` bounded-node contract); edge lists at or below
    ``local_max_edges`` run identical rounds on driver arrays.

    Returns ``(node, c0, c1, ..., c<rounds>)`` sorted by node, c0 = degree
    mod 1048573.
    """
    import ray
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    M = np.int64(1048573)
    A = np.int64(2654435761)
    B = np.int64(40503)
    C = np.int64(2246822519)

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)
        all_nodes = np.unique(np.concatenate([la, lb]))
        ia = np.searchsorted(all_nodes, la)
        ib = np.searchsorted(all_nodes, lb)
        deg = np.zeros(len(all_nodes), dtype=np.int64)
        np.add.at(deg, ia, 1)
        np.add.at(deg, ib, 1)
    else:
        la = lb = ia = ib = None

        def degs(t: pa.Table) -> pa.Table:
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            u, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
            return pa.table({"node": pa.array(u), "d": pa.array(cnt.astype(np.int64))})

        got = (
            edges.map_batches(degs, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Sum("d", alias_name="d"))
            .to_pandas()
            .sort_values("node")
        )
        all_nodes = got["node"].to_numpy().astype(np.int64)
        deg = got["d"].to_numpy().astype(np.int64)

    cols = {"node": all_nodes, "c0": deg % M}
    c = deg % M
    for r in range(1, rounds + 1):
        if local:
            s = np.zeros(len(all_nodes), dtype=np.int64)
            np.add.at(s, ia, c[ib] * B + C)
            np.add.at(s, ib, c[ia] * B + C)
        else:
            ref = ray.put((all_nodes, c))

            def contrib(t: pa.Table, _f=ref) -> pa.Table:
                nodes, col = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ja = np.searchsorted(nodes, a)
                jb = np.searchsorted(nodes, b)
                u = np.concatenate([a, b])
                w = np.concatenate([col[jb] * B + C, col[ja] * B + C])
                un, inv = np.unique(u, return_inverse=True)
                sums = np.zeros(len(un), dtype=np.int64)
                np.add.at(sums, inv, w)
                return pa.table({"node": pa.array(un), "s": pa.array(sums)})

            got = (
                edges.map_batches(contrib, batch_format="pyarrow")
                .groupby("node")
                .aggregate(_Sum("s", alias_name="s"))
                .to_pandas()
                .sort_values("node")
            )
            s = got["s"].to_numpy().astype(np.int64)
        c = (c * A + s) % M
        cols[f"c{r}"] = c
    return pd.DataFrame(cols).sort_values("node").reset_index(drop=True)


def neighborhood_function(
    edges: Dataset,
    max_h: int = 3,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
    local_max_nodes: int = 8192,
) -> pd.DataFrame:
    """EXACT neighborhood function N(h) = number of ordered node pairs
    (u, v) with dist(u, v) <= h, for h = 0..max_h — the quantity HyperANF
    (Boldi/Rosa/Vigna WWW'11) approximates with per-node HLL counters; at
    validation scale the engine computes it exactly so the oracle can hash
    it. N(h)/V^2 is the cumulative distance distribution whose 90th
    percentile is the graph's effective diameter.

    Distributed shape: the frontier state is the PAIR-dimension set
    {(src, node)} packed one int64 per pair (ranks share the 2^21 budget
    of the other graph ops) and lives in the cluster as a Dataset — it is
    never collected; each hop extends every pair through a broadcast CSR
    adjacency (edge-dimension, ray.put once) inside ``map_batches``, then
    one pair-keyed groupby deduplicates. Per hop: one scan + one distinct
    shuffle; ``ds.count()`` reads N(h). Small graphs (<= local caps) run
    the identical semantics as driver-side boolean-reachability matmuls.

    Returns ``(h, pairs, n_nodes, ratio)`` with ratio = pairs / V^2.
    """
    import ray
    from ray.data.aggregate import Count as _Count

    edges = edges.materialize()
    ecount = edges.count()

    def ends(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

    all_nodes = np.sort(
        edges.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Count(alias_name="_c"))
        .to_pandas()["node"]
        .to_numpy()
        .astype(np.int64)
    )
    nv = len(all_nodes)
    if nv >= (1 << 21):
        raise ValueError("neighborhood_function node set exceeds the packed-key budget")

    _df = edges.to_pandas() if ecount <= local_max_edges and nv <= local_max_nodes else None
    counts: list[int] = []
    if _df is not None:
        ia = np.searchsorted(all_nodes, _df[a_col].to_numpy().astype(np.int64))
        ib = np.searchsorted(all_nodes, _df[b_col].to_numpy().astype(np.int64))
        adj = np.zeros((nv, nv), dtype=np.float32)
        adj[ia, ib] = 1.0
        adj[ib, ia] = 1.0
        np.fill_diagonal(adj, 1.0)
        reach = np.eye(nv, dtype=np.float32)
        counts.append(nv)
        for _ in range(1, max_h + 1):
            reach = (reach @ adj > 0).astype(np.float32)
            counts.append(int(reach.sum()))
    else:
        import ray.data as rd

        # CSR adjacency over node ranks, broadcast once
        eia: list[np.ndarray] = []
        for blk in edges.to_arrow_refs():
            t = ray.get(blk)
            a = np.searchsorted(all_nodes, t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64))
            b = np.searchsorted(all_nodes, t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64))
            eia.append(np.stack([np.concatenate([a, b]), np.concatenate([b, a])], axis=1))
        inc = np.concatenate(eia)
        order = np.argsort(inc[:, 0], kind="stable")
        srcs, nbr = inc[order, 0], inc[order, 1]
        indptr = np.searchsorted(srcs, np.arange(nv + 1))
        csr_ref = ray.put((indptr, nbr))

        pairs = rd.from_arrow(
            pa.table({"pk": pa.array(((np.arange(nv, dtype=np.int64) << 21) | np.arange(nv)).astype(np.int64))})
        ).materialize()
        counts.append(nv)
        mask = np.int64((1 << 21) - 1)
        for _ in range(1, max_h + 1):

            def extend(t: pa.Table, _c=csr_ref) -> pa.Table:
                iptr, nb_ = ray.get(_c)
                pk = t.column("pk").to_numpy(zero_copy_only=False)
                s = pk >> 21
                d = pk & mask
                reps = (iptr[d + 1] - iptr[d]).astype(np.int64)
                src_rep = np.repeat(s, reps)
                # vectorized CSR gather: nb_[iptr[d[k]] + j] for j < reps[k]
                starts = np.repeat(iptr[d].astype(np.int64), reps)
                offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                    reps.cumsum() - reps, reps
                )
                flat = nb_[starts + offs]
                new = (src_rep << 21) | flat.astype(np.int64)
                out = np.unique(np.concatenate([pk, new]))
                return pa.table({"pk": pa.array(out)})

            pairs = (
                pairs.map_batches(extend, batch_format="pyarrow")
                .groupby("pk")
                .aggregate(_Count(alias_name="_n"))
                .select_columns(["pk"])
                .materialize()
            )
            counts.append(pairs.count())

    out = pd.DataFrame(
        {
            "h": np.arange(max_h + 1, dtype=np.int64),
            "pairs": np.array(counts, dtype=np.int64),
            "n_nodes": np.int64(nv),
        }
    )
    out["ratio"] = out["pairs"].to_numpy().astype(np.float64) / (float(nv) * nv)
    return out


def boruvka_msf(
    edges: Dataset,
    rounds: int = 12,
    contract_steps: int = 8,
    a_col: str = "item_a",
    b_col: str = "item_b",
    local_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """Distributed minimum spanning forest by Boruvka rounds (Boruvka 1926
    — the canonical parallel MST / single-linkage-clustering algorithm)
    with DETERMINISTIC unique edge weights: key(e) = (pri << 42 | ru << 21
    | rv), pri = (u*2654435761 + v*40503) mod 2^20, ranks in id order —
    the same ANSI-SQL-reproducible packing as ``greedy_maximal_matching``.
    Per round every label group adopts its minimum-key OUTGOING edge, then
    labels contract by exactly ``contract_steps`` min-over-forest-neighbor
    folds (NOT to fixpoint — bounded steps keep each round mirrorable by
    an unrolled SQL oracle). Stale labels are safe: a label group S is
    always a vertex subset, so its min outgoing edge is the minimum of the
    cut (S, V \\ S) and belongs to the unique MSF by the cut property —
    re-chosen edges are deduplicated by first round, and the accumulated
    set is ALWAYS a sub-forest of the true MSF; rounds=12 x steps=8
    completes graphs with contraction chains up to these bounds (larger
    inputs report the identical partial forest on both sides).

    Per round: ONE edge scan emitting (label, min outgoing key) partials +
    a label-keyed min-groupby, then one winner-marking scan. Labels and
    the (<= V-1)-edge forest are node-dimension driver state (the
    ``bfs_levels`` bounded-node contract); contraction folds run on driver
    arrays. Edge lists at or below ``local_max_edges`` run identical
    rounds locally.

    Returns ``(node_u, node_v, round)`` — MSF edges with the 1-based round
    they were first chosen, sorted by (round, node_u, node_v).
    """
    import ray
    from ray.data.aggregate import Count as _Count, Min as _Min

    edges = edges.materialize()
    local = edges.count() <= local_max_edges
    if local:
        _df = edges.to_pandas()
        la = _df[a_col].to_numpy().astype(np.int64)
        lb = _df[b_col].to_numpy().astype(np.int64)
        all_nodes = np.unique(np.concatenate([la, lb]))
    else:
        la = lb = None

        def ends(t: pa.Table) -> pa.Table:
            a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

        all_nodes = np.sort(
            edges.map_batches(ends, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Count(alias_name="_c"))
            .to_pandas()["node"]
            .to_numpy()
            .astype(np.int64)
        )
    V = len(all_nodes)
    if V >= (1 << 21):
        raise ValueError("boruvka_msf node set exceeds the packed-key budget")
    sent = np.iinfo(np.int64).max

    def edge_key(u: np.ndarray, v: np.ndarray, ru: np.ndarray, rv: np.ndarray) -> np.ndarray:
        pri = (u * 2654435761 + v * 40503) % (1 << 20)
        return (pri << 42) | (ru.astype(np.int64) << 21) | rv.astype(np.int64)

    lab = np.arange(V, dtype=np.int64)
    fu = np.empty(0, dtype=np.int64)  # forest, as node ranks
    fv = np.empty(0, dtype=np.int64)
    first_round = np.full(0, 0, dtype=np.int64)
    chosen_keys: set = set()
    out_u: list = []
    out_v: list = []
    out_r: list = []

    if local:
        iu = np.searchsorted(all_nodes, la)
        iv = np.searchsorted(all_nodes, lb)
        key = edge_key(la, lb, iu, iv)

    for r in range(1, rounds + 1):
        if local:
            ga, gb = lab[iu], lab[iv]
            outm = ga != gb
            if not outm.any():
                break
            gm = np.full(V, sent, dtype=np.int64)
            np.minimum.at(gm, ga[outm], key[outm])
            np.minimum.at(gm, gb[outm], key[outm])
            win = outm & ((key == gm[ga]) | (key == gm[gb]))
            wu, wv = iu[win], iv[win]
        else:
            ref = ray.put((all_nodes, lab))

            def grp_min(t: pa.Table, _f=ref) -> pa.Table:
                nodes, l_ = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ja = np.searchsorted(nodes, a)
                jb = np.searchsorted(nodes, b)
                k = edge_key(a, b, ja, jb)
                o = l_[ja] != l_[jb]
                if not o.any():
                    return pa.table(
                        {"g": pa.array([], pa.int64()), "m": pa.array([], pa.int64())}
                    )
                g = np.concatenate([l_[ja[o]], l_[jb[o]]])
                w = np.concatenate([k[o], k[o]])
                un, inv = np.unique(g, return_inverse=True)
                mins = np.full(len(un), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mins, inv, w)
                return pa.table({"g": pa.array(un), "m": pa.array(mins)})

            got = (
                edges.map_batches(grp_min, batch_format="pyarrow")
                .groupby("g")
                .aggregate(_Min("m", alias_name="m"))
                .to_pandas()
            )
            if not len(got):
                break
            gm = np.full(V, sent, dtype=np.int64)
            gm[got["g"].to_numpy().astype(np.int64)] = got["m"].to_numpy().astype(np.int64)
            wref = ray.put((all_nodes, lab, gm))

            def winners(t: pa.Table, _f=wref) -> pa.Table:
                nodes, l_, g_ = ray.get(_f)
                a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ja = np.searchsorted(nodes, a)
                jb = np.searchsorted(nodes, b)
                k = edge_key(a, b, ja, jb)
                o = l_[ja] != l_[jb]
                w_ = o & ((k == g_[l_[ja]]) | (k == g_[l_[jb]]))
                return pa.table({"ju": pa.array(ja[w_]), "jv": pa.array(jb[w_])})

            wdf = edges.map_batches(winners, batch_format="pyarrow").to_pandas()
            if not len(wdf):
                break
            wu = wdf["ju"].to_numpy().astype(np.int64)
            wv = wdf["jv"].to_numpy().astype(np.int64)

        fresh = [
            i for i in range(len(wu)) if (int(wu[i]), int(wv[i])) not in chosen_keys
        ]
        for i in fresh:
            chosen_keys.add((int(wu[i]), int(wv[i])))
            out_u.append(all_nodes[wu[i]])
            out_v.append(all_nodes[wv[i]])
            out_r.append(r)
        fu = np.concatenate([fu, wu[fresh]])
        fv = np.concatenate([fv, wv[fresh]])
        for _ in range(contract_steps):
            nl = lab.copy()
            np.minimum.at(nl, fu, lab[fv])
            np.minimum.at(nl, fv, lab[fu])
            lab = nl

    return (
        pd.DataFrame(
            {
                "node_u": np.array(out_u, dtype=np.int64),
                "node_v": np.array(out_v, dtype=np.int64),
                "round": np.array(out_r, dtype=np.int64),
            }
        )
        .sort_values(["round", "node_u", "node_v"])
        .reset_index(drop=True)
    )
