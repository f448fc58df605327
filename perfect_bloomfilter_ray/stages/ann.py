"""Similarity search over an embedding column (`list<float>`).

- ``brute_force_topk`` — exact cosine top-k: per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once), per-batch partial top-k, tiny
  final reduce. This is the correctness baseline AND the per-partition kernel.
- ``lsh_topk`` — the scale path: random-hyperplane LSH buckets restrict the
  matmul to candidate buckets (same bucketing as
  stages.dedup.embedding_neardup_pairs); recall < 1 by design, measured
  against the brute-force baseline in tests.

Scale notes: queries are broadcast (Q × dim, small); the embedding table
streams through map_batches; per-batch candidate rows (≤ Q·k each) are the
only thing the final reduce sees — no full-table materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _vecs_of(t: pa.Table, vec_col: str, dim: int) -> np.ndarray:
    col = t.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.flatten()).reshape(len(t), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float32, copy=False)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _empty_topk_table(t: pa.Table, id_col: str) -> pa.Table:
    """Zero-row result with the scorer's output schema (empty input blocks
    reach every scorer via empty parquet fragments / upstream filters;
    np.argpartition on a size-0 axis would raise)."""
    return pa.table(
        {
            "query_id": pa.array([], pa.int32()),
            id_col: pa.array([], t.schema.field(id_col).type),
            "cos": pa.array([], pa.float64()),
        }
    )


def _topk_scorer(queries_ref, vec_col: str, id_col: str, dim: int, k: int):
    """Stateless task fn: the query matrix is broadcast once (``ray.put``)
    and resolved zero-copy from the object store in every task — cheaper than
    an actor pool for state this small (actor pools respawn per execution,
    ~2 s of spin-up that dwarfs the matmul on dimension-scale inputs)."""

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_topk_table(t, id_col)
        q = _normalize(np.asarray(ray.get(queries_ref)))  # (Q, dim)
        vecs = _normalize(_vecs_of(t, vec_col, dim))
        sims = vecs @ q.T  # (n, Q)
        n, Q = sims.shape
        kk = min(k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q) row indices
        ids = t.column(id_col).to_numpy()
        out_q = np.repeat(np.arange(Q, dtype=np.int32), kk)
        out_idx = part.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q),
                id_col: pa.array(ids[out_idx]),
                "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
            }
        )

    return score


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a small pandas frame
    (query_id, id, cos) with k rows per query, sorted by cos desc, ties by id.
    """
    ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        _topk_scorer(ref, vec_col, id_col, dim, k),
        batch_format="pyarrow",
    )
    # final reduce over ≤ k·Q·num_batches candidate rows — tiny
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def lsh_topk(
    ds: Dataset,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate top-k: score only rows sharing an LSH bucket with a query
    in at least one table. Same output shape as brute_force_topk; recall
    measured in tests (raise num_tables for higher recall)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float32)
    qm = _normalize(np.asarray(queries))
    qkeys = np.stack(
        [
            ((qm @ planes[t].T) > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(num_planes, dtype=np.uint64))
            for t in range(num_tables)
        ]
    )  # (tables, Q)
    qkeys_ref = ray.put(qkeys)
    q_ref = ray.put(qm)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_topk_table(t, id_col)
        q = ray.get(q_ref)
        qk = ray.get(qkeys_ref)
        vecs = _normalize(_vecs_of(t, vec_col, dim))
        n = len(vecs)
        cand = np.zeros((n, q.shape[0]), dtype=bool)
        for tb in range(num_tables):
            bits = (vecs @ planes[tb].T) > 0
            keys = bits.astype(np.uint64) @ (np.uint64(1) << np.arange(num_planes, dtype=np.uint64))
            cand |= keys[:, None] == qk[tb][None, :]
        sims = vecs @ q.T
        sims[~cand] = -2.0  # outside every bucket → never in top-k
        kk = min(k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        ids = t.column(id_col).to_numpy()
        Q = q.shape[0]
        out_q = np.repeat(np.arange(Q, dtype=np.int32), kk)
        out_idx = part.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q),
                id_col: pa.array(ids[out_idx]),
                "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    df = partials.to_pandas()
    df = df[df["cos"] > -1.5]
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def _train_centroids(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    nlist: int,
    train_sample: int,
    kmeans_iters: int,
    seed: int,
) -> np.ndarray:
    """Deterministic UNBIASED k-means training sample + fit, shared by
    ``ivf_topk`` and ``ivf_build_index``: hash-filter on the id column
    (``limit()`` alone would take the first rows — biased whenever storage
    order correlates with content, e.g. time- or crawl-ordered corpora),
    cap at ``train_sample``, fit spherical k-means."""
    sample = _unbiased_sample(ds, vec_col, id_col, train_sample)
    return _kmeans_fit(sample, nlist, kmeans_iters, seed)


def _unbiased_sample(ds: Dataset, vec_col: str, id_col: str, train_sample: int) -> np.ndarray:
    """Deterministic hash-filtered vector sample, L2-normalized (see
    ``_train_centroids`` for why ``limit()`` alone would be biased)."""
    from perfect_bloomfilter_ray.functions.hashing import hash64

    total = ds.count()
    if total > train_sample:
        keep_mod = max(2, total // train_sample)

        def keep(t: pa.Table) -> pa.Table:
            h = hash64(t.column(id_col), 0x5A3) % np.uint64(keep_mod)
            return t.filter(pa.array(h == 0))

        sample_ds = ds.map_batches(keep, batch_format="pyarrow").limit(train_sample)
    else:
        sample_ds = ds
    sample_tbl = sample_ds.to_pandas()
    return _normalize(np.stack([np.asarray(v, dtype=np.float32) for v in sample_tbl[vec_col]]))


def _kmeans_fit(sample: np.ndarray, nlist: int, iters: int, seed: int) -> np.ndarray:
    """Spherical k-means on unit vectors (numpy Lloyd iterations; no sklearn
    in this environment). Deterministic for a given sample and seed."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    centroids = sample[rng.choice(n, size=min(nlist, n), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    kmeans_iters: int = 8,
    seed: int = 5,
) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k: cluster the corpus into
    ``nlist`` spherical-k-means cells, probe only each query's ``nprobe``
    nearest cells. The centroid table (nlist × dim) is broadcast once; each
    map task assigns its batch to cells with one matmul and scores only rows
    whose cell is probed by ≥1 query.

    At 100 TB the training sample is a deterministic hash-sample of the id
    column (unbiased even when storage order correlates with content), the
    centroid matmul is O(batch × nlist), and scored work drops by roughly
    nprobe/nlist vs brute force. Recall vs ``brute_force_topk`` is measured in
    tests; raise ``nprobe`` for higher recall. Same output shape as
    ``brute_force_topk``.
    """
    centroids = _train_centroids(ds, vec_col, id_col, nlist, train_sample, kmeans_iters, seed)

    qm = _normalize(np.asarray(queries))
    q_cells = np.argsort(-(qm @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]  # (Q, nprobe)
    probed = np.zeros((len(centroids), qm.shape[0]), dtype=bool)  # cell -> queries probing it
    for qi in range(qm.shape[0]):
        probed[q_cells[qi], qi] = True

    c_ref = ray.put(centroids)
    q_ref = ray.put(qm)
    p_ref = ray.put(probed)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_topk_table(t, id_col)
        c = ray.get(c_ref)
        q = ray.get(q_ref)
        probed = ray.get(p_ref)
        vecs = _normalize(_vecs_of(t, vec_col, dim))
        cells = np.argmax(vecs @ c.T, axis=1)  # (n,)
        cand = probed[cells]  # (n, Q): query probes this row's cell
        sims = vecs @ q.T
        sims[~cand] = -2.0
        n = len(vecs)
        kk = min(k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        ids = t.column(id_col).to_numpy()
        Q = q.shape[0]
        out_q = np.repeat(np.arange(Q, dtype=np.int32), kk)
        out_idx = part.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q),
                id_col: pa.array(ids[out_idx]),
                "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    df = partials.to_pandas()
    df = df[df["cos"] > -1.5]
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def quantize_embeddings(
    ds: Dataset,
    vec_col: str,
    dim: int,
    code_col: str = "qvec",
    scale_col: str = "qscale",
    precision: str = "f32",
) -> Dataset:
    """Per-vector symmetric int8 scalar quantization: ``code = round(v /
    scale)`` with ``scale = max|v| / 127``, appended as a
    ``fixed_size_list<int8>[dim]`` column plus a float32 scale. 4× smaller
    than float32 — at 10^12 rows the embedding column is the dominant
    storage/shuffle cost, and int8 codes keep brute-force scans
    memory-bandwidth-bound instead of capacity-bound. Zero vectors quantize
    to all-zero codes with scale 0.

    ``precision="f64"`` computes scale and ratio in float64 and rounds
    HALF-AWAY-FROM-ZERO — bit-identical to SQL ``round(x / s)``, the mode
    the exact oracle twin uses (f32 + numpy half-even is the bandwidth
    mode; the codes differ only where a ratio lands within one ulp of a
    .5 boundary).
    """

    def q(t: pa.Table) -> pa.Table:
        v = _vecs_of(t, vec_col, dim)
        if precision == "f64":
            v = v.astype(np.float64)
        scale = np.abs(v).max(axis=1) / 127.0 if len(v) else np.empty(0, np.float32)
        safe = np.where(scale > 0, scale, 1.0)
        if len(v) == 0:
            codes = np.empty((0, dim), np.int8)
        elif precision == "f64":
            z = v / safe[:, None]
            away = np.where(z >= 0, np.floor(z + 0.5), np.ceil(z - 0.5))
            codes = np.clip(away, -127, 127).astype(np.int8)
        else:
            codes = np.clip(np.round(v / safe[:, None]), -127, 127).astype(np.int8)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(codes.ravel(), pa.int8()), dim)
        return t.append_column(code_col, arr).append_column(
            scale_col, pa.array(scale.astype(np.float32))
        )

    return ds.map_batches(q, batch_format="pyarrow")


def quantized_topk(
    ds: Dataset,
    queries: np.ndarray,
    code_col: str,
    scale_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    rescore: int = 4,
) -> pd.DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: each block
    dequantizes codes to float32 (reading 4× less memory than float32
    vectors — the win at scale is bandwidth, the arithmetic is identical),
    keeps ``rescore × k`` candidates per block so quantization-rank jitter
    near the cut survives to the final exact merge, and the driver takes
    the global top-k. Same output shape as :func:`brute_force_topk`;
    recall vs the float baseline is property-tested.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_topk_table(t, id_col)
        q = np.asarray(ray.get(ref))  # (Q, dim), normalized
        codes = _vecs_of(t, code_col, dim)
        scales = t.column(scale_col).to_numpy(zero_copy_only=False).astype(np.float32)
        v = codes.astype(np.float32) * scales[:, None]
        vn = _normalize(v)
        sims = vn @ q.T
        n, Q = sims.shape
        kk = min(rescore * k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        ids = t.column(id_col).to_numpy()
        out_q = np.repeat(np.arange(Q, dtype=np.int32), kk)
        out_idx = part.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q),
                id_col: pa.array(ids[out_idx]),
                "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
            }
        )

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def ivf_build_index(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    dim: int,
    index_dir: str,
    nlist: int = 16,
    train_sample: int = 4096,
    kmeans_iters: int = 8,
    seed: int = 5,
) -> dict:
    """Build and PERSIST an IVF index: spherical-k-means centroids plus the
    corpus re-written as cell-partitioned Parquet (``index_dir/vectors/
    cell=N/``). Queries then touch only their probed cells' files — the
    read itself is pruned, so at 10^12 rows a query scans ~nprobe/nlist of
    the corpus from storage instead of filtering after a full scan (the
    difference between an index and a cache). Returns (and writes) a
    manifest dict; the build is a one-pass ``map_batches`` + partitioned
    ``write_parquet`` and is re-runnable (overwrite semantics).
    """
    import json
    import os
    import shutil

    centroids = _train_centroids(ds, vec_col, id_col, nlist, train_sample, kmeans_iters, seed)
    c_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = np.asarray(ray.get(c_ref))
        vecs = _normalize(_vecs_of(t, vec_col, dim))
        cells = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cells))

    os.makedirs(index_dir, exist_ok=True)
    vec_dir = os.path.join(index_dir, "vectors")
    # true overwrite: Ray's write_parquet APPENDS into existing partition
    # dirs, which would silently duplicate every vector on a rebuild
    shutil.rmtree(vec_dir, ignore_errors=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        vec_dir, partition_cols=["cell"]
    )
    cent_tbl = pa.table(
        {
            "cell": pa.array(np.arange(len(centroids), dtype=np.int32)),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(centroids.ravel(), pa.float32()), dim
            ),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(cent_tbl, os.path.join(index_dir, "centroids.parquet"))
    manifest = {"dim": dim, "nlist": int(len(centroids)), "vec_col": vec_col, "id_col": id_col}
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def ivf_query_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Query a persisted IVF index: load the (tiny) centroid table, pick
    each query's ``nprobe`` nearest cells, and ``read_parquet`` ONLY those
    cells' directories (path-level partition pruning — the scan never
    touches unprobed cells). Scoring is the shared brute-force kernel over
    the pruned read; a row outside a query's probed cells can only add
    recall. Same output shape as :func:`brute_force_topk`.
    """
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    dim, vec_col, id_col = man["dim"], man["vec_col"], man["id_col"]
    cent = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    centroids = _vecs_of(cent, "centroid", dim)
    qm = _normalize(np.asarray(queries))
    q_cells = np.argsort(-(qm @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]
    cells = sorted(set(int(c) for c in q_cells.ravel()))
    paths = []
    for c in cells:
        d = os.path.join(index_dir, "vectors", f"cell={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    if not paths:
        # every probed cell was empty (k-means leaves empty cells; an
        # out-of-distribution query can probe only those) — empty result,
        # not a read_parquet([]) ValueError
        return pd.DataFrame({"query_id": pd.Series([], dtype="int32"),
                             id_col: pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    import ray.data as rd

    pruned = rd.read_parquet(paths, columns=[id_col, vec_col])
    ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = pruned.map_batches(
        _topk_scorer(ref, vec_col, id_col, dim, k), batch_format="pyarrow"
    )
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def _kmeans_euclid(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain Euclidean Lloyd k-means (PQ codebooks live in subspace
    coordinates, where the inner-product decomposition needs Euclidean —
    not spherical — cells). Deterministic for a given sample and rng."""
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    xx = (x * x).sum(axis=1)
    for _ in range(iters):
        d2 = xx[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        a = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[a == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_train_codebooks(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 256,
    train_sample: int = 20_000,
    kmeans_iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze & Schmid 2011): split
    the (L2-normalized) vector into ``m`` contiguous subspaces of dim/m
    dims and fit an independent ``ksub``-centroid Euclidean k-means per
    subspace on one deterministic unbiased sample. Returns
    ``(m, ksub, dim//m)`` float32. Codebooks are O(m*ksub*dsub) — trivially
    broadcastable regardless of corpus size."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = _unbiased_sample(ds, vec_col, id_col, train_sample)
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            _kmeans_euclid(sample[:, j * dsub : (j + 1) * dsub], ksub, kmeans_iters, rng)
            for j in range(m)
        ]
    )


def pq_encode(
    ds: Dataset,
    codebooks: np.ndarray,
    vec_col: str,
    id_col: str,
    dim: int,
    code_col: str = "pqcode",
) -> Dataset:
    """Encode every vector to ``m`` uint8 subspace code ids (nearest
    Euclidean codebook entry per subspace, first-index ties) — for
    dim=64 float32 → m=8 bytes that is a 32× compression of the scan
    column. One ``map_batches`` with the tiny codebook broadcast."""
    m, ksub, dsub = codebooks.shape
    cb_ref = ray.put(codebooks.astype(np.float32))

    def enc(t: pa.Table) -> pa.Table:
        cb = np.asarray(ray.get(cb_ref))
        n = len(t)
        if n == 0:
            codes = np.empty((0, m), np.uint8)
        else:
            v = _normalize(_vecs_of(t, vec_col, dim))
            codes = np.empty((n, m), np.uint8)
            for j in range(m):
                x = v[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ cb[j].T)
                    + (cb[j] * cb[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(codes.ravel(), pa.uint8()), m)
        return pa.table({id_col: t.column(id_col), code_col: arr})

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    codes_ds: Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    code_col: str,
    id_col: str,
    k: int = 10,
    rescore: int = 4,
):
    """Asymmetric-distance (ADC) cosine top-k over PQ codes: queries stay
    full-precision; per query one (m, ksub) inner-product lookup table is
    precomputed against the codebooks, so scoring a vector is ``m`` table
    lookups + adds — no float vector is ever read. Each block keeps
    ``rescore*k`` candidates (quantization-rank jitter near the cut
    survives to the exact driver merge), same output shape as
    :func:`brute_force_topk`; recall vs the float baseline is
    property-tested (the PQ pipelines' standard contract)."""
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    # luts[j]: (Q, ksub) — <q_j, c_{j,code}> for every code
    luts = np.stack([qn[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)])
    lut_ref = ray.put(luts.astype(np.float32))

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_topk_table(t, id_col)
        lt = np.asarray(ray.get(lut_ref))  # (m, Q, ksub)
        codes = _vecs_of(t, code_col, m).astype(np.int64)
        n = len(codes)
        Q = lt.shape[1]
        sims = np.zeros((n, Q), dtype=np.float32)
        for j in range(m):
            sims += lt[j][:, codes[:, j]].T
        kk = min(rescore * k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        ids = t.column(id_col).to_numpy()
        out_q = np.repeat(np.arange(Q, dtype=np.int32), kk)
        out_idx = part.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q),
                id_col: pa.array(ids[out_idx]),
                "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
            }
        )

    df = codes_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def exact_topk_ranked(
    ds: Dataset,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Float64 cosine top-k WITH explicit rank positions — the reference
    ranking for :func:`ranking_eval`. Same distributed shape as
    :func:`brute_force_topk` (per-block partial top-k, tiny driver merge)
    but all arithmetic in float64 to mirror the SQL oracle's
    ``list_cosine_similarity``, ties broken by id ascending, and each
    query's own vector excluded when ``query_ids`` is given. Returns
    (query_id, id, rk) with rk 1..k.
    """
    qm = np.asarray(queries, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-300)
    ref = ray.put(qm)
    qids = None if query_ids is None else np.asarray(query_ids, dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_topk_table(t, id_col)
        q = np.asarray(ray.get(ref))
        v = _vecs_of(t, vec_col, dim).astype(np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        sims = v @ q.T
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        qs, out_ids, out_cos = [], [], []
        for qi in range(sims.shape[1]):
            m = np.ones(len(ids), dtype=bool) if qids is None else ids != qids[qi]
            mi, ms = ids[m], sims[m, qi]
            order = np.lexsort((mi, -ms))[: min(k, len(mi))]
            qs.append(np.full(len(order), qi, dtype=np.int32))
            out_ids.append(mi[order])
            out_cos.append(ms[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs) if qs else np.array([], np.int32)),
                id_col: pa.array(np.concatenate(out_ids) if out_ids else np.array([], np.int64)),
                "cos": pa.array(np.concatenate(out_cos) if out_cos else np.array([], np.float64)),
            }
        )

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rk"] = df.groupby("query_id").cumcount().astype("int64") + 1
    return df[["query_id", id_col, "rk"]]


def quantized_exact_topk_ranked(
    ds: Dataset,
    query_codes: np.ndarray,
    code_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Multi-query EXACT ranking over int8 codes: scores are PURE INTEGER
    code dot products (every term ≤ 127², exact in any summation order —
    no float anywhere), so the ranking is bit-deterministic across engines
    and block layouts. Per-block partial top-k (dot desc, id asc), tiny
    driver merge. Returns (query_id, id, rk) with rk 1..k.
    """
    qc = np.asarray(query_codes, dtype=np.int32)
    ref = ray.put(qc)
    qids = None if query_ids is None else np.asarray(query_ids, dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    "qdot": pa.array([], pa.int64()),
                }
            )
        q = np.asarray(ray.get(ref))
        codes = _vecs_of(t, code_col, dim).astype(np.int32)
        dots = (codes @ q.T).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        qs, out_ids, out_dot = [], [], []
        for qi in range(dots.shape[1]):
            m = np.ones(len(ids), dtype=bool) if qids is None else ids != qids[qi]
            mi, md = ids[m], dots[m, qi]
            order = np.lexsort((mi, -md))[: min(k, len(mi))]
            qs.append(np.full(len(order), qi, dtype=np.int32))
            out_ids.append(mi[order])
            out_dot.append(md[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs) if qs else np.array([], np.int32)),
                id_col: pa.array(np.concatenate(out_ids) if out_ids else np.array([], np.int64)),
                "qdot": pa.array(np.concatenate(out_dot) if out_dot else np.array([], np.int64)),
            }
        )

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "qdot", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rk"] = df.groupby("query_id").cumcount().astype("int64") + 1
    return df[["query_id", id_col, "rk"]]


def ranking_eval(
    exact: pd.DataFrame,
    approx: pd.DataFrame,
    id_col: str,
    k: int,
) -> pd.DataFrame:
    """Retrieval-quality report card between two (query_id, id, rk) rankings
    — the eval harness for every ANN variant against its exact reference.
    Per query: ``overlap`` (|exact∩approx| in the top-k, BIGINT),
    ``jaccard`` (= overlap / (2k − overlap), ONE exact-int division),
    ``mrr`` (reciprocal of the approx rank of the exact top-1 item; 0.0 if
    absent — again one exact-int division), ``displacement``
    (Σ |rk_exact − rk_approx| over common items, BIGINT). Driver-side over
    rank-cardinality-bounded frames; every float is a single int/int
    division, so the report hashes bit-identically against a SQL join of
    the two rankings.
    """
    j = exact.merge(
        approx.rename(columns={"rk": "rk_b"}), on=["query_id", id_col], how="left"
    )
    rows = []
    for qid, g in j.groupby("query_id", sort=True):
        hit = g["rk_b"].notna()
        overlap = int(hit.sum())
        top1 = g[g["rk"] == 1]
        rk_b1 = top1["rk_b"].iloc[0] if len(top1) else np.nan
        mrr = float(1.0) / float(int(rk_b1)) if pd.notna(rk_b1) else 0.0
        disp = int((g.loc[hit, "rk"] - g.loc[hit, "rk_b"]).abs().sum())
        rows.append(
            {
                "query_id": int(qid),
                "overlap": overlap,
                "jaccard": float(overlap) / float(2 * k - overlap),
                "mrr": mrr,
                "displacement": disp,
            }
        )
    out = pd.DataFrame(rows)
    return out.astype(
        {"query_id": "int64", "overlap": "int64", "displacement": "int64"}
    )
