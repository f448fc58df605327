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


class _TopKScorer:
    """Actor-pool batch fn: query matrix loaded once per actor (broadcast)."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, dim: int, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self._q = _normalize(np.asarray(q))  # (Q, dim)
        self._vec_col, self._id_col, self._dim, self._k = vec_col, id_col, dim, k

    def __call__(self, t: pa.Table) -> pa.Table:
        vecs = _normalize(_vecs_of(t, self._vec_col, self._dim))
        sims = vecs @ self._q.T  # (n, Q)
        n, Q = sims.shape
        k = min(self._k, n)
        part = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, Q) row indices
        ids = t.column(self._id_col).to_numpy()
        out_q = np.repeat(np.arange(Q, dtype=np.int32), k)
        out_idx = part.T.ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q),
                self._id_col: pa.array(ids[out_idx]),
                "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
            }
        )


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    concurrency: int | tuple[int, int] = (2, 8),
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a small pandas frame
    (query_id, id, cos) with k rows per query, sorted by cos desc, ties by id.
    """
    ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        _TopKScorer,
        fn_constructor_args=(ref, vec_col, id_col, dim, k),
        batch_format="pyarrow",
        concurrency=concurrency,
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

    class Scorer:
        def __init__(self):
            self._q = ray.get(q_ref)
            self._qk = ray.get(qkeys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vecs = _normalize(_vecs_of(t, vec_col, dim))
            n = len(vecs)
            cand = np.zeros((n, self._q.shape[0]), dtype=bool)
            for tb in range(num_tables):
                bits = (vecs @ planes[tb].T) > 0
                keys = bits.astype(np.uint64) @ (np.uint64(1) << np.arange(num_planes, dtype=np.uint64))
                cand |= keys[:, None] == self._qk[tb][None, :]
            sims = vecs @ self._q.T
            sims[~cand] = -2.0  # outside every bucket → never in top-k
            kk = min(k, n)
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            ids = t.column(id_col).to_numpy()
            Q = self._q.shape[0]
            out_q = np.repeat(np.arange(Q, dtype=np.int32), kk)
            out_idx = part.T.ravel()
            res = pa.table(
                {
                    "query_id": pa.array(out_q),
                    id_col: pa.array(ids[out_idx]),
                    "cos": pa.array(sims[out_idx, out_q].astype(np.float64)),
                }
            )
            return res

    partials = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(2, 8))
    df = partials.to_pandas()
    df = df[df["cos"] > -1.5]
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
