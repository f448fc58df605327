"""Maximal Marginal Relevance selection (Carbonell & Goldstein 1998).

Diversity-aware top-k: greedily pick the candidate maximizing
``lambda·cos(query, d) − (1−lambda)·max_{s∈selected} cos(d, s)`` — the
standard retrieval / diverse-sampling step (dedupe a result list, pick
training examples that cover the space). Each greedy round is one
``map_batches`` pass with the (query, selected) matrix broadcast via
``ray.put``: every block reduces to its best (score, id, vector) candidate
row and one tiny merge picks the global winner — k rounds, no all-pairs, no
materialized corpus. Ties break to the smallest id (deterministic)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.centroids import _vectors


def mmr_select(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    query_vec: np.ndarray,
    k: int = 10,
    lam: float = 0.7,
) -> pa.Table:
    """Returns (rank, id, relevance, mmr_score) for the k selected rows."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    picked: list[tuple[int, float, float, np.ndarray]] = []  # (id, rel, score, unit vec)

    for _ in range(k):
        sel = np.stack([p[3] for p in picked]) if picked else np.zeros((0, len(q)))
        sel_ids = {p[0] for p in picked}
        state = ray.put((q, sel, sel_ids))

        def best(t: pa.Table) -> pa.Table:
            qq, ss, done = ray.get(state)
            vecs = _vectors(t.column(vec_col)).astype(np.float64)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, np.array(sorted(done), dtype=ids.dtype)) if done else np.ones(len(ids), bool)
            if not keep.any():
                return pa.table({"id": pa.array([], pa.int64()), "rel": pa.array([], pa.float64()), "score": pa.array([], pa.float64()), "vec": pa.array([], pa.binary())})
            vecs, ids = vecs[keep], ids[keep]
            norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-12)
            unit = vecs / norms[:, None]
            rel = unit @ qq
            red = (unit @ ss.T).max(axis=1) if len(ss) else np.zeros(len(unit))
            score = lam * rel - (1.0 - lam) * red
            order = np.lexsort((ids, -score))
            j = order[0]
            return pa.table(
                {
                    "id": pa.array([int(ids[j])], pa.int64()),
                    "rel": pa.array([float(rel[j])], pa.float64()),
                    "score": pa.array([float(score[j])], pa.float64()),
                    "vec": pa.array([unit[j].tobytes()], pa.binary()),
                }
            )

        cand = ds.map_batches(best, batch_format="pyarrow").to_pandas()
        if not len(cand):
            break
        cand = cand.sort_values(["score", "id"], ascending=[False, True]).iloc[0]
        picked.append(
            (int(cand["id"]), float(cand["rel"]), float(cand["score"]), np.frombuffer(cand["vec"], dtype=np.float64))
        )

    return pa.table(
        {
            "rank": pa.array(range(1, len(picked) + 1), pa.int64()),
            "vec_id": pa.array([p[0] for p in picked], pa.int64()),
            "relevance": pa.array([round(p[1], 6) for p in picked], pa.float64()),
            "mmr_score": pa.array([round(p[2], 6) for p in picked], pa.float64()),
        }
    )
