"""Grouped embedding centroids + cosine-to-centroid scoring.

The semantic-curation staple: average the embedding vectors per group
(label / language / cluster), then score each vector by cosine similarity to
its own group's centroid — low scores are semantic outliers (mislabeled or
off-topic documents), high scores near 1 are redundant near-centroid mass.

Execution shape: one ``map_batches`` pass reduces each batch to ONE
``(key, n, dim-wise float64 sum)`` partial row per key — so only
``keys × blocks`` tiny rows ever leave the map tasks; the merge is a
driver-side numpy sum (bounded: labels × blocks, never data rows). The
centroid table broadcasts once via ``ray.put`` and the scoring pass is
shuffle-free, one matmul-free vectorized cosine per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

__all__ = ["grouped_centroids", "cosine_to_centroid"]


def _vectors(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(rows, dim) float64 view of a list<float> / fixed_size_list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(-1, dim).astype(np.float64)
    lens = np.diff(col.offsets.to_numpy())
    dim = int(lens[0]) if len(lens) else 0
    if len(lens) and not (lens == dim).all():
        raise ValueError("ragged embedding column: all rows must share one dim")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, dim).astype(np.float64)


def grouped_centroids(ds: Dataset, key: str, vec_col: str) -> dict:
    """Per-key mean vector. Returns ``{key_value: centroid float64[dim]}``."""

    def partial(t: pa.Table) -> pa.Table:
        v = _vectors(t.column(vec_col))
        k = t.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        n_g = np.diff(np.append(starts, len(ks)))
        sums = np.add.reduceat(v[order], starts, axis=0)
        return pa.table(
            {
                key: pa.array(ks[starts]),
                "pn": pa.array(n_g.astype(np.int64)),
                "psum": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    agg: dict = {}
    for b in ds.select_columns([key, vec_col]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        ks = b.column(key).to_pylist()
        ns = b.column("pn").to_numpy()
        ss = b.column("psum").to_pylist()
        for kk, nn, s in zip(ks, ns, ss):
            cur = agg.get(kk)
            if cur is None:
                agg[kk] = [int(nn), np.asarray(s, np.float64)]
            else:
                cur[0] += int(nn)
                cur[1] = cur[1] + np.asarray(s, np.float64)
    return {kk: s / n for kk, (n, s) in agg.items()}


def cosine_to_centroid(
    ds: Dataset,
    key: str,
    vec_col: str,
    out_col: str = "cos_centroid",
    centroids: dict | None = None,
) -> Dataset:
    """Append cosine similarity of each row's vector to its key's centroid.

    ``centroids`` defaults to :func:`grouped_centroids` over ``ds`` itself
    (two streaming passes total). Zero-norm vectors or unseen keys get null.
    """
    import ray

    if centroids is None:
        centroids = grouped_centroids(ds, key, vec_col)
    keys = np.array(sorted(centroids))
    mat = np.stack([centroids[k] for k in keys])
    lut_ref = ray.put((keys, mat, np.linalg.norm(mat, axis=1)))

    def score(t: pa.Table) -> pa.Table:
        k_sorted, cmat, cnorm = ray.get(lut_ref)
        v = _vectors(t.column(vec_col))
        k = t.column(key).to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(k_sorted, k), 0, len(k_sorted) - 1)
        hit = k_sorted[idx] == k
        dots = np.einsum("ij,ij->i", v, cmat[idx])
        vn = np.linalg.norm(v, axis=1)
        denom = vn * cnorm[idx]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dots / denom
        cos = np.where(hit & (denom > 0), cos, np.nan)
        return t.append_column(out_col, pa.array(cos))

    return ds.map_batches(score, batch_format="pyarrow")
