"""Distributed PCA over an embedding column (covariance method).

``pca_fit`` reduces the corpus to the mergeable sufficient statistics
(state/moments.EmbeddingMoments) through the same partial/tree-merge path as
every other sketch — the shuffle carries (dim + dim²)-float partials, never
vectors — and the driver does one dim×dim ``eigh``. ``pca_transform`` is a
shuffle-free map pass projecting each vector onto the broadcast components.

Determinism: eigenvectors have a sign ambiguity; each component's sign is
fixed so its largest-|value| coordinate is positive, making projections
reproducible across runs/engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from perfect_bloomfilter_ray.state.moments import EmbeddingMoments


def pca_fit(ds: Dataset, vec_col: str, dim: int, k: int) -> dict:
    """Fit top-``k`` principal components; returns ``{mean, components
    (k×dim), explained_var (k), n}`` — a small plain-numpy model dict."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global

    m: EmbeddingMoments = sketch_global(ds, vec_col, lambda: EmbeddingMoments(dim))
    cov = m.covariance()
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, dim)
    # deterministic sign: largest-|coord| positive
    flips = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flips[flips == 0] = 1.0
    comps = comps * flips[:, None]
    return {
        "mean": m.mean(),
        "components": comps,
        "explained_var": w[order],
        "n": m.n,
    }


def pca_transform(
    ds: Dataset, model: dict, vec_col: str, dim: int, out_col: str = "pca"
) -> Dataset:
    """Append the k-dim projection ``(x - mean) @ components.T`` as a
    ``fixed_size_list<double>[k]`` column (broadcast model, one map pass)."""
    import ray

    ref = ray.put((model["mean"], model["components"]))

    def project(t: pa.Table) -> pa.Table:
        mu, comps = ray.get(ref)
        col = t.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = np.asarray(col.flatten(), dtype=np.float64).reshape(len(t), dim)
        p = (v - mu) @ comps.T
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(p.ravel(), pa.float64()), comps.shape[0]
        )
        return t.append_column(out_col, arr)

    return ds.map_batches(project, batch_format="pyarrow")
