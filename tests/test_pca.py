"""Distributed PCA (stages/pca.py) vs driver-side numpy on the same data."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _np_pca(vecs, k):
    mu = vecs.mean(axis=0)
    cov = np.cov(vecs, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    flips = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flips[flips == 0] = 1.0
    return mu, comps * flips[:, None], w[order]


def test_pca_matches_numpy(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.pca import pca_fit, pca_transform

    rng = np.random.default_rng(9)
    dim, n, k = 12, 5000, 3
    # anisotropic data so the top components are well separated
    basis = rng.normal(size=(dim, dim))
    scales = np.linspace(5, 0.1, dim)
    vecs = (rng.normal(size=(n, dim)) * scales) @ basis.T
    vecs = vecs.astype(np.float64)

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float64()), dim
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    model = pca_fit(ds, "embedding", dim, k)
    mu, comps, ev = _np_pca(vecs, k)
    np.testing.assert_allclose(model["mean"], mu, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(model["explained_var"], ev, rtol=1e-6)
    np.testing.assert_allclose(model["components"], comps, rtol=1e-5, atol=1e-7)

    out = (
        pca_transform(ds, model, "embedding", dim)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    proj = np.stack(out["pca"].to_numpy())
    np.testing.assert_allclose(proj, (vecs - mu) @ comps.T, rtol=1e-5, atol=1e-6)


def test_moments_merge_associativity(ray_session):
    from perfect_bloomfilter_ray.state.moments import EmbeddingMoments

    rng = np.random.default_rng(4)
    parts = [rng.normal(size=(100, 6)) for _ in range(4)]

    def build(order):
        total = EmbeddingMoments(6)
        for i in order:
            s = EmbeddingMoments(6)
            s.update_column(parts[i])
            total.merge(EmbeddingMoments.from_bytes(s.to_bytes()))
        return total

    a = build([0, 1, 2, 3])
    b = build([3, 1, 0, 2])
    assert a.state_equal(b, rtol=1e-9)
    one = EmbeddingMoments(6)
    one.update_column(np.concatenate(parts))
    assert a.n == one.n and np.allclose(a.ss, one.ss)
