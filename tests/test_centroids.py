"""grouped_centroids / cosine_to_centroid (stages/centroids.py) vs numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _make(n=600, dim=16, klasses=7, seed=13):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, klasses, n).astype(np.int64)
    v = rng.normal(0, 1, (n, dim)).astype(np.float32)
    v += k[:, None] * 0.5  # separate the clusters a bit
    return k, v


def test_centroids_and_cosine_match_numpy(ray_session):
    from perfect_bloomfilter_ray.stages.centroids import (
        cosine_to_centroid,
        grouped_centroids,
    )

    k, v = _make()
    t = pa.table(
        {
            "rid": pa.array(np.arange(len(k))),
            "label": pa.array(k),
            "vec": pa.array(list(v), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(9)
    cents = grouped_centroids(ds, "label", "vec")
    for kk in np.unique(k):
        np.testing.assert_allclose(
            cents[kk], v[k == kk].astype(np.float64).mean(axis=0), rtol=1e-12
        )
    out = (
        cosine_to_centroid(ds, "label", "vec")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    cmat = np.stack([cents[kk] for kk in k])
    ref = np.einsum("ij,ij->i", v.astype(np.float64), cmat) / (
        np.linalg.norm(v.astype(np.float64), axis=1) * np.linalg.norm(cmat, axis=1)
    )
    np.testing.assert_allclose(out["cos_centroid"].to_numpy(), ref, rtol=1e-9)


def test_cosine_fixed_size_list_and_zero_vector(ray_session):
    from perfect_bloomfilter_ray.stages.centroids import cosine_to_centroid

    k, v = _make(n=80, dim=8, klasses=3, seed=4)
    v[5] = 0.0  # zero-norm → null score
    t = pa.table(
        {
            "rid": pa.array(np.arange(len(k))),
            "label": pa.array(k),
            "vec": pa.FixedSizeListArray.from_arrays(pa.array(v.ravel()), 8),
        }
    )
    out = (
        cosine_to_centroid(rd.from_arrow(t).repartition(4), "label", "vec")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert np.isnan(out.loc[5, "cos_centroid"])
    assert out["cos_centroid"].drop(index=5).notna().all()
