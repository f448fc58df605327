"""Model-weights inference stage: broadcast weights, forward-pass parity,
curate-waterfall wiring."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_feats():
    # Defined as a RETURNED CLOSURE, not a module-level function: cloudpickle
    # ships closures by value, while a module-level function from a test file
    # serializes by reference to a module Ray workers cannot import (the
    # actor would then restart forever -- a real deployment passes functions
    # from its installed package, where by-reference is fine).
    def feats(t: pa.Table) -> np.ndarray:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.float64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.float64)
        return np.stack([a, b], axis=1)

    return feats


def test_scorer_matches_driver_numpy(ray_session):
    """Actor-pool scores == one driver-side numpy forward pass, bitwise."""
    import ray

    from perfect_bloomfilter_ray.stages.inference import (
        NumpyModelScorer,
        mlp_init,
        model_score_dataset,
    )

    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {"rid": np.arange(5000, dtype=np.int64), "a": rng.randn(5000), "b": rng.randn(5000)}
    )
    weights = mlp_init([2, 4, 1], seed=3)
    ds = ray.data.from_pandas(df)
    got = (
        model_score_dataset(ds, weights, _make_feats(), id_cols=["rid"], out_col="logit")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    # driver-side reference through the same class, no Ray
    local = NumpyModelScorer(weights, _make_feats(), id_cols=["rid"])
    x = np.stack([df["a"].to_numpy(), df["b"].to_numpy()], axis=1)
    expected = local._forward(x)
    np.testing.assert_array_equal(got["logit"].to_numpy(), expected)


def test_relu_layering_and_shapes():
    from perfect_bloomfilter_ray.stages.inference import NumpyModelScorer

    w = {
        "layers": [
            (np.array([[1.0], [0.0]]), np.array([-2.0])),  # unit = a - 2
            (np.array([[3.0]]), np.array([0.5])),  # logit = 3*relu(a-2) + 0.5
        ]
    }
    sc = NumpyModelScorer(w, _make_feats(), id_cols=[])
    x = np.array([[1.0, 9.0], [4.0, 9.0]])
    np.testing.assert_array_equal(sc._forward(x), [0.5, 6.5])


def test_logreg_to_mlp_standardizes():
    from perfect_bloomfilter_ray.stages.inference import NumpyModelScorer, logreg_to_mlp

    fit = {
        "w": np.array([2.0, -1.0, 0.25]),
        "mu": np.array([1.0, 2.0]),
        "sd": np.array([2.0, 4.0]),
    }
    sc = NumpyModelScorer(logreg_to_mlp(fit), _make_feats(), id_cols=[])
    x = np.array([[3.0, 6.0]])  # standardized -> [1.0, 1.0]
    np.testing.assert_allclose(sc._forward(x), [2.0 - 1.0 + 0.25])


def test_model_quality_filter_in_curation(ray_session):
    """Train the distributed logreg on a separable signal, then gate docs
    through the broadcast-weights filter; the kept set must equal the
    driver-side score >= 0 set and carry the score column."""
    import ray

    from perfect_bloomfilter_ray.pipelines.curate import model_quality_filter
    from perfect_bloomfilter_ray.stages.inference import NumpyModelScorer, logreg_to_mlp
    from perfect_bloomfilter_ray.stages.logreg import logreg_fit

    rng = np.random.RandomState(1)
    n = 4000
    a = rng.randn(n) * 2
    b = rng.randn(n) * 2
    y = (a + b > 0).astype(np.int64)  # linearly separable up to noise-free
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "a": a, "b": b, "y": y})
    ds = ray.data.from_pandas(df)

    fit = logreg_fit(
        ds,
        _make_feats(),
        lambda t: t.column("y").to_numpy(zero_copy_only=False).astype(bool),
        n_features=2,
        iters=30,
        lr=0.5,
        tag_col="doc_id",
    )
    assert fit["accuracy"] > 0.95

    kept = (
        model_quality_filter(ds, fit, _make_feats(), threshold=0.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    local = NumpyModelScorer(logreg_to_mlp(fit), _make_feats(), id_cols=[])
    z = local._forward(np.stack([a, b], axis=1))
    expected_ids = df["doc_id"].to_numpy()[z >= 0.0]
    np.testing.assert_array_equal(kept["doc_id"].to_numpy(), expected_ids)
    assert "quality_logit" in kept.columns
    np.testing.assert_array_equal(kept["quality_logit"].to_numpy(), z[z >= 0.0])
