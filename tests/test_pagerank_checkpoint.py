"""Resumable pagerank_dataset — checkpoint publish + resume parity."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from perfect_bloomfilter_ray.stages.graph import pagerank_dataset


def _edges():
    import ray

    rng = np.random.RandomState(0)
    src = rng.randint(0, 40, 500).astype(np.int64)
    dst = rng.randint(0, 40, 500).astype(np.int64)
    keep = src != dst
    return ray.data.from_pandas(pd.DataFrame({"src": src[keep], "dst": dst[keep]}))


def _ranks(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return df


def test_checkpoint_resume_matches_straight_run(ray_session, tmp_path):
    ck = str(tmp_path / "pr")
    straight = _ranks(pagerank_dataset(_edges(), iters=4))
    # simulate an interrupted job: 2 iterations published...
    _ranks(pagerank_dataset(_edges(), iters=2, checkpoint_dir=ck))
    assert os.path.isdir(os.path.join(ck, "iter_2"))
    # ...then the rerun resumes from iter_2 instead of restarting
    resumed = _ranks(pagerank_dataset(_edges(), iters=4, checkpoint_dir=ck))
    assert os.path.isdir(os.path.join(ck, "iter_4"))
    pd.testing.assert_series_equal(straight["node"], resumed["node"])
    assert np.allclose(straight["rank"], resumed["rank"], rtol=1e-12)


def test_checkpoint_files_are_per_iteration(ray_session, tmp_path):
    ck = str(tmp_path / "pr2")
    _ranks(pagerank_dataset(_edges(), iters=3, checkpoint_dir=ck))
    iters = sorted(d for d in os.listdir(ck) if d.startswith("iter_"))
    assert iters == ["iter_1", "iter_2", "iter_3"]
    assert not any(d.startswith(".tmp") for d in os.listdir(ck))


def test_resume_ignores_iterations_beyond_request(ray_session, tmp_path):
    ck = str(tmp_path / "pr3")
    _ranks(pagerank_dataset(_edges(), iters=4, checkpoint_dir=ck))
    # asking for FEWER iters than checkpointed: resumes from iter_2, runs none
    two = _ranks(pagerank_dataset(_edges(), iters=2, checkpoint_dir=ck))
    fresh = _ranks(pagerank_dataset(_edges(), iters=2))
    assert np.allclose(two["rank"], fresh["rank"], rtol=1e-12)


def test_tol_early_stop_converges_and_matches(ray_session, tmp_path):
    """tol stops early once Σ|Δ| < tol (provably, via the checkpoint count)
    and the early result matches a longer fixed run."""
    ck = str(tmp_path / "tolck")
    long = _ranks(pagerank_dataset(_edges(), iters=25))
    early = _ranks(pagerank_dataset(_edges(), iters=25, tol=1e-10, checkpoint_dir=ck))
    ran = len([d for d in os.listdir(ck) if d.startswith("iter_")])
    assert ran < 25  # the stop actually fired (measured: ~17 on this graph)
    pd.testing.assert_series_equal(long["node"], early["node"])
    assert np.allclose(long["rank"], early["rank"], atol=1e-8)


def test_manifest_rejects_changed_inputs(ray_session, tmp_path):
    """A checkpoint dir written for one (edges, damping) refuses a run with
    different inputs instead of silently resuming stale state."""
    import ray

    ck = str(tmp_path / "pr4")
    _ranks(pagerank_dataset(_edges(), iters=2, checkpoint_dir=ck))
    assert os.path.isfile(os.path.join(ck, "manifest.json"))
    # changed damping
    with pytest.raises(ValueError, match="different inputs"):
        pagerank_dataset(_edges(), iters=3, damping=0.5, checkpoint_dir=ck)
    # changed edge set (same counts, different pairs -> fingerprint differs)
    other = ray.data.from_pandas(
        pd.DataFrame({"src": np.arange(20, dtype=np.int64), "dst": (np.arange(20, dtype=np.int64) + 1) % 20})
    )
    with pytest.raises(ValueError, match="different inputs"):
        pagerank_dataset(other, iters=3, checkpoint_dir=ck)
    # unchanged inputs still resume fine
    _ranks(pagerank_dataset(_edges(), iters=3, checkpoint_dir=ck))


def test_orphan_checkpoints_without_manifest_are_refused(ray_session, tmp_path):
    """iter_K dirs with no manifest.json (pre-guard runs, or a deleted
    manifest) must refuse resume — provenance unknown."""
    ck = str(tmp_path / "pr5")
    _ranks(pagerank_dataset(_edges(), iters=2, checkpoint_dir=ck))
    os.remove(os.path.join(ck, "manifest.json"))
    with pytest.raises(ValueError, match="no manifest"):
        pagerank_dataset(_edges(), iters=3, checkpoint_dir=ck)


def test_tol_none_runs_all_iterations(ray_session):
    a = _ranks(pagerank_dataset(_edges(), iters=2))
    b = _ranks(pagerank_dataset(_edges(), iters=2, tol=None))
    assert np.allclose(a["rank"], b["rank"], rtol=1e-12)
