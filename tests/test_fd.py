"""FrequentDirections: spectral bound, mergeability, roundtrip, recovery."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.fd import FrequentDirections


def _spiked(rng, n, dim, spikes=3, noise=0.05):
    u = rng.standard_normal((spikes, dim))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.standard_normal((n, spikes)) * np.array([10.0, 5.0, 2.0])[:spikes]
    return w @ u + noise * rng.standard_normal((n, dim)), u


def _spec_err(a, b):
    return float(np.linalg.norm(a - b, 2))


def test_fd_bound_and_recovery():
    rng = np.random.default_rng(3)
    a, u = _spiked(rng, 3000, 40)
    fd = FrequentDirections(40, sketch_rows=16)
    fd.update_rows(a)
    ata = a.T @ a
    err = _spec_err(ata, fd.cov_estimate())
    assert err <= fd.error_bound(0) + 1e-6
    # with k=3 spikes, the k-aware bound is much tighter and still holds
    assert err <= fd.error_bound(3) + 1e-6
    # top direction recovered (up to sign)
    vt, _ = fd.top_directions(1)
    top_exact = np.linalg.eigh(ata)[1][:, -1]
    assert abs(float(vt[0] @ top_exact)) > 0.99


def test_fd_merge_keeps_bound_any_order():
    rng = np.random.default_rng(11)
    a, _ = _spiked(rng, 2400, 24)
    chunks = np.array_split(a, 7)
    ata = a.T @ a

    def build(order):
        parts = []
        for c in chunks:
            s = FrequentDirections(24, sketch_rows=12)
            s.update_rows(c)
            parts.append(s)
        acc = parts[order[0]]
        for i in order[1:]:
            acc = acc.merge(parts[i])
        return acc

    for order in ([0, 1, 2, 3, 4, 5, 6], [6, 2, 0, 5, 1, 4, 3]):
        s = build(list(order))
        assert s.n == len(a)
        assert s.fro2 == pytest.approx(float((a * a).sum()), rel=1e-9)
        assert _spec_err(ata, s.cov_estimate()) <= s.error_bound(0) + 1e-6


def test_fd_roundtrip_and_empty():
    rng = np.random.default_rng(1)
    a, _ = _spiked(rng, 300, 16)
    s = FrequentDirections(16, sketch_rows=8)
    s.update_rows(a)
    r = FrequentDirections.from_bytes(s.to_bytes())
    assert r.n == s.n and r.fro2 == s.fro2
    assert np.allclose(r.cov_estimate(), s.cov_estimate())
    empty = FrequentDirections(16, sketch_rows=8)
    assert empty.cov_estimate().shape == (16, 16)
    assert float(np.abs(empty.cov_estimate()).sum()) == 0.0


def test_fd_query_runs(ray_session, sf_dir):
    from perfect_bloomfilter_ray.pipelines.extras import embedding_fd_directions

    out = embedding_fd_directions(sf_dir)
    assert len(out) == 4
    # FD's top singular values never exceed the exact eigenvalues, and the
    # gap is within the spectral bound
    assert (out["fd_singular_value_sq"] <= out["exact_eigenvalue"] + 1e-6).all()
    assert ((out["exact_eigenvalue"] - out["fd_singular_value_sq"]) <= out["spectral_bound"] + 1e-6).all()
