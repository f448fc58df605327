"""Piecewise-linear learned index — eps invariant, exact lookup, size."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.plindex import PLIndex


def _keys(n=100_000, seed=0):
    rng = np.random.RandomState(seed)
    return np.sort(np.unique(rng.randint(0, 1 << 40, n).astype(np.int64)))


def test_eps_invariant_for_present_keys():
    k = _keys()
    for eps in (4, 16, 64):
        ix = PLIndex(k, eps=eps)
        pred = ix._predict(k)
        assert int(np.abs(pred - np.arange(len(k))).max()) <= eps


def test_lookup_exact_present_and_absent():
    k = _keys(50_000, seed=1)
    ix = PLIndex(k, eps=16)
    rng = np.random.RandomState(2)
    probes = np.concatenate(
        [k[rng.randint(0, len(k), 2000)], rng.randint(0, 1 << 40, 2000).astype(np.int64)]
    )
    got = ix.lookup(probes, k)
    exp = np.searchsorted(k, probes)
    assert (got == exp).all()


def test_fewer_segments_with_larger_eps_and_tiny_size():
    k = _keys()
    tight, loose = PLIndex(k, eps=4), PLIndex(k, eps=128)
    assert loose.n_segments <= tight.n_segments
    # a few float triples per segment — orders below an offsets array
    assert loose.nbytes < k.nbytes / 20


def test_linear_keys_collapse_to_one_segment():
    k = np.arange(0, 1_000_000, 7, dtype=np.int64)
    ix = PLIndex(k, eps=4)
    assert ix.n_segments == 1
    probes = np.array([0, 7, 8, 699993, 10**7], dtype=np.int64)
    assert (ix.lookup(probes, k) == np.searchsorted(k, probes)).all()


def test_duplicates_and_validation():
    k = np.sort(np.array([5, 5, 5, 9, 9, 12] * 10, dtype=np.int64))
    ix = PLIndex(k, eps=8)
    probes = np.array([4, 5, 6, 9, 12, 13], dtype=np.int64)
    assert (ix.lookup(probes, k) == np.searchsorted(k, probes)).all()
    with pytest.raises(ValueError):
        PLIndex(np.array([3, 1], dtype=np.int64))
    with pytest.raises(ValueError):
        PLIndex(np.empty(0, dtype=np.int64))


def test_high_magnitude_and_tight_gap_keys():
    """Reviewer-reproduced crashes: snowflake-style high-base dense keys
    and adjacent huge keys must build and look up exactly (the fit is
    segment-relative, so |key| magnitude cannot eat the eps bound)."""
    rng = np.random.RandomState(7)
    base = np.int64(1) << 60
    k = np.sort(np.unique(base + rng.randint(0, 100_000, 20_000).astype(np.int64)))
    ix = PLIndex(k, eps=16)
    pred = ix._predict(k)
    uk, first = np.unique(k, return_index=True)
    assert int(np.abs(ix._predict(uk) - first).max()) <= 16
    probes = np.concatenate([k[::97], k[::89] + 1])
    assert (ix.lookup(probes, k) == np.searchsorted(k, probes)).all()
    # adjacent int64 keys at huge magnitude (gap far below float64 ulp of the key)
    k2 = base + np.arange(0, 5000, dtype=np.int64)
    ix2 = PLIndex(k2, eps=4)
    assert ix2.n_segments == 1
    assert (ix2.lookup(k2[::37], k2) == np.searchsorted(k2, k2[::37])).all()
