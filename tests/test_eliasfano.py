"""Elias-Fano — exact roundtrip, succinct size, successor/membership."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.eliasfano import EliasFano


def _vals(n=50_000, u=1 << 30, seed=0):
    rng = np.random.RandomState(seed)
    return np.unique(rng.randint(0, u, n).astype(np.int64))


def test_access_roundtrip_exact():
    v = _vals()
    ef = EliasFano(v)
    assert (ef.access(np.arange(len(v))) == v).all()
    idx = np.random.RandomState(1).randint(0, len(v), 5000)
    assert (ef.access(idx) == v[idx]).all()


def test_size_near_theoretical_bound():
    v = _vals()
    ef = EliasFano(v)
    n, u = len(v), int(v[-1]) + 1
    bound = 2 + np.ceil(np.log2(u / n))
    assert ef.bits_per_key <= bound + 1.0  # within a byte-rounding of theory
    assert ef.bits_per_key < 64 / 2  # far below raw int64


def test_next_geq_and_contains():
    v = _vals(5_000, seed=2)
    ef = EliasFano(v)
    rng = np.random.RandomState(3)
    probes = rng.randint(0, int(v[-1]) + 10, 5000).astype(np.int64)
    exp_pos = np.searchsorted(v, probes)
    exp = np.where(exp_pos < len(v), v[np.minimum(exp_pos, len(v) - 1)], -1)
    assert (ef.next_geq(probes) == exp).all()
    assert ef.contains(v[::7]).all()
    absent = v[:-1] + 1
    absent = absent[~np.isin(absent, v)]
    assert not ef.contains(absent).any()


def test_serialization_and_validation():
    v = _vals(2_000, seed=4)
    ef = EliasFano(v)
    rt = EliasFano.from_bytes(ef.to_bytes())
    assert (rt.access(np.arange(len(v))) == v).all()
    with pytest.raises(ValueError):
        EliasFano(np.array([3, 3], dtype=np.int64))  # not strictly increasing
    with pytest.raises(ValueError):
        EliasFano(np.array([], dtype=np.int64))
    with pytest.raises(ValueError):
        EliasFano(np.array([-1, 4], dtype=np.int64))


def test_dense_and_sparse_regimes():
    dense = np.arange(0, 10_000, dtype=np.int64)  # u/n = 1 -> l = 0
    ef = EliasFano(dense)
    assert ef.l == 0
    assert (ef.access(np.arange(len(dense))) == dense).all()
    sparse = np.unique(np.random.RandomState(5).randint(0, 1 << 50, 1000).astype(np.int64))
    ef2 = EliasFano(sparse)
    assert (ef2.access(np.arange(len(sparse))) == sparse).all()
