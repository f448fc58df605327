"""Minimal perfect hash — bijectivity, size, determinism, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.mph import MinimalPerfectHash


def _keys(n=100_000, seed=0):
    rng = np.random.RandomState(seed)
    return np.unique(rng.randint(0, 2**62, n).astype(np.int64)).astype(np.uint64)


def test_bijection_onto_0_n():
    for n in (1, 17, 1000, 100_000):
        keys = _keys(n, seed=n)
        m = MinimalPerfectHash(keys)
        slots = m.lookup(keys)
        assert slots.min() == 0 and slots.max() == len(keys) - 1
        assert len(np.unique(slots)) == len(keys)


def test_minimal_size():
    m = MinimalPerfectHash(_keys())
    assert m.bits_per_key < 5.0  # ~3.3 at gamma=2, far below any stored-key map
    tight = MinimalPerfectHash(_keys(), gamma=1.2)
    assert tight.bits_per_key < m.bits_per_key  # smaller gamma, smaller table


def test_deterministic_and_serializable():
    keys = _keys(20_000, seed=3)
    a = MinimalPerfectHash(keys)
    b = MinimalPerfectHash(keys.copy())
    assert (a.lookup(keys) == b.lookup(keys)).all()
    rt = MinimalPerfectHash.from_bytes(a.to_bytes())
    assert (rt.lookup(keys) == a.lookup(keys)).all()


def test_static_dictionary_composition():
    """MPH + parallel value array = collision-free static dictionary."""
    keys = _keys(10_000, seed=4)
    m = MinimalPerfectHash(keys)
    values = np.arange(len(keys)) * 7
    table = np.empty(len(keys), dtype=np.int64)
    table[m.lookup(keys)] = values
    probe = keys[::13]
    assert (table[m.lookup(probe)] == values[::13]).all()


def test_nonmember_lookup_is_bounded_or_minus_one():
    keys = _keys(10_000, seed=5)
    m = MinimalPerfectHash(keys)
    rng = np.random.RandomState(6)
    fresh = rng.randint(0, 2**62, 10_000).astype(np.int64).astype(np.uint64)
    got = m.lookup(fresh)
    assert ((got == -1) | ((got >= 0) & (got < m.n))).all()
