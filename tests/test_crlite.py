"""CRLite cascade — exactness inside the universe, size, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.crlite import CRLiteCascade


def _sets(n=100_000, frac=0.1, seed=0):
    rng = np.random.RandomState(seed)
    uni = np.unique(rng.randint(0, 2**62, n).astype(np.int64)).astype(np.uint64)
    mem = uni[rng.rand(len(uni)) < frac]
    return mem, uni


def test_exact_inside_universe():
    mem, uni = _sets()
    c = CRLiteCascade(mem, uni)
    got = c.contains(uni)
    exp = np.isin(uni, mem)
    assert (got == exp).all()  # FP = FN = 0 within U


@pytest.mark.parametrize("frac", [0.01, 0.5, 0.99])
def test_exact_across_densities(frac):
    mem, uni = _sets(n=20_000, frac=frac, seed=3)
    c = CRLiteCascade(mem, uni)
    assert (c.contains(uni) == np.isin(uni, mem)).all()


def test_size_constant_in_keyspace_not_universe_scale():
    mem, uni = _sets()
    c = CRLiteCascade(mem, uni)
    bits_per_member = 8 * c.nbytes / max(len(mem), 1)
    assert bits_per_member < 40  # O(|S|) bits, independent of 2^62 key space


def test_serialization_and_edge_cases():
    mem, uni = _sets(n=5_000)
    c = CRLiteCascade(mem, uni)
    rt = CRLiteCascade.from_bytes(c.to_bytes())
    assert (rt.contains(uni) == c.contains(uni)).all()
    # empty member set and full member set
    all_out = CRLiteCascade(np.empty(0, np.uint64), uni)
    assert not all_out.contains(uni).any()
    all_in = CRLiteCascade(uni, uni)
    assert all_in.contains(uni).all()
    with pytest.raises(ValueError):
        CRLiteCascade(np.array([1, 2], np.uint64), np.array([1], np.uint64))
