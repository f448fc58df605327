"""Golomb-compressed set: contract, FPR, size, codec roundtrip."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.gcs import GolombSet, _map_to_range


def _u64(rng, n):
    return (rng.randint(0, 1 << 32, n).astype(np.uint64) << np.uint64(32)) | rng.randint(
        0, 1 << 32, n
    ).astype(np.uint64)


def test_no_false_negatives():
    rng = np.random.RandomState(1)
    keys = _u64(rng, 50_000)
    g = GolombSet(keys, p=9)
    assert g.contains(keys).all()


def test_fpr_near_two_to_minus_p():
    rng = np.random.RandomState(2)
    keys = _u64(rng, 80_000)
    g = GolombSet(keys, p=10)
    fresh = _u64(rng, 300_000)
    fresh = fresh[~np.isin(fresh, keys)]
    fpr = g.contains(fresh).mean()
    assert fpr < 3 * 2**-10
    assert fpr > 0  # sanity: the measurement has power


def test_size_near_entropy_optimal():
    rng = np.random.RandomState(3)
    g = GolombSet(_u64(rng, 100_000), p=10)
    # p + ~1.6 overhead bits; Bloom at the same FPR needs 1.44*p = 14.4
    assert g.bits_per_key < 10 + 2.2
    assert g.bits_per_key > 10.0


def test_codec_roundtrip_exact():
    rng = np.random.RandomState(4)
    g = GolombSet(_u64(rng, 10_000), p=8)
    g2 = GolombSet.from_state(g.to_state())
    assert np.array_equal(g._vals, g2._vals)
    assert g2.n == g.n and g2.n_range == g.n_range


def test_empty_and_tiny():
    g = GolombSet(np.empty(0, np.uint64), p=8)
    assert not g.contains(np.array([1, 2], np.uint64)).any()
    g1 = GolombSet(np.array([42], np.uint64), p=8)
    assert g1.contains(np.array([42], np.uint64)).all()
    g1b = GolombSet.from_state(g1.to_state())
    assert g1b.contains(np.array([42], np.uint64)).all()


def test_map_to_range_bounds():
    rng = np.random.RandomState(5)
    h = _u64(rng, 10_000)
    v = _map_to_range(h, 1000)
    assert v.min() >= 0 and v.max() < 1000


def test_invalid_p():
    with pytest.raises(ValueError):
        GolombSet(np.empty(0, np.uint64), p=1)


def test_map_to_range_wide_range_exact():
    # n_range >= 2^32 needs the full 64x64->high-64 multiply: the
    # two-halves-of-h shortcut wraps a*m and collapses values into
    # [0, 2^32). Compare against Python bignum ground truth.
    rng = np.random.RandomState(11)
    h = _u64(rng, 2_000)
    for n_range in (2**33, (1 << 40) + 12345, (1 << 63) + 7):
        got = _map_to_range(h, n_range)
        exp = np.array([(int(x) * n_range) >> 64 for x in h], np.uint64)
        assert (got == exp).all()
    # advisor's concrete case: h=2^63, n_range=2^33 -> exactly 2^32
    one = _map_to_range(np.array([2**63], np.uint64), 2**33)
    assert int(one[0]) == 2**32
