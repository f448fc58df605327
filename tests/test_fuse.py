"""BinaryFuse8 — no-FN contract, FPR bound, size vs Xor8, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.fuse import BinaryFuse8
from perfect_bloomfilter_ray.state.xorfilter import Xor8


def _keys(rng, n):
    return rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives():
    rng = np.random.RandomState(1)
    for n in (1, 7, 1000, 100_000):
        keys = _keys(rng, n)
        f = BinaryFuse8(keys)
        assert f.contains(keys).all()


def test_fpr_near_1_over_256():
    rng = np.random.RandomState(2)
    f = BinaryFuse8(_keys(rng, 100_000))
    fresh = _keys(rng, 200_000)
    fpr = f.contains(fresh).mean()
    assert fpr < 3 / 256  # expected ~1/256


def test_smaller_than_xor8_at_scale():
    rng = np.random.RandomState(3)
    keys = _keys(rng, 200_000)
    fuse, xor = BinaryFuse8(keys), Xor8(keys)
    xor_bits = 8.0 * len(xor.cells) / xor.n
    assert fuse.bits_per_key < xor_bits  # the paper's headline claim
    assert fuse.bits_per_key < 10.0


def test_positions_in_distinct_segments():
    rng = np.random.RandomState(4)
    f = BinaryFuse8(_keys(rng, 50_000))
    h = _keys(rng, 10_000)
    p0, p1, p2 = f._positions(h)
    cap = f.seg_count_len + 2 * f.seg_len
    for p in (p0, p1, p2):
        assert p.min() >= 0 and p.max() < cap
    sl = f.seg_len
    assert ((p1 // sl) == (p0 // sl) + 1).all()
    assert ((p2 // sl) == (p0 // sl) + 2).all()


def test_state_roundtrip_and_empty():
    rng = np.random.RandomState(5)
    keys = _keys(rng, 5_000)
    f = BinaryFuse8(keys)
    rt = BinaryFuse8.from_state(f.to_state())
    assert rt.contains(keys).all()
    probe = _keys(rng, 5_000)
    assert (rt.contains(probe) == f.contains(probe)).all()
    empty = BinaryFuse8(np.empty(0, np.uint64))
    assert not empty.contains(keys).any()


def test_deterministic_build():
    rng = np.random.RandomState(6)
    keys = _keys(rng, 20_000)
    a, b = BinaryFuse8(keys), BinaryFuse8(keys.copy())
    assert a.seed == b.seed
    assert (a.cells == b.cells).all()
