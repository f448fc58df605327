"""Bounded-load consistent hashing — capacity bound, determinism, disruption."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.functions.hashing import (
    bounded_load_assign,
    hash64,
    jump_hash,
)


def _hashes(n=50_000, skew=True, seed=0):
    rng = np.random.RandomState(seed)
    ids = (rng.zipf(1.2, n) % 500).astype(np.int64) if skew else np.arange(n)
    return hash64(pa.array(ids), 0x1)


def test_capacity_bound_holds_under_skew():
    h = _hashes()
    for m, lf in ((8, 1.25), (16, 1.1), (64, 1.5)):
        a = bounded_load_assign(h, m, lf)
        assert (a >= 0).all() and (a < m).all()
        cap = math.ceil(lf * len(h) / m)
        assert np.bincount(a, minlength=m).max() <= cap
    # plain jump-hash violates the same bound on this skewed input
    plain = np.bincount(jump_hash(h.astype(np.uint64), 16), minlength=16)
    assert plain.max() > math.ceil(1.1 * len(h) / 16)


def test_multiset_determinism_across_input_order():
    h = _hashes()
    rng = np.random.RandomState(1)
    perm = rng.permutation(len(h))
    a1 = bounded_load_assign(h, 16, 1.25)
    a2 = bounded_load_assign(h[perm], 16, 1.25)

    def ms(hh, aa):
        z = np.stack([hh.astype(np.int64), aa], axis=1)
        return z[np.lexsort((z[:, 1], z[:, 0]))]

    assert (ms(h, a1) == ms(h[perm], a2)).all()


def test_low_disruption_on_uniform_keys():
    h = _hashes(skew=False)
    a = bounded_load_assign(h, 16, 1.25)
    home = jump_hash(h.astype(np.uint64), 16)
    # uniform keys barely overflow: most stay on their jump-hash home shard
    assert (a != home).mean() < 0.15


def test_empty_and_tiny():
    assert len(bounded_load_assign(np.empty(0, np.uint64), 4)) == 0
    one = bounded_load_assign(np.array([42], np.uint64), 4)
    assert one[0] in range(4)
