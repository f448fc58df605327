"""Counting Bloom filter (Fan et al. 2000): no false negatives, published
FPR bound, exactly-associative merge (byte-identical state across merge
orders), and counter-subtraction deletion — the fully-mergeable deletion
path the cuckoo filter (sequential delete) cannot offer."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from perfect_bloomfilter_ray.state.countingbloom import CountingBloomFilter


def _keys(prefix, n):
    return pa.array([f"{prefix}{i}" for i in range(n)])


def test_no_false_negatives():
    keys = _keys("user", 50_000)
    f = CountingBloomFilter(50_000)
    f.update_column(keys)
    assert f.contains_column(keys).all()
    assert f.key_count == 50_000


def test_fpr_within_published_bound():
    n = 20_000
    f = CountingBloomFilter(n, bits_per_key=16, num_hashes=8)
    f.update_column(_keys("user", n))
    fresh = _keys("fresh", 200_000)
    fpr = f.contains_column(fresh).sum() / 200_000
    k, m = f.num_hashes, f.num_cells
    bound = (1.0 - np.exp(-k * n / m)) ** k
    assert fpr <= bound * 1.5, (fpr, bound)


def test_merge_is_exactly_associative_and_commutative():
    a1 = _keys("a", 5_000)
    a2 = _keys("b", 5_000)
    a3 = _keys("c", 5_000)

    def build(col):
        f = CountingBloomFilter(15_000)
        f.update_column(col)
        return f

    left = build(a1).merge(build(a2)).merge(build(a3))
    right = build(a3).merge(build(a1)).merge(build(a2))
    assert np.array_equal(left.counts, right.counts), "merge must be state-exact"
    assert left.key_count == right.key_count == 15_000


def test_subtract_deletes_exactly_and_keeps_no_fn():
    keys = _keys("k", 30_000)
    deleted = _keys("k", 10_000)  # first third
    kept = pa.array([f"k{i}" for i in range(10_000, 30_000)])
    f = CountingBloomFilter(30_000)
    f.update_column(keys)
    d = CountingBloomFilter(30_000)
    d.update_column(deleted)
    f.subtract(d)
    assert f.contains_column(kept).all(), "remaining keys must keep the no-FN guarantee"
    assert f.key_count == 20_000
    # at 48 counters/key, k=32 the residual-positive probability per deleted
    # key is ~9e-11 -> observed 0 at this scale
    assert f.contains_column(deleted).sum() == 0


def test_subtract_refuses_uninserted_keys():
    f = CountingBloomFilter(1_000)
    f.update_column(_keys("x", 1_000))
    d = CountingBloomFilter(1_000)
    d.update_column(_keys("never", 1_000))
    with pytest.raises(ValueError):
        f.subtract(d)


def test_delete_everything_restores_empty_state():
    keys = _keys("k", 5_000)
    f = CountingBloomFilter(5_000)
    f.update_column(keys)
    d = CountingBloomFilter(5_000)
    d.update_column(keys)
    f.subtract(d)
    assert (f.counts == 0).all(), "full deletion must restore the zero state"
    assert f.key_count == 0


def test_roundtrip_bytes():
    f = CountingBloomFilter(2_000)
    f.update_column(_keys("k", 2_000))
    g = CountingBloomFilter.from_bytes(f.to_bytes())
    assert np.array_equal(f.counts, g.counts)
    assert g.key_count == f.key_count


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300))
def test_property_delete_inverse_of_insert(ids):
    """insert(X) then subtract(X) is the identity on filter state, for any
    multiset X (duplicates included — counters count multiplicity)."""
    col = pa.array([f"u{i}" for i in ids])
    f = CountingBloomFilter(10_000)
    f.update_column(col)
    d = CountingBloomFilter(10_000)
    d.update_column(col)
    f.subtract(d)
    assert (f.counts == 0).all()
