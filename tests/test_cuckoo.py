"""Cuckoo filter (Fan et al. 2014) conformance: no false negatives, bounded
false positives, merge-order membership invariance, and DELETION — the
capability the reference's add-only Bloom tiers cannot express."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from perfect_bloomfilter_ray import CuckooFilter
from perfect_bloomfilter_ray.state.cuckoo import CuckooCapacityError


def _keys(prefix, n):
    return pa.array([f"{prefix}{i}" for i in range(n)])


def test_insert_contains_no_false_negatives():
    keys = _keys("user", 100_000)
    f = CuckooFilter.for_capacity(100_000)
    f.insert_column(keys)
    assert f.contains_column(keys).all()
    assert f.key_count == 100_000


def test_false_positive_rate_within_bound():
    f = CuckooFilter.for_capacity(100_000)
    f.insert_column(_keys("user", 100_000))
    fresh = _keys("fresh", 200_000)
    fpr = f.contains_column(fresh).sum() / 200_000
    assert fpr <= f.fpr_bound * 1.5, (fpr, f.fpr_bound)


def test_delete_all_empties_the_table():
    keys = _keys("k", 50_000)
    f = CuckooFilter.for_capacity(50_000)
    f.insert_column(keys)
    ok = f.delete_column(keys)
    assert ok.all(), "every inserted key must be deletable (no FN)"
    assert (f.buckets == 0).all(), "deleting every key must empty the table"
    assert not f.contains_column(keys).any()
    assert f.key_count == 0


def test_delete_half_keeps_other_half():
    keys = _keys("k", 20_000)
    f = CuckooFilter.for_capacity(20_000)
    f.insert_column(keys)
    evens = pa.array([f"k{i}" for i in range(0, 20_000, 2)])
    odds = pa.array([f"k{i}" for i in range(1, 20_000, 2)])
    assert f.delete_column(evens).all()
    assert f.contains_column(odds).all(), "deletes must not disturb other keys"


def test_merge_membership_invariant_any_order():
    a_keys, b_keys, c_keys = _keys("a", 7000), _keys("b", 5000), _keys("c", 3000)

    def build(keys):
        f = CuckooFilter.for_capacity(20_000)
        f.insert_column(keys)
        return f

    left = build(a_keys).merge(build(b_keys)).merge(build(c_keys))
    m2 = build(b_keys).merge(build(c_keys))
    right = build(a_keys).merge(m2)
    allk = pa.array([k.as_py() for k in a_keys] + [k.as_py() for k in b_keys] + [k.as_py() for k in c_keys])
    assert left.contains_column(allk).all()
    assert right.contains_column(allk).all()
    assert left.key_count == right.key_count == 15_000


def test_serialization_roundtrip():
    f = CuckooFilter.for_capacity(10_000)
    f.insert_column(_keys("x", 10_000))
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert np.array_equal(f.buckets, g.buckets)
    assert g.key_count == f.key_count
    assert g.contains_column(_keys("x", 10_000)).all()


def test_capacity_error_on_overfill():
    f = CuckooFilter(64)  # 256 slots
    with pytest.raises(CuckooCapacityError):
        f.insert_column(_keys("y", 1000))


def test_geometry_validation():
    with pytest.raises(ValueError):
        CuckooFilter(100)  # not a power of two
    with pytest.raises(ValueError):
        CuckooFilter.for_capacity(100).merge(CuckooFilter.for_capacity(100_000))


@settings(max_examples=20, deadline=None)
@given(
    keys=st.lists(st.binary(min_size=1, max_size=32), min_size=1, max_size=300, unique=True),
    cut=st.integers(0, 299),
)
def test_property_insert_delete_roundtrip(keys, cut):
    cut = min(cut, len(keys) - 1)
    f = CuckooFilter.for_capacity(4096)
    col = pa.array(keys, pa.binary())
    f.insert_column(col)
    assert f.contains_column(col).all()
    dels = pa.array(keys[:cut], pa.binary()) if cut else None
    if dels is not None and cut:
        assert f.delete_column(dels).all()
        keep = pa.array(keys[cut:], pa.binary())
        assert f.contains_column(keep).all()
