"""RoaringBitmap — exactness, container flips, merge laws, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.roaring import (
    RoaringBitmap,
    _ARRAY_MAX,
    _bitmap_members,
    _to_bitmap,
)


def _bm(values) -> RoaringBitmap:
    b = RoaringBitmap()
    b.update_column(np.asarray(values, dtype=np.int64))
    return b


def test_exact_membership_and_cardinality():
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1 << 40, size=50_000).astype(np.int64)
    b = _bm(vals)
    uniq = np.unique(vals)
    assert b.cardinality() == len(uniq)
    assert b.contains(uniq).all()
    fresh = rng.randint(0, 1 << 40, size=50_000).astype(np.int64)
    expected = np.isin(fresh, uniq)
    assert (b.contains(fresh) == expected).all()  # EXACT: no false positives


def test_container_flip_array_to_bitmap():
    # one chunk, cardinality crossing _ARRAY_MAX flips to the 8 KB bitmap
    lo = np.arange(_ARRAY_MAX + 100, dtype=np.int64)
    b = _bm(lo)
    (chunk,) = b.chunks.values()
    assert chunk.dtype == np.uint64  # bitmap container
    assert b.cardinality() == _ARRAY_MAX + 100
    assert b.contains(lo).all()
    # incremental updates crossing the boundary flip too
    b2 = _bm(np.arange(4000, dtype=np.int64))
    assert next(iter(b2.chunks.values())).dtype == np.uint16
    b2.update_column(np.arange(3000, 8000, dtype=np.int64))
    assert next(iter(b2.chunks.values())).dtype == np.uint64
    assert b2.cardinality() == 8000


def test_bitmap_members_roundtrip():
    lo = np.sort(np.random.RandomState(0).choice(1 << 16, size=9000, replace=False)).astype(np.uint16)
    assert (_bitmap_members(_to_bitmap(lo)) == lo).all()


def test_merge_laws_and_idempotence():
    rng = np.random.RandomState(7)
    a_v = rng.randint(0, 1 << 20, size=10_000).astype(np.int64)
    b_v = rng.randint(0, 1 << 20, size=10_000).astype(np.int64)
    union = np.union1d(a_v, b_v)
    ab = _bm(a_v).merge(_bm(b_v))
    ba = _bm(b_v).merge(_bm(a_v))
    assert ab.cardinality() == ba.cardinality() == len(union)
    assert (ab.to_array() == union).all()
    assert (ba.to_array() == union).all()
    again = ab.merge(_bm(a_v))  # idempotent
    assert again.cardinality() == len(union)


def test_and_cardinality_mixed_containers():
    rng = np.random.RandomState(11)
    a_v = rng.choice(1 << 16, size=10_000, replace=False).astype(np.int64)  # bitmap
    b_v = rng.choice(1 << 16, size=2_000, replace=False).astype(np.int64)  # array
    a, b = _bm(a_v), _bm(b_v)
    exact = len(np.intersect1d(a_v, b_v))
    assert a.and_cardinality(b) == exact
    assert b.and_cardinality(a) == exact
    assert a.and_cardinality(a) == a.cardinality()


def test_serialization_roundtrip_and_negative_rejects():
    b = _bm([1, 2, 65_536 * 3 + 5, 1 << 50])
    rt = RoaringBitmap.from_bytes(b.to_bytes())
    assert (rt.to_array() == b.to_array()).all()
    with pytest.raises(ValueError):
        _bm([-1])


def test_empty():
    b = RoaringBitmap()
    assert b.cardinality() == 0
    assert not b.contains(np.array([0, 1], np.int64)).any()
    assert b.and_cardinality(_bm([1])) == 0
    assert len(b.to_array()) == 0
