"""IBLT — exact reconciliation, merge laws, overload honesty."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.iblt import IBLT


def _iblt(keys, m=4096):
    t = IBLT(m)
    t.update_column(np.asarray(keys, dtype=np.int64))
    return t


def test_exact_symmetric_difference():
    rng = np.random.RandomState(0)
    base = np.unique(rng.randint(0, 1 << 40, size=110_000).astype(np.int64))[:100_000]
    removed = base[:300]
    kept = base[300:]
    added = np.unique(rng.randint(0, 1 << 40, size=300).astype(np.int64))[:250] + (1 << 41)
    a = _iblt(base)
    b = _iblt(np.concatenate([kept, added]))
    only_a, only_b, ok = a.subtract(b).decode()
    assert ok
    assert (only_a == np.sort(removed)).all()
    assert (only_b == np.sort(added)).all()


def test_identical_sets_decode_empty():
    keys = np.arange(10_000, dtype=np.int64)
    d = _iblt(keys).subtract(_iblt(keys))
    a, r, ok = d.decode()
    assert ok and len(a) == 0 and len(r) == 0


def test_merge_is_cellwise_addition_and_commutative():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 1 << 30, 5000).astype(np.int64)
    y = rng.randint(0, 1 << 30, 5000).astype(np.int64)
    ab = _iblt(x).merge(_iblt(y))
    ba = _iblt(y).merge(_iblt(x))
    assert (ab.count == ba.count).all()
    assert (ab.key_xor == ba.key_xor).all()
    whole = _iblt(np.concatenate([x, y]))
    assert (ab.count == whole.count).all()
    assert (ab.key_xor == whole.key_xor).all()


def test_overload_reports_failure_not_partial_truth():
    rng = np.random.RandomState(2)
    a = np.unique(rng.randint(0, 1 << 30, size=5100).astype(np.int64))[:5000]
    b = np.unique(rng.randint(0, 1 << 30, size=5100).astype(np.int64))[:5000]
    # diff ~10k keys >> 64 cells: decode must say NOT ok
    _, _, ok = _iblt(a, m=64).subtract(_iblt(b, m=64)).decode()
    assert not ok


def test_delete_then_decode_and_serialization():
    keys = np.arange(1000, dtype=np.int64)
    t = _iblt(keys)
    t.delete_column(keys[:400])
    rt = IBLT.from_bytes(t.to_bytes())
    a, r, ok = rt.decode()
    assert ok
    assert (a == np.arange(400, 1000)).all()
    assert len(r) == 0


def test_size_mismatch_raises():
    with pytest.raises(ValueError):
        IBLT(1024).merge(IBLT(2048))
    with pytest.raises(ValueError):
        IBLT(1024).subtract(IBLT(2048))
