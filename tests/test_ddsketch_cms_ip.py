"""Round-3b additions: DDSketch relative-error quantiles + CMS inner-product
join-size estimation. No Ray needed — pure sketch-state tests."""

import collections

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from perfect_bloomfilter_ray import CountMinSketch, DDSketch


# ---------------------------------------------------------------------------
# DDSketch
# ---------------------------------------------------------------------------


def test_ddsketch_relative_error_bound():
    rng = np.random.default_rng(42)
    data = rng.lognormal(mean=3.0, sigma=2.0, size=200_000)
    s = DDSketch(alpha=0.01)
    s.update_column(data)
    srt = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
        est = s.quantile(q)
        true = srt[int(q * (len(srt) - 1))]
        assert abs(est - true) <= s.alpha * abs(true) * 1.0001, (q, est, true)


def test_ddsketch_zero_and_negative():
    vals = np.array([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0])
    s = DDSketch(alpha=0.01)
    s.update_column(vals)
    assert s.n == 6 and s.zero_count == 2
    # median of 6 values at rank 2.5 -> the first zero bucket
    assert s.quantile(0.5) == 0.0
    assert abs(s.quantile(0.0) + 100.0) <= 1.0 + 0.01 * 100
    assert abs(s.quantile(1.0) - 100.0) <= 1.0 + 0.01 * 100
    # negative estimates keep the relative bound too
    q1 = s.quantile(1.0 / 5.0)  # rank 1 -> -1.0
    assert abs(q1 + 1.0) <= 0.011


def test_ddsketch_serialization_roundtrip():
    rng = np.random.default_rng(7)
    s = DDSketch(alpha=0.02, max_bins=64)
    s.update_column(rng.lognormal(size=10_000))
    s2 = DDSketch.from_bytes(s.to_bytes())
    assert s.state_equal(s2)
    assert s.quantiles([0.5, 0.9]) == s2.quantiles([0.5, 0.9])


def test_ddsketch_collapse_bounds_memory_keeps_upper_quantiles():
    rng = np.random.default_rng(3)
    # 12 decades of magnitude -> ~1380 natural buckets at alpha=0.01
    data = 10.0 ** rng.uniform(-6, 6, size=100_000)
    s = DDSketch(alpha=0.01, max_bins=512)
    s.update_column(data)
    # 512 bins at ~115 buckets/decade keep the TOP ~4.4 decades: quantiles
    # above 1 - 4.4/12 ~ 0.64 keep the alpha guarantee, lower ones collapse
    assert len(s.pos) <= 512
    srt = np.sort(data)
    for q in (0.7, 0.9, 0.99, 0.999):
        true = srt[int(q * (len(srt) - 1))]
        assert abs(s.quantile(q) - true) <= s.alpha * true * 1.0001
    # collapsed low quantile degrades but stays inside the kept range
    assert s.quantile(0.01) >= srt[0]


float_lists = st.lists(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, width=64),
    min_size=0,
    max_size=150,
)


@settings(max_examples=40, deadline=None)
@given(a=float_lists, b=float_lists, c=float_lists)
def test_ddsketch_merge_exactly_associative_commutative(a, b, c):
    def mk(chunks):
        out = []
        for ch in chunks:
            s = DDSketch(alpha=0.01, max_bins=512)
            if ch:
                s.update_column(np.array(ch, dtype=np.float64))
            out.append(s)
        return out

    p1, p2, p3 = mk([a, b, c])
    left = p1.merge(p2).merge(p3)
    q1, q2, q3 = mk([a, b, c])
    right = q1.merge(q2.merge(q3))
    assert left.state_equal(right)
    r1, r2 = mk([a, b])
    s1, s2 = mk([a, b])
    assert r1.merge(r2).state_equal(s2.merge(s1))


# ---------------------------------------------------------------------------
# CMS inner product (join-size estimation)
# ---------------------------------------------------------------------------


def _exact_join_size(a_keys, b_keys) -> int:
    ca, cb = collections.Counter(a_keys), collections.Counter(b_keys)
    return sum(n * cb.get(k, 0) for k, n in ca.items())


def test_cms_inner_product_dense_bound():
    rng = np.random.default_rng(11)
    a_keys = [f"u{int(z)}" for z in rng.zipf(1.4, 60_000)]
    b_keys = [f"u{int(z)}" for z in rng.zipf(1.6, 40_000)]
    a = CountMinSketch(eps=1e-2, delta=1e-2)
    b = CountMinSketch(eps=1e-2, delta=1e-2)
    a.update_column(pa.array(a_keys))
    b.update_column(pa.array(b_keys))
    assert a._sparse_h is None, "test should exercise the dense path"
    exact = _exact_join_size(a_keys, b_keys)
    est = a.inner_product(b)
    assert est >= exact, "inner product must never underestimate"
    assert est <= exact + a.eps * a.total * b.total


def test_cms_inner_product_sparse_exact():
    a = CountMinSketch(eps=1e-4, delta=1e-3)
    b = CountMinSketch(eps=1e-4, delta=1e-3)
    a_keys = ["x", "x", "y", "z"]
    b_keys = ["x", "y", "y", "w"]
    a.update_column(pa.array(a_keys))
    b.update_column(pa.array(b_keys))
    assert a._sparse_h is not None and b._sparse_h is not None
    assert a.inner_product(b) == _exact_join_size(a_keys, b_keys) == 4


def test_cms_inner_product_mixed_phase_and_symmetry():
    rng = np.random.default_rng(5)
    a_keys = [f"u{int(z)}" for z in rng.zipf(1.5, 30_000)]
    b_keys = ["u1", "u2", "u3", "u1"]
    a = CountMinSketch(eps=1e-2, delta=1e-2)
    b = CountMinSketch(eps=1e-2, delta=1e-2)
    a.update_column(pa.array(a_keys))
    b.update_column(pa.array(b_keys))
    assert a._sparse_h is None and b._sparse_h is not None
    exact = _exact_join_size(a_keys, b_keys)
    est_ab, est_ba = a.inner_product(b), b.inner_product(a)
    for est in (est_ab, est_ba):
        assert est >= exact
        assert est <= exact + a.eps * a.total * b.total
    # non-mutating: both sketches still answer point queries afterwards
    assert b._sparse_h is not None
    assert a.estimate_column(pa.array(["u1"]))[0] >= collections.Counter(a_keys)["u1"]


def test_cms_inner_product_geometry_mismatch():
    import pytest

    a = CountMinSketch(eps=1e-2, delta=1e-2)
    b = CountMinSketch(eps=1e-3, delta=1e-2)
    with pytest.raises(ValueError):
        a.inner_product(b)
