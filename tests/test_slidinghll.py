"""Sliding-window HLL: window accuracy, Pareto-prune invariants, merge laws."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.state.slidinghll import SlidingHLL


def _stream(n, n_distinct, seed):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, n_distinct, n).astype(np.int64)
    ts = np.sort(rng.randint(0, 1_000_000, n)).astype(np.int64)
    return vals, ts


def test_window_estimates_track_exact():
    vals, ts = _stream(200_000, 60_000, 0)
    s = SlidingHLL(p=12)
    s.update_column(pa.array(vals), ts)
    for cutoff in (0, 400_000, 800_000, 990_000):
        live = ts >= cutoff
        exact = len(np.unique(vals[live]))
        est = s.estimate(cutoff)
        if exact == 0:
            assert est < 100
        else:
            assert abs(est - exact) / exact < 5 * s.rel_error, (cutoff, exact, est)


def test_full_window_matches_plain_hll_bound():
    vals, ts = _stream(100_000, 30_000, 1)
    s = SlidingHLL(p=12)
    s.update_column(pa.array(vals), ts)
    exact = len(np.unique(vals))
    assert abs(s.estimate() - exact) / exact < 5 * s.rel_error


def test_pareto_front_is_small_and_sound():
    vals, ts = _stream(300_000, 100_000, 2)
    s = SlidingHLL(p=10)
    for i in range(0, len(vals), 50_000):  # incremental updates prune as they go
        s.update_column(pa.array(vals[i : i + 50_000]), ts[i : i + 50_000])
    # expected front size O(log n) per register
    assert len(s.reg) < s.m * 40
    # soundness: within a register, sorting by ts desc must give strictly
    # increasing ranks (the Pareto property)
    order = np.lexsort((-s.ts, s.reg))
    reg, rank = s.reg[order], s.rank[order]
    same = reg[1:] == reg[:-1]
    assert (rank[1:][same] > rank[:-1][same]).all()


def test_merge_equals_single_stream_and_laws():
    vals, ts = _stream(120_000, 40_000, 3)
    whole = SlidingHLL(p=11)
    whole.update_column(pa.array(vals), ts)
    a, b, c = SlidingHLL(11), SlidingHLL(11), SlidingHLL(11)
    a.update_column(pa.array(vals[:40_000]), ts[:40_000])
    b.update_column(pa.array(vals[40_000:80_000]), ts[40_000:80_000])
    c.update_column(pa.array(vals[80_000:]), ts[80_000:])

    def clone(x):
        return SlidingHLL.from_bytes(x.to_bytes())

    ab_c = clone(a).merge(clone(b)).merge(clone(c))
    c_ba = clone(c).merge(clone(b).merge(clone(a)))
    for cutoff in (0, 500_000):
        assert ab_c.estimate(cutoff) == c_ba.estimate(cutoff) == whole.estimate(cutoff)


def test_query_windows_within_bound(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["sliding_hll_trailing_distinct"]("/root/testdata/sf0.001")
    bound = 5 * 1.04 / np.sqrt(1 << 12)
    for _, r in out.iterrows():
        exact = r["exact_distinct"]
        if exact >= 100:  # below that, absolute error dominates
            assert abs(r["hll_estimate"] - exact) / exact < bound, dict(r)


def test_serialization_roundtrip():
    vals, ts = _stream(10_000, 3_000, 4)
    s = SlidingHLL(p=10)
    s.update_column(pa.array(vals), ts)
    s2 = SlidingHLL.from_bytes(s.to_bytes())
    assert s2.estimate(200_000) == s.estimate(200_000)
