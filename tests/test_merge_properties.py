"""Merge associativity/commutativity property tests (hypothesis) — FIXTURES.md F3.

Ray's AggregateFnV2.combine tree is pairwise and order-nondeterministic, so
these properties are load-bearing, not decorative (SURVEY §7 hard part (e)):
- Bloom (capacity-planned) / HLL / CMS: merge is *state-exact* associative +
  commutative. Capacity-planned is the distributed-build contract
  (BloomCascade.for_capacity): a cascade whose layers ROLL OVER mid-stream
  assigns keys to layers by arrival order — like the reference's rehash
  timing (filter.rs:104-112) — so exact state equality cannot survive
  arbitrary merge orders; what growth preserves instead is membership (no
  false negatives) + the FPR bound, asserted separately below.
- KLL / t-digest: internal state is merge-order-dependent by design; their
  property is estimate-stability — any merge tree's quantiles stay within the
  sketch's rank-error bound of the exact answer.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from perfect_bloomfilter_ray import (
    BloomCascade,
    BloomConfig,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    TDigest,
    ThetaSketch,
)

key_lists = st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=200)


def _mk(factory, chunks):
    parts = []
    for chunk in chunks:
        s = factory()
        if len(chunk):
            s.update_column(pa.array(chunk, pa.binary()))
        parts.append(s)
    return parts


@settings(max_examples=25, deadline=None)
@given(a=key_lists, b=key_lists, c=key_lists)
def test_exact_state_merge_properties(a, b, c):
    for factory in (
        # capacity-planned: no layer rollover inside the test inputs (the
        # distributed-build contract; growth-path properties tested below)
        lambda: BloomCascade.for_capacity(1024, BloomConfig()),
        lambda: HyperLogLog(8),
        lambda: CountMinSketch(1e-2, 1e-2),
        lambda: ThetaSketch(64),
    ):
        # associativity: (a+b)+c == a+(b+c)
        p1, p2, p3 = _mk(factory, [a, b, c])
        left = p1.merge(p2).merge(p3)
        q1, q2, q3 = _mk(factory, [a, b, c])
        right = q2.merge(q3)
        right = q1.merge(right)
        assert left.state_equal(right)
        # commutativity: a+b == b+a
        r1, r2 = _mk(factory, [a, b])
        s1, s2 = _mk(factory, [a, b])
        assert r1.merge(r2).state_equal(s2.merge(s1))


@settings(max_examples=25, deadline=None)
@given(a=key_lists, b=key_lists, c=key_lists)
def test_growing_cascade_merge_membership_invariant(a, b, c):
    """A cascade that rolls layers mid-stream is NOT state-equal across merge
    orders (layer assignment follows arrival order, like the reference's
    rehash timing) — but every merge order must answer membership identically
    on the inserted keys (no false negatives) and keep the same key_count."""
    factory = lambda: BloomCascade(BloomConfig(initial_bits=1 << 10))  # noqa: E731
    p1, p2, p3 = _mk(factory, [a, b, c])
    left = p1.merge(p2).merge(p3)
    q1, q2, q3 = _mk(factory, [a, b, c])
    right = q1.merge(q2.merge(q3))
    assert left.key_count == right.key_count == len(a) + len(b) + len(c)
    all_keys = a + b + c
    if all_keys:
        col = pa.array(all_keys, pa.binary())
        assert left.contains_column(col).all()
        assert right.contains_column(col).all()


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=30, max_size=400),
    cut1=st.integers(1, 28),
    cut2=st.integers(2, 29),
)
def test_quantile_sketch_merge_tree_invariance(data, cut1, cut2):
    lo = min(cut1, len(data) - 2)
    hi = min(cut2, len(data) - 1)
    lo, hi = min(lo, hi), max(lo, hi)
    if lo == hi:
        hi += 1
    chunks = [np.array(data[:lo]), np.array(data[lo:hi]), np.array(data[hi:])]
    srt = np.sort(np.array(data))

    for factory, rank_tol in ((lambda: KLLSketch(128), 0.15), (lambda: TDigest(100), 0.15)):
        for order in ((0, 1, 2), (2, 0, 1)):
            parts = _mk_f(factory, [chunks[i] for i in order])
            m = parts[0].merge(parts[1]).merge(parts[2])
            for q in (0.25, 0.5, 0.75):
                v = m.quantile(q)
                true_rank = np.searchsorted(srt, v, side="right") / len(srt)
                lo_rank = np.searchsorted(srt, v, side="left") / len(srt)
                # v's rank interval must be within tol of q (small-n: coarse tol)
                assert lo_rank - rank_tol <= q <= true_rank + rank_tol


def _mk_f(factory, chunks):
    parts = []
    for chunk in chunks:
        s = factory()
        if len(chunk):
            s.update_column(chunk)
        parts.append(s)
    return parts


@settings(max_examples=25, deadline=None)
@given(a=key_lists, b=key_lists, c=key_lists)
def test_misra_gries_merge_bound_invariant(a, b, c):
    """Misra-Gries state is merge-order-dependent (trim timing), but every
    merge tree must keep the mergeable-summaries guarantee: estimates are
    under-counts by at most the tracked err, and err <= total/(m+1)."""
    from collections import Counter

    from perfect_bloomfilter_ray import MisraGries

    m = 16
    factory = lambda: MisraGries(m)  # noqa: E731
    truth = Counter(a) + Counter(b) + Counter(c)
    total = sum(truth.values())

    p1, p2, p3 = _mk(factory, [a, b, c])
    left = p1.merge(p2).merge(p3)
    q1, q2, q3 = _mk(factory, [a, b, c])
    right = q1.merge(q2.merge(q3))

    for s in (left, right):
        assert s.total == total
        assert s.err <= total // (m + 1)
        for key, true_n in truth.items():
            est = s.estimate(key)
            assert est <= true_n
            assert true_n - est <= s.err
        # guarantee: anything heavier than total/(m+1) is retained
        for key, true_n in truth.items():
            if true_n > total / (m + 1):
                assert s.estimate(key) > 0
