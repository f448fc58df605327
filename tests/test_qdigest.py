"""q-digest: rank-error bound, compression size, merge laws, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.state.qdigest import QDigest


def _rank_of(sorted_vals: np.ndarray, v: int) -> int:
    return int(np.searchsorted(sorted_vals, v, side="right"))


def _rank_ok(sorted_vals: np.ndarray, v: int, target: float, slack: float) -> bool:
    """A value is a correct q-quantile answer if the target rank falls in
    its occupied rank interval widened by the sketch's rank-error slack
    (a heavy value legitimately spans many ranks)."""
    lo = int(np.searchsorted(sorted_vals, v, side="left"))
    hi = int(np.searchsorted(sorted_vals, v, side="right"))
    return lo - slack <= target <= hi + slack


@pytest.mark.parametrize("dist", ["uniform", "zipfish", "clustered"])
def test_quantiles_within_guaranteed_rank_bound(dist):
    rng = np.random.RandomState(0)
    n = 100_000
    if dist == "uniform":
        v = rng.randint(0, 1 << 20, n)
    elif dist == "zipfish":
        v = np.minimum(rng.zipf(1.3, n), (1 << 20) - 1)
    else:
        v = (rng.choice([1000, 5000, 900_000], n) + rng.randint(0, 50, n)).astype(np.int64)
    qd = QDigest(log_universe=20, k=512)
    for i in range(0, n, 10_000):
        qd.update(v[i : i + 10_000])
    sv = np.sort(v)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = qd.quantile(q)
        assert _rank_ok(sv, est, q * n, qd.rank_bound() + 1), (dist, q, est, qd.rank_bound())


def test_size_depends_on_universe_not_n():
    rng = np.random.RandomState(1)
    qd = QDigest(log_universe=16, k=256)
    for _ in range(20):
        qd.update(rng.randint(0, 1 << 16, 50_000))
    # 3k per the digest bound (~k·log-ish slack across levels), never O(n)
    assert qd.num_nodes < 3 * 256 * 16 / 4
    assert qd.n == 20 * 50_000


def test_merge_matches_single_stream_bound_and_laws():
    rng = np.random.RandomState(2)
    v = rng.randint(0, 1 << 18, 60_000)
    whole = QDigest(18, 512)
    whole.update(v)
    a, b, c = QDigest(18, 512), QDigest(18, 512), QDigest(18, 512)
    a.update(v[:20_000])
    b.update(v[20_000:40_000])
    c.update(v[40_000:])

    def clone(x):
        return QDigest.from_bytes(x.to_bytes())

    m1 = clone(a).merge(clone(b)).merge(clone(c))
    m2 = clone(c).merge(clone(a).merge(clone(b)))
    assert m1.n == m2.n == whole.n
    sv = np.sort(v)
    for m in (m1, m2):
        for q in (0.1, 0.5, 0.9):
            assert _rank_ok(sv, m.quantile(q), q * len(v), m.rank_bound() + 1)


def test_exact_when_uncompressed():
    """n small enough that n // k == 0: nothing compresses, quantiles are
    exact discrete ranks."""
    v = np.arange(100, dtype=np.int64)
    qd = QDigest(log_universe=8, k=256)
    qd.update(v)
    assert qd.quantile(0.5) == 49
    assert qd.quantile(1.0) == 99


def test_bounds_and_errors():
    qd = QDigest(log_universe=8, k=64)
    with pytest.raises(ValueError):
        qd.update(np.array([256]))
    with pytest.raises(ValueError):
        qd.update(np.array([-1]))
    with pytest.raises(ValueError):
        qd.quantile(0.5)  # empty
    qd2 = QDigest(log_universe=9, k=64)
    qd.update(np.array([1, 2, 3]))
    with pytest.raises(ValueError):
        qd.merge(qd2)


def test_weighted_updates():
    qd = QDigest(log_universe=10, k=256)
    qd.update(np.array([10, 20]), weights=np.array([99, 1]))
    assert qd.n == 100
    assert qd.quantile(0.5) == 10
    assert qd.quantile(1.0) == 20
