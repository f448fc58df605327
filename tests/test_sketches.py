"""Error-bound tests for HLL / CMS / KLL / t-digest vs exact numpy oracles."""

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray import CountMinSketch, HyperLogLog, KLLSketch, TDigest


def test_hll_error_within_3_sigma():
    for true_n in (100, 10_000, 200_000):
        h = HyperLogLog(p=12)
        h.update_column(pa.array([f"k{i}" for i in range(true_n)]))
        est = h.estimate()
        assert abs(est - true_n) <= 3 * h.rel_error * true_n + 3, (true_n, est)


def test_hll_duplicates_do_not_change_estimate():
    h1 = HyperLogLog(12)
    h1.update_column(pa.array([f"k{i}" for i in range(1000)]))
    h2 = HyperLogLog(12)
    h2.update_column(pa.array([f"k{i % 1000}" for i in range(10_000)]))
    assert h1.state_equal(h2)


def test_cms_overestimates_within_eps_n():
    rng = np.random.default_rng(7)
    # zipf-ish frequencies
    keys = [f"u{int(z)}" for z in rng.zipf(1.3, 50_000)]
    c = CountMinSketch(eps=1e-3, delta=1e-3)
    c.update_column(pa.array(keys))
    import collections

    exact = collections.Counter(keys)
    probes = [k for k, _ in exact.most_common(50)]
    est = c.estimate_column(pa.array(probes))
    for k, e in zip(probes, est):
        assert e >= exact[k], "CMS must never underestimate"
        assert e <= exact[k] + c.eps * c.total, "CMS overshoot beyond eps*N"


def test_kll_rank_error():
    rng = np.random.default_rng(1)
    data = rng.lognormal(3, 1, 300_000)
    s = KLLSketch(k=200)
    for chunk in np.array_split(data, 10):
        s.update_column(chunk)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        v = s.quantile(q)
        true_rank = np.searchsorted(srt, v) / len(srt)
        assert abs(true_rank - q) < 0.02, (q, v, true_rank)


def test_tdigest_rank_error_tail_accurate():
    rng = np.random.default_rng(2)
    data = rng.normal(0, 1, 300_000)
    t = TDigest(200)
    for chunk in np.array_split(data, 7):
        t.update_column(chunk)
    srt = np.sort(data)
    for q, tol in ((0.001, 0.002), (0.01, 0.005), (0.5, 0.02), (0.99, 0.005), (0.999, 0.002)):
        v = t.quantile(q)
        true_rank = np.searchsorted(srt, v) / len(srt)
        assert abs(true_rank - q) < tol, (q, v, true_rank)


def test_tdigest_extremes_exact():
    t = TDigest(100)
    data = np.arange(10_000, dtype=float)
    t.update_column(data)
    assert t.quantile(0.0) == 0.0
    assert t.quantile(1.0) == 9999.0


def test_serialization_roundtrips():
    data = np.random.default_rng(3).normal(size=5000)
    keys = pa.array([f"k{i}" for i in range(5000)])
    sketches = []
    h = HyperLogLog(10)
    h.update_column(keys)
    sketches.append((h, lambda s: s.estimate()))
    c = CountMinSketch(1e-3, 1e-3)
    c.update_column(keys)
    sketches.append((c, lambda s: s.total))
    k = KLLSketch(128)
    k.update_column(data)
    sketches.append((k, lambda s: s.quantile(0.5)))
    t = TDigest(100)
    t.update_column(data)
    sketches.append((t, lambda s: s.quantile(0.5)))
    for s, probe in sketches:
        rt = type(s).from_bytes(s.to_bytes())
        assert probe(rt) == probe(s)


def test_hll_sparse_phase_exact_and_compact():
    import numpy as np

    from perfect_bloomfilter_ray.state.hll import HyperLogLog

    import pyarrow as pa

    s = HyperLogLog(14)  # dense registers would be 16 KB
    s.update_column(pa.array([f"k{i}" for i in range(100)]))
    assert s._sparse is not None  # still sparse
    assert s.estimate() == 100.0  # exact below the densify threshold
    assert len(s.to_bytes()) < 2000  # ~8 B/key + envelope, not 16 KB

    # sparse+sparse, sparse+dense, dense+dense merges all agree
    a = HyperLogLog(12)
    b = HyperLogLog(12)
    a.update_column(pa.array([f"x{i}" for i in range(50)]))
    b.update_column(pa.array([f"x{i}" for i in range(25, 4000)]))  # densifies
    assert b._sparse is None
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(HyperLogLog.from_bytes(b.to_bytes()))
    ref = HyperLogLog(12)
    ref.update_column(pa.array([f"x{i}" for i in range(4000)]))
    assert merged.state_equal(ref)
    np.testing.assert_allclose(merged.estimate(), ref.estimate())


def test_cms_sparse_phase_exact_and_compact():
    from perfect_bloomfilter_ray.state.cms import CountMinSketch

    s = CountMinSketch(1e-4, 1e-3)  # dense table would be ~1.5 MB
    keys = pa.array([f"k{i % 50}" for i in range(500)])  # 50 keys x10 each
    s.update_column(keys)
    assert s._sparse_h is not None
    np.testing.assert_array_equal(s.estimate_column(pa.array(["k0", "k49"])), [10, 10])
    assert s.estimate_column(pa.array(["missing"]))[0] == 0
    assert len(s.to_bytes()) < 5000  # not 1.5 MB

    # sparse+dense merge agrees with the all-at-once dense build
    big = CountMinSketch(1e-3, 1e-3)
    big.update_column(pa.array([f"x{i % 100}" for i in range(40_000)]))  # densifies
    assert big._sparse_h is None
    small = CountMinSketch(1e-3, 1e-3)
    small.update_column(pa.array([f"x{i % 100}" for i in range(1000)]))
    merged = CountMinSketch.from_bytes(big.to_bytes()).merge(CountMinSketch.from_bytes(small.to_bytes()))
    ref = CountMinSketch(1e-3, 1e-3)
    ref.update_column(pa.array([f"x{i % 100}" for i in range(40_000)]))
    ref.update_column(pa.array([f"x{i % 100}" for i in range(1000)]))
    assert merged.state_equal(ref)
    assert merged.total == ref.total


def test_sliding_distinct_theta_tracks_exact(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["sliding_distinct_users_exact"](sf).set_index("bucket")["n_users"]
    est = QUERIES["sliding_distinct_users_theta"](sf).set_index("bucket")["n_users_est"]
    assert set(exact.index) == set(est.index)
    # k=4096 theta over <=150 users is exact (below sampling threshold)
    for b in exact.index:
        assert abs(int(est[b]) - int(exact[b])) <= max(1, 0.05 * exact[b])


def test_req_relative_rank_error_at_tail():
    from perfect_bloomfilter_ray.state.req import REQSketch

    rng = np.random.default_rng(5)
    data = rng.lognormal(0, 2, 200_000)
    s = REQSketch(k=64)
    for chunk in np.array_split(data, 40):
        s.update_column(chunk)
    srt = np.sort(data)
    for q in (0.9, 0.99, 0.999, 0.9999):
        v = s.quantile(q)
        true_rank = np.searchsorted(srt, v, side="right") / len(srt)
        # RELATIVE rank error: |rank - q| proportional to (1 - q)
        assert abs(true_rank - q) <= 0.25 * (1 - q) + 1e-9, (q, true_rank)
    # the maximum is exact by construction (top item never compacted)
    assert s.quantile(1.0) == srt[-1]
    assert s.max() == srt[-1]
    # space stays sketch-sized
    assert sum(len(c) for c in s.compactors) < 40 * s.k


def test_req_merge_estimate_equivalence():
    from perfect_bloomfilter_ray.state.req import REQSketch

    rng = np.random.default_rng(7)
    data = rng.exponential(5, 120_000)
    parts = np.array_split(data, 8)

    def build(p):
        x = REQSketch(k=64)
        x.update_column(p)
        return x

    fwd = build(parts[0])
    for p in parts[1:]:
        fwd.merge(build(p))
    rev = build(parts[-1])
    for p in parts[:-1][::-1]:
        rev.merge(build(p))
    assert fwd.n == rev.n == len(data)
    srt = np.sort(data)
    for q in (0.99, 0.999):
        for sk in (fwd, rev):
            r = np.searchsorted(srt, sk.quantile(q), side="right") / len(srt)
            assert abs(r - q) <= 0.25 * (1 - q) + 1e-9
    # byte round-trip
    back = REQSketch.from_bytes(fwd.to_bytes())
    assert back.quantile(0.999) == fwd.quantile(0.999)


def test_countsketch_unbiased_median_error_bound():
    """Estimates over a Zipf stream stay within 3*sqrt(F2/width) of exact
    (the CCF'02 single-row bound; the 5-row median only tightens it), and
    the heavy head is recovered near-exactly."""
    from perfect_bloomfilter_ray.state.countsketch import CountSketch

    rng = np.random.default_rng(17)
    keys = rng.zipf(1.3, size=60_000) % 5_000
    cs = CountSketch(width=4096, depth=5)
    cs.update_column(pa.array(keys.astype(np.int64)))
    cs._densify()

    exact = np.bincount(keys, minlength=5_000).astype(np.int64)
    probe = np.arange(5_000, dtype=np.int64)
    est = cs.estimate_column(pa.array(probe))
    f2 = float((exact.astype(np.float64) ** 2).sum())
    bound = 3.0 * np.sqrt(f2 / 4096)
    frac_ok = (np.abs(est - exact) <= bound).mean()
    assert frac_ok > 0.99, frac_ok
    top = np.argsort(-exact)[:10]
    assert np.all(np.abs(est[top] - exact[top]) <= bound)


def test_countsketch_turnstile_delete_and_merge_associativity():
    """Insert-then-delete nets to the sparse-exact zero; dense merges are
    associative and equal the single-sketch build (linearity)."""
    from perfect_bloomfilter_ray.state.countsketch import CountSketch

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1000, 20_000).astype(np.int64)
    b = rng.integers(0, 1000, 20_000).astype(np.int64)
    c = rng.integers(0, 1000, 20_000).astype(np.int64)

    def build(arrs, dels=()):
        s = CountSketch(width=512, depth=5)
        for x in arrs:
            s.update_column(pa.array(x))
        for x in dels:
            s.delete_column(pa.array(x))
        s._densify()
        return s

    one = build([a, b, c])
    m1 = build([a]).merge(build([b]).merge(build([c])))
    m2 = build([a]).merge(build([b])).merge(build([c]))
    assert one.state_equal(m1) and one.state_equal(m2)
    assert one.total == m1.total == 60_000

    net = build([a, b], dels=[b])
    only_a = build([a])
    assert net.state_equal(only_a)
    assert net.total == 20_000

    # serialization roundtrip, both phases
    sp = CountSketch(width=4096, depth=5)
    sp.update_column(pa.array(a[:100]))
    assert CountSketch.from_bytes(sp.to_bytes()).state_equal(sp)
    assert CountSketch.from_bytes(one.to_bytes()).state_equal(one)


def test_kll_range_count_calibration_bound(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["kll_range_count_calibration"]("/root/testdata/sf0.001")
    n = int(out["exact_count"].sum())
    # KLL uniform rank error ~1.65/k per endpoint; band = two endpoints
    bound = 2 * 2 * 1.65 / 200
    assert ((out["est_count"] - out["exact_count"]).abs() / n <= bound).all()
    assert (out["exact_count"] >= 0).all() and n > 0
