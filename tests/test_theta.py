"""ThetaSketch (KMV): accuracy, set operations, merge laws, serialization."""

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.state.theta import ThetaSketch


def _fill(s: ThetaSketch, vals):
    s.update_column(pa.array([str(v) for v in vals]))
    return s


def test_exact_below_k():
    s = _fill(ThetaSketch(1024), range(500))
    assert s.estimate() == 500.0


def test_estimate_within_bound():
    k = 1024
    n = 200_000
    s = ThetaSketch(k)
    # batched updates like map_batches would deliver
    for lo in range(0, n, 8192):
        _fill(s, range(lo, min(lo + 8192, n)))
    err = abs(s.estimate() - n) / n
    assert err < 5 * s.rel_error, (s.estimate(), err)


def test_set_operations():
    k = 4096
    a = _fill(ThetaSketch(k), range(0, 60_000))          # A = [0, 60k)
    b = _fill(ThetaSketch(k), range(40_000, 100_000))    # B = [40k, 100k)
    inter = a.intersect_estimate(b)                      # 20k
    diff = a.a_not_b_estimate(b)                         # 40k
    union = ThetaSketch(k).merge(a).merge(b).estimate()  # 100k
    assert abs(inter - 20_000) / 20_000 < 0.15
    assert abs(diff - 40_000) / 40_000 < 0.1
    assert abs(union - 100_000) / 100_000 < 0.1
    jac = a.jaccard_estimate(b)
    assert abs(jac - 0.2) < 0.05


def test_merge_associative_commutative_exact_state():
    k = 256
    parts = [list(range(i * 700, (i + 1) * 700)) for i in range(4)]
    sketches = [_fill(ThetaSketch(k), p) for p in parts]

    def build(order):
        out = ThetaSketch(k)
        for i in order:
            s = ThetaSketch.from_bytes(sketches[i].to_bytes())  # fresh copy
            out.merge(s)
        return out

    x = build([0, 1, 2, 3])
    y = build([3, 1, 0, 2])
    assert x.state_equal(y)
    # nested vs flat
    ab = ThetaSketch(k).merge(ThetaSketch.from_bytes(sketches[0].to_bytes())).merge(
        ThetaSketch.from_bytes(sketches[1].to_bytes())
    )
    cd = ThetaSketch(k).merge(ThetaSketch.from_bytes(sketches[2].to_bytes())).merge(
        ThetaSketch.from_bytes(sketches[3].to_bytes())
    )
    z = ab.merge(cd)
    assert x.state_equal(z)


def test_serialization_roundtrip():
    s = _fill(ThetaSketch(64), range(5000))
    t = ThetaSketch.from_bytes(s.to_bytes())
    assert s.state_equal(t)
    assert t.estimate() == s.estimate()


def test_ray_udaf_build(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.agg import sketch_global

    ds = rd.range(50_000).map_batches(
        lambda t: pa.table({"v": pa.array([f"u{int(x)%5000}" for x in t.column("id").to_numpy()])}),
        batch_format="pyarrow",
    )
    s = sketch_global(ds, "v", lambda: ThetaSketch(2048), "theta")
    assert abs(s.estimate() - 5000) / 5000 < 5 * s.rel_error
