"""PCSA (Flajolet-Martin) distinct sketch: estimator, merge laws, Ray build."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray.state.pcsa import PCSA, _ctz64


def test_ctz64_exact():
    vals = np.array([0, 1, 2, 8, 3, 1 << 63, (1 << 64) - 1], dtype=np.uint64)
    assert _ctz64(vals).tolist() == [64, 0, 1, 3, 0, 63, 0]


def test_empty_estimates_zero():
    assert PCSA(10).estimate() == 0.0


@pytest.mark.parametrize("n", [50_000, 200_000])
def test_estimate_within_bound(n):
    s = PCSA(10)
    s.update_column(pa.array(np.arange(n).astype(str)))
    est = s.estimate()
    assert abs(est - n) / n < 5 * s.rel_error


def test_merge_associative_commutative_idempotent():
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1 << 62, 6000).astype(np.uint64)
    parts = [xs[:2000], xs[2000:4000], xs[4000:]]

    def sk(h):
        s = PCSA(8)
        s.update_hashes(h)
        return s

    a, b, c = (sk(p) for p in parts)
    left = PCSA.from_bytes(a.to_bytes()).merge(b).merge(c)
    right = PCSA.from_bytes(a.to_bytes()).merge(
        PCSA.from_bytes(b.to_bytes()).merge(c)
    )
    whole = sk(xs)
    assert left.state_equal(right)
    assert left.state_equal(whole)
    # commutative
    rev = PCSA.from_bytes(c.to_bytes()).merge(b).merge(a)
    assert rev.state_equal(whole)
    # idempotent
    again = PCSA.from_bytes(whole.to_bytes()).merge(whole)
    assert again.state_equal(whole)
    # serialization roundtrip
    assert PCSA.from_bytes(whole.to_bytes()).state_equal(whole)


def test_mixed_precision_merge_rejected():
    with pytest.raises(ValueError):
        PCSA(8).merge(PCSA(10))


def test_ray_global_build_matches_local(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.agg import sketch_global

    n = 30_000
    keys = np.arange(n) % 9_000  # 9k distinct
    ds = rd.from_arrow(pa.table({"k": keys.astype(str)}))
    s = sketch_global(ds, "k", lambda: PCSA(10), name="pcsa")
    local = PCSA(10)
    local.update_column(pa.array(np.unique(keys).astype(str)))
    # distributed partial/merge tree must be STATE-exact vs one local pass
    assert s.state_equal(local)
    assert abs(s.estimate() - 9_000) / 9_000 < 5 * s.rel_error


def test_query_registered(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["pcsa_distinct_docs_per_lang"]("/root/testdata/sf0.001")
    assert list(out.columns) == ["lang", "distinct_docs_pcsa", "distinct_docs_exact"]
    assert (out["distinct_docs_exact"] > 0).all()
    rel = (
        (out["distinct_docs_pcsa"] - out["distinct_docs_exact"]).abs()
        / out["distinct_docs_exact"]
    )
    # per-lang cardinalities at sf0.001 sit below PCSA's n >> m regime;
    # the estimator must still be within its documented small-n bias band
    assert (rel < 0.5).all()
