"""BloomCascade conformance tests — port of the reference's test strategy.

The reference ships one end-to-end check→insert→check conformance loop
(tests/sync_test.rs:24-68: 0 false positives on fresh keys, 0 false negatives
after insert, at Accuracy::Medium). We run the same contract batch-wise at
100k keys (the 3.1e-13 AND-of-4 bound makes any FP at this scale a real bug),
plus growth, merge, serialization and FPR-bound tests.
"""

import numpy as np
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray import BloomCascade, BloomConfig
from perfect_bloomfilter_ray.config import expected_n, optimal_k


N = 100_000


def _keys(lo, hi, prefix=""):
    return pa.array([f"{prefix}{i}" for i in range(lo, hi)])


def test_sync_conformance_check_insert_check():
    """sync_test.rs semantics: fresh keys absent, inserted keys present."""
    bc = BloomCascade(BloomConfig(initial_bits=1 << 14))
    keys = _keys(0, N)
    assert not bc.contains_column(keys).any(), "false positive on empty filter"
    bc.update_column(keys)
    assert bc.contains_column(keys).all(), "false negative after insert"
    fresh = _keys(N, 2 * N)
    fp = int(bc.contains_column(fresh).sum())
    assert fp == 0, f"{fp} false positives over {N} fresh keys (bound ~3e-13)"


def test_growth_keeps_bits_per_key_above_threshold():
    cfg = BloomConfig(initial_bits=1 << 12)
    bc = BloomCascade(cfg)
    bc.update_column(_keys(0, 50_000))
    assert len(bc.layers) > 1, "cascade should have grown"
    for layer in bc.layers[:-1]:  # frozen layers exactly at capacity bound
        assert layer.key_count <= expected_n(layer.m, cfg.threshold)
        assert layer.m / max(1, layer.key_count) >= cfg.threshold
    # m doubles per layer, k follows optimal_k for the doubled size
    for a, b in zip(bc.layers, bc.layers[1:]):
        assert b.m == 2 * a.m
        assert b.k == optimal_k(b.m, expected_n(b.m, cfg.threshold))


def test_grow_false_disables_growth():
    """Documented divergence: reference with_rehash(false) is a no-op
    (REHASH_SWITCH written filter.rs:175, never read); our grow=False works."""
    bc = BloomCascade(BloomConfig(initial_bits=1 << 12, grow=False))
    bc.update_column(_keys(0, 20_000))
    assert len(bc.layers) == 1


def test_duplicate_inserts_inflate_key_count():
    """key_count counts update calls incl. duplicates (filter.rs:326)."""
    bc = BloomCascade(BloomConfig(initial_bits=1 << 14))
    dup = pa.array(["same"] * 1000)
    bc.update_column(dup)
    assert bc.key_count == 1000


def test_merge_equals_sequential_and_no_false_negatives():
    cfg = BloomConfig(initial_bits=1 << 13)
    seq = BloomCascade(cfg)
    seq.update_column(_keys(0, 30_000))

    a = BloomCascade(cfg)
    b = BloomCascade(cfg)
    a.update_column(_keys(0, 15_000))
    b.update_column(_keys(15_000, 30_000))
    merged = a.merge(b)
    assert merged.contains_column(_keys(0, 30_000)).all()
    assert merged.key_count == seq.key_count


def test_for_capacity_merge_preserves_fpr_bound():
    """Capacity-planned partials: OR-merge stays within the bits/key budget,
    so the measured post-merge FPR still meets the configured bound."""
    cfg = BloomConfig()
    parts = []
    for j in range(8):
        s = BloomCascade.for_capacity(80_000, cfg)
        s.update_column(_keys(j * 10_000, (j + 1) * 10_000))
        parts.append(s)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.contains_column(_keys(0, 80_000)).all()
    assert len(merged.layers) == 1  # planned capacity → no rollover
    bound = cfg.per_lookup_fpr_bound(len(merged.layers))
    assert merged.effective_fpr() <= bound * 1.5
    fresh = _keys(80_000, 180_000)
    assert int(merged.contains_column(fresh).sum()) == 0


def test_serialization_roundtrip_exact():
    bc = BloomCascade(BloomConfig(initial_bits=1 << 13))
    bc.update_column(_keys(0, 20_000))
    rt = BloomCascade.from_bytes(bc.to_bytes())
    assert rt.state_equal(bc)
    assert rt.contains_column(_keys(0, 20_000)).all()


def test_merge_rejects_mismatched_geometry():
    a = BloomCascade(BloomConfig(initial_bits=1 << 12))
    b = BloomCascade(BloomConfig(initial_bits=1 << 13))
    with pytest.raises(ValueError):
        a.merge(b)


def test_accuracy_enums_match_reference_constants():
    """threshold 12/15/19 → k 8/10/13 (filter.rs:156-160, 381-383; §2.2)."""
    for acc, thr, k in (("low", 12.0, 8), ("medium", 15.0, 10), ("high", 19.0, 13)):
        cfg = BloomConfig.from_enums(accuracy=acc)
        assert cfg.threshold == thr
        assert cfg.k_for(cfg.initial_bits) == k


def test_sparse_dense_merge_paths_equivalent():
    """All three merge paths (sparse x sparse w/ auto-densify, sparse x dense,
    dense x dense) produce the same state as one sequential dense build."""
    import pyarrow as pa

    from perfect_bloomfilter_ray.config import BloomConfig
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    keys = pa.array([f"k{i}" for i in range(5000)])
    a_keys, b_keys = keys.slice(0, 2500), keys.slice(2500)

    ref = BloomCascade.for_capacity(5000, BloomConfig())
    ref.update_column(keys)
    ref._densify()

    sxs = BloomCascade.for_capacity(5000, BloomConfig())
    sxs.update_column(a_keys)
    other = BloomCascade.for_capacity(5000, BloomConfig())
    other.update_column(b_keys)
    assert sxs._sparse_lo is not None and other._sparse_lo is not None
    sxs.merge(other)
    assert sxs.state_equal(ref)

    sxd = BloomCascade.for_capacity(5000, BloomConfig())
    sxd.update_column(a_keys)
    dense_b = BloomCascade.for_capacity(5000, BloomConfig())
    dense_b.update_column(b_keys)
    dense_b._densify()
    sxd.merge(dense_b)
    assert sxd.state_equal(ref)

    dxd = BloomCascade.for_capacity(5000, BloomConfig())
    dxd.update_column(a_keys)
    dxd._densify()
    dxd.merge(dense_b)
    assert dxd.state_equal(ref)


def test_sparse_serialization_roundtrip():
    import numpy as np
    import pyarrow as pa

    from perfect_bloomfilter_ray.config import BloomConfig
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    s = BloomCascade.for_capacity(100000, BloomConfig())
    s.update_column(pa.array([f"u{i}" for i in range(300)]))
    assert s._sparse_lo is not None  # far below densify threshold
    blob = s.to_bytes()
    rt = BloomCascade.from_bytes(blob)
    assert rt._sparse_count == 300
    assert bool(rt.contains_column(pa.array(["u5", "u299", "nope"])).tolist() == [True, True, False])


def test_cardinality_estimate_accuracy():
    import pyarrow as pa

    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    c = BloomCascade()
    assert c.cardinality_estimate() == 0.0
    n = 200_000
    c.update_column(pa.array(np.arange(n).astype(str)))
    est = c.cardinality_estimate()
    assert abs(est - n) / n < 0.01


def test_cardinality_estimate_distributed_matches(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    n = 60_000
    ds = rd.from_arrow(pa.table({"k": np.arange(n).astype(str)})).repartition(8)
    c = sketch_global(ds, "k", BloomCascade, name="bloom")
    est = c.cardinality_estimate()
    assert abs(est - n) / n < 0.01


def test_query_bloom_cardinality(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["bloom_cardinality_estimate"]("/root/testdata/sf0.001")
    assert out.shape[0] == 1
    exact = int(out["distinct_docs_exact"].iloc[0])
    est = float(out["distinct_docs_bloom_fill"].iloc[0])
    assert abs(est - exact) / exact < 0.02
