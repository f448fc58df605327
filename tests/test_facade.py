"""PerfectBloomFilter facade: reference-API conformance (sync_test port)."""

import numpy as np

from perfect_bloomfilter_ray.config import BloomConfig
from perfect_bloomfilter_ray.facade import PerfectBloomFilter


def test_scalar_check_insert_check():
    """The reference's conformance loop (tests/sync_test.rs:24-68) at test
    scale: no false positives before insert, no false negatives after."""
    pbf = PerfectBloomFilter.new()
    for i in range(0, 2000, 100):  # scalar API parity; the batch path covers volume
        key = str(i)
        assert not pbf.contains(key)
        pbf.insert(key)
        assert pbf.contains(key)


def test_batch_check_insert_check():
    n = 50_000
    pbf = PerfectBloomFilter(expected_keys=n)
    keys = [str(i).encode() for i in range(n)]
    assert not pbf.contains_batch(keys).any()  # zero FP on fresh keys
    pbf.insert_batch(keys)
    assert pbf.contains_batch(keys).all()  # zero FN
    fresh = [str(i).encode() for i in range(n, 2 * n)]
    fp = pbf.contains_batch(fresh).sum()
    assert fp == 0, f"{fp} false positives at Medium accuracy over {n} fresh keys"


def test_sharded_mode_roundtrip():
    n = 20_000
    pbf = PerfectBloomFilter(expected_keys=n, sharded=True, throughput="low")
    assert pbf.num_shards == 2048
    keys = [f"url-{i}".encode() for i in range(n)]
    pbf.insert_batch(keys)
    assert pbf.contains_batch(keys).all()
    assert pbf.key_count == n
    fresh = [f"other-{i}".encode() for i in range(n)]
    assert pbf.contains_batch(fresh).sum() == 0


def test_new_with_config_and_interop():
    cfg = BloomConfig.from_enums(accuracy="high", capacity="low")
    pbf = PerfectBloomFilter.new_with_config(cfg, expected_keys=5000)
    pbf.insert_batch([str(i) for i in range(5000)])
    # hand the backing sketch to a fresh facade (cluster -> local interop)
    again = PerfectBloomFilter.from_sketch(pbf.sketch)
    assert again.contains("123") and not again.contains("999999")
    assert again.key_count == 5000


def test_workers_knob_reference_parity(ray_session):
    """Reference Workers enum (config.rs:38-45) → concurrency resolution and
    end-to-end use as the membership actor-pool size."""
    from perfect_bloomfilter_ray.config import resolve_workers

    assert resolve_workers("cores1") == 1
    assert resolve_workers("cores4") == 4
    assert resolve_workers("cores8") == 8
    assert resolve_workers(3) == 3
    assert resolve_workers(None) is None
    assert resolve_workers("half_sys_max") >= 1
    cfg = BloomConfig.from_enums(workers="cores1")
    assert cfg.concurrency == 1
    assert BloomConfig().concurrency is None

    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.membership import bloom_semi_join

    big = rd.from_pandas(pd.DataFrame({"k": list(range(100))}))
    small = rd.from_pandas(pd.DataFrame({"k": list(range(0, 100, 2))}))
    out = bloom_semi_join(big, small, "k", "k", expected_keys=1024, config=cfg)
    assert sorted(out.to_pandas()["k"]) == list(range(0, 100, 2))
