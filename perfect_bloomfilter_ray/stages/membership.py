"""Membership stages — broadcast Bloom filters, semi/anti joins, sharded builds.

The reference's ``contains`` (filter.rs:45-55) becomes a vectorized batch
column transform against a filter broadcast through the Ray object store:
``ray.put`` ONCE on the driver, each map task / actor reads the shared copy
(zero re-shipping per batch). Two stage flavors:

- ``membership_column`` — stateless tasks; filter deserialized per task
  (fine for small/medium filters).
- ``MembershipChecker`` — actor pool; filter deserialized ONCE per actor in
  ``__init__`` and reused across batches (the model-weights pattern; right
  for large cascades).

``build_sharded_filter`` preserves the reference's shard geometry at scale:
keys are routed by the same jump-consistent-hash function the reference uses
(filter.rs:467-483) into S independent capacity-planned cascades, so each
partial stays small and merge fan-in per shard is bounded; lookups route the
probe key to its shard. This is the 10^12-key path: S shards × planned
capacity each, built in one grouped aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from perfect_bloomfilter_ray.config import BloomConfig
from perfect_bloomfilter_ray.functions.hashing import SEED_ROUTE_A, hash64, jump_hash
from perfect_bloomfilter_ray.state.base import loads_sketch
from perfect_bloomfilter_ray.state.bloom import BloomCascade
from perfect_bloomfilter_ray.stages.agg import SketchAgg, sketch_global


def build_filter(ds: Dataset, col: str, expected_keys: int, config: BloomConfig | None = None) -> BloomCascade:
    """Build one capacity-planned BloomCascade over a Dataset column.

    No row shuffle: per-block partials tree-merged by Dataset.aggregate.
    """
    return sketch_global(
        ds, col, lambda: BloomCascade.for_capacity(expected_keys, config), name="bloom"
    )


class MembershipChecker:
    """Actor-pool batch callable: adds a bool membership column.

    Deserializes the (possibly large) filter once per actor — the reference's
    per-call lock+check (filter.rs:45-55) becomes amortized actor state.
    Use: ``ds.map_batches(MembershipChecker, fn_constructor_args=(ref, col),
    concurrency=N, batch_format="pyarrow")``.
    """

    def __init__(self, filter_ref, col: str, out_col: str = "member", negate: bool = False):
        obj = ray.get(filter_ref) if isinstance(filter_ref, ray.ObjectRef) else filter_ref
        self._filter = BloomCascade.from_bytes(obj) if isinstance(obj, bytes) else obj
        self._col = col
        self._out = out_col
        self._negate = negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self._filter.contains_column(batch.column(self._col))
        if self._negate:
            mask = ~mask
        return batch.append_column(self._out, pa.array(mask))


def membership_column(
    ds: Dataset, filter_obj: BloomCascade | bytes, col: str, out_col: str = "member"
) -> Dataset:
    """Stateless membership stage (broadcast via ray.put once)."""
    ref = ray.put(filter_obj.to_bytes() if isinstance(filter_obj, BloomCascade) else filter_obj)

    def check(batch: pa.Table) -> pa.Table:
        f = BloomCascade.from_bytes(ray.get(ref))
        return batch.append_column(out_col, pa.array(f.contains_column(batch.column(col))))

    return ds.map_batches(check, batch_format="pyarrow")


def bloom_semi_join(
    big: Dataset,
    small: Dataset | None,
    big_key: str,
    small_key: str | None = None,
    expected_keys: int = 1 << 20,
    anti: bool = False,
    config: BloomConfig | None = None,
    concurrency: int | tuple[int, int] | None = None,
    prebuilt=None,
) -> Dataset:
    """Semi (or anti) join: filter ``big`` to rows whose key is (not) in
    ``small`` — the flagship Bloom use (tests/sync_test.rs:49-66 is exactly a
    membership-gate loop). The small side never shuffles the big side: it is
    collapsed to a broadcast cascade.

    With a capacity-planned config the FPR bound (~3e-13 at Medium accuracy,
    SURVEY §2.2) makes the semi join *exact in practice*; the driver's DuckDB
    oracle comparison relies on that.
    """
    if concurrency is None:
        # reference Workers knob (config.rs:38-45) → probe actor-pool size;
        # unset → autoscaling pool
        cfg_workers = config.concurrency if config is not None else None
        concurrency = cfg_workers if cfg_workers is not None else (2, 8)
    filt = prebuilt if prebuilt is not None else build_filter(small, small_key, expected_keys, config)
    ref = ray.put(filt.to_bytes())
    out = big.map_batches(
        MembershipChecker,
        fn_constructor_args=(ref, big_key, "_member", anti),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    import pyarrow.compute as pc

    return out.map_batches(
        lambda t: t.filter(pc.equal(t.column("_member"), True)).drop_columns(["_member"]),
        batch_format="pyarrow",
    )


def bloom_prefiltered_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    num_partitions: int | None = None,
    expected_keys: int = 1 << 20,
    config=None,
):
    """Exact inner hash join with a Bloom runtime filter pushed below the
    shuffle: build a compact cascade over the LEFT side's keys, stream-filter
    the RIGHT side against it BEFORE the all-to-all exchange, then run the
    exact Ray-native join.

    This is the classic distributed-join runtime-filter optimization: when
    the join is selective (most right rows match nothing), the shuffle moves
    only ~(matching + FPR·non-matching) right rows instead of all of them.
    Results are EXACT — the Bloom filter only admits false positives, and the
    hash join discards those. Cost: one extra streaming pass over the left
    keys (the filter build); skip it when the join is not selective.
    """
    from perfect_bloomfilter_ray.stages.partitioning import choose_join_partitions

    right_on = right_on or on
    if num_partitions is None:
        # a runtime-filtered right side is small by construction; coarse
        # cluster-derived sizing (see choose_join_partitions) is enough
        num_partitions = choose_join_partitions()
    filt = build_filter(left, on, expected_keys=expected_keys, config=config)
    right_small = bloom_semi_join(right, None, right_on, prebuilt=filt)
    return left.join(right_small, "inner", num_partitions=num_partitions, on=(on,), right_on=(right_on,))


def build_sharded_filter(
    ds: Dataset,
    col: str,
    num_shards: int,
    expected_keys: int,
    config: BloomConfig | None = None,
) -> "ShardedBloomFilter":
    """Build S jump-hash-routed shard cascades in one grouped aggregation.

    Mirrors the reference's shard vector (2^s shards, filter.rs:190-217) as
    the *partition dimension* of the build: shard_id = jump_hash(h64(key), S).
    Each shard is capacity-planned for expected_keys/S (×2 headroom), bounding
    per-partial memory and per-shard merge fan-in.
    """
    assert num_shards & (num_shards - 1) == 0, "num_shards must be a power of two"
    per_shard = max(64, (2 * expected_keys) // num_shards)
    factory = lambda: BloomCascade.for_capacity(per_shard, config)  # noqa: E731

    def add_shard(t: pa.Table) -> pa.Table:
        sid = jump_hash(hash64(t.column(col), SEED_ROUTE_A), num_shards)
        return t.append_column("_shard", pa.array(sid, pa.int32()))

    sharded = ds.map_batches(add_shard, batch_format="pyarrow")
    built = sharded.groupby("_shard").aggregate(
        SketchAgg(factory, on=col, name="bloom")
    )
    parts: dict[int, bytes] = {}
    for row in built.iter_rows():
        parts[int(row["_shard"])] = row["bloom"]
    shards = [
        BloomCascade.from_bytes(parts[i]) if i in parts else factory() for i in range(num_shards)
    ]
    return ShardedBloomFilter(shards)


def plan_sharded_filter(
    expected_keys: int,
    num_shards: int,
    config: BloomConfig | None = None,
    reduce_heap_bytes: int = 4 * 2**30,
) -> dict:
    """Capacity-plan arithmetic for :func:`build_sharded_filter` — the
    10^12-key deployment math, computable with zero data.

    Mirrors the build exactly: per-shard plan = ``max(64, 2·N/S)`` keys
    (×2 headroom — jump-hash routing skew at trillion-key scale is
    ≪ +2% at 6σ, so headroom dominates skew), layer-0 bits = next power
    of two ≥ keys × threshold (bits/key lands in [threshold, 2·threshold)),
    dense bytes = m0/8 × num_views. A reduce slot holds the shard
    accumulator plus one incoming partial → peak 2× shard bytes; ``fits``
    says whether that clears ``reduce_heap_bytes``. ``min_shards`` is the
    smallest power-of-two S that fits — at Accuracy::Medium and a 4 GiB
    reduce budget, 10^12 keys need S ≥ 8192 (2 GiB/shard at 8192, 1 GiB at
    16384; ~16 TiB filter total across the cluster either way). If no
    power-of-two S up to 2^30 fits (per-shard floor of 64 keys still over
    budget), ``min_shards`` is ``None``.
    """
    config = config or BloomConfig()
    per_shard_keys = max(64, (2 * expected_keys) // num_shards)
    m0 = 1 << max((int(per_shard_keys * config.threshold) - 1).bit_length(), 6)
    shard_bytes = (m0 // 8) * config.num_views
    peak = 2 * shard_bytes

    min_shards: int | None = 1
    while True:
        pk = max(64, (2 * expected_keys) // min_shards)
        m = 1 << max((int(pk * config.threshold) - 1).bit_length(), 6)
        if 2 * (m // 8) * config.num_views <= reduce_heap_bytes:
            break
        if min_shards >= 1 << 30:
            min_shards = None  # NOTHING fits the budget — say so, not 2^30
            break
        min_shards <<= 1

    return {
        "per_shard_keys": per_shard_keys,
        "layer0_bits": m0,
        "bits_per_key": m0 / per_shard_keys,
        "shard_bytes": shard_bytes,
        "reduce_peak_bytes": peak,
        "fits": peak <= reduce_heap_bytes,
        "min_shards": min_shards,
        "total_filter_bytes": shard_bytes * num_shards,
    }


class ShardedBloomFilter:
    """S independent cascades + the jump-hash router; vectorized lookups."""

    def __init__(self, shards: list[BloomCascade]):
        assert len(shards) & (len(shards) - 1) == 0
        self.shards = shards

    @property
    def num_shards(self) -> int:
        return len(self.shards)

    @property
    def key_count(self) -> int:
        return sum(s.key_count for s in self.shards)

    def contains_column(self, col) -> np.ndarray:
        sid = jump_hash(hash64(col, SEED_ROUTE_A), self.num_shards)
        out = np.zeros(len(sid), dtype=bool)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for s in np.unique(sid):
            idx = np.nonzero(sid == s)[0]
            out[idx] = self.shards[s].contains_column(col.take(pa.array(idx)))
        return out

    def to_bytes(self) -> bytes:
        from perfect_bloomfilter_ray.state.base import dumps_sketch

        return dumps_sketch([s.to_bytes() for s in self.shards])

    @classmethod
    def from_bytes(cls, data: bytes) -> "ShardedBloomFilter":
        return cls([BloomCascade.from_bytes(b) for b in loads_sketch(data)])
