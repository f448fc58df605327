"""BloomConfig — per-instance config mirroring the reference's builder semantics.

Mirrors ``/root/reference/src/config.rs`` (enum → derived-constant mapping,
config.rs:1-113 and filter.rs:139-172):
  Accuracy  {Low, Medium, High} → bits-per-key threshold 12 / 15 / 19
  Capacity  {Low, Medium, High, VeryHigh} → initial m = 2^11 / 2^12 / 2^13 / 2^15 bits
  Throughput{Low, Medium, High} → 2^11 / 2^12 / 2^13 shards per tier (here: the
            partition count used when a global filter is built as mergeable
            shard-sketches — Ray blocks provide the actual write concurrency)
  Workers   → actor-pool `concurrency` for stateful stages
  rehash    → `grow`. NOTE: the reference's `with_rehash(false)` is a no-op
            (REHASH_SWITCH set at filter.rs:175 but never read); our
            `grow=False` actually disables growth — documented divergence.

Config is per-instance, not process-global (the reference publishes its
threshold through a OnceCell, filter.rs:174-175 — a footgun we do not copy).
"""

from __future__ import annotations

from dataclasses import dataclass
import math

# Accuracy enum → bits/key threshold (config.rs Accuracy; filter.rs:156-160)
ACCURACY_THRESHOLDS = {"low": 12.0, "medium": 15.0, "high": 19.0}
# Capacity enum → initial bits m0 (filter.rs:149-154)
CAPACITY_BITS = {"low": 1 << 11, "medium": 1 << 12, "high": 1 << 13, "very_high": 1 << 15}
# Throughput enum → shards per tier (filter.rs:143-147)
THROUGHPUT_SHARDS = {"low": 1 << 11, "medium": 1 << 12, "high": 1 << 13}
# Workers enum → worker-core count (config.rs:38-45; resolved filter.rs:162-172).
# In the reference these are rehashing threads; here the same knob is the
# actor-pool ``concurrency`` default for stateful membership stages.
WORKER_CORES = {"cores1": 1, "cores4": 4, "cores8": 8}


def resolve_workers(workers: str | int | None) -> int | None:
    """Reference ``Workers`` → concurrency. ``"half_sys_max"`` = half the
    cluster CPUs (filter.rs:166-171's num_cpus/2, cluster-wide here); ints
    pass through; None = let the stage pick."""
    if workers is None or isinstance(workers, int):
        return workers
    w = workers.lower()
    if w in WORKER_CORES:
        return WORKER_CORES[w]
    if w == "half_sys_max":
        try:
            import ray

            if ray.is_initialized():
                return max(1, int(ray.cluster_resources().get("CPU", 2)) // 2)
        except Exception:  # pragma: no cover
            pass
        import os

        return max(1, (os.cpu_count() or 2) // 2)
    raise ValueError(f"unknown workers setting {workers!r}")


def optimal_k(m: int, n: int) -> int:
    """k = round((m/n)·ln2) — classic optimum (filter.rs:381-383)."""
    return max(1, round((m / max(1, n)) * math.log(2)))


def expected_n(m: int, threshold: float) -> int:
    """Capacity of a layer of m bits at the configured threshold (filter.rs:377-379)."""
    return max(1, int(m // threshold))


@dataclass(frozen=True)
class BloomConfig:
    """Per-instance Bloom cascade configuration.

    threshold: bits/key at which a layer freezes and the cascade grows
               (rehash trigger m/n <= threshold, filter.rs:373-375).
    initial_bits: m0 of layer 0; power of two; doubles per layer.
    num_views: independent seed-family views AND-ed per layer. 4 preserves the
               reference's AND-of-4 geometry (2 tiers × 2 shards,
               filter.rs:45-55, 71-90) and its ~(per-filter FPR)^4 bound.
    grow: dynamic capacity growth (frozen-layer cascade) on/off.
    workers: reference ``Workers`` knob (config.rs:38-45) — default actor-pool
             concurrency for stateful membership stages ("cores1"/"cores4"/
             "cores8"/"half_sys_max", an int, or None = stage default).
             The reference spends these cores on background rehashing;
             the frozen-layer design has no rehash, so the equivalent
             parallelism dial here is probe/build concurrency.
    """

    threshold: float = ACCURACY_THRESHOLDS["medium"]
    initial_bits: int = CAPACITY_BITS["medium"]
    num_views: int = 4
    grow: bool = True
    max_layers: int = 48
    workers: str | int | None = None

    def __post_init__(self):
        if self.initial_bits & (self.initial_bits - 1):
            raise ValueError("initial_bits must be a power of two")
        if not (1 <= self.num_views <= 8):
            raise ValueError("num_views must be in 1..8")

    @classmethod
    def from_enums(
        cls,
        accuracy: str = "medium",
        capacity: str = "medium",
        grow: bool = True,
        workers: str | int | None = None,
    ) -> "BloomConfig":
        return cls(
            threshold=ACCURACY_THRESHOLDS[accuracy],
            initial_bits=CAPACITY_BITS[capacity],
            grow=grow,
            workers=workers,
        )

    @property
    def concurrency(self) -> int | None:
        """Resolved worker count (None when unset — stages use their own
        default pool size)."""
        return resolve_workers(self.workers)

    def k_for(self, m: int) -> int:
        """k for a layer of m bits filled to capacity at this threshold."""
        return optimal_k(m, expected_n(m, self.threshold))

    def layer_bits(self, layer: int) -> int:
        return self.initial_bits << layer

    def per_lookup_fpr_bound(self, num_layers: int = 1) -> float:
        """AND-of-views FPR at the trigger point, OR-ed over layers (§2.2)."""
        k = self.k_for(self.initial_bits)
        per_view = (1.0 - math.exp(-k / self.threshold)) ** k
        return num_layers * per_view**self.num_views
