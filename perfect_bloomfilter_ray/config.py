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
    """

    threshold: float = ACCURACY_THRESHOLDS["medium"]
    initial_bits: int = CAPACITY_BITS["medium"]
    num_views: int = 4
    grow: bool = True
    max_layers: int = 48

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
    ) -> "BloomConfig":
        return cls(
            threshold=ACCURACY_THRESHOLDS[accuracy],
            initial_bits=CAPACITY_BITS[capacity],
            grow=grow,
        )

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
