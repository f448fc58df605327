"""Theta sketch (KMV — k minimum values) — mergeable distinct-count sketch
supporting SET OPERATIONS (union / intersection / difference estimates), the
one capability HLL lacks.

Standard KMV theta sketch (Beyer et al. 2007 "On Synopses for Distinct-Value
Estimation"; Dasgupta et al. 2016 theta-sketch framework): keep the k
smallest 64-bit key hashes, all strictly below theta = the (k+1)-th smallest
hash seen (as a fraction of hash space); every retained hash is a uniform
sample of the key space below theta.

- estimate()                |retained| / theta — the theta-sketch framework
                            estimator (Dasgupta et al. §2) with theta the
                            (k+1)-th smallest hash when saturated; exact
                            count when not. RSE ≈ 1/√(k-2).
- union  = merge            keep k smallest of the multiset union (assoc+comm).
- intersect / a_not_b       intersect/diff the retained sample sets at
                            theta = min(theta_a, theta_b), scale by 1/theta.

Unlike HLL's register max, set ops here are EXACT over the sample, so
intersection error stays relative to the union size — the standard tradeoff
(Dasgupta et al. §3). Merge is associative/commutative (property-tested).
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_THETA_SEED = 0x7E7A5EED0C0FFEE5
_MAX = np.float64(2**64)


class ThetaSketch:
    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = k
        self.hashes = np.empty(0, dtype=_U64)  # sorted retained hashes, all < theta_u64
        self.theta_u64 = _U64(0xFFFFFFFFFFFFFFFF)

    @property
    def rel_error(self) -> float:
        return 1.0 / max(self.k - 2, 1) ** 0.5

    def update_column(self, col) -> None:
        self.update_hashes(splitmix64(hash64(col, _THETA_SEED)))

    def update_hashes(self, h: np.ndarray) -> None:
        h = np.unique(h)  # sorted + deduped
        h = h[h < self.theta_u64]
        merged = np.union1d(self.hashes, h)
        if len(merged) > self.k:
            self.theta_u64 = merged[self.k]  # k-th smallest becomes the new bound
            merged = merged[: self.k]
        self.hashes = merged

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("cannot merge theta sketches with different k")
        self.theta_u64 = min(self.theta_u64, other.theta_u64)
        merged = np.union1d(self.hashes, other.hashes)
        merged = merged[merged < self.theta_u64]
        if len(merged) > self.k:
            self.theta_u64 = merged[self.k]
            merged = merged[: self.k]
        self.hashes = merged
        return self

    def _theta(self) -> float:
        return float(self.theta_u64) / float(_MAX)

    def estimate(self) -> float:
        if self.theta_u64 == _U64(0xFFFFFFFFFFFFFFFF):
            return float(len(self.hashes))  # not saturated: exact
        return len(self.hashes) / self._theta()

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        """Estimated |A ∩ B| (samples intersected at the smaller theta)."""
        th = min(self.theta_u64, other.theta_u64)
        a = self.hashes[self.hashes < th]
        b = other.hashes[other.hashes < th]
        common = np.intersect1d(a, b, assume_unique=True)
        return len(common) / (float(th) / float(_MAX))

    def a_not_b_estimate(self, other: "ThetaSketch") -> float:
        """Estimated |A \\ B|."""
        th = min(self.theta_u64, other.theta_u64)
        a = self.hashes[self.hashes < th]
        b = other.hashes[other.hashes < th]
        only = np.setdiff1d(a, b, assume_unique=True)
        return len(only) / (float(th) / float(_MAX))

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        u = ThetaSketch(self.k)
        u.merge(self).merge(other)
        denom = u.estimate()
        return self.intersect_estimate(other) / denom if denom else 0.0

    def state_equal(self, other: "ThetaSketch") -> bool:
        return (
            self.k == other.k
            and self.theta_u64 == other.theta_u64
            and np.array_equal(self.hashes, other.hashes)
        )

    def to_bytes(self) -> bytes:
        return dumps_sketch({"k": self.k, "theta": self.theta_u64, "hashes": self.hashes})

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        d = loads_sketch(data)
        out = cls(d["k"])
        out.theta_u64 = d["theta"]
        out.hashes = d["hashes"]
        return out
