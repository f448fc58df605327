"""Count-min sketch — mergeable frequency sketch for heavy hitters.

Cormode & Muthukrishnan 2005: d = ⌈ln(1/δ)⌉ rows × w = ⌈e/ε⌉ counters.
Point estimate = min over rows; overestimates by ≤ ε·N with prob ≥ 1-δ.
Merge = elementwise add → associative and commutative.
"""

from __future__ import annotations

import math

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_CMS_SEED = 0x51C6B2A49D7E8F31
_ROW_SALTS = splitmix64(np.arange(1, 33, dtype=_U64) * _U64(0xA24BAED4963EE407))


class CountMinSketch:
    def __init__(self, eps: float = 1e-4, delta: float = 1e-4):
        self.eps = eps
        self.delta = delta
        self.depth = max(1, math.ceil(math.log(1.0 / delta)))
        self.width = max(16, math.ceil(math.e / eps))
        self.total = 0
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices — one salted splitmix per row."""
        return np.stack([(splitmix64(h ^ _ROW_SALTS[r]) % _U64(self.width)).astype(np.int64) for r in range(self.depth)])

    def update_column(self, col, weights: np.ndarray | None = None) -> None:
        h = splitmix64(hash64(col, _CMS_SEED))
        idx = self._indices(h)
        if weights is None:
            for r in range(self.depth):
                np.add.at(self.counts[r], idx[r], 1)
            self.total += len(h)
        else:
            w = np.asarray(weights, dtype=np.int64)
            for r in range(self.depth):
                np.add.at(self.counts[r], idx[r], w)
            self.total += int(w.sum())

    def estimate_column(self, col) -> np.ndarray:
        """Vectorized point estimates (min over rows) for a column of keys."""
        h = splitmix64(hash64(col, _CMS_SEED))
        idx = self._indices(h)
        ests = np.stack([self.counts[r][idx[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if other.counts.shape != self.counts.shape:
            raise ValueError("cannot merge CMS with different geometry")
        self.counts += other.counts
        self.total += other.total
        return self

    def state_equal(self, other: "CountMinSketch") -> bool:
        return self.counts.shape == other.counts.shape and np.array_equal(self.counts, other.counts)

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            {"eps": self.eps, "delta": self.delta, "total": self.total, "counts": self.counts}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        d = loads_sketch(data)
        out = cls(d["eps"], d["delta"])
        out.total = d["total"]
        out.counts = d["counts"]
        return out
