"""Count-Sketch — mergeable UNBIASED frequency sketch (turnstile model).

Charikar, Chen & Farach-Colton 2002: d rows x w counters; each row salts the
key into a column AND a sign in {-1, +1}; update adds sign*weight, the point
estimate is the MEDIAN over rows of sign * counter. Unlike count-min (which
only overestimates), Count-Sketch is unbiased, tolerates DELETIONS (negative
weights — the full turnstile model), and its error scales with the residual
L2 mass: |err| <= 3*sqrt(F2_resid / w) per row with constant probability,
driven to delta by the median over d = O(log 1/delta) rows. Merge =
elementwise add -> associative and commutative, so it composes with the same
partial-sketch + tree-merge machinery as the CMS (stages/agg.SketchAgg).

Sparse phase (mirroring state/cms.py): partials buffer exact signed
(hash, weight) pairs until the buffer outgrows the dense table, then
densify; estimates during the sparse phase are exact.
"""

from __future__ import annotations

import math

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_CS_SEED = 0x7A3D91B64C28E5F7
_ROW_SALTS = splitmix64(np.arange(1, 33, dtype=_U64) * _U64(0x9E3779B97F4A7C15))
_SIGN_SALTS = splitmix64(np.arange(1, 33, dtype=_U64) * _U64(0xC2B2AE3D27D4EB4F))


class CountSketch:
    def __init__(self, width: int = 4096, depth: int = 5):
        if depth % 2 == 0:
            raise ValueError("depth must be odd so the median is a counter value")
        self.width = int(width)
        self.depth = int(depth)
        self.total = 0  # signed net total (turnstile)
        self.counts: np.ndarray | None = None
        self._sparse_h: list[np.ndarray] | None = []
        self._sparse_w: list[np.ndarray] = []
        self._sparse_n = 0

    # -- phases ---------------------------------------------------------------

    @property
    def _dense_bytes(self) -> int:
        return self.depth * self.width * 8

    def _indices_signs(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = np.stack(
            [
                (splitmix64(h ^ _ROW_SALTS[r]) % _U64(self.width)).astype(np.int64)
                for r in range(self.depth)
            ]
        )
        sgn = np.stack(
            [
                (
                    ((splitmix64(h ^ _SIGN_SALTS[r]) >> _U64(63)).astype(np.int64) << 1)
                    - 1
                )
                for r in range(self.depth)
            ]
        )
        return idx, sgn

    def _update_dense(self, h: np.ndarray, w: np.ndarray) -> None:
        idx, sgn = self._indices_signs(h)
        for r in range(self.depth):
            np.add.at(self.counts[r], idx[r], sgn[r] * w)

    def _densify(self) -> None:
        if self._sparse_h is None:
            return
        hs, ws = self._sparse_h, self._sparse_w
        self._sparse_h = None
        self._sparse_w = []
        self._sparse_n = 0
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        for h, w in zip(hs, ws):
            self._update_dense(h, w)

    def _sparse_agg(self) -> tuple[np.ndarray, np.ndarray]:
        if not self._sparse_h:
            return np.empty(0, _U64), np.empty(0, np.int64)
        h = np.concatenate(self._sparse_h)
        w = np.concatenate(self._sparse_w)
        uh, inv = np.unique(h, return_inverse=True)
        uw = np.zeros(len(uh), dtype=np.int64)
        np.add.at(uw, inv, w)
        return uh, uw

    # -- updates --------------------------------------------------------------

    def update_column(self, col, weights: np.ndarray | None = None) -> None:
        h = splitmix64(hash64(col, _CS_SEED))
        w = (
            np.ones(len(h), dtype=np.int64)
            if weights is None
            else np.asarray(weights, dtype=np.int64)
        )
        self.total += int(w.sum())
        if self._sparse_h is not None:
            self._sparse_h.append(h)
            self._sparse_w.append(w)
            self._sparse_n += len(h)
            if 16 * self._sparse_n >= self._dense_bytes:
                self._densify()
            return
        self._update_dense(h, w)

    def delete_column(self, col, weights: np.ndarray | None = None) -> None:
        """Turnstile deletion: the negative-weight update CMS cannot take."""
        h = splitmix64(hash64(col, _CS_SEED))
        w = (
            np.ones(len(h), dtype=np.int64)
            if weights is None
            else np.asarray(weights, dtype=np.int64)
        )
        self.total -= int(w.sum())
        if self._sparse_h is not None:
            self._sparse_h.append(h)
            self._sparse_w.append(-w)
            self._sparse_n += len(h)
            if 16 * self._sparse_n >= self._dense_bytes:
                self._densify()
            return
        self._update_dense(h, -w)

    # -- queries --------------------------------------------------------------

    def estimate_column(self, col) -> np.ndarray:
        """Vectorized UNBIASED point estimates: median over rows of
        sign * counter. Sparse phase answers exactly."""
        h = splitmix64(hash64(col, _CS_SEED))
        if self._sparse_h is not None:
            uh, uw = self._sparse_agg()
            pos = np.searchsorted(uh, h)
            pos_c = np.minimum(pos, max(len(uh) - 1, 0))
            if len(uh):
                hit = uh[pos_c] == h
                return np.where(hit, uw[pos_c], 0)
            return np.zeros(len(h), dtype=np.int64)
        idx, sgn = self._indices_signs(h)
        ests = np.stack([sgn[r] * self.counts[r][idx[r]] for r in range(self.depth)])
        return np.median(ests, axis=0).astype(np.int64)

    def negated(self) -> "CountSketch":
        """-S under the sketch's linear structure: merging S.negated() into
        a build subtracts S's whole stream (bulk turnstile retraction —
        e.g. net counts excluding one event class built as two ordinary
        distributed builds)."""
        out = CountSketch.from_bytes(self.to_bytes())
        out.total = -out.total
        if out._sparse_h is not None:
            out._sparse_w = [-w for w in out._sparse_w]
        else:
            out.counts = -out.counts
        return out

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge CountSketch with different geometry")
        self.total += other.total
        if self._sparse_h is not None and other._sparse_h is not None:
            self._sparse_h.extend(other._sparse_h)
            self._sparse_w.extend(other._sparse_w)
            self._sparse_n += other._sparse_n
            if 16 * self._sparse_n >= self._dense_bytes:
                self._densify()
            return self
        self._densify()
        if other._sparse_h is not None:
            for h, w in zip(other._sparse_h, other._sparse_w):
                self._update_dense(h, w)
            return self
        self.counts += other.counts
        return self

    # -- introspection / serialization ----------------------------------------

    def state_equal(self, other: "CountSketch") -> bool:
        if (self.depth, self.width) != (other.depth, other.width):
            return False
        a, b = self, other
        if (a._sparse_h is None) != (b._sparse_h is None):
            a = CountSketch.from_bytes(a.to_bytes())
            b = CountSketch.from_bytes(b.to_bytes())
            a._densify()
            b._densify()
        if a._sparse_h is not None:
            ah, aw = a._sparse_agg()
            bh, bw = b._sparse_agg()
            return np.array_equal(ah, bh) and np.array_equal(aw, bw)
        return np.array_equal(a.counts, b.counts)

    def to_bytes(self) -> bytes:
        base = {"width": self.width, "depth": self.depth, "total": self.total}
        if self._sparse_h is not None:
            uh, uw = self._sparse_agg()
            return dumps_sketch(base | {"sparse_h": uh, "sparse_w": uw})
        return dumps_sketch(base | {"counts": self.counts})

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountSketch":
        d = loads_sketch(data)
        out = cls(d["width"], d["depth"])
        out.total = d["total"]
        if "sparse_h" in d:
            h, w = d["sparse_h"], d["sparse_w"]
            out._sparse_h = [h] if len(h) else []
            out._sparse_w = [w] if len(w) else []
            out._sparse_n = len(h)
        else:
            out._sparse_h = None
            out.counts = d["counts"]
        return out
