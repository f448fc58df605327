"""Count-min sketch — mergeable frequency sketch for heavy hitters.

Cormode & Muthukrishnan 2005: d = ⌈ln(1/δ)⌉ rows × w = ⌈e/ε⌉ counters.
Point estimate = min over rows; overestimates by ≤ ε·N with prob ≥ 1-δ.
Merge = elementwise add → associative and commutative.

Sparse phase (mirroring the Bloom/HLL partials, SURVEY §2.3): a tight-ε CMS
table is MBs of mostly-zero counters, but a per-block partial in a
distributed build holds only batch_size keys — so partials buffer raw
(hash, weight) pairs (16 B/key, exact counts) until the buffer outgrows the
table, then densify through the normal counter path. Identical estimates
after densification; far smaller partial-shuffle bytes and no per-batch
multi-MB zero allocation.
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
        self.counts: np.ndarray | None = None
        self._sparse_h: list[np.ndarray] | None = []
        self._sparse_w: list[np.ndarray] = []
        self._sparse_n = 0

    # -- phases ---------------------------------------------------------------

    @property
    def _dense_bytes(self) -> int:
        return self.depth * self.width * 8

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

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices — one salted splitmix per row."""
        return np.stack([(splitmix64(h ^ _ROW_SALTS[r]) % _U64(self.width)).astype(np.int64) for r in range(self.depth)])

    def _update_dense(self, h: np.ndarray, w: np.ndarray) -> None:
        idx = self._indices(h)
        for r in range(self.depth):
            np.add.at(self.counts[r], idx[r], w)

    def _sparse_agg(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted unique hashes, summed weights) of the sparse buffer."""
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
        h = splitmix64(hash64(col, _CMS_SEED))
        w = np.ones(len(h), dtype=np.int64) if weights is None else np.asarray(weights, dtype=np.int64)
        self.total += int(w.sum())
        if self._sparse_h is not None:
            self._sparse_h.append(h)
            self._sparse_w.append(w)
            self._sparse_n += len(h)
            if 16 * self._sparse_n >= self._dense_bytes:
                self._densify()
            return
        self._update_dense(h, w)

    # -- queries --------------------------------------------------------------

    def estimate_column(self, col) -> np.ndarray:
        """Vectorized point estimates (min over rows) for a column of keys.

        Sparse phase answers exactly from the buffered (hash, weight) pairs.
        """
        h = splitmix64(hash64(col, _CMS_SEED))
        if self._sparse_h is not None:
            uh, uw = self._sparse_agg()
            pos = np.searchsorted(uh, h)
            pos_c = np.minimum(pos, max(len(uh) - 1, 0))
            if len(uh):
                hit = uh[pos_c] == h
                return np.where(hit, uw[pos_c], 0)
            return np.zeros(len(h), dtype=np.int64)
        idx = self._indices(h)
        ests = np.stack([self.counts[r][idx[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size estimate |A ⋈ B| = Σ_k f_A(k)·f_B(k) (Cormode &
        Muthukrishnan 2005 §4.2): min over rows of the row dot product.
        Overestimates by ≤ ε·N_A·N_B with prob ≥ 1-δ; never underestimates.
        Both sketches share the class-level seed family, so identical
        geometry ⇒ aligned counters. Non-mutating (densifies copies)."""
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot inner-product CMS with different geometry")
        a, b = self, other
        if a._sparse_h is not None and b._sparse_h is not None:
            # both sparse: exact join of the buffered (hash, weight) pairs
            ah, aw = a._sparse_agg()
            bh, bw = b._sparse_agg()
            if len(ah) == 0 or len(bh) == 0:
                return 0
            pos = np.searchsorted(ah, bh)
            pos_c = np.minimum(pos, len(ah) - 1)
            hit = ah[pos_c] == bh
            return int((aw[pos_c][hit] * bw[hit]).sum())
        if a._sparse_h is not None:
            a = CountMinSketch.from_bytes(a.to_bytes())
            a._densify()
        if b._sparse_h is not None:
            b = CountMinSketch.from_bytes(b.to_bytes())
            b._densify()
        rows = (a.counts * b.counts).sum(axis=1)
        return int(rows.min())

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge CMS with different geometry")
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

    # -- introspection / serialization ---------------------------------------

    def state_equal(self, other: "CountMinSketch") -> bool:
        if (self.depth, self.width) != (other.depth, other.width):
            return False
        a, b = self, other
        if (a._sparse_h is None) != (b._sparse_h is None):
            a = CountMinSketch.from_bytes(a.to_bytes())
            b = CountMinSketch.from_bytes(b.to_bytes())
            a._densify()
            b._densify()
        if a._sparse_h is not None:
            ah, aw = a._sparse_agg()
            bh, bw = b._sparse_agg()
            return np.array_equal(ah, bh) and np.array_equal(aw, bw)
        return np.array_equal(a.counts, b.counts)

    def to_bytes(self) -> bytes:
        base = {"eps": self.eps, "delta": self.delta, "total": self.total}
        if self._sparse_h is not None:
            uh, uw = self._sparse_agg()
            return dumps_sketch(base | {"sparse_h": uh, "sparse_w": uw})
        return dumps_sketch(base | {"counts": self.counts})

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        d = loads_sketch(data)
        out = cls(d["eps"], d["delta"])
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


class ConservativeCMS(CountMinSketch):
    """Count-min with BATCHED conservative update (Estan & Varghese 2002
    §4.2): a cell is raised only to ``min_rows(key) + increment``, never
    blindly added to — pointwise ≤ the plain CMS table on the same stream
    (proved by induction: max(cur, mn+w) ≤ cur+w since mn ≤ cur), while
    the no-underestimate guarantee survives because mn ≥ true count
    before the batch.

    Batched semantics: each update_column aggregates its batch per
    distinct key and applies one conservative raise per key (np.maximum.at
    — order-independent, fully vectorized), which is slightly looser than
    per-item CU but keeps the hot path loop-free.  MERGING partials adds
    cellwise (inherited): still an upper bound (each row cell ≥ its
    side's true count, sums preserve it) but merging forfeits part of
    CU's tightness — the more of the stream each partial sees, the closer
    to single-stream CU; the estimate never drops below plain-CMS
    correctness either way."""

    def _update_dense(self, h: np.ndarray, w: np.ndarray) -> None:
        uh, inv = np.unique(h, return_inverse=True)
        uw = np.zeros(len(uh), dtype=np.int64)
        np.add.at(uw, inv, w)
        idx = self._indices(uh)  # (depth, u)
        # single 2-D fancy gather + one flat scatter — no per-row Python
        # loop building depth×u stacked intermediates on the hot path
        cur = self.counts[np.arange(self.depth)[:, None], idx]
        target = np.broadcast_to(cur.min(axis=0) + uw, idx.shape)
        flat = idx + (np.arange(self.depth, dtype=np.int64)[:, None] * self.width)
        np.maximum.at(self.counts.reshape(-1), flat.reshape(-1), target.reshape(-1))
