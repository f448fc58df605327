"""REQ-style relative-error quantile sketch (high-rank-accuracy variant).

Cormode, Karnin, Liberty, Thaler & Vesely, "Relative Error Streaming
Quantiles" (PODS 2021): a KLL-shaped compactor ladder whose compactions
discard items only from the LOW-rank end of each level buffer, so items near
the maximum survive compaction indefinitely — rank error scales with the
distance from the tail, i.e. relative ((1-q)·n) rather than uniform (ε·n).
That is the property needed for tail latencies (p99/p999/p9999), where a
uniform-error sketch (state/kll.py) needs k ∝ 1/(1-q) to answer at all.

This is a simplified deterministic variant of the paper's scheme, NOT a port
of the DataSketches implementation: each level keeps its top half verbatim
and compacts the sorted lower half with an alternating-offset halve (the same
derandomization used in state/kll.py). The global top ~k items are therefore
EXACT at every point; empirical relative rank error at the tail is pinned in
tests/test_sketches.py alongside a merge-associativity property test. Low
ranks (q → 0) have correspondingly weak error — by design; flip the input's
sign for low-rank accuracy.

Mergeable (MergeableSketch protocol, state/base.py): concatenate level-wise,
re-compact — associative/commutative up to the error bound, like KLL.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch
from perfect_bloomfilter_ray.state.kll import _as_float_array


class REQSketch:
    def __init__(self, k: int = 64):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.compactors: list[np.ndarray] = [np.empty(0)]
        self.offsets: list[int] = [0]
        self.n = 0

    def _cap(self) -> int:
        return 2 * self.k

    def update_column(self, col) -> None:
        vals = _as_float_array(col)
        if len(vals) == 0:
            return
        self.compactors[0] = np.concatenate([self.compactors[0], vals])
        self.n += len(vals)
        self._compress()

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            # a level keeps its high half, so a post-merge oversized buffer
            # needs repeated compaction (each pass halves it) — unlike KLL,
            # which empties the level in one pass
            while len(self.compactors[h]) >= self._cap():
                if h + 1 == len(self.compactors):
                    self.compactors.append(np.empty(0))
                    self.offsets.append(0)
                lvl = np.sort(self.compactors[h], kind="stable")
                mid = len(lvl) // 2
                low, high = lvl[:mid], lvl[mid:]  # high half survives verbatim
                off = self.offsets[h]
                self.offsets[h] ^= 1
                promoted = low[off::2]  # alternating-offset halve of the low half
                self.compactors[h] = high
                self.compactors[h + 1] = np.concatenate(
                    [self.compactors[h + 1], promoted]
                )
            h += 1

    def merge(self, other: "REQSketch") -> "REQSketch":
        if other.k != self.k:
            raise ValueError("cannot merge REQ sketches with different k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0))
            self.offsets.append(0)
        for h, lvl in enumerate(other.compactors):
            if len(lvl):
                self.compactors[h] = np.concatenate([self.compactors[h], lvl])
        self.n += other.n
        self._compress()
        return self

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lvl in enumerate(self.compactors):
            if len(lvl):
                vals.append(lvl)
                wts.append(np.full(len(lvl), 1 << h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Approximate normalized rank of x (fraction of items <= x)."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        i = int(np.searchsorted(v, x, side="right"))
        return float(w[:i].sum() / w.sum())

    def max(self) -> float:
        """The exact stream maximum (the top item is never compacted)."""
        v, _ = self._weighted_items()
        return float(v[-1]) if len(v) else float("nan")

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            {"k": self.k, "n": self.n, "compactors": self.compactors, "offsets": self.offsets}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "REQSketch":
        d = loads_sketch(data)
        out = cls(d["k"])
        out.n = d["n"]
        out.compactors = d["compactors"]
        out.offsets = d["offsets"]
        return out
