"""KLL quantile sketch (Karnin, Lang & Liberty 2016) — mergeable, numpy-based.

Levels of geometrically-shrinking compactors; item at level h carries weight
2^h. Compaction keeps every other item of a sorted level (derandomized with a
per-level alternating offset — deterministic across runs, which the repo's
reproducibility tests rely on; the classic analysis uses a random coin but the
alternating variant's empirical rank error is equivalent — see PAPERS.md KLL±
/ EDBT'23 experimental analysis). Rank error ≈ O(1/k); tested empirically
against numpy exact quantiles in tests/test_sketches.py.

Merge = concatenate level-wise, then re-compact → associative/commutative up
to rank-error (internal state is merge-order-dependent by design).
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class KLLSketch:
    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.compactors: list[np.ndarray] = [np.empty(0)]
        self.offsets: list[int] = [0]
        self.n = 0

    def _cap(self, h: int) -> int:
        """Capacity of level h with H current levels: k·(2/3)^(H-1-h), min 2."""
        depth = len(self.compactors) - 1 - h
        return max(2, int(self.k * (2.0 / 3.0) ** depth))

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
            if len(self.compactors[h]) >= self._cap(h):
                if h + 1 == len(self.compactors):
                    self.compactors.append(np.empty(0))
                    self.offsets.append(0)
                lvl = np.sort(self.compactors[h], kind="stable")
                off = self.offsets[h]
                self.offsets[h] ^= 1
                promoted = lvl[off::2]
                self.compactors[h] = np.empty(0)
                self.compactors[h + 1] = np.concatenate([self.compactors[h + 1], promoted])
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
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

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            {"k": self.k, "n": self.n, "compactors": self.compactors, "offsets": self.offsets}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        d = loads_sketch(data)
        out = cls(d["k"])
        out.n = d["n"]
        out.compactors = d["compactors"]
        out.offsets = d["offsets"]
        return out


def _as_float_array(col) -> np.ndarray:
    import pyarrow as pa

    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        arr = col.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(col)
    arr = arr.astype(np.float64, copy=False)
    return arr[~np.isnan(arr)]
