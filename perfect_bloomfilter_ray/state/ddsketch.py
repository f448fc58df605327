"""DDSketch (Masson, Rim & Lee, VLDB 2019) — relative-error quantile sketch.

Log-spaced buckets: a positive value x lands in bucket ``ceil(log_gamma(x))``
with ``gamma = (1+alpha)/(1-alpha)``; reporting the bucket midpoint
``2*gamma^i/(gamma+1)`` guarantees relative error <= alpha for every quantile.
Zeros get a dedicated counter and negative values a mirrored store, so the
sketch covers the full real line. The collapsing variant bounds memory: when
the positive store exceeds ``max_bins``, the LOWEST buckets fold into the
smallest kept one (upper quantiles — the ones quality/latency pipelines care
about — keep the alpha guarantee; collapsed low quantiles degrade gracefully).

Merge = per-bucket count addition (exactly associative/commutative — unlike
KLL/t-digest the internal state is merge-order-INDEPENDENT), which makes it
the best-behaved quantile sketch in the library for Ray's pairwise,
order-nondeterministic ``combine`` tree. Complements, not replaces, KLL
(uniform rank error) and t-digest (extreme-quantile rank error): DDSketch's
contract is RELATIVE value error, the right bound for long-tailed metrics.

No counterpart in the reference (a membership filter, `filter.rs`); this is
[RULE] scope — the mergeable-sketch tier the north rule mandates.
"""

from __future__ import annotations

import math

import numpy as np

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class DDSketch:
    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = alpha
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._lg = math.log(self.gamma)
        self.max_bins = max_bins
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero_count = 0
        self.n = 0

    # -- update ------------------------------------------------------------
    def _indices(self, mags: np.ndarray) -> np.ndarray:
        return np.ceil(np.log(mags) / self._lg).astype(np.int64)

    def _add_bulk(self, store: dict[int, int], mags: np.ndarray) -> None:
        idx, cnt = np.unique(self._indices(mags), return_counts=True)
        for i, c in zip(idx.tolist(), cnt.tolist()):
            store[i] = store.get(i, 0) + c

    def update_column(self, col) -> None:
        vals = _as_float_array(col)
        if len(vals) == 0:
            return
        self.n += len(vals)
        zero = vals == 0.0
        self.zero_count += int(zero.sum())
        p = vals[vals > 0.0]
        if len(p):
            self._add_bulk(self.pos, p)
        m = vals[vals < 0.0]
        if len(m):
            self._add_bulk(self.neg, -m)
        self._collapse()

    def _collapse(self) -> None:
        for store in (self.pos, self.neg):
            if len(store) > self.max_bins:
                keys = sorted(store)
                cut = keys[len(store) - self.max_bins]
                folded = sum(store.pop(k) for k in keys if k < cut)
                store[cut] = store.get(cut, 0) + folded

    # -- merge / io ----------------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-12:
            raise ValueError("cannot merge DDSketches with different alpha")
        for mine, theirs in ((self.pos, other.pos), (self.neg, other.neg)):
            for k, c in theirs.items():
                mine[k] = mine.get(k, 0) + c
        self.zero_count += other.zero_count
        self.n += other.n
        self._collapse()
        return self

    def state_equal(self, other: "DDSketch") -> bool:
        return (
            abs(self.alpha - other.alpha) < 1e-12
            and self.pos == other.pos
            and self.neg == other.neg
            and self.zero_count == other.zero_count
            and self.n == other.n
        )

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            {
                "alpha": self.alpha,
                "max_bins": self.max_bins,
                "pos": self.pos,
                "neg": self.neg,
                "zero": self.zero_count,
                "n": self.n,
            }
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        d = loads_sketch(data)
        out = cls(d["alpha"], d["max_bins"])
        out.pos, out.neg = d["pos"], d["neg"]
        out.zero_count, out.n = d["zero"], d["n"]
        return out

    # -- query ---------------------------------------------------------------
    def _mid(self, i: int) -> float:
        return 2.0 * self.gamma**i / (self.gamma + 1.0)

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        rank = q * (self.n - 1)
        seen = 0
        # negative store: largest magnitude = smallest value, so walk
        # descending magnitude first
        for i in sorted(self.neg, reverse=True):
            seen += self.neg[i]
            if seen > rank:
                return -self._mid(i)
        seen += self.zero_count
        if seen > rank:
            return 0.0
        for i in sorted(self.pos):
            seen += self.pos[i]
            if seen > rank:
                return self._mid(i)
        return self._mid(max(self.pos)) if self.pos else 0.0

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]


def _as_float_array(col) -> np.ndarray:
    import pyarrow as pa

    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        arr = col.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(col)
    arr = arr.astype(np.float64, copy=False)
    return arr[~np.isnan(arr)]
