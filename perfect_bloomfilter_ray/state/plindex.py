"""Piecewise-linear learned index — error-bounded rank prediction over a
sorted key column.

The PGM/RMI idea (Ferragina & Vinciguerra VLDB 2020 "The PGM-index";
Kraska et al. SIGMOD 2018) without any ML runtime: approximate the CDF of
a SORTED key array by greedy maximal line segments such that every key's
predicted rank is within ``eps`` of its true rank (the shrinking-cone
construction: extend the current segment while the feasible slope cone
stays non-empty).  A lookup then costs one segment binary search (tiny
array) + one predicted-position probe + a ≤ 2ε+1 local scan — O(log
segments + ε) instead of O(log n), with the whole "index" a few float
pairs per segment (orders of magnitude smaller than a B-tree over the
same keys).

Exactness contract: construction is deterministic; ``max_error`` is an
enforced invariant (asserted over every key at build), so ``lookup`` is
EXACT — it returns the true rank for present keys and the insertion point
for absent ones.  Cluster shape: fit per sorted shard/file (the zone-map
sidecar pattern of the data-skipping index); the per-shard models are a
few KB and broadcast with the existing min/max zone metadata.
"""

from __future__ import annotations

import numpy as np


class PLIndex:
    """Greedy shrinking-cone piecewise-linear index over sorted int64 keys."""

    __slots__ = ("eps", "starts", "slopes", "intercepts", "n", "keys_min", "keys_max")

    def __init__(self, sorted_keys: np.ndarray, eps: int = 16):
        k = np.asarray(sorted_keys, dtype=np.int64)
        if len(k) == 0:
            raise ValueError("cannot index an empty key array")
        if np.any(np.diff(k) < 0):
            raise ValueError("keys must be sorted ascending")
        self.eps = int(eps)
        self.n = len(k)
        self.keys_min, self.keys_max = int(k[0]), int(k[-1])
        # fit DISTINCT keys against their FIRST-occurrence rank (the
        # searchsorted-left position): duplicate runs share one (x, y)
        # point, so any multiplicity is representable within eps.
        # All arithmetic is SEGMENT-RELATIVE (dx from an int64 subtraction,
        # prediction slope·(x−x0)+y0): absolute-coordinate fits lose the
        # eps bound to float64 rounding once |key| / gap exceeds ~2^52
        # (snowflake-style IDs), and adjacent high keys can even collapse
        # to dx == 0 in float
        uk, first = np.unique(k, return_index=True)
        y = first.astype(np.float64)
        starts, slopes, y0s = [], [], []
        i = 0
        m = len(uk)
        while i < m:
            y0 = y[i]
            lo, hi = -np.inf, np.inf  # feasible slope cone
            j = i + 1
            while j < m:
                dx = float(int(uk[j]) - int(uk[i]))  # exact: int64 gap
                s_lo = (y[j] - y0 - self.eps) / dx
                s_hi = (y[j] - y0 + self.eps) / dx
                nlo, nhi = max(lo, s_lo), min(hi, s_hi)
                if nlo > nhi:
                    break
                lo, hi = nlo, nhi
                j += 1
            slope = (lo + hi) / 2.0 if np.isfinite(lo) and np.isfinite(hi) else 0.0
            starts.append(int(uk[i]))
            slopes.append(slope)
            y0s.append(y0)
            i = j
        self.starts = np.asarray(starts, dtype=np.int64)
        self.slopes = np.asarray(slopes, dtype=np.float64)
        self.intercepts = np.asarray(y0s, dtype=np.float64)  # y0 per segment
        # enforced invariant: every distinct key predicted within eps of its
        # left rank (clip to the left-rank range, matching _predict)
        pred = self._predict(uk)
        err = np.abs(pred - first)
        if int(err.max()) > self.eps:  # pragma: no cover - construction bug guard
            raise AssertionError(f"eps invariant violated: {int(err.max())} > {self.eps}")

    @property
    def n_segments(self) -> int:
        return len(self.starts)

    @property
    def nbytes(self) -> int:
        return self.starts.nbytes + self.slopes.nbytes + self.intercepts.nbytes

    def _predict(self, keys: np.ndarray) -> np.ndarray:
        seg = np.clip(np.searchsorted(self.starts, keys, side="right") - 1, 0, None)
        dx = (keys.astype(np.int64) - self.starts[seg]).astype(np.float64)
        pred = self.slopes[seg] * dx + self.intercepts[seg]
        return np.clip(np.rint(pred), 0, self.n - 1).astype(np.int64)

    def lookup(self, keys: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
        """EXACT insertion points (np.searchsorted-left parity) for
        ``keys``, probing only the ±eps window around each prediction."""
        q = np.asarray(keys, dtype=np.int64)
        pred = self._predict(q)
        lo = np.maximum(pred - self.eps - 1, 0)
        hi = np.minimum(pred + self.eps + 1, self.n)
        out = np.empty(len(q), dtype=np.int64)
        for i in range(len(q)):  # windows are <= 2eps+2 wide — bounded scan
            a, b = lo[i], hi[i]
            # the eps bound holds for PRESENT keys; an absent key between
            # segments can predict outside its window — detect by boundary
            # and widen with a full binary search (rare; still exact)
            if (a > 0 and q[i] < sorted_keys[a]) or (
                b < self.n and q[i] > sorted_keys[b - 1]
            ):
                out[i] = np.searchsorted(sorted_keys, q[i])
            else:
                out[i] = a + np.searchsorted(sorted_keys[a:b], q[i])
        return out
