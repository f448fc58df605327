"""t-digest (Dunning & Ertl) — mergeable quantile sketch, merging variant.

Centroids sized by the k1 scale function k(q) = (δ/2π)·asin(2q−1), which
bounds relative rank error near the tails. Compression is implemented as a
fully **vectorized bucket pass** (assign each sorted point to
⌊k(q)⌋-buckets, weighted-mean per bucket via np.bincount) rather than the
sequential greedy pass — deterministic given input order, same error regime
(SURVEY §7 hard part (c): sorted deterministic passes for merge stability).

Merge = concatenate centroids + recompress → associative/commutative up to
rank error (tested with tolerance in tests/test_sketches.py).
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch
from perfect_bloomfilter_ray.state.kll import _as_float_array


class TDigest:
    def __init__(self, compression: int = 200):
        self.compression = int(compression)
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.n = 0
        self.min = np.inf
        self.max = -np.inf

    def update_column(self, col) -> None:
        vals = _as_float_array(col)
        if len(vals) == 0:
            return
        self.n += len(vals)
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        self._buf.append(vals)
        self._buf_n += len(vals)
        if self._buf_n >= 8 * self.compression:
            self._compress()

    def _compress(self) -> None:
        if not self._buf and len(self.means) <= 2 * self.compression:
            return
        m = np.concatenate([self.means] + self._buf) if self._buf else self.means
        w = (
            np.concatenate([self.weights, np.ones(self._buf_n)])
            if self._buf
            else self.weights
        )
        self._buf, self._buf_n = [], 0
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # midpoint quantile of each item, then k1-scale bucket id
        q = (np.cumsum(w) - 0.5 * w) / total
        q = np.clip(q, 1e-12, 1 - 1e-12)
        kq = (self.compression / (2.0 * np.pi)) * (np.arcsin(2.0 * q - 1.0) + np.pi / 2.0)
        bucket = np.floor(kq).astype(np.int64)
        nb = int(bucket.max()) + 1
        bw = np.bincount(bucket, weights=w, minlength=nb)
        bm = np.bincount(bucket, weights=w * m, minlength=nb)
        keep = bw > 0
        self.weights = bw[keep]
        self.means = bm[keep] / self.weights

    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("cannot merge TDigests with different compression")
        other_flat = np.concatenate([other.means] + other._buf) if other._buf else other.means
        other_w = np.concatenate([other.weights, np.ones(other._buf_n)]) if other._buf else other.weights
        self._buf.append(np.empty(0))
        self.means = np.concatenate([self.means, other_flat])
        self.weights = np.concatenate([self.weights, other_w])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        cum = np.cumsum(w) - 0.5 * w
        target = q * w.sum()
        if target <= cum[0]:
            return float(self.min)
        if target >= cum[-1]:
            return float(self.max)
        i = int(np.searchsorted(cum, target, side="right"))
        t = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(self.means[i - 1] + t * (self.means[i] - self.means[i - 1]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def to_bytes(self) -> bytes:
        self._compress()
        return dumps_sketch(
            {
                "compression": self.compression,
                "means": self.means,
                "weights": self.weights,
                "n": self.n,
                "min": self.min,
                "max": self.max,
            }
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        d = loads_sketch(data)
        out = cls(d["compression"])
        out.means, out.weights = d["means"], d["weights"]
        out.n, out.min, out.max = d["n"], d["min"], d["max"]
        return out
