"""PCSA — Flajolet-Martin probabilistic counting with stochastic averaging.

The 1985 ancestor of HyperLogLog (Flajolet & Martin, JCSS 1985), kept in the
library because its state is a *bitmap per register*, not a max: merge is a
plain bitwise OR, which makes it the simplest possible mergeable distinct
sketch and a useful cross-check against the HLL estimate (different estimator,
same 64-bit key hash family). m = 2^p bitmaps of 64 bits each; a key's top p
hash bits pick the bitmap, the count of trailing zeros of the remaining bits
picks the bit to set. Estimate: n ≈ (m / φ) · 2^(mean lowest-zero-index),
φ = 0.77351; relative standard error ≈ 0.78/√m.

Merge = elementwise OR → associative, commutative, idempotent, state-exact.
Partial size is fixed at 8·2^p bytes (8 KiB at p=10) — no sparse phase needed.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_PCSA_SEED = 0x5C5A_1985_F1A9_E0B3
_PHI = 0.77351


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64; ctz(0) = 64 (exact)."""
    x = np.asarray(x, dtype=_U64)
    out = np.zeros(x.shape, dtype=np.int64)
    nz = x != 0
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = (_U64(1) << _U64(s)) - _U64(1)
        m = nz & ((v & mask) == 0)
        out[m] += s
        v[m] >>= _U64(s)
    out[~nz] = 64
    return out


class PCSA:
    def __init__(self, p: int = 10):
        if not (4 <= p <= 16):
            raise ValueError("p must be in 4..16")
        self.p = p
        self.m = 1 << p
        self.bitmaps = np.zeros(self.m, dtype=_U64)

    @property
    def rel_error(self) -> float:
        return 0.78 / (self.m**0.5)

    # -- updates --------------------------------------------------------------

    def update_column(self, col) -> None:
        self.update_hashes(splitmix64(hash64(col, _PCSA_SEED)))

    def update_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=_U64)
        if len(h) == 0:
            return
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = h << _U64(self.p)  # remaining 64-p bits, left-aligned
        # trailing-zero count of the ORIGINAL low bits == ctz of w minus p;
        # w == 0 (all-zero suffix, prob 2^-(64-p)) lands at bit 64-p (the
        # max observable rank); the min-63 clamp only guards p < 1
        pos = np.minimum(_ctz64(w) - self.p + np.int64(0), 63)
        pos = np.minimum(np.maximum(pos, 0), 63)
        np.bitwise_or.at(self.bitmaps, idx, _U64(1) << pos.astype(_U64))

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "PCSA") -> "PCSA":
        if other.p != self.p:
            raise ValueError("cannot merge PCSAs with different precision")
        np.bitwise_or(self.bitmaps, other.bitmaps, out=self.bitmaps)
        return self

    # -- queries --------------------------------------------------------------

    def estimate(self) -> float:
        # R_j = index of the lowest UNSET bit of bitmap j: ctz of ~bitmap
        r = _ctz64(~self.bitmaps)
        a = float(r.sum()) / self.m
        # Scheuermann & Mauve 2007 small-range correction: exact 0 when
        # empty, converges to the classic (m/φ)·2^A estimator for large n
        return (self.m / _PHI) * (2.0**a - 2.0 ** (-1.75 * a))

    def state_equal(self, other: "PCSA") -> bool:
        return self.p == other.p and np.array_equal(self.bitmaps, other.bitmaps)

    # -- serialization --------------------------------------------------------

    def to_bytes(self) -> bytes:
        return dumps_sketch({"p": self.p, "bitmaps": self.bitmaps})

    @classmethod
    def from_bytes(cls, data: bytes) -> "PCSA":
        d = loads_sketch(data)
        out = cls(d["p"])
        out.bitmaps = d["bitmaps"]
        return out
