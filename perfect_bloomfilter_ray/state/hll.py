"""HyperLogLog — mergeable distinct-count sketch (dense registers).

Standard HLL (Flajolet et al. 2007) over the library's 64-bit key hash, with
linear-counting small-range correction (HLL++-style, no large-range correction
needed with 64-bit hashes). Relative standard error ≈ 1.04/√(2^p).
Merge = elementwise register max → associative, commutative, idempotent.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import clz64, hash64, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_HLL_SEED = 0x8AE8F1B7A2C3D4E5


class HyperLogLog:
    def __init__(self, p: int = 12):
        if not (4 <= p <= 18):
            raise ValueError("p must be in 4..18")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @property
    def rel_error(self) -> float:
        return 1.04 / (self.m**0.5)

    def update_column(self, col) -> None:
        h = splitmix64(hash64(col, _HLL_SEED))
        self.update_hashes(h)

    def update_hashes(self, h: np.ndarray) -> None:
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = h << _U64(self.p)  # remaining 64-p bits, left-aligned
        rho = np.minimum(clz64(w) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))  # 2^-reg exactly
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def state_equal(self, other: "HyperLogLog") -> bool:
        return self.p == other.p and np.array_equal(self.registers, other.registers)

    def to_bytes(self) -> bytes:
        return dumps_sketch({"p": self.p, "registers": self.registers})

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        d = loads_sketch(data)
        out = cls(d["p"])
        out.registers = d["registers"]
        return out
