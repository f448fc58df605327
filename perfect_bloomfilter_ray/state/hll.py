"""HyperLogLog — mergeable distinct-count sketch (sparse → dense registers).

Standard HLL (Flajolet et al. 2007) over the library's 64-bit key hash, with
linear-counting small-range correction and an HLL++-style SPARSE phase
(Heule, Nunkesser & Hall 2013): until a partial has seen enough keys to
justify the dense register array, it buffers the raw 64-bit hashes
(8 B/key). A grouped build over K keys ships batches × K partials — with
dense registers every partial is 2^p bytes even for a single-row group, so
the sparse phase cuts the partial-shuffle bytes by orders of magnitude for
high-cardinality group keys. Densification replays the buffer through the
normal register path, so estimates are identical.

Relative standard error ≈ 1.04/√(2^p).
Merge = elementwise register max (dense) / hash union (sparse) →
associative, commutative, idempotent, state-exact in both phases.
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
        self.registers: np.ndarray | None = None  # dense phase
        self._sparse: list[np.ndarray] | None = []  # buffered raw hashes
        self._sparse_n = 0

    @property
    def rel_error(self) -> float:
        return 1.04 / (self.m**0.5)

    # -- phases ---------------------------------------------------------------

    def _densify(self) -> None:
        if self._sparse is None:
            return
        chunks = self._sparse
        self._sparse = None
        self._sparse_n = 0
        self.registers = np.zeros(self.m, dtype=np.uint8)
        for h in chunks:
            self._update_dense(h)

    def _update_dense(self, h: np.ndarray) -> None:
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = h << _U64(self.p)  # remaining 64-p bits, left-aligned
        rho = np.minimum(clz64(w) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    # -- updates --------------------------------------------------------------

    def update_column(self, col) -> None:
        h = splitmix64(hash64(col, _HLL_SEED))
        self.update_hashes(h)

    def update_hashes(self, h: np.ndarray) -> None:
        if self._sparse is not None:
            self._sparse.append(np.asarray(h, dtype=_U64))
            self._sparse_n += len(h)
            # densify once the hash buffer outgrows the register array
            if 8 * self._sparse_n >= self.m:
                self._densify()
            return
        self._update_dense(np.asarray(h, dtype=_U64))

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        if self._sparse is not None and other._sparse is not None:
            self._sparse.extend(other._sparse)
            self._sparse_n += other._sparse_n
            if 8 * self._sparse_n >= self.m:
                self._densify()
            return self
        self._densify()
        if other._sparse is not None:
            for h in other._sparse:
                self._update_dense(h)
            return self
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -- queries --------------------------------------------------------------

    def estimate(self) -> float:
        if self._sparse is not None:
            # exact-by-construction at sparse sizes: distinct hash count
            if not self._sparse:
                return 0.0
            return float(len(np.unique(np.concatenate(self._sparse))))
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))  # 2^-reg exactly
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def state_equal(self, other: "HyperLogLog") -> bool:
        if self.p != other.p:
            return False
        # canonical comparison: sparse compares the hash SET; mixed phases
        # compare after densifying a copy
        a, b = self, other
        if (a._sparse is None) != (b._sparse is None):
            a = HyperLogLog.from_bytes(a.to_bytes())
            b = HyperLogLog.from_bytes(b.to_bytes())
            a._densify()
            b._densify()
        if a._sparse is not None:
            ha = np.unique(np.concatenate(a._sparse)) if a._sparse else np.empty(0, _U64)
            hb = np.unique(np.concatenate(b._sparse)) if b._sparse else np.empty(0, _U64)
            return np.array_equal(ha, hb)
        return np.array_equal(a.registers, b.registers)

    # -- serialization --------------------------------------------------------

    def to_bytes(self) -> bytes:
        if self._sparse is not None:
            h = np.concatenate(self._sparse) if self._sparse else np.empty(0, _U64)
            return dumps_sketch({"p": self.p, "sparse": np.unique(h)})
        return dumps_sketch({"p": self.p, "registers": self.registers})

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        d = loads_sketch(data)
        out = cls(d["p"])
        if "sparse" in d:
            h = d["sparse"]
            out._sparse = [h] if len(h) else []
            out._sparse_n = len(h)
        else:
            out._sparse = None
            out.registers = d["registers"]
        return out
