"""Sliding-window HyperLogLog — distinct counts over ANY trailing window
from one mergeable summary.

Chabchoub & Hébrail 2010 ("Sliding HyperLogLog"); Fusy & Giroire's sliding
MinCount is the same idea: a plain HLL register keeps only the max rank
ever seen, which cannot forget expired items. Instead each register keeps
the PARETO FRONT of (rank, ts) pairs — an entry survives only if no
STRICTLY MORE RECENT entry has rank ≥ its own. Querying a window
[t − W, t] takes, per register, the max rank among front entries with
ts ≥ t − W: exactly the register state a fresh HLL would have built over
the window's items, so the standard estimator and its 1.04/√m error bound
apply to EVERY window simultaneously. Expected front size per register is
O(log n) — the summary stays within a small constant of plain HLL.

Merge = concatenate fronts + re-prune: associative, commutative,
idempotent (prune is a closure operator), so Ray's partial-per-block +
combine-tree aggregation applies unchanged (`stages/agg.SketchAgg`).

All operations vectorized: the prune is ONE lexsort over (register,
ts desc) + a running max of ``register·64 + rank`` (rank < 64, so register
boundaries reset the max arithmetically — no per-register Python loop).

No reference-repo counterpart; [RULE] sketch-library surface, the
time-windowed member of the HLL family (the DGIM exponential histogram is
its counting sibling for SUMS).
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64


class SlidingHLL:
    """Mergeable sliding-window distinct sketch over (value, ts) streams."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        # concatenated Pareto fronts: parallel arrays (register, rank, ts)
        self.reg = np.empty(0, dtype=np.int64)
        self.rank = np.empty(0, dtype=np.int64)
        self.ts = np.empty(0, dtype=np.int64)

    @property
    def rel_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    # -- updates ---------------------------------------------------------------

    def update_hashes(self, h: np.ndarray, ts: np.ndarray) -> None:
        h = np.asarray(h, dtype=_U64)
        ts = np.asarray(ts, dtype=np.int64)
        reg = (h >> _U64(64 - self.p)).astype(np.int64)
        body = (h << _U64(self.p)) | _U64(1)  # sentinel bit caps rank at 64-p
        # rank = leading zeros of body + 1 (HLL rho), via float64 exponent
        rank = np.empty(len(h), dtype=np.int64)
        nz = body != 0
        # 63 - floor(log2(body)) + 1; exact for all uint64 via bit_length trick
        bl = np.zeros(len(h), dtype=np.int64)
        x = body.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            step = x >= (_U64(1) << _U64(shift))
            bl[step] += shift
            x[step] >>= _U64(shift)
        bl[nz] += 1  # bit_length
        rank[:] = 64 - bl + 1
        self.reg = np.concatenate([self.reg, reg])
        self.rank = np.concatenate([self.rank, rank])
        self.ts = np.concatenate([self.ts, ts])
        self._prune()

    def update_column(self, col, ts_col) -> None:
        import pyarrow as pa

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        from perfect_bloomfilter_ray.functions.hashing import hash64

        h = hash64(col, 0x51D7)
        ts = ts_col.to_numpy(zero_copy_only=False).astype(np.int64) if hasattr(ts_col, "to_numpy") else np.asarray(ts_col, np.int64)
        self.update_hashes(h, ts)

    def _prune(self) -> None:
        """Keep only Pareto-optimal (rank, ts) per register: an entry dies
        iff a strictly more recent entry in the same register has rank ≥
        its own. One lexsort + running max — fully vectorized."""
        n = len(self.reg)
        if n == 0:
            return
        order = np.lexsort((-self.ts, self.reg))  # by register, ts DESC
        reg, rank, ts = self.reg[order], self.rank[order], self.ts[order]
        # composite running max: register*128 + rank (rank ≤ 64 < 128), so a
        # new register's floor exceeds any previous register's ceiling
        comp = reg * 128 + rank
        runmax = np.maximum.accumulate(comp)
        # survive if strictly greater than the max over all STRICTLY more
        # recent same-register entries (== runmax before this row)
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = comp[1:] > runmax[:-1]
        # equal-ts duplicates with equal rank: keep the first occurrence only
        self.reg, self.rank, self.ts = reg[keep], rank[keep], ts[keep]

    # -- queries ---------------------------------------------------------------

    def registers_at(self, cutoff_ts: int) -> np.ndarray:
        """Per-register max rank among entries with ts >= cutoff (0 = empty)."""
        regs = np.zeros(self.m, dtype=np.int64)
        live = self.ts >= cutoff_ts
        np.maximum.at(regs, self.reg[live], self.rank[live])
        return regs

    def estimate(self, cutoff_ts: int | None = None) -> float:
        """Standard HLL estimate over items with ts >= cutoff (None = all)."""
        regs = self.registers_at(cutoff_ts if cutoff_ts is not None else np.iinfo(np.int64).min)
        m = float(self.m)
        inv = np.exp2(-regs.astype(np.float64))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / inv.sum()
        zeros = int((regs == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting regime
        return float(raw)

    # -- merge / io ------------------------------------------------------------

    def merge(self, other: "SlidingHLL") -> "SlidingHLL":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        self.reg = np.concatenate([self.reg, other.reg])
        self.rank = np.concatenate([self.rank, other.rank])
        self.ts = np.concatenate([self.ts, other.ts])
        self._prune()
        return self

    def to_bytes(self) -> bytes:
        return dumps_sketch((self.p, self.reg, self.rank, self.ts))

    @classmethod
    def from_bytes(cls, data: bytes) -> "SlidingHLL":
        p, reg, rank, ts = loads_sketch(data)
        out = cls(p)
        out.reg, out.rank, out.ts = reg, rank, ts
        return out
