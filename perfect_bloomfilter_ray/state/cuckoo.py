"""Cuckoo filter (Fan, Andersen, Kaminsky & Mitzenmacher, CoNEXT 2014) —
approximate membership with DELETION support.

The capability the reference's Bloom tiers cannot offer (`filter.rs` can only
ever add bits): a cuckoo filter stores 16-bit key fingerprints in 4-slot
buckets; each key has exactly two candidate buckets ``i`` and
``i ^ H(fingerprint)`` (partial-key cuckoo hashing — the pair is recoverable
from either member, which is what makes displacement and MERGE possible
without the original keys). Lookup probes 8 slots; delete removes one
matching fingerprint; at the default geometry the false-positive rate is
bounded by ``2·slots/2^16 ≈ 1.2e-4`` and the table fills to ~95% load.

Distributed build: per-block partials merge by REINSERTING the other side's
fingerprints (the candidate pair is bucket-translation-invariant), so the
filter drops into the same tree-combine machinery as the Bloom cascade.
Merge is membership-preserving but (like the growing cascade,
tests/test_merge_properties.py) not state-exact across merge orders —
displacement order differs. Inserts are bulk-vectorized: two numpy
rank-vs-free-slot placement passes cover the overwhelming majority of a
batch, and only the handful of leftovers walk the classic per-item eviction
loop.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_KEY_SEED = 0xC0C0_0F11
_FP_MIX = _U64(0x9E3779B97F4A7C15)


class CuckooCapacityError(RuntimeError):
    """Raised when an insert cannot place a fingerprint within max kicks."""


class CuckooFilter:
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, num_buckets: int):
        if num_buckets < 1 or (num_buckets & (num_buckets - 1)) != 0:
            raise ValueError("num_buckets must be a power of two")
        self.num_buckets = num_buckets
        self.buckets = np.zeros((num_buckets, self.SLOTS), dtype=np.uint16)
        self.key_count = 0

    @classmethod
    def for_capacity(cls, n: int, load: float = 0.84) -> "CuckooFilter":
        need = max(1, int(np.ceil(n / (cls.SLOTS * load))))
        return cls(1 << int(np.ceil(np.log2(need))))

    # -- hashing ------------------------------------------------------------
    def _fp_and_buckets(self, col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h = splitmix64(hash64(col, _KEY_SEED))
        fp = ((h >> _U64(48)).astype(np.uint16)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        mask = _U64(self.num_buckets - 1)
        i1 = (h & mask).astype(np.int64)
        i2 = self._alt(i1, fp)
        return fp, i1, i2

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        hf = splitmix64(fp.astype(_U64) * _FP_MIX)
        return (i.astype(_U64) ^ (hf & _U64(self.num_buckets - 1))).astype(np.int64)

    # -- bulk insert ----------------------------------------------------------
    def _bulk_place(self, fp: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Vectorized placement of (fp, bucket) pairs into free slots.
        Returns a boolean mask of items that were placed."""
        if len(fp) == 0:
            return np.zeros(0, dtype=bool)
        free = (self.buckets[idx] == 0).sum(axis=1)  # free slots in each target
        order = np.argsort(idx, kind="stable")
        idx_s = idx[order]
        # rank of each item within its bucket group
        new_grp = np.ones(len(idx_s), dtype=bool)
        new_grp[1:] = idx_s[1:] != idx_s[:-1]
        grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(idx_s)), 0))
        rank = np.arange(len(idx_s)) - grp_start
        fits = rank < free[order]
        placed = np.zeros(len(fp), dtype=bool)
        placed[order[fits]] = True
        # scatter the placed fingerprints into concrete slots, bucket-major
        p_idx, p_fp = idx[placed], fp[placed]
        o2 = np.argsort(p_idx, kind="stable")
        p_idx, p_fp = p_idx[o2], p_fp[o2]
        ng = np.ones(len(p_idx), dtype=bool)
        ng[1:] = p_idx[1:] != p_idx[:-1]
        gs = np.maximum.accumulate(np.where(ng, np.arange(len(p_idx)), 0))
        within = np.arange(len(p_idx)) - gs
        # argsort(occupied) lists EMPTY slots first -> the g-th item placed
        # into a bucket takes that bucket's g-th empty slot
        slot_order = np.argsort(self.buckets[p_idx] != 0, axis=1, kind="stable")
        slot = np.take_along_axis(slot_order, within[:, None], axis=1)[:, 0]
        self.buckets[p_idx, slot] = p_fp
        return placed

    def insert_column(self, col) -> None:
        fp, i1, i2 = self._fp_and_buckets(col)
        self.key_count += len(fp)
        placed = self._bulk_place(fp, i1)
        rem = ~placed
        if rem.any():
            placed2 = self._bulk_place(fp[rem], i2[rem])
            rem_idx = np.flatnonzero(rem)[~placed2]
        else:
            rem_idx = np.empty(0, dtype=np.int64)
        for j in rem_idx:  # leftovers: classic eviction walk (few at sane load)
            self._insert_one(int(fp[j]), int(i1[j]))

    def _insert_one(self, f: int, i: int) -> None:
        for attempt in range(self.MAX_KICKS):
            row = self.buckets[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = f
                return
            # deterministic victim: derived from (fingerprint, bucket, attempt)
            # — mixing the bucket in breaks walk cycles that a pure
            # (fingerprint, attempt) choice falls into on full neighborhoods
            # int() BEFORE the modulo: numpy uint64 % python-int promotes to
            # float64, whose ulp at 2^63 is > SLOTS — the remainder would
            # degenerate to a constant
            victim = (
                int(splitmix64(np.array([(f * 0x5851F42D) ^ (i * 0x2545F491) ^ attempt], dtype=_U64))[0])
                % self.SLOTS
            )
            f, row[victim] = int(row[victim]), f
            i = int(self._alt(np.array([i]), np.array([f], dtype=np.uint16))[0])
        raise CuckooCapacityError(
            f"cuckoo filter over capacity (load={self.load_factor():.3f}); "
            "size with for_capacity(n)"
        )

    # adapter alias: the SketchAgg/sketch_global machinery feeds batches via
    # update_column, matching the rest of the state/ family
    def update_column(self, col) -> None:
        self.insert_column(col)

    # -- queries --------------------------------------------------------------
    def contains_column(self, col) -> np.ndarray:
        fp, i1, i2 = self._fp_and_buckets(col)
        in1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        in2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_column(self, col) -> np.ndarray:
        """Delete ONE stored copy per requested key. Returns per-key success.
        Only delete keys that were inserted — deleting a never-inserted key
        can evict a colliding neighbor (the documented cuckoo contract)."""
        fp, i1, i2 = self._fp_and_buckets(col)
        ok = np.zeros(len(fp), dtype=bool)
        for j in range(len(fp)):  # deletes are rare-path; correctness first
            for i in (int(i1[j]), int(i2[j])):
                row = self.buckets[i]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    row[hit[0]] = 0
                    ok[j] = True
                    self.key_count -= 1
                    break
        return ok

    def load_factor(self) -> float:
        return float((self.buckets != 0).sum() / self.buckets.size)

    @property
    def fpr_bound(self) -> float:
        return 2.0 * self.SLOTS / 65536.0

    # -- merge / io -----------------------------------------------------------
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        if other.num_buckets != self.num_buckets:
            raise ValueError("cannot merge cuckoo filters with different geometry")
        occ_i, occ_s = np.nonzero(other.buckets)
        fps = other.buckets[occ_i, occ_s]
        placed = self._bulk_place(fps, occ_i.astype(np.int64))
        rem = np.flatnonzero(~placed)
        if len(rem):
            alt = self._alt(occ_i[rem].astype(np.int64), fps[rem])
            placed2 = self._bulk_place(fps[rem], alt)
            for k in np.flatnonzero(~placed2):
                self._insert_one(int(fps[rem][k]), int(occ_i[rem][k]))
        self.key_count += other.key_count
        return self

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            {"nb": self.num_buckets, "buckets": self.buckets, "n": self.key_count}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        d = loads_sketch(data)
        out = cls(d["nb"])
        out.buckets = d["buckets"]
        out.key_count = d["n"]
        return out
