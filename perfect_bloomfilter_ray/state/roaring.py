"""Roaring-style compressed bitmap index — EXACT mergeable set of int64 keys.

The exact-membership member of the library's AMQ family (Chambi, Lemire,
Kaser & Godin 2016 "Better bitmap performance with Roaring bitmaps"; the
container layout used by Lucene/Spark/Druid/ClickHouse): the key space is
chunked by the high bits (chunk = key >> 16) and each chunk stores its low
16 bits either as a SORTED uint16 array (≤ ``_ARRAY_MAX`` members — ≤ 8 KB)
or as a dense 2^16-bit bitmap (8 KB fixed), whichever is smaller.  Unlike
the Bloom cascade / xor / Golomb filters this is not approximate: contains()
is exact both ways, and intersection/union cardinalities are exact — the
structure backing exact distributed semi-joins and OLAP distinct-count
intersections where an AMQ's ε is unacceptable.

Differences from the paper kept deliberately: no run containers (the
synthetic key sets here are hash-scattered, runs don't pay for their
branchiness) and 64-bit keys via an unbounded high-48-bit chunk dict (the
paper's 32-bit two-level split generalized; chunk count is bounded by
key-range/2^16, not by corpus size).

Mergeable-UDAF contract (state/base.MergeableSketch): update_column is
vectorized (one np.unique + one split per batch — the per-chunk loop is
over TOUCHED chunks, bounded by key-range/65536, not rows), merge is an
exact per-chunk union (associative, commutative, idempotent), to_bytes
round-trips exactly.  Scale shape: partial bitmaps per block → tree-merge
(stages/agg.sketch_global), identical to every sketch in the library — but
the merged result is exact, so the filter side of a semi-join carries no
FPR term.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_ARRAY_MAX = 4096  # above this an array container flips to a bitmap (paper §2)
_WORDS = 1 << 10  # 2^16 bits / 64


def _popcount64(words: np.ndarray) -> int:
    return int(np.unpackbits(words.view(np.uint8)).sum())


def _to_bitmap(arr: np.ndarray) -> np.ndarray:
    bits = np.zeros(_WORDS, dtype=np.uint64)
    np.bitwise_or.at(
        bits, (arr >> 6).astype(np.int64), np.uint64(1) << (arr.astype(np.uint64) & np.uint64(63))
    )
    return bits


def _bitmap_members(bits: np.ndarray) -> np.ndarray:
    # bit i of word w (LSB-first) -> value w*64 + i
    u8 = np.unpackbits(bits.view(np.uint8), bitorder="little")
    return np.flatnonzero(u8).astype(np.uint16)


def _union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union two containers (either kind), normalizing the result kind."""
    a_bm, b_bm = a.dtype == np.uint64, b.dtype == np.uint64
    if a_bm and b_bm:
        return np.bitwise_or(a, b)
    if a_bm or b_bm:
        bits = (a if a_bm else b).copy()
        arr = b if a_bm else a
        np.bitwise_or.at(
            bits, (arr >> 6).astype(np.int64), np.uint64(1) << (arr.astype(np.uint64) & np.uint64(63))
        )
        return bits
    u = np.union1d(a, b)
    return u if len(u) <= _ARRAY_MAX else _to_bitmap(u)


def _card(c: np.ndarray) -> int:
    return _popcount64(c) if c.dtype == np.uint64 else len(c)


def _and_card(a: np.ndarray, b: np.ndarray) -> int:
    a_bm, b_bm = a.dtype == np.uint64, b.dtype == np.uint64
    if a_bm and b_bm:
        return _popcount64(np.bitwise_and(a, b))
    if a_bm or b_bm:
        bits, arr = (a, b) if a_bm else (b, a)
        hit = (bits[(arr >> 6).astype(np.int64)] >> (arr.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return int(hit.sum())
    return len(np.intersect1d(a, b, assume_unique=True))


class RoaringBitmap:
    """Exact mergeable bitmap over non-negative int64 keys."""

    def __init__(self) -> None:
        self.chunks: dict[int, np.ndarray] = {}

    # -- updates --------------------------------------------------------------

    def update_column(self, col) -> None:
        v = np.asarray(col if isinstance(col, np.ndarray) else col.to_numpy(zero_copy_only=False))
        if len(v) == 0:
            return
        v = np.unique(v.astype(np.int64))
        if v[0] < 0:
            raise ValueError("RoaringBitmap keys must be non-negative")
        hi = v >> 16
        lo = (v & 0xFFFF).astype(np.uint16)
        starts = np.flatnonzero(np.diff(hi, prepend=hi[0] - 1))
        bounds = np.append(starts, len(v))
        for s, e in zip(bounds[:-1], bounds[1:]):
            key = int(hi[s])
            new = lo[s:e]
            if len(new) > _ARRAY_MAX:
                new = _to_bitmap(new)
            old = self.chunks.get(key)
            self.chunks[key] = new if old is None else _union(old, new)

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "RoaringBitmap") -> "RoaringBitmap":
        for key, c in other.chunks.items():
            mine = self.chunks.get(key)
            self.chunks[key] = c.copy() if mine is None else _union(mine, c)
        return self

    # -- queries --------------------------------------------------------------

    def contains(self, values) -> np.ndarray:
        v = np.asarray(values if isinstance(values, np.ndarray) else values.to_numpy(zero_copy_only=False)).astype(np.int64)
        out = np.zeros(len(v), dtype=bool)
        if len(v) == 0:
            return out
        hi = v >> 16
        lo = (v & 0xFFFF).astype(np.uint16)
        order = np.argsort(hi, kind="stable")
        sh = hi[order]
        starts = np.flatnonzero(np.diff(sh, prepend=sh[0] - 1)) if len(sh) else np.empty(0, np.int64)
        bounds = np.append(starts, len(v))
        for s, e in zip(bounds[:-1], bounds[1:]):
            idx = order[s:e]
            c = self.chunks.get(int(sh[s]))
            if c is None:
                continue
            q = lo[idx]
            if c.dtype == np.uint64:
                out[idx] = ((c[(q >> 6).astype(np.int64)] >> (q.astype(np.uint64) & np.uint64(63))) & np.uint64(1)).astype(bool)
            else:
                pos = np.searchsorted(c, q)
                ok = pos < len(c)
                safe = np.minimum(pos, max(len(c) - 1, 0))
                out[idx] = ok & (c[safe] == q)
        return out

    def cardinality(self) -> int:
        return sum(_card(c) for c in self.chunks.values())

    def and_cardinality(self, other: "RoaringBitmap") -> int:
        keys = self.chunks.keys() & other.chunks.keys()
        return sum(_and_card(self.chunks[k], other.chunks[k]) for k in keys)

    def to_array(self) -> np.ndarray:
        """All members, sorted ascending (int64)."""
        parts = []
        for key in sorted(self.chunks):
            c = self.chunks[key]
            lo = _bitmap_members(c) if c.dtype == np.uint64 else c
            parts.append((np.int64(key) << 16) | lo.astype(np.int64))
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    @property
    def nbytes(self) -> int:
        return sum(c.nbytes for c in self.chunks.values())

    # -- serialization ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        return dumps_sketch(self.chunks)

    @classmethod
    def from_bytes(cls, data: bytes) -> "RoaringBitmap":
        out = cls()
        out.chunks = loads_sketch(data)
        return out
