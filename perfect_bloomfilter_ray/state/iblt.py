"""Invertible Bloom Lookup Table — EXACT set reconciliation in O(diff) space.

Goodrich & Mitzenmacher 2011 ("Invertible Bloom Lookup Tables") /
Eppstein-Goodrich-Uyeda-Varghese SIGCOMM'11 ("What's the Difference?"):
the rsync primitive of the AMQ family.  Each of two snapshots builds a
small cell table (count, keyXor, checkXor) over k=3 cells per key;
SUBTRACTING the tables cellwise yields a structure that depends ONLY on
the symmetric difference — then a peeling decode (find a "pure" cell
whose checksum matches its key, remove that key from its 3 cells, repeat)
recovers the EXACT differing keys with high probability whenever the cell
count is ~1.4× the difference size.  Two 10^11-row snapshots that differ
in 10^4 keys reconcile by exchanging kilobytes, not by shuffling either
table.

Contracts:
- update_column / merge follow the MergeableSketch protocol: insertion is
  cellwise addition — associative, commutative, so a global IBLT builds
  through the same partial/tree-merge shuffle as every sketch here
  (stages/agg.sketch_global).
- subtract(other) is exact and ORDER-SENSITIVE only in sign: keys only in
  self decode with count +1, keys only in other with −1.
- decode() returns (added, removed, ok): ok=False means the difference
  overflowed the table (cells too small) — the caller's contract is to
  rebuild with more cells, NEVER to trust a partial list silently.

All operations are vectorized (np.add.at / np.bitwise_xor.at over cell
index arrays; decode peels whole rounds of pure cells at once, the Xor8
singleton-queue shape).  The mix is splitmix64 (bijective), checksum a
second independent splitmix64 stream.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64
_K = 3
_CHECK_SEED = _U64(0xC0FFEE123456789)


def _positions(h: np.ndarray, m: int) -> list[np.ndarray]:
    # three independent cell indices from disjoint hash substreams
    out = []
    for r in range(_K):
        salt = _U64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF)
        hr = splitmix64(h ^ salt)
        out.append((hr % _U64(m)).astype(np.int64))
    return out


def _check(h: np.ndarray) -> np.ndarray:
    return splitmix64(h ^ _CHECK_SEED)


class IBLT:
    """Invertible Bloom lookup table over 64-bit keys (ints are cast)."""

    def __init__(self, m: int = 4096):
        if m < 8:
            raise ValueError("m must be >= 8")
        self.m = int(m)
        self.count = np.zeros(self.m, dtype=np.int64)
        self.key_xor = np.zeros(self.m, dtype=_U64)
        self.chk_xor = np.zeros(self.m, dtype=_U64)

    # -- updates --------------------------------------------------------------

    def _apply(self, keys: np.ndarray, sign: int) -> None:
        h = np.asarray(keys).astype(np.int64).view(_U64)
        chk = _check(h)
        for pos in _positions(h, self.m):
            np.add.at(self.count, pos, sign)
            np.bitwise_xor.at(self.key_xor, pos, h)
            np.bitwise_xor.at(self.chk_xor, pos, chk)

    def update_column(self, col) -> None:
        v = np.asarray(col if isinstance(col, np.ndarray) else col.to_numpy(zero_copy_only=False))
        if len(v):
            self._apply(v, +1)

    def delete_column(self, col) -> None:
        v = np.asarray(col if isinstance(col, np.ndarray) else col.to_numpy(zero_copy_only=False))
        if len(v):
            self._apply(v, -1)

    # -- merge / subtract ------------------------------------------------------

    def merge(self, other: "IBLT") -> "IBLT":
        if other.m != self.m:
            raise ValueError("cannot merge IBLTs of different sizes")
        self.count += other.count
        self.key_xor ^= other.key_xor
        self.chk_xor ^= other.chk_xor
        return self

    def subtract(self, other: "IBLT") -> "IBLT":
        if other.m != self.m:
            raise ValueError("cannot subtract IBLTs of different sizes")
        out = IBLT(self.m)
        out.count = self.count - other.count
        out.key_xor = self.key_xor ^ other.key_xor
        out.chk_xor = self.chk_xor ^ other.chk_xor
        return out

    # -- decode ----------------------------------------------------------------

    def decode(self) -> tuple[np.ndarray, np.ndarray, bool]:
        """Peel the (subtracted) table: returns (only_in_self, only_in_other,
        ok).  ok=False ⇒ the difference overflowed this table size and the
        lists are INCOMPLETE — rebuild with larger m."""
        count = self.count.copy()
        key_xor = self.key_xor.copy()
        chk_xor = self.chk_xor.copy()
        added: list[np.ndarray] = []
        removed: list[np.ndarray] = []
        # a legitimate decode peels at least one key per round, and at most
        # m keys fit, so > m+64 rounds means an overloaded table is cycling
        # (decode/undecode oscillation) — bail out; ok comes back False
        for _round in range(self.m + 64):
            pure = np.flatnonzero(
                (np.abs(count) == 1) & (_check(key_xor) == chk_xor)
            )
            if len(pure) == 0:
                break
            keys = key_xor[pure]
            signs = count[pure]
            # a key pure in several cells appears once per cell this round
            uk, first = np.unique(keys, return_index=True)
            keys, signs = keys[first], signs[first]
            added.append(keys[signs == 1])
            removed.append(keys[signs == -1])
            chk = _check(keys)
            for pos in _positions(keys, self.m):
                np.add.at(count, pos, -signs)
                np.bitwise_xor.at(key_xor, pos, keys)
                np.bitwise_xor.at(chk_xor, pos, chk)
        ok = bool((count == 0).all() and (key_xor == 0).all())
        a = np.sort(np.concatenate(added).view(np.int64)) if added else np.empty(0, np.int64)
        r = np.sort(np.concatenate(removed).view(np.int64)) if removed else np.empty(0, np.int64)
        return a, r, ok

    # -- serialization ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        return dumps_sketch((self.m, self.count, self.key_xor, self.chk_xor))

    @classmethod
    def from_bytes(cls, data: bytes) -> "IBLT":
        m, c, kx, cx = loads_sketch(data)
        out = cls(m)
        out.count, out.key_xor, out.chk_xor = c, kx, cx
        return out
