"""Minimal perfect hash — BBHash-style multi-level bitmaps.

Limasset, Rizk, Chikhi & Peterlongo 2017 ("Fast and scalable minimal
perfect hashing for massive key sets", SEA): a static injection
S → [0, |S|) in ~3-4 bits/key with NO stored keys.  Level ℓ hashes the
surviving keys into a bitmap of γ·|survivors| bits; positions hit by
EXACTLY ONE key are assigned (bit set), colliding keys survive to the
next level.  The final index of a key is the POPCOUNT RANK of its bit
across the concatenated level bitmaps — an order-preserving-free minimal
perfect hash, the structure behind static dictionaries, external-memory
k-mer tables and per-shard record offsets.

The name is earned literally: where the reference library's cascade makes
Bloom membership "near-perfect" (FPR → 0), an MPH over the SAME key set
is the exact endpoint — every member maps to a unique slot, so a parallel
value array turns it into a collision-free static dictionary.  Contract
mirrors Xor8/fuse/CRLite: build once per hash shard from the full key
set, broadcast the (tiny) bitmaps, probe vectorized; NOT mergeable.

Lookup for non-members is UNDEFINED (returns an arbitrary slot or -1
when the key falls on an unset bit at every level) — pair with the
cascade / fuse filter when the probe stream may contain strangers; that
composition (filter gates, MPH addresses) is exactly the deployment the
paper describes.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64


class MinimalPerfectHash:
    """BBHash with gamma bits/key/level over distinct 64-bit key hashes."""

    def __init__(self, key_hashes: np.ndarray, gamma: float = 2.0, max_levels: int = 64):
        keys = np.unique(np.asarray(key_hashes, dtype=_U64))
        self.n = len(keys)
        self.gamma = float(gamma)
        self.bitmaps: list[np.ndarray] = []
        self.sizes: list[int] = []
        surv = keys
        for level in range(max_levels):
            if len(surv) == 0:
                break
            m = max(64, int(self.gamma * len(surv)))
            h = splitmix64(surv ^ _U64(0xB0B0 + level))
            pos = (h % _U64(m)).astype(np.int64)
            cnt = np.bincount(pos, minlength=m)
            ok = cnt[pos] == 1  # keys alone in their slot are placed
            bits = np.zeros((m + 63) // 64, dtype=_U64)
            placed = pos[ok]
            np.bitwise_or.at(
                bits, placed >> 6, _U64(1) << (placed.astype(_U64) & _U64(63))
            )
            self.bitmaps.append(bits)
            self.sizes.append(m)
            surv = surv[~ok]
        else:  # pragma: no cover - gamma>=1 converges long before
            raise RuntimeError("MPH build did not converge")
        # exclusive popcount prefix per level (rank bases), plus per-word
        # exclusive popcount prefixes for O(1) vectorized rank
        self._word_prefix = []
        base = 0
        self._level_base = []
        for bits in self.bitmaps:
            pc = np.unpackbits(bits.view(np.uint8)).reshape(len(bits), 64).sum(axis=1)
            self._word_prefix.append(
                np.concatenate([[0], np.cumsum(pc)[:-1]]).astype(np.int64)
            )
            self._level_base.append(base)
            base += int(pc.sum())
        assert base == self.n  # every key placed exactly once

    @property
    def bits_per_key(self) -> float:
        return 64.0 * sum(len(b) for b in self.bitmaps) / self.n if self.n else 0.0

    @property
    def n_levels(self) -> int:
        return len(self.bitmaps)

    def lookup(self, key_hashes: np.ndarray) -> np.ndarray:
        """Slot in [0, n) for every MEMBER key; -1 where the key misses
        every level (a guaranteed non-member; members never return -1)."""
        q = np.asarray(key_hashes, dtype=_U64)
        out = np.full(len(q), -1, dtype=np.int64)
        alive = np.arange(len(q))
        for level, bits in enumerate(self.bitmaps):
            if len(alive) == 0:
                break
            m = self.sizes[level]
            h = splitmix64(q[alive] ^ _U64(0xB0B0 + level))
            pos = (h % _U64(m)).astype(np.int64)
            word = pos >> 6
            bit = pos.astype(_U64) & _U64(63)
            hit = ((bits[word] >> bit) & _U64(1)).astype(bool)
            if hit.any():
                hw = word[hit]
                # rank = level base + word prefix + popcount of lower bits
                lower = bits[hw] & ((_U64(1) << bit[hit]) - _U64(1))
                low_pc = np.unpackbits(
                    lower[:, None].view(np.uint8), axis=1
                ).sum(axis=1)
                out[alive[hit]] = (
                    self._level_base[level] + self._word_prefix[level][hw] + low_pc
                )
            alive = alive[~hit]
        return out

    def to_bytes(self) -> bytes:
        return dumps_sketch((self.n, self.gamma, self.sizes, self.bitmaps))

    @classmethod
    def from_bytes(cls, data: bytes) -> "MinimalPerfectHash":
        n, gamma, sizes, bitmaps = loads_sketch(data)
        out = cls.__new__(cls)
        out.n, out.gamma, out.sizes, out.bitmaps = n, gamma, sizes, bitmaps
        out._word_prefix = []
        out._level_base = []
        base = 0
        for bits in bitmaps:
            pc = np.unpackbits(bits.view(np.uint8)).reshape(len(bits), 64).sum(axis=1)
            out._word_prefix.append(
                np.concatenate([[0], np.cumsum(pc)[:-1]]).astype(np.int64)
            )
            out._level_base.append(base)
            base += int(pc.sum())
        return out
