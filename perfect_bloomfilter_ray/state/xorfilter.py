"""Xor8 static membership filter (Graf & Lemire 2019).

The immutable counterpart of the Bloom cascade in state/bloom.py: given a
FIXED key set, a 3-wise xor filter stores ~9.84 bits/key (1.23 cells/key ×
8-bit fingerprints) with zero false negatives and ~1/256 false-positive
rate — smaller and faster to probe than a Bloom filter at the same ε, at
the cost of being build-once (no inserts after construction; the reference
library's rollover/rebuild rule, README.md:19-23 of /root/reference, is
the same trade made dynamic).

Construction is hypergraph peeling: every key occupies one cell in each of
three equal segments; repeatedly pop any cell containing exactly one key
(tracked with count + xor-of-hashes accumulators, so the singleton's
identity is read directly from the accumulator), then assign fingerprints
in reverse pop order so each key's three cells xor to its fingerprint.
Peeling succeeds w.h.p. at capacity 1.23·n + 32; on failure the build
retries with the next derived seed. Keys enter as 64-bit hashes; the mix
is splitmix64(key ^ seed) which is BIJECTIVE, so distinct 64-bit keys can
never collide inside a build (collisions can only happen upstream in the
key→64-bit hash, ~n²/2⁻⁶⁴).

Cluster shape: a filter is built per hash shard (each shard's key set fits
one task) and probed via one broadcast of the per-shard fingerprint
arrays — the sharded-filter geometry of stages/membership.py. The filter
itself is NOT mergeable (unlike the Bloom cascade); sharding is the
distribution mechanism, exactly like the reference's jump-hash routing.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import splitmix64

_U64 = np.uint64


def _mix(hashes: np.ndarray, seed: int) -> np.ndarray:
    return splitmix64(hashes.astype(_U64) ^ _U64(seed))


def _positions(h: np.ndarray, bl: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    b = _U64(bl)
    p0 = (h % b).astype(np.int64)
    p1 = (((h >> _U64(21)) % b) + b).astype(np.int64)
    p2 = (((h >> _U64(42)) % b) + _U64(2) * b).astype(np.int64)
    return p0, p1, p2


def _fingerprint(h: np.ndarray) -> np.ndarray:
    return ((h ^ (h >> _U64(32))) & _U64(0xFF)).astype(np.uint8)


class Xor8:
    """Build-once 8-bit xor filter over distinct 64-bit key hashes."""

    __slots__ = ("seed", "bl", "cells", "n")

    def __init__(self, key_hashes: np.ndarray, seed_base: int = 0x9E37) -> None:
        keys = np.unique(key_hashes.astype(_U64))
        self.n = len(keys)
        bl = max(4, (int(1.23 * self.n) + 32 + 2) // 3)
        self.bl = bl
        cap = 3 * bl
        if self.n == 0:
            self.seed = seed_base
            self.cells = np.zeros(cap, dtype=np.uint8)
            return
        for attempt in range(64):
            seed = int(splitmix64(np.array([seed_base + attempt], dtype=_U64))[0])
            order, cellstack = self._peel(keys, seed, bl)
            if order is not None:
                break
        else:  # pragma: no cover - probability ~2^-64
            raise RuntimeError("xor filter peeling failed for 64 seeds")
        self.seed = seed
        # reverse-order assignment: each popped cell is written exactly once,
        # so B[c] is still 0 when the formula reads it. `order` holds the
        # already-MIXED hashes (the peel accumulators store mixed values).
        h = order
        p0, p1, p2 = _positions(h, bl)
        fp = _fingerprint(h)
        B = np.zeros(cap, dtype=np.uint8)
        for i in range(len(h) - 1, -1, -1):
            B[cellstack[i]] = fp[i] ^ B[p0[i]] ^ B[p1[i]] ^ B[p2[i]]
        self.cells = B

    @staticmethod
    def _peel(keys: np.ndarray, seed: int, bl: int):
        cap = 3 * bl
        h = _mix(keys, seed)
        p0, p1, p2 = _positions(h, bl)
        cnt = np.zeros(cap, dtype=np.int64)
        xs = np.zeros(cap, dtype=_U64)
        for p in (p0, p1, p2):
            np.add.at(cnt, p, 1)
            np.bitwise_xor.at(xs, p, h)
        order = np.empty(len(keys), dtype=_U64)
        cells = np.empty(len(keys), dtype=np.int64)
        top = 0
        sing = np.flatnonzero(cnt == 1)
        while len(sing):
            hs = xs[sing]
            # the same key can be the singleton of 2-3 cells this round:
            # keep one pop cell per key (mixed hashes are unique per build)
            uh, first = np.unique(hs, return_index=True)
            pc = sing[first]
            order[top : top + len(uh)] = uh
            cells[top : top + len(uh)] = pc
            top += len(uh)
            q0, q1, q2 = _positions(uh, bl)
            for p in (q0, q1, q2):
                np.add.at(cnt, p, -1)
                np.bitwise_xor.at(xs, p, uh)
            sing = np.flatnonzero(cnt == 1)
        if top != len(keys):
            return None, None
        return order[:top], cells[:top]

    def contains(self, key_hashes: np.ndarray) -> np.ndarray:
        """Vectorized probe: True for every inserted key (no FN); fresh
        keys pass with probability ~1/256."""
        if self.n == 0:
            return np.zeros(len(key_hashes), dtype=bool)
        h = _mix(key_hashes.astype(_U64), self.seed)
        p0, p1, p2 = _positions(h, self.bl)
        B = self.cells
        return (B[p0] ^ B[p1] ^ B[p2]) == _fingerprint(h)

    def to_state(self) -> tuple[int, int, int, bytes]:
        return (self.seed, self.bl, self.n, self.cells.tobytes())

    @classmethod
    def from_state(cls, state: tuple[int, int, int, bytes]) -> "Xor8":
        obj = cls.__new__(cls)
        obj.seed, obj.bl, obj.n = state[0], state[1], state[2]
        obj.cells = np.frombuffer(state[3], dtype=np.uint8)
        return obj
