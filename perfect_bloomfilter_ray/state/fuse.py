"""Binary fuse filter, 8-bit (Graf & Lemire 2022, "Binary Fuse Filters:
Fast and Smaller Than Xor Filters", ACM JEA 27).

The successor of state/xorfilter.Xor8 at the storage-efficiency frontier of
the STATIC membership family: same 3-wise xor probe and zero false
negatives, but the three cells fall in three CONSECUTIVE segments of a
sliding window instead of three independent thirds — cache-local probes
and a tighter load threshold, ~1.125 cells/key (≈9.0 bits/key at 8-bit
fingerprints) vs xor's 1.23 (9.84 bits/key), FPR ≈ 1/256 either way.

Layout (the published parameterization): segment_length = 2^k with
k = floor(log(n)/log(3.33) + 2.25) capped at 2^18; capacity =
n · max(1.125, 0.875 + 0.25·ln(10^6)/ln(n)); the array is
(segment_count + 2) segments.  A key's start offset is the high-64
multiply of its mixed hash into segment_count·segment_length (the exact
mulhi shared with state/gcs — no wrap for any array size), h1/h2 sit one
and two segments later with xor-perturbed low bits, so the three cells
always land in three distinct segment-aligned blocks (distinct positions,
no degenerate hyperedges).

Construction is the same count+xor singleton peel as Xor8 (the fuse
paper's construction is peeling with a smarter schedule; the generic
queue converges for any 3-position scheme), retrying with a derived seed
on failure.  Static contract and cluster shape identical to Xor8: build
once per hash shard, probe via one broadcast of the per-shard cell
arrays (stages/membership.py geometry); NOT mergeable — sharding is the
distribution mechanism, like the reference's jump-hash routing.
"""

from __future__ import annotations

import math

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import splitmix64
from perfect_bloomfilter_ray.state.gcs import _map_to_range

_U64 = np.uint64


def _mix(hashes: np.ndarray, seed: int) -> np.ndarray:
    return splitmix64(hashes.astype(_U64) ^ _U64(seed))


def _fingerprint(h: np.ndarray) -> np.ndarray:
    return ((h ^ (h >> _U64(32))) & _U64(0xFF)).astype(np.uint8)


class BinaryFuse8:
    """Build-once 8-bit binary fuse filter over distinct 64-bit key hashes."""

    __slots__ = ("seed", "seg_len", "seg_count_len", "cells", "n")

    def __init__(self, key_hashes: np.ndarray, seed_base: int = 0xB1A2) -> None:
        keys = np.unique(np.asarray(key_hashes, dtype=_U64))
        self.n = len(keys)
        if self.n == 0:
            self.seg_len = 4
            self.seg_count_len = 4
            self.seed = seed_base
            self.cells = np.zeros(3 * 4, dtype=np.uint8)
            return
        n = self.n
        k = int(math.floor(math.log(max(n, 2)) / math.log(3.33) + 2.25))
        seg_len = 1 << max(2, min(k, 18))
        size_factor = max(1.125, 0.875 + 0.25 * math.log(1e6) / math.log(max(n, 2)))
        capacity = int(round(n * size_factor))
        init_segments = max(1, (capacity + seg_len - 1) // seg_len - 2)
        array_len = (init_segments + 2) * seg_len
        seg_count = max(1, array_len // seg_len - 2)
        self.seg_len = seg_len
        self.seg_count_len = seg_count * seg_len
        for attempt in range(128):
            seed = int(splitmix64(np.array([seed_base + attempt], dtype=_U64))[0])
            order, cellstack = self._peel(keys, seed)
            if order is not None:
                break
        else:  # pragma: no cover - repeated-failure probability negligible
            raise RuntimeError("binary fuse peeling failed for 128 seeds")
        self.seed = seed
        h = order
        p0, p1, p2 = self._positions(h)
        fp = _fingerprint(h)
        B = np.zeros(array_len, dtype=np.uint8)
        for i in range(len(h) - 1, -1, -1):
            B[cellstack[i]] = fp[i] ^ B[p0[i]] ^ B[p1[i]] ^ B[p2[i]]
        self.cells = B

    def _positions(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        sl = _U64(self.seg_len)
        mask = sl - _U64(1)
        h0 = _map_to_range(h, self.seg_count_len)
        h1 = (h0 + sl) ^ ((h >> _U64(18)) & mask)
        h2 = (h0 + _U64(2) * sl) ^ (h & mask)
        return h0.astype(np.int64), h1.astype(np.int64), h2.astype(np.int64)

    def _peel(self, keys: np.ndarray, seed: int):
        cap = self.seg_count_len + 2 * self.seg_len
        h = _mix(keys, seed)
        if len(np.unique(h)) != len(h):  # pragma: no cover - ~n^2/2^64
            return None, None
        p0, p1, p2 = self._positions(h)
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
            uh, first = np.unique(hs, return_index=True)
            pc_ = sing[first]
            order[top : top + len(uh)] = uh
            cells[top : top + len(uh)] = pc_
            top += len(uh)
            q0, q1, q2 = self._positions(uh)
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
        h = _mix(np.asarray(key_hashes, dtype=_U64), self.seed)
        p0, p1, p2 = self._positions(h)
        B = self.cells
        return (B[p0] ^ B[p1] ^ B[p2]) == _fingerprint(h)

    @property
    def bits_per_key(self) -> float:
        return 8.0 * len(self.cells) / self.n if self.n else 0.0

    def to_state(self) -> tuple[int, int, int, int, bytes]:
        return (self.seed, self.seg_len, self.seg_count_len, self.n, self.cells.tobytes())

    @classmethod
    def from_state(cls, state: tuple[int, int, int, int, bytes]) -> "BinaryFuse8":
        obj = cls.__new__(cls)
        obj.seed, obj.seg_len, obj.seg_count_len, obj.n = state[:4]
        obj.cells = np.frombuffer(state[4], dtype=np.uint8)
        return obj
