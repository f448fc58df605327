"""CRLite-style EXACT set encoding — a Bloom-filter cascade with zero error
inside a known universe.

Larisch et al. IEEE S&P 2017 ("CRLite: A Scalable System for Pushing All
TLS Revocations to All Browsers"), the construction Mozilla ships for
certificate revocation: given a member set S inside a KNOWN finite
universe U, layer 1 is a Bloom filter over S; its false positives among
U∖S become layer 2's member set; layer 2's false positives among S become
layer 3's; … until a layer has no false positives.  A query walks the
cascade — the deepest layer that still contains the key decides by PARITY
(odd depth ⇒ member).  Within U the answer is EXACT (FP = FN = 0); the
approximation error is pushed entirely onto keys outside the universe,
which the deployment contract says are never asked.

Layer sizing follows the paper: layer 1 at fp ≈ |U∖S|-proportional budget
(r·|S| bits), deeper layers shrink geometrically since each holds only the
previous layer's false positives (expected fp·|candidates|) — total size
O(|S|) bits regardless of |U|, the property that makes "ship the whole
revocation set to every client" feasible and here makes "broadcast the
exact member set to every task" cheap where a Roaring bitmap of a sparse
64-bit key space would not be.

This is the missing EXACT sibling of the library's core: the reference's
cascade (state/bloom.BloomCascade) grows layers to keep FPR low under
inserts; CRLite's cascade closes the loop to zero error for a frozen
(S, U) snapshot.  Build is vectorized (one hash pass per layer per side);
NOT mergeable — rebuild per snapshot, like Xor8/fuse (the static
contract), shard by key hash to distribute.
"""

from __future__ import annotations

import math

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import km_positions, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64


class _PlainBloom:
    __slots__ = ("m", "k", "seed", "bits")

    def __init__(self, n: int, fp: float, seed: int):
        n = max(1, n)
        ideal = max(64, int(math.ceil(-n * math.log(max(fp, 1e-12)) / (math.log(2) ** 2))))
        self.m = 1 << (ideal - 1).bit_length()  # km_positions wants a power of two
        self.k = max(1, int(round(self.m / n * math.log(2))))
        self.seed = seed
        self.bits = np.zeros((self.m + 63) // 64, dtype=_U64)

    def _pos(self, h: np.ndarray) -> np.ndarray:
        h1 = splitmix64(h ^ _U64(self.seed))
        # h2 must be ODD for full period mod 2^t (km_positions contract,
        # same convention as state/bloom.py) — an even h2 collapses the k
        # probes onto a short cycle and inflates per-layer FPR
        h2 = splitmix64(h1 ^ _U64(0x9E3779B97F4A7C15)) | _U64(1)
        return km_positions(h1, h2, self.k, self.m)

    def add(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        pos = self._pos(h).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> 6).astype(np.int64), _U64(1) << (pos.astype(_U64) & _U64(63))
        )

    def contains(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._pos(h)  # (n, k)
        word = (pos >> _U64(6)).astype(np.int64)
        bit = pos & _U64(63)
        hit = ((self.bits[word] >> bit) & _U64(1)).astype(bool)
        return hit.all(axis=1)


class CRLiteCascade:
    """Exact membership for ``members ⊆ universe`` (64-bit key hashes)."""

    def __init__(
        self, members: np.ndarray, universe: np.ndarray, fp: float = 0.5, max_layers: int = 64
    ):
        inside = np.unique(np.asarray(members, dtype=_U64))
        uni = np.unique(np.asarray(universe, dtype=_U64))
        if len(np.setdiff1d(inside, uni)):
            raise ValueError("members must be a subset of the universe")
        outside = np.setdiff1d(uni, inside)
        self.n_members = len(inside)
        self.layers: list[_PlainBloom] = []
        include, exclude = inside, outside
        for depth in range(max_layers):
            if len(include) == 0:
                break
            # layer 1 spends real bits (fp 1/√2-ish per paper); deeper layers
            # hold only survivors, so the same rate shrinks them geometrically
            bl = _PlainBloom(len(include), fp, seed=0xC121 + depth)
            bl.add(include)
            self.layers.append(bl)
            fps = exclude[bl.contains(exclude)] if len(exclude) else np.empty(0, _U64)
            include, exclude = fps, include
        else:  # pragma: no cover - geometric shrink terminates long before
            raise RuntimeError("cascade failed to close")

    def contains(self, keys: np.ndarray) -> np.ndarray:
        h = np.asarray(keys, dtype=_U64)
        depth = np.zeros(len(h), dtype=np.int64)
        alive = np.ones(len(h), dtype=bool)
        for i, bl in enumerate(self.layers):
            if not alive.any():
                break
            idx = np.flatnonzero(alive)
            hit = bl.contains(h[idx])
            depth[idx[hit]] = i + 1
            alive[idx[~hit]] = False
        return (depth % 2) == 1  # odd deepest layer ⇒ member

    @property
    def nbytes(self) -> int:
        return sum(bl.bits.nbytes for bl in self.layers)

    @property
    def n_layers(self) -> int:
        return len(self.layers)

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            [(bl.m, bl.k, bl.seed, bl.bits) for bl in self.layers] + [self.n_members]
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CRLiteCascade":
        *layers, n_members = loads_sketch(data)
        out = cls.__new__(cls)
        out.n_members = n_members
        out.layers = []
        for m, k, seed, bits in layers:
            bl = _PlainBloom.__new__(_PlainBloom)
            bl.m, bl.k, bl.seed, bl.bits = m, k, seed, bits
            out.layers.append(bl)
        return out
