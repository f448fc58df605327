"""Counting Bloom filter (Fan, Cao, Almeida & Broder, ToN 2000) — the
deletable Bloom variant whose ENTIRE lifecycle is mergeable.

The reference's tiers (`filter.rs`, add-only bit arrays) cannot delete, and
the repo's cuckoo filter (state/cuckoo.py) deletes only through ONE mutable
object (its merge reinserts fingerprints, so deletions cannot be built as
independent partials). A counting Bloom filter closes that gap: cells are
COUNTERS, so

  - insert partials merge by counter ADDITION (exactly associative and
    commutative — byte-identical state across any merge order, the
    strongest contract in state/base.py's protocol);
  - a batch of deletions is itself a counting Bloom filter built over the
    deleted keys, and applying it is counter SUBTRACTION.

That makes distributed deletion a second tree-merged build followed by one
subtract — no sequential driver loop, no shared mutable actor. Exactness:
as long as every deleted key was previously inserted (the caller contract,
same as the paper's), subtraction is exact per cell and remaining keys keep
their no-false-negative guarantee; a deleted key may still test positive
with the filter's ordinary false-positive probability (other keys'
contributions on all k of its cells).

Hashing is Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m): two 64-bit
hashes per key, k derived cells, fully vectorized via one (rows, k) index
matrix + ``np.add.at``. Counters are uint32 (a cell's count is
Poisson(n*k/m) ~ O(1); overflow is unreachable at planned load — and the
10^12-key path shards by jump hash exactly like stages/membership.py).
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import hash64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64

_SEED_H1 = 0xC0FFEE_B10011
_SEED_H2 = 0xC0FFEE_B10012


class CountingBloomFilter:
    """Mergeable counting Bloom filter with exact counter-wise deletion.

    ``bits_per_key=48, num_hashes=32`` plans a ~9e-11 false-positive rate —
    small enough that contract round-trips observe 0 residual positives at
    test scales while the asymptotic bound stays published-formula-checkable
    (FPR = (1 - e^(-k*n/m))^k, tests/test_sketches.py).
    """

    def __init__(self, capacity: int, bits_per_key: int = 48, num_hashes: int = 32):
        self.capacity = int(capacity)
        self.num_cells = max(64, int(capacity) * int(bits_per_key))
        self.num_hashes = int(num_hashes)
        self.counts = np.zeros(self.num_cells, dtype=np.uint32)
        self.key_count = 0

    # -- hashing ----------------------------------------------------------
    def _cells(self, col) -> np.ndarray:
        """(rows, k) int64 cell-index matrix via double hashing."""
        h1 = hash64(col, _SEED_H1)
        h2 = hash64(col, _SEED_H2) | _U64(1)  # odd => full-period stride
        i = np.arange(self.num_hashes, dtype=_U64)
        with np.errstate(over="ignore"):
            cells = (h1[:, None] + i[None, :] * h2[:, None]) % _U64(self.num_cells)
        return cells.astype(np.int64)

    # -- MergeableSketch protocol ------------------------------------------
    def update_column(self, col) -> "CountingBloomFilter":
        cells = self._cells(col)
        np.add.at(self.counts, cells.ravel(), 1)
        self.key_count += cells.shape[0]
        return self

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if other.num_cells != self.num_cells or other.num_hashes != self.num_hashes:
            raise ValueError("counting-bloom merge requires identical geometry")
        self.counts += other.counts
        self.key_count += other.key_count
        return self

    def subtract(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Apply a deletion filter (counter subtraction). Caller contract:
        ``other``'s keys are a sub-multiset of this filter's inserted keys."""
        if other.num_cells != self.num_cells or other.num_hashes != self.num_hashes:
            raise ValueError("counting-bloom subtract requires identical geometry")
        if (other.counts > self.counts).any():
            raise ValueError("deletion filter contains keys never inserted")
        self.counts -= other.counts
        self.key_count -= other.key_count
        return self

    def contains_column(self, col) -> np.ndarray:
        cells = self._cells(col)
        return (self.counts[cells] > 0).all(axis=1)

    def to_bytes(self) -> bytes:
        return dumps_sketch(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountingBloomFilter":
        return loads_sketch(data)
