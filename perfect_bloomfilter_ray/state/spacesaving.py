"""Misra-Gries heavy-hitter summary — the mergeable top-k sketch.

Complements the count-min sketch: CMS answers *point* frequency queries for
keys you already know; Misra-Gries maintains the candidate top-k **set**
itself in O(m) space, so "what are the heavy hitters?" needs no second pass
over the data.

Misra & Gries 1982; mergeability per Agarwal, Cormode, Huang, Phillips,
Wei & Yi 2012 "Mergeable Summaries" (§3): keep at most ``m`` (key, count)
counters; when an update/merge would exceed ``m``, subtract the (m+1)-th
largest count from every counter and drop the non-positive ones. Under ANY
merge tree over a stream of total weight N:

  true_count(key) - err  <=  count(key)  <=  true_count(key)

with ``err`` (the accumulated subtraction, tracked exactly in ``self.err``)
bounded by N/(m+1). Every key with true weight > N/(m+1) is guaranteed
present. Counts are therefore under-estimates; ``upper_bound = count + err``.

No reference-repo counterpart (the reference is a membership filter only,
/root/reference/src/filter.rs); this is part of the [RULE] sketch-library
surface alongside HLL/CMS/KLL/t-digest/Theta.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class MisraGries:
    def __init__(self, m: int = 256):
        if m < 8:
            raise ValueError("m must be >= 8")
        self.m = m
        self.total = 0  # total stream weight seen
        self.err = 0  # accumulated decrement: true - count <= err, exactly tracked
        self.keys: np.ndarray = np.empty(0, dtype=object)
        self.counts: np.ndarray = np.empty(0, dtype=np.int64)

    # -- updates ---------------------------------------------------------------

    def update_column(self, col, weights: np.ndarray | None = None) -> None:
        """Vectorized batch update: per-batch value_counts (Arrow C++) then
        one combine+trim — no per-row Python."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not isinstance(col, (pa.Array, pa.ChunkedArray)):
            col = pa.array(col)
        if weights is None:
            vc = pc.value_counts(col)
            ks = vc.field("values").to_numpy(zero_copy_only=False)
            ws = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            ks_all = col.to_numpy(zero_copy_only=False)
            w_all = np.asarray(weights, dtype=np.int64)
            ks, inv = np.unique(ks_all, return_inverse=True)
            ws = np.zeros(len(ks), dtype=np.int64)
            np.add.at(ws, inv, w_all)
        self.total += int(ws.sum())
        self._combine(ks.astype(object), ws)

    def _combine(self, keys2: np.ndarray, counts2: np.ndarray) -> None:
        if len(self.keys) == 0:
            # keys2 is unique but (value_counts path) not sorted; estimate()
            # searchsorts, so keep the invariant: keys always sorted
            order = np.argsort(keys2, kind="stable")
            keys, counts = keys2[order], counts2[order]
        else:
            allk = np.concatenate([self.keys, keys2])
            allc = np.concatenate([self.counts, counts2])
            keys, inv = np.unique(allk, return_inverse=True)
            counts = np.zeros(len(keys), dtype=np.int64)
            np.add.at(counts, inv, allc)
        if len(keys) > self.m:
            # Misra-Gries trim: subtract the (m+1)-th largest count from all
            kth = np.partition(counts, -(self.m + 1))[-(self.m + 1)]
            self.err += int(kth)
            keep = counts > kth
            keys, counts = keys[keep], counts[keep] - kth
        self.keys, self.counts = keys, counts

    # -- queries ---------------------------------------------------------------

    def estimate(self, key) -> int:
        """Lower-bound count (0 if not retained); true <= estimate + err."""
        idx = np.searchsorted(self.keys, key)
        if idx < len(self.keys) and self.keys[idx] == key:
            return int(self.counts[idx])
        return 0

    def top_k(self, k: int) -> list[tuple[object, int]]:
        """(key, lower-bound count) pairs, count desc then key asc."""
        order = np.lexsort((self.keys, -self.counts))[:k]
        return [(self.keys[i], int(self.counts[i])) for i in order]

    @property
    def error_bound(self) -> int:
        """Exact accumulated under-count (≤ total/(m+1) by construction)."""
        return self.err

    # -- merge -----------------------------------------------------------------

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.m != other.m:
            raise ValueError("cannot merge MisraGries with different m")
        self.total += other.total
        self.err += other.err
        self._combine(other.keys, other.counts)
        return self

    # -- serialization ----------------------------------------------------------

    def to_bytes(self) -> bytes:
        return dumps_sketch(
            {"m": self.m, "total": self.total, "err": self.err, "keys": self.keys, "counts": self.counts}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        d = loads_sketch(data)
        out = cls(d["m"])
        out.total = d["total"]
        out.err = d["err"]
        out.keys = d["keys"]
        out.counts = d["counts"]
        return out
