"""DGIM exponential histogram for sliding-window counting.

Datar, Gionis, Indyk, Motwani (SICOMP 2002): count the events in the last
W time units of a stream using O(k · log n) buckets instead of the raw
window. Buckets hold (size = 2^j, rightmost event timestamp); at most
``k`` buckets of each size are kept, and inserting past that merges the
two OLDEST buckets of the size into one of double size stamped with the
more recent of their timestamps. A window query sums every bucket whose
timestamp falls inside the window and credits HALF the oldest straddling
bucket — the classic ≤ 1/(2(k-1)) relative-error bound.

Sequencing contract: DGIM is inherently per-stream sequential (it is the
textbook *streaming* counter — the one sketch in this library that is NOT
mergeable). The Ray embedding therefore partitions by stream key and
replays each key's events in timestamp order inside ONE ``map_groups``
task: parallelism comes from the key dimension, exactly how a per-entity
streaming counter deploys on a cluster. This is the documented opposite
trade from the mergeable sketches in state/ (hll, cms, theta, kll...),
kept for the windowed-monitoring use case where the stream arrives
ordered per key anyway.

Reference parity: the reference engine keeps no sliding-window state;
this extends the sketch tier the same way HLL/CMS do (SURVEY.md §2).
"""

from __future__ import annotations


class DGIM:
    """Sliding-window event counter over integer timestamps."""

    __slots__ = ("k", "buckets", "total", "min_ts")

    def __init__(self, k: int = 4) -> None:
        if k < 2:
            raise ValueError("DGIM needs k >= 2 buckets per size")
        self.k = k
        # list of [size, rightmost_ts], oldest first; sizes ascend from the
        # right (newest buckets are size 1)
        self.buckets: list[list[int]] = []
        self.total = 0
        self.min_ts: int | None = None

    def insert(self, ts: int) -> None:
        ts = int(ts)
        self.total += 1
        if self.min_ts is None:
            self.min_ts = ts
        self.buckets.append([1, ts])
        # cascade merges: scan from the newest end; at most k of each size
        size = 1
        i = len(self.buckets) - 1
        while True:
            # count buckets of `size` ending at i (they are contiguous)
            j = i
            while j >= 0 and self.buckets[j][0] == size:
                j -= 1
            n_size = i - j
            if n_size <= self.k:
                break
            # merge the two OLDEST of this size (positions j+1, j+2)
            a = self.buckets[j + 1]
            b = self.buckets[j + 2]
            merged = [size * 2, max(a[1], b[1])]
            self.buckets[j + 1 : j + 3] = [merged]
            size *= 2
            i = j + 1
        # keep list ordered oldest->newest by timestamp (merges preserve it)

    def query(self, since_ts: int) -> int:
        """Estimated number of events with ts >= since_ts."""
        if self.total == 0:
            return 0
        if self.min_ts is not None and since_ts <= self.min_ts:
            return self.total  # window covers the whole stream: exact
        est = 0
        oldest_in = None
        for size, ts in self.buckets:
            if ts >= since_ts:
                if oldest_in is None:
                    oldest_in = size
                est += size
        if oldest_in is None:
            return 0
        return est - oldest_in // 2

    def n_buckets(self) -> int:
        return len(self.buckets)
