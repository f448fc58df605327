"""q-digest — the classic mergeable quantile sketch over a BOUNDED integer
universe (Shrivastava, Buragohain, Agrawal, Suri 2004, "Medians and Beyond").

Complements the suite's comparison-based quantile sketches: KLL/REQ bound
RANK error for arbitrary comparables, t-digest bounds relative rank error,
DDSketch bounds relative VALUE error — q-digest is the tree-structured one
for bounded integer domains (byte counts, latencies in µs buckets, char
counts): a subset of dyadic-interval nodes over [0, 2^L) where every
non-root kept node satisfies the digest property
``count(v) + count(parent) + count(sibling) > ⌊n/k⌋`` after compression,
giving rank queries within ε·n for k = ⌈1/ε · L⌉ nodes kept — size depends
on log(universe), NOT on n.

Merge = add counts node-wise + recompress: associative and commutative up
to recompression (estimates stay within the ε bound under ANY merge tree —
the property Ray's partial-per-block + combine aggregation needs, same
contract as every sketch in state/).

Vectorization: updates bucket values to leaves with one np.add.at;
compression walks the L levels bottom-up, each level one vectorized pass
(children pairs → parent ids via ``ids >> 1``); quantile() accumulates
node counts in post-order via one lexsort on (right-endpoint, depth).

No reference-repo counterpart; [RULE] sketch-library surface.
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class QDigest:
    """Mergeable q-digest over integers in [0, 2^log_universe)."""

    def __init__(self, log_universe: int = 20, k: int = 256):
        if not 1 <= log_universe <= 40:
            raise ValueError("log_universe must be in [1, 40]")
        self.L = log_universe
        self.k = k
        self.n = 0
        # sparse node map: dyadic node id -> count. Node ids use the heap
        # numbering: root = 1; node x at depth d covers a 2^(L-d) slice;
        # leaves are ids [2^L, 2^(L+1)).
        self.ids = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)

    # -- updates ---------------------------------------------------------------

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.int64)
        if len(v) == 0:
            return
        if (v < 0).any() or (v >= (1 << self.L)).any():
            raise ValueError(f"values outside [0, 2^{self.L})")
        w = np.ones(len(v), dtype=np.int64) if weights is None else np.asarray(weights, np.int64)
        leaf = v + (np.int64(1) << np.int64(self.L))
        uid, inv = np.unique(leaf, return_inverse=True)
        uw = np.zeros(len(uid), dtype=np.int64)
        np.add.at(uw, inv, w)
        self._absorb(uid, uw)
        self.n += int(w.sum())
        self._compress()

    def _absorb(self, ids: np.ndarray, counts: np.ndarray) -> None:
        """Merge a sorted-unique (ids, counts) batch into the node map."""
        all_ids = np.concatenate([self.ids, ids])
        all_cnt = np.concatenate([self.counts, counts])
        uid, inv = np.unique(all_ids, return_inverse=True)
        ucnt = np.zeros(len(uid), dtype=np.int64)
        np.add.at(ucnt, inv, all_cnt)
        self.ids, self.counts = uid, ucnt

    def _compress(self) -> None:
        """Bottom-up: collapse (node, sibling) into parent while the digest
        property would still hold; one vectorized pass per level."""
        if self.n == 0 or len(self.ids) == 0:
            return
        thresh = self.n // self.k
        ids, cnt = self.ids, self.counts
        for depth in range(self.L, 0, -1):
            lo, hi = np.int64(1) << np.int64(depth), np.int64(1) << np.int64(depth + 1)
            at = (ids >= lo) & (ids < hi)
            if not at.any():
                continue
            nid, ncnt = ids[at], cnt[at]
            parent = nid >> 1
            up, pinv = np.unique(parent, return_inverse=True)
            fam = np.zeros(len(up), dtype=np.int64)
            np.add.at(fam, pinv, ncnt)
            # family total (node + sibling; parent's own count joins above):
            # collapse families with fam <= thresh into the parent
            collapse = fam[pinv] <= thresh
            if not collapse.any():
                continue
            keep_ids = np.concatenate([ids[~at], nid[~collapse]])
            keep_cnt = np.concatenate([cnt[~at], ncnt[~collapse]])
            up_c, upinv = np.unique(parent[collapse], return_inverse=True)
            upcnt = np.zeros(len(up_c), dtype=np.int64)
            np.add.at(upcnt, upinv, ncnt[collapse])
            all_ids = np.concatenate([keep_ids, up_c])
            all_cnt = np.concatenate([keep_cnt, upcnt])
            uid, inv = np.unique(all_ids, return_inverse=True)
            ucnt = np.zeros(len(uid), dtype=np.int64)
            np.add.at(ucnt, inv, all_cnt)
            ids, cnt = uid, ucnt
        self.ids, self.counts = ids, cnt

    # -- queries ---------------------------------------------------------------

    def _node_ranges(self):
        """(lo, hi_exclusive, count) per node in VALUE space."""
        # depth = floor(log2(id)) via a vectorized binary bit-length walk
        bl = np.zeros(len(self.ids), dtype=np.int64)
        x = self.ids.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            step = x >= (np.int64(1) << np.int64(shift))
            bl[step] += shift
            x[step] >>= np.int64(shift)
        d = bl
        span = np.int64(1) << (np.int64(self.L) - d)
        lo = (self.ids - (np.int64(1) << d)) * span
        return lo, lo + span, self.counts

    def quantile(self, q: float) -> int:
        """Value whose estimated rank covers q·n (within ε·n = n·L/k)."""
        if self.n == 0:
            raise ValueError("empty digest")
        lo, hi, cnt = self._node_ranges()
        # q-digest rank rule: scan nodes in order of (right endpoint, span)
        order = np.lexsort((hi - lo, hi))
        csum = np.cumsum(cnt[order])
        target = max(int(np.ceil(q * self.n)), 1)
        pos = int(np.searchsorted(csum, target))
        pos = min(pos, len(order) - 1)
        return int(hi[order][pos] - 1)

    def rank_bound(self) -> float:
        """Guaranteed rank-error bound ε·n with ε = L/k."""
        return self.n * self.L / self.k

    # -- merge / io ------------------------------------------------------------

    def merge(self, other: "QDigest") -> "QDigest":
        if (other.L, other.k) != (self.L, self.k):
            raise ValueError("parameter mismatch")
        self._absorb(other.ids, other.counts)
        self.n += other.n
        self._compress()
        return self

    @property
    def num_nodes(self) -> int:
        return len(self.ids)

    def update_column(self, col) -> None:
        import pyarrow as pa

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        self.update(col.to_numpy(zero_copy_only=False).astype(np.int64))

    def to_bytes(self) -> bytes:
        return dumps_sketch((self.L, self.k, self.n, self.ids, self.counts))

    @classmethod
    def from_bytes(cls, data: bytes) -> "QDigest":
        L, k, n, ids, counts = loads_sketch(data)
        out = cls(L, k)
        out.n, out.ids, out.counts = n, ids, counts
        return out
