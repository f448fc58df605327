"""Frequent Directions — a mergeable low-rank MATRIX sketch (Liberty 2013,
Ghashami et al. 2016).

Maintains an ``l x dim`` sketch ``B`` of a (tall) row-stream matrix ``A``
such that ``0 <= ||A^T A - B^T B||_2 <= ||A||_F^2 / (l - k)`` for every
rank ``k < l`` (deterministic, worst-case — no randomness, no failure
probability). The covariance-method PCA in ``state/moments.py`` is exact
but costs dim^2 floats per partial; FD costs ``l x dim`` and is the
standard answer once dim grows past the moments gate (dim >~ 4k: think
1k-4k-dim text embeddings where dim^2 partials stop being "slim").

Mergeability (the property every sketch in this library must have): FD is
a *mergeable summary* in the Agarwal et al. sense — ``merge(B1, B2) =
shrink(vstack(B1, B2))`` keeps the SAME error bound as a single-stream
sketch, so partials combine associatively/commutatively up to float
rounding in the repo's partial/tree-merge machinery (``stages/agg``).

Shrink step: SVD of the buffered rows, subtract the (l-th singular
value)^2 from every squared singular value, rebuild. Buffering 2l rows
between shrinks amortizes the SVD (Liberty's doubling trick) — update
cost O(dim * l) amortized per row.

No reference counterpart (the reference is membership-only,
/root/reference/src/filter.rs); part of the [RULE] sketch/approximate-
aggregation tier alongside state/moments.py (its exact twin for the
accuracy audit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class FrequentDirections:
    """l x dim deterministic matrix sketch with the FD guarantee."""

    def __init__(self, dim: int, sketch_rows: int = 32):
        if sketch_rows < 2:
            raise ValueError("sketch_rows must be >= 2")
        self.dim = dim
        self.l = int(sketch_rows)
        # buffer holds up to 2l rows: the live sketch rows plus new arrivals
        self.buf = np.zeros((2 * self.l, dim), np.float64)
        self.filled = 0
        self.n = 0
        self.fro2 = 0.0  # ||A||_F^2, exact (for the audit's bound check)

    # ---- update ----

    def _shrink(self) -> None:
        if self.filled == 0:
            return
        # economy SVD of the occupied rows; rotate into the top-l directions
        _, s, vt = np.linalg.svd(self.buf[: self.filled], full_matrices=False)
        s2 = s * s
        if len(s2) > self.l:
            delta = s2[self.l - 1]
            s2 = np.maximum(s2[: self.l] - delta, 0.0)
            vt = vt[: self.l]
        keep = np.sqrt(s2)
        self.buf[: len(keep)] = keep[:, None] * vt[: len(keep)]
        self.buf[len(keep) :] = 0.0
        self.filled = int((keep > 0).sum())

    def update_rows(self, v: np.ndarray) -> None:
        v = np.asarray(v, dtype=np.float64).reshape(-1, self.dim)
        self.n += len(v)
        self.fro2 += float((v * v).sum())
        i = 0
        while i < len(v):
            space = 2 * self.l - self.filled
            take = min(space, len(v) - i)
            self.buf[self.filled : self.filled + take] = v[i : i + take]
            self.filled += take
            i += take
            if self.filled >= 2 * self.l:
                self._shrink()

    def update_column(self, col) -> None:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, (pa.ListArray, pa.FixedSizeListArray, pa.LargeListArray)):
            v = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, self.dim)
        else:
            v = np.asarray(col, dtype=np.float64).reshape(-1, self.dim)
        self.update_rows(v)

    # ---- merge ----

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.dim != self.dim or other.l != self.l:
            raise ValueError("incompatible FrequentDirections sketches")
        self.n += other.n
        self.fro2 += other.fro2
        self.update_rows(other.buf[: other.filled])
        # update_rows double-counted the partner's mass into n/fro2: undo
        self.n -= other.filled
        self.fro2 -= float((other.buf[: other.filled] ** 2).sum())
        return self

    # ---- results ----

    def sketch_matrix(self) -> np.ndarray:
        """The l x dim sketch B (rows may be fewer while warm)."""
        self._shrink()
        return self.buf[: self.l].copy()

    def cov_estimate(self) -> np.ndarray:
        """B^T B — the A^T A (uncentered second moment) estimate."""
        b = self.sketch_matrix()
        return b.T @ b

    def top_directions(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k right singular directions and singular values of B."""
        b = self.sketch_matrix()
        _, s, vt = np.linalg.svd(b, full_matrices=False)
        return vt[:k], s[:k]

    def error_bound(self, k: int = 0) -> float:
        """Worst-case ||A^T A - B^T B||_2 bound: ||A||_F^2 / (l - k)."""
        return self.fro2 / (self.l - k)

    # ---- serialization (shuffle payload) ----

    def to_bytes(self) -> bytes:
        self._shrink()  # ship at most l dense rows
        return dumps_sketch(
            (self.dim, self.l, self.n, self.fro2, self.buf[: self.filled].copy())
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrequentDirections":
        dim, l, n, fro2, rows = loads_sketch(data)
        s = cls(dim, l)
        s.buf[: len(rows)] = rows
        s.filled = len(rows)
        s.n = n
        s.fro2 = fro2
        return s
