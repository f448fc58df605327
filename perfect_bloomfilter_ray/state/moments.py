"""Mergeable second-moment sketch over an embedding column — the sufficient
statistics (n, Σx, ΣxxT) for distributed covariance / PCA.

Covariance is exactly mergeable (the three sums are associative +
commutative up to float addition order), so the sketch plugs into the same
`stages.agg` partial/tree-merge machinery as HLL/CMS/etc. (SURVEY §2.3
"mergeable UDAFs"): each block contributes one (dim + dim²)-float partial, a
dim-bounded payload regardless of corpus size, and the driver finishes with
one dim×dim eigendecomposition — the classical scalable PCA formulation
(covariance method), valid while dim² stays small (dim ≤ ~4k).

No reference counterpart (the reference is membership-only,
/root/reference/src/filter.rs); part of the [RULE] embedding analytics
surface alongside stages/centroids.py and stages/ann.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class EmbeddingMoments:
    """n, Σx (dim), ΣxxT (dim×dim) over vectors; exactly mergeable."""

    def __init__(self, dim: int):
        self.dim = dim
        self.n = 0
        self.s = np.zeros(dim, np.float64)
        self.ss = np.zeros((dim, dim), np.float64)

    def update_column(self, col) -> None:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, (pa.ListArray, pa.FixedSizeListArray, pa.LargeListArray)):
            v = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, self.dim)
        else:
            v = np.asarray(col, dtype=np.float64).reshape(-1, self.dim)
        self.n += len(v)
        self.s += v.sum(axis=0)
        self.ss += v.T @ v

    def merge(self, other: "EmbeddingMoments") -> "EmbeddingMoments":
        self.n += other.n
        self.s += other.s
        self.ss += other.ss
        return self

    def mean(self) -> np.ndarray:
        return self.s / max(self.n, 1)

    def covariance(self) -> np.ndarray:
        """Sample covariance (n-1 denominator), exact given the sums."""
        if self.n < 2:
            return np.zeros((self.dim, self.dim))
        mu = self.mean()
        return (self.ss - self.n * np.outer(mu, mu)) / (self.n - 1)

    def to_bytes(self) -> bytes:
        return dumps_sketch(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "EmbeddingMoments":
        return loads_sketch(data)

    def state_equal(self, other: "EmbeddingMoments", rtol: float = 1e-9) -> bool:
        return (
            self.n == other.n
            and np.allclose(self.s, other.s, rtol=rtol)
            and np.allclose(self.ss, other.ss, rtol=rtol)
        )
