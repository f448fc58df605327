"""MergeableSketch protocol — the user-extension surface of the library.

The reference's extension point is its builder config + sealed shard API
(config.rs:61-113, filter.rs:291/385/423/431). Ours is this protocol: any
object implementing it becomes a Ray Data `AggregateFnV2` via
``stages.agg.SketchAgg`` and gains grouped / global / checkpointed build
pipelines for free.

Contract (property-tested in tests/test_merge_properties.py):
  - merge is associative and commutative up to estimate error bounds
    (exact-state-equal for capacity-planned Bloom, HLL, CMS, Theta;
    estimate-equal within bound for KLL/t-digest, whose internal state is
    merge-order-dependent by design; a GROWING Bloom cascade assigns keys to
    layers by arrival order — like the reference's rehash timing — so across
    merge orders it guarantees membership equality + the FPR bound, not
    byte-equal state);
  - update_column accepts a pyarrow Array/ChunkedArray (or numpy) and is
    vectorized — NO per-row Python in the hot path;
  - to_bytes/from_bytes round-trips exactly (used for checkpoints, the Ray
    object store, and partial-sketch columns inside Arrow blocks).
"""

from __future__ import annotations

import pickle
import zlib
from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class MergeableSketch(Protocol):
    def update_column(self, col: Any) -> None:  # vectorized batch update
        ...

    def merge(self, other: "MergeableSketch") -> "MergeableSketch":  # in-place, returns self
        ...

    def to_bytes(self) -> bytes:
        ...

    @classmethod
    def from_bytes(cls, data: bytes) -> "MergeableSketch":
        ...


def dumps_sketch(sketch: Any, level: int = 1) -> bytes:
    """Default compact serialization: zlib-compressed pickle.

    Early-cascade bit arrays and CMS tables are sparse → zlib level 1 cuts
    partial-sketch shuffle bytes several-fold for negligible CPU.
    """
    return zlib.compress(pickle.dumps(sketch, protocol=pickle.HIGHEST_PROTOCOL), level)


def loads_sketch(data: bytes) -> Any:
    return pickle.loads(zlib.decompress(data))
