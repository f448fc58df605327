"""PerfectBloomFilter — drop-in style facade mirroring the reference crate's
object API, backed by the mergeable engine.

A user of the reference (``/root/reference/src/filter.rs``) drives it as:

    let pbf = PerfectBloomFilter::new();            # filter.rs:36-39
    pbf.insert(key)?;                               # filter.rs:57-69
    pbf.contains(key) -> bool                       # filter.rs:45-55

This facade reproduces that surface 1:1 (plus the config builder semantics,
config.rs:61-113) so single-process callers can switch without touching their
call sites — while the backing state is the same ``BloomCascade`` /
``ShardedBloomFilter`` the distributed pipelines build, so a filter built on
a cluster can be handed to this class and queried locally (and vice versa:
``.sketch`` drops into any ``stages.membership`` pipeline).

Geometry parity: ``throughput`` routes keys across 2^s jump-hash shards
(filter.rs:120-137 routing; shard count per filter.rs:143-147); each shard is
a cascade whose ``num_views`` AND-checked seed families preserve the
reference's AND-of-4 accuracy bound (SURVEY §2.2). Batch methods are the
vectorized fast path; the scalar insert/contains exist for API parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.config import BloomConfig, THROUGHPUT_SHARDS
from perfect_bloomfilter_ray.state.bloom import BloomCascade


class PerfectBloomFilter:
    """Reference-API facade over the mergeable Bloom cascade.

    ``expected_keys`` sizes layer 0 (the reference instead starts tiny and
    rehashes; our frozen-layer cascade grows by appending layers, SURVEY
    §2.3). ``throughput`` picks the shard count (2^11/12/13 — "low",
    "medium", "high"); ``sharded=False`` uses one cascade (the common
    single-process case; shards only matter for distributed builds and the
    reference's lock-granularity concern, which Ray makes moot).
    """

    def __init__(
        self,
        config: BloomConfig | None = None,
        expected_keys: int = 1 << 15,
        sharded: bool = False,
        throughput: str = "medium",
    ):
        self.config = config or BloomConfig()
        if sharded:
            self.num_shards = THROUGHPUT_SHARDS[throughput]
            per = max(64, (2 * expected_keys) // self.num_shards)
            self._shards = [BloomCascade.for_capacity(per, self.config) for _ in range(self.num_shards)]
            self._single = None
        else:
            self.num_shards = 1
            self._shards = None
            self._single = BloomCascade.for_capacity(expected_keys, self.config)

    # -- reference API (scalar) ----------------------------------------------

    @classmethod
    def new(cls) -> "PerfectBloomFilter":
        """``PerfectBloomFilter::new()`` (filter.rs:36-39)."""
        return cls()

    @classmethod
    def new_with_config(cls, config: BloomConfig, **kw) -> "PerfectBloomFilter":
        """``new_with_config`` (filter.rs:41-43)."""
        return cls(config=config, **kw)

    def insert(self, key: bytes | str) -> None:
        """``insert(&self, key: &[u8])`` (filter.rs:57-69)."""
        self.insert_batch([key])

    def contains(self, key: bytes | str) -> bool:
        """``contains(&self, key: &[u8]) -> bool`` (filter.rs:45-55)."""
        return bool(self.contains_batch([key])[0])

    # -- vectorized fast path -------------------------------------------------

    def _to_array(self, keys) -> pa.Array:
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            return keys
        ks = [k.encode() if isinstance(k, str) else k for k in keys]
        return pa.array(ks, pa.binary())

    def insert_batch(self, keys) -> None:
        col = self._to_array(keys)
        if self._single is not None:
            self._single.update_column(col)
            return
        from perfect_bloomfilter_ray.functions.hashing import SEED_ROUTE_A, hash64, jump_hash

        sid = jump_hash(hash64(col, SEED_ROUTE_A), self.num_shards)
        for s in np.unique(sid):
            self._shards[int(s)].update_column(col.filter(pa.array(sid == s)))

    def contains_batch(self, keys) -> np.ndarray:
        col = self._to_array(keys)
        if self._single is not None:
            return self._single.contains_column(col)
        from perfect_bloomfilter_ray.functions.hashing import SEED_ROUTE_A, hash64, jump_hash

        sid = jump_hash(hash64(col, SEED_ROUTE_A), self.num_shards)
        out = np.zeros(len(col), dtype=bool)
        for s in np.unique(sid):
            mask = sid == s
            out[mask] = self._shards[int(s)].contains_column(col.filter(pa.array(mask)))
        return out

    # -- interop with the distributed engine ---------------------------------

    @property
    def sketch(self) -> BloomCascade:
        """The backing cascade (single-shard mode) — usable anywhere the
        distributed pipelines accept a built filter (``ray.put`` + probe)."""
        if self._single is None:
            raise ValueError("sharded filter has no single backing cascade")
        return self._single

    @classmethod
    def from_sketch(cls, sketch: BloomCascade) -> "PerfectBloomFilter":
        out = cls.__new__(cls)
        out.config = sketch.config
        out.num_shards = 1
        out._shards = None
        out._single = sketch
        return out

    @property
    def key_count(self) -> int:
        if self._single is not None:
            return self._single.key_count
        return sum(s.key_count for s in self._shards)
