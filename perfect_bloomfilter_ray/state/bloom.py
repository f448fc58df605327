"""BloomCascade — mergeable cascading multidimensional Bloom filter.

Re-expresses the reference's ``PerfectBloomFilter`` semantics
(/root/reference/src/filter.rs) in a merge-friendly, batch-vectorized design:

- The reference's 2-tiers × 2-routed-shards geometry makes every key answer an
  AND of 4 independent Bloom checks (filter.rs:45-55, 71-90) → here each layer
  holds ``num_views`` (default 4) bit arrays with disjoint seed families,
  AND-checked, preserving the ~(per-filter FPR)^4 accuracy bound (SURVEY §2.2).
- The reference's dynamic growth (background 3-phase rehash hot-swap,
  filter.rs:227-274) is redesigned as a **frozen-layer cascade**: when the
  active layer reaches the bits-per-key threshold (rehash_check formula,
  filter.rs:373-375), it freezes and a new layer of 2× bits opens. Growth is
  append-only → no locks, no WAL replay, and `merge` is a plain layer-wise OR,
  which makes the sketch associative/commutative — the property Ray Data's
  partial-per-block + combine-tree aggregation requires. Like the reference's
  P3 catch-up, there are never false negatives, including "mid-growth".
- `key_count` counts update calls including duplicates, matching the
  reference's duplicate-inflating counter (filter.rs:326) — conservative: may
  grow early, never late.

Merging partials whose *same-index* layers were filled concurrently ORs their
bits, so a merged layer can exceed its planned capacity (bits/key dips below
threshold for that layer). Two mitigations, both provided:
  (1) capacity planning — ``BloomCascade.for_capacity(n, config)`` sizes layer
      0 for the expected total n, so the OR of all partials stays within
      threshold (the 100-TB path; combine with shard partitioning in
      stages.membership to bound per-partial memory);
  (2) honesty — ``effective_fpr()`` computes the real post-merge FPR from bit
      fill ratios (popcount), so callers can verify the bound held.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from perfect_bloomfilter_ray.config import BloomConfig, expected_n
from perfect_bloomfilter_ray.functions.hashing import key_hash128, km_positions, splitmix64
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

_U64 = np.uint64

# Per-view seed-family constants (roles as HASH_SEED_SELECTION[2..5],
# filter.rs:485-487: one (h1, h2) pair per view). 8 views max.
_VIEW_C1 = splitmix64(np.arange(1, 9, dtype=_U64) * _U64(0x9E3779B97F4A7C15))
_VIEW_C2 = splitmix64(np.arange(1, 9, dtype=_U64) * _U64(0xC2B2AE3D27D4EB4F))


def _view_hashes(lo: np.ndarray, hi: np.ndarray, view: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-view (h1, h2) for KM double hashing; h2 forced odd (full period)."""
    h1 = splitmix64(lo ^ _VIEW_C1[view])
    h2 = splitmix64(hi ^ _VIEW_C2[view]) | _U64(1)
    return h1, h2


@dataclass
class _Layer:
    m: int  # bits per view (power of two)
    k: int
    key_count: int = 0
    frozen: bool = False
    words: np.ndarray = field(default=None)  # (num_views, m//64) uint64

    @classmethod
    def empty(cls, m: int, k: int, num_views: int) -> "_Layer":
        return cls(m=m, k=k, words=np.zeros((num_views, m // 64), dtype=_U64))

    def insert(self, lo: np.ndarray, hi: np.ndarray) -> None:
        for v in range(self.words.shape[0]):
            h1, h2 = _view_hashes(lo, hi, v)
            pos = km_positions(h1, h2, self.k, self.m).ravel()
            np.bitwise_or.at(self.words[v], pos >> _U64(6), _U64(1) << (pos & _U64(63)))
        self.key_count += len(lo)

    def check(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        ok = np.ones(len(lo), dtype=bool)
        for v in range(self.words.shape[0]):
            if not ok.any():
                break
            h1, h2 = _view_hashes(lo, hi, v)
            pos = km_positions(h1, h2, self.k, self.m)
            bits = (self.words[v][pos >> _U64(6)] >> (pos & _U64(63))) & _U64(1)
            ok &= bits.all(axis=1)
        return ok

    def fill_ratios(self) -> np.ndarray:
        """Fraction of set bits per view (chunked popcount)."""
        out = np.empty(self.words.shape[0])
        for v in range(self.words.shape[0]):
            w = self.words[v]
            total = 0
            for s in range(0, len(w), 1 << 20):
                total += int(np.unpackbits(w[s : s + (1 << 20)].view(np.uint8)).sum())
            out[v] = total / self.m
        return out


class BloomCascade:
    """Mergeable cascading Bloom filter (see module docstring)."""

    def __init__(self, config: BloomConfig | None = None, initial_bits: int | None = None):
        self.config = config or BloomConfig()
        if initial_bits is not None:
            if initial_bits & (initial_bits - 1):
                raise ValueError("initial_bits must be a power of two")
            self.config = BloomConfig(
                threshold=self.config.threshold,
                initial_bits=initial_bits,
                num_views=self.config.num_views,
                grow=self.config.grow,
                max_layers=self.config.max_layers,
            )
        m0 = self.config.initial_bits
        # Sparse phase (cf. sparse HyperLogLog): until enough keys justify the
        # dense bit arrays, buffer the raw 128-bit key hashes (16 B/key). A
        # per-block partial in a distributed build holds only batch_size keys,
        # so capacity-planned partials would otherwise each allocate + ship
        # the FULL planned m0 bit array (MBs of mostly-zero words per block).
        # Densification replays the buffer through the normal insert path, so
        # semantics (layer rollover order, duplicate counting) are identical.
        self._sparse_lo: list[np.ndarray] | None = []
        self._sparse_hi: list[np.ndarray] = []
        self._sparse_count = 0
        self.layers: list[_Layer] = []

    # -- sparse phase ---------------------------------------------------------

    @property
    def _dense_bytes(self) -> int:
        return self.config.initial_bits // 8 * self.config.num_views

    def _densify(self) -> None:
        if self._sparse_lo is None:
            return
        lo_chunks, hi_chunks = self._sparse_lo, self._sparse_hi
        self._sparse_lo = None
        self._sparse_hi = []
        self._sparse_count = 0
        m0 = self.config.initial_bits
        self.layers = [_Layer.empty(m0, self.config.k_for(m0), self.config.num_views)]
        for lo, hi in zip(lo_chunks, hi_chunks):
            self.update_hashes(lo, hi)

    # -- construction helpers -------------------------------------------------

    @classmethod
    def for_capacity(cls, n: int, config: BloomConfig | None = None) -> "BloomCascade":
        """Size layer 0 so n keys fit within the bits/key threshold.

        This is the distributed-build path: every partial starts at the same
        planned m0, so layer-wise OR-merge of partials covering n total keys
        keeps bits/key >= threshold → the §2.2 FPR bound survives the merge.
        """
        config = config or BloomConfig()
        m0 = 1 << max((int(n * config.threshold) - 1).bit_length(), 6)
        return cls(config, initial_bits=m0)

    def _push_layer(self) -> None:
        if len(self.layers) >= self.config.max_layers:
            raise RuntimeError("BloomCascade exceeded max_layers")
        last = self.layers[-1]
        last.frozen = True
        m = last.m * 2  # m doubles per layer — optimal_k_for_next_size, filter.rs:385-389
        self.layers.append(_Layer.empty(m, self.config.k_for(m), self.config.num_views))

    # -- updates --------------------------------------------------------------

    def update_column(self, col) -> None:
        lo, hi = key_hash128(col)
        self.update_hashes(lo, hi)

    def update_hashes(self, lo: np.ndarray, hi: np.ndarray) -> None:
        """Insert a batch, rolling the cascade over at capacity boundaries.

        Chunked so every layer respects the threshold (the reference checks
        rehash_check per insert, filter.rs:104-112; we check per chunk).
        """
        if self._sparse_lo is not None:
            self._sparse_lo.append(np.asarray(lo, dtype=_U64))
            self._sparse_hi.append(np.asarray(hi, dtype=_U64))
            self._sparse_count += len(lo)
            if 16 * self._sparse_count >= self._dense_bytes:
                self._densify()
            return
        n = len(lo)
        i = 0
        while i < n:
            layer = self.layers[-1]
            if self.config.grow:
                room = expected_n(layer.m, self.config.threshold) - layer.key_count
                if room <= 0:
                    self._push_layer()
                    continue
                take = min(n - i, room)
            else:
                take = n - i
            layer.insert(lo[i : i + take], hi[i : i + take])
            i += take

    # -- queries --------------------------------------------------------------

    def contains_column(self, col) -> np.ndarray:
        lo, hi = key_hash128(col)
        return self.contains_hashes(lo, hi)

    def contains_hashes(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """OR over layers of (AND over views) — vectorized, short-circuiting."""
        self._densify()
        found = np.zeros(len(lo), dtype=bool)
        for layer in self.layers:
            if layer.key_count == 0:
                continue
            pending = ~found
            if not pending.any():
                break
            idx = np.nonzero(pending)[0]
            found[idx] = layer.check(lo[idx], hi[idx])
        return found

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "BloomCascade") -> "BloomCascade":
        if (
            other.config.threshold != self.config.threshold
            or other.config.initial_bits != self.config.initial_bits
            or other.config.num_views != self.config.num_views
        ):
            raise ValueError("cannot merge BloomCascades with different geometry")
        if self._sparse_lo is not None and other._sparse_lo is not None:
            self._sparse_lo.extend(other._sparse_lo)
            self._sparse_hi.extend(other._sparse_hi)
            self._sparse_count += other._sparse_count
            if 16 * self._sparse_count >= self._dense_bytes:
                self._densify()
            return self
        self._densify()
        if other._sparse_lo is not None:
            for lo, hi in zip(other._sparse_lo, other._sparse_hi):
                self.update_hashes(lo, hi)
            return self
        for i, ol in enumerate(other.layers):
            if i < len(self.layers):
                sl = self.layers[i]
                assert sl.m == ol.m
                np.bitwise_or(sl.words, ol.words, out=sl.words)
                sl.key_count += ol.key_count
                sl.frozen = sl.frozen or ol.frozen
            else:
                self.layers.append(
                    _Layer(m=ol.m, k=ol.k, key_count=ol.key_count, frozen=ol.frozen, words=ol.words.copy())
                )
        # keep the active (last) layer within threshold for future updates
        if self.config.grow:
            last = self.layers[-1]
            if last.key_count >= expected_n(last.m, self.config.threshold):
                self._push_layer()
        return self

    # -- introspection / serialization ---------------------------------------

    @property
    def key_count(self) -> int:
        return self._sparse_count + sum(l.key_count for l in self.layers)

    @property
    def total_bits(self) -> int:
        return sum(l.m * l.words.shape[0] for l in self.layers)

    def effective_fpr(self) -> float:
        """Measured post-merge FPR: Σ_layers Π_views fill_v^k (fill = popcount/m)."""
        self._densify()
        total = 0.0
        for layer in self.layers:
            if layer.key_count == 0:
                continue
            fills = layer.fill_ratios()
            total += float(np.prod(fills**layer.k))
        return total

    def cardinality_estimate(self) -> float:
        """Distinct-key estimate from the filter's own bit fill — Swamidass &
        Baldi 2007: per view, n̂ = −(m/k)·ln(1 − fill). The views of one
        layer saw the same key stream, so their estimates AVERAGE (variance
        reduction); layers saw disjoint slices of the insert stream, so the
        per-layer estimates SUM. Exact semantics: Σ_layers (distinct keys
        inserted into that layer) — equal to the global distinct count when
        each key is inserted once (the deduplicated-pipeline shape); a key
        re-inserted after a rollover counts once per layer it landed in,
        the same caveat `key_count` already carries for duplicates."""
        self._densify()
        total = 0.0
        for layer in self.layers:
            if layer.key_count == 0:
                continue
            fills = np.minimum(layer.fill_ratios(), 1.0 - 1.0 / layer.m)
            total += float(np.mean(-(layer.m / layer.k) * np.log1p(-fills)))
        return total

    def stats(self) -> dict:
        return {
            "num_layers": len(self.layers),
            "key_count": self.key_count,
            "total_bits": self.total_bits,
            "layer_bits": [l.m for l in self.layers],
            "layer_keys": [l.key_count for l in self.layers],
            "effective_fpr": self.effective_fpr(),
        }

    def state_equal(self, other: "BloomCascade") -> bool:
        self._densify()
        other._densify()
        return (
            len(self.layers) == len(other.layers)
            and all(
                a.m == b.m and a.k == b.k and a.key_count == b.key_count and np.array_equal(a.words, b.words)
                for a, b in zip(self.layers, other.layers)
            )
        )

    def to_bytes(self) -> bytes:
        if self._sparse_lo is not None:
            return dumps_sketch(
                {
                    "config": self.config,
                    "sparse": (
                        np.concatenate(self._sparse_lo) if self._sparse_lo else np.empty(0, _U64),
                        np.concatenate(self._sparse_hi) if self._sparse_hi else np.empty(0, _U64),
                    ),
                }
            )
        return dumps_sketch(
            {
                "config": self.config,
                "layers": [(l.m, l.k, l.key_count, l.frozen, l.words) for l in self.layers],
            }
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomCascade":
        d = loads_sketch(data)
        out = cls.__new__(cls)
        out.config = d["config"]
        if "sparse" in d:
            lo, hi = d["sparse"]
            out._sparse_lo = [lo] if len(lo) else []
            out._sparse_hi = [hi] if len(hi) else []
            out._sparse_count = len(lo)
            out.layers = []
        else:
            out._sparse_lo = None
            out._sparse_hi = []
            out._sparse_count = 0
            out.layers = [_Layer(m=m, k=k, key_count=c, frozen=f, words=w) for (m, k, c, f, w) in d["layers"]]
        return out
