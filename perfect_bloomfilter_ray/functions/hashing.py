"""Vectorized hash kernels — the foundation of every sketch.

Re-expresses the reference's hashing layer (xxh3-128 + Kirsch–Mitzenmacher +
jump consistent hash, ``/root/reference/src/filter.rs:120-137, 291-314,
467-487``) with kernels available in this environment: polars' seeded
vectorized 64-bit hash for byte/string columns, and numpy splitmix64 mixing.
Bit-level xxh3 compatibility is NOT required (the rule demands matching error
bounds, not hash-identical bitsets — SURVEY.md §4.3); what matters is that the
hash is (a) deterministic across processes (verified: polars hash is stable for
a given seed and version), (b) well-mixed, (c) vectorized end-to-end.

Seed roles mirror ``HASH_SEED_SELECTION`` (filter.rs:485-487):
  SEED_ROUTE_A / SEED_ROUTE_B   shard/partition routing (tier 1 / tier 2)
  SEED_ID_LO / SEED_ID_HI       the two independent 64-bit halves of a key's
                                128-bit identity, from which per-view Bloom
                                (h1, h2) pairs are derived
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

# Seed constants. Values are ours; the ROLES mirror filter.rs:485-487.
SEED_ROUTE_A = 0x9E3779B97F4A7C15
SEED_ROUTE_B = 0xC2B2AE3D27D4EB4F
SEED_ID_LO = 0x165667B19E3779F9
SEED_ID_HI = 0x27D4EB2F165667C5

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def _to_polars(col) -> pl.Series:
    """Normalize any column-ish input to a polars Series (zero-copy for Arrow)."""
    if isinstance(col, pl.Series):
        return col
    if isinstance(col, pa.ChunkedArray):
        return pl.from_arrow(col.combine_chunks())
    if isinstance(col, pa.Array):
        return pl.from_arrow(col)
    if isinstance(col, np.ndarray):
        return pl.Series("k", col)
    return pl.Series("k", list(col))


def hash64(col, seed: int) -> np.ndarray:
    """Seeded vectorized 64-bit hash of a column of keys → uint64 ndarray.

    Works on string, binary, integer, float and temporal columns. Hash values
    are deterministic across processes for a fixed polars version + seed
    (required: partial sketches built on different workers must agree).
    """
    s = _to_polars(col)
    # polars hashes each physical type consistently; for cross-type canonical
    # keys use functions.keys.key_bytes first.
    return s.hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy().astype(_U64, copy=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al.) — full-avalanche mix."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def key_hash128(col) -> tuple[np.ndarray, np.ndarray]:
    """Two independent seeded 64-bit hashes forming a 128-bit key identity.

    Two independent base hashes (not one hash split) so that the birthday
    collision probability at 10^12 keys stays ~n^2/2^129 — required for the
    cascade's FPR bound to hold at target scale (SURVEY.md §2.2).
    """
    s = _to_polars(col)
    lo = s.hash(seed=SEED_ID_LO).to_numpy().astype(_U64, copy=False)
    hi = s.hash(seed=SEED_ID_HI).to_numpy().astype(_U64, copy=False)
    # decorrelate the two streams further (polars uses one algorithm family)
    return lo, splitmix64(hi ^ _U64(0xD6E8FEB86659FD93))


def km_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """Kirsch–Mitzenmacher double hashing: k bit positions per key.

    ``pos[i, j] = (h1[i] + j * h2[i]) & (m - 1)`` — the same scheme the
    reference uses (filter.rs:291-314, comment at :307). m must be a power of
    two. h2 should be odd (full period mod 2^t). Returns (n, k) uint64.
    """
    assert m & (m - 1) == 0, "m must be a power of two"
    j = np.arange(k, dtype=_U64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + j[None, :] * h2[:, None]
    return pos & _U64(m - 1)


def jump_hash(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Vectorized jump consistent hash (Lamping & Veach 2014).

    Port of the reference's scalar port (filter.rs:467-483) to a masked numpy
    loop — expected O(ln num_buckets) iterations over the whole vector. Used
    for shard/partition routing and for salting skewed keys.
    """
    key = keys.astype(_U64, copy=True)
    n = int(num_buckets)
    b = np.full(key.shape, -1, dtype=np.int64)
    j = np.zeros(key.shape, dtype=np.int64)
    active = j < n
    with np.errstate(over="ignore"):
        while active.any():
            b[active] = j[active]
            key[active] = key[active] * _U64(2862933555777941757) + _U64(1)
            frac = np.float64(1 << 31) / ((key[active] >> _U64(33)).astype(np.float64) + 1.0)
            j[active] = ((b[active] + 1).astype(np.float64) * frac).astype(np.int64)
            active = j < n
    return b


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (exact, no float log tricks)."""
    x = x.astype(_U64, copy=True)
    hb = np.zeros(x.shape, dtype=np.int64)  # floor(log2(x)) for x > 0
    nz = x != 0
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (_U64(1) << _U64(s))
        hb[m] += s
        x[m] >>= _U64(s)
    out = np.full(x.shape, 64, dtype=np.int64)
    out[nz] = 63 - hb[nz]
    return out


def route_shards(col, num_shards: int, tier_seed: int = SEED_ROUTE_A) -> tuple[np.ndarray, np.ndarray]:
    """Route each key to 2 shards of a tier, mirroring filter.rs:120-137.

    p1 = jump_hash(h, S); p2 = (p1 + S/2) & (S-1) — antipodal, guaranteed ≠ p1
    for S ≥ 2 a power of two.
    """
    assert num_shards & (num_shards - 1) == 0 and num_shards >= 2
    h = hash64(col, tier_seed)
    p1 = jump_hash(h, num_shards)
    p2 = (p1 + num_shards // 2) & (num_shards - 1)
    return p1, p2


def bounded_load_assign(
    keys: np.ndarray, num_buckets: int, load_factor: float = 1.25
) -> np.ndarray:
    """Consistent hashing with bounded loads (Mirrokni, Thorup & Zadimoghaddam
    2018, the CH-BL policy behind Vimeo/HAProxy's `hash-balance-factor`):
    each key starts at its jump-hash shard and LINEAR-PROBES to the next
    shard whenever the current one is full, with per-shard capacity
    ceil(load_factor · n / m).  Guarantees max load ≤ capacity by
    construction while moving only O(1/ε)-ish keys off their home shard —
    the fix for the hot-shard problem plain jump-hash has under skewed or
    adversarial key multiplicities.

    Deterministic and ORDER-SENSITIVE by contract: keys are processed in
    ascending uint64 hash order (ties by position), so every caller —
    any worker, any rerun — assigns identically.  Vectorized rounds: each
    round places every key whose current candidate shard still has room
    (one bincount + cumsum-within-shard per round), then advances the
    spilled keys; ≤ m rounds, in practice 2-3.
    """
    import math as _math

    key = np.asarray(keys, dtype=_U64)
    m = int(num_buckets)
    n = len(key)
    if load_factor < 1.0:
        # m * cap < n would leave keys unplaceable; fail loudly instead of
        # returning -1 shard ids
        raise ValueError(f"load_factor must be >= 1.0, got {load_factor}")
    cap = int(_math.ceil(load_factor * n / m)) if n else 0
    order = np.argsort(key, kind="stable")
    home = jump_hash(key[order], m).astype(np.int64)
    assign = np.full(n, -1, dtype=np.int64)
    load = np.zeros(m, dtype=np.int64)
    cand = home.copy()
    pending = np.arange(n)
    for _ in range(m):
        if len(pending) == 0:
            break
        c = cand[pending]
        # rank of each pending key WITHIN its candidate shard this round
        # (stable sort keeps ascending-hash priority)
        srt = np.argsort(c, kind="stable")
        cs = c[srt]
        starts = np.flatnonzero(np.diff(cs, prepend=cs[0] - 1))
        rank = np.arange(len(cs)) - np.repeat(starts, np.diff(np.append(starts, len(cs))))
        room = cap - load[cs]
        ok = rank < room
        placed = pending[srt[ok]]
        assign[placed] = cs[ok]
        np.add.at(load, cs[ok], 1)
        spilled = pending[srt[~ok]]
        cand[spilled] = (cand[spilled] + 1) % m
        pending = spilled
    out = np.empty(n, dtype=np.int64)
    out[order] = assign
    return out
