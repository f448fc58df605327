"""Hash kernel unit tests (SURVEY §2.1 ops #8, #9, #21, #22)."""

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.functions import hashing as H
from perfect_bloomfilter_ray.functions.keys import key_bytes


def test_hash64_deterministic_and_seed_sensitive():
    col = pa.array(["a", "b", "", "a" * 1000])
    h1 = H.hash64(col, 1)
    h2 = H.hash64(col, 1)
    h3 = H.hash64(col, 2)
    assert np.array_equal(h1, h2)
    assert not np.array_equal(h1, h3)
    assert h1.dtype == np.uint64


def test_key_hash128_halves_independent():
    col = pa.array([str(i) for i in range(10000)])
    lo, hi = H.key_hash128(col)
    assert len(np.unique(lo)) == 10000  # no collisions at this scale
    assert len(np.unique(hi)) == 10000
    # halves are decorrelated: xor should also be collision-free
    assert len(np.unique(lo ^ hi)) == 10000


def test_km_positions_shape_and_range():
    h1 = np.array([1, 2**63], dtype=np.uint64)
    h2 = np.array([3, 5], dtype=np.uint64)
    pos = H.km_positions(h1, h2, k=7, m=1 << 16)
    assert pos.shape == (2, 7)
    assert (pos < (1 << 16)).all()
    # KM recurrence: pos[:, j] = (h1 + j*h2) mod m
    assert pos[0, 3] == (1 + 3 * 3) % (1 << 16)


def test_jump_hash_matches_scalar_reference():
    """Cross-check the vectorized port against the published scalar algorithm
    (Lamping & Veach 2014; the reference ports it at filter.rs:467-483)."""

    def scalar_jump(key: int, n: int) -> int:
        b, j = -1, 0
        while j < n:
            b = j
            key = (key * 2862933555777941757 + 1) & 0xFFFFFFFFFFFFFFFF
            j = int(float(b + 1) * (float(1 << 31) / float((key >> 33) + 1)))
        return b

    keys = np.array([0, 1, 42, 2**64 - 1, 123456789123456789], dtype=np.uint64)
    for n in (1, 2, 16, 100, 4096):
        got = H.jump_hash(keys, n)
        want = [scalar_jump(int(k), n) for k in keys]
        assert got.tolist() == want, (n, got.tolist(), want)


def test_jump_hash_balance_and_monotonicity():
    keys = H.splitmix64(np.arange(100000, dtype=np.uint64))
    b16 = H.jump_hash(keys, 16)
    counts = np.bincount(b16, minlength=16)
    assert counts.min() > 100000 / 16 * 0.9
    # consistency property: growing bucket count only moves keys to NEW buckets
    b17 = H.jump_hash(keys, 17)
    moved = b16 != b17
    assert (b17[moved] == 16).all()


def test_clz64_exact():
    x = np.array([0, 1, 2, 3, 2**63, 2**64 - 1, 2**32], dtype=np.uint64)
    assert H.clz64(x).tolist() == [64, 63, 62, 62, 0, 0, 31]


def test_route_shards_two_distinct_shards():
    """Mirrors filter.rs:120-137: each key routes to 2 distinct shards/tier."""
    col = pa.array([str(i) for i in range(1000)])
    p1, p2 = H.route_shards(col, 64)
    assert (p1 != p2).all()
    assert (p1 >= 0).all() and (p2 < 64).all()


def test_key_bytes_canonical():
    # string → utf8, int → 8-byte LE, consistent per type (README.md:12)
    s = key_bytes(pa.array(["ab", ""]))
    assert s.to_pylist() == [b"ab", b""]
    i = key_bytes(pa.array([1, 256], pa.int64()))
    assert i.to_pylist() == [(1).to_bytes(8, "little"), (256).to_bytes(8, "little")]
    f = key_bytes(pa.array([1.5], pa.float32()))
    assert f.to_pylist() == [np.float64(1.5).tobytes()]


def test_zorder_key_interleave_and_locality():
    import numpy as np

    from perfect_bloomfilter_ray.stages.partitioning import zorder_key2

    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 16, 2000)
    b = rng.integers(0, 1 << 16, 2000)
    z = zorder_key2(a, b, 16)
    ref = np.zeros(len(a), np.int64)
    for k in range(16):
        ref |= (((a >> k) & 1) << (2 * k)) | (((b >> k) & 1) << (2 * k + 1))
    assert (z == ref).all()
    # locality: rows in one quadrant (high bits equal) form a contiguous
    # z-range — the property that makes file-level pruning work
    qa, qb = a % 256, b % 256  # same high byte = 0
    zq = zorder_key2(qa, qb, 16)
    assert zq.max() < (1 << 16)  # quadrant stays inside its own key range


def test_jump_hash_resize_monotone_and_balanced():
    """Lamping-Veach contract: on S -> S+1 resize, movers relocate ONLY to
    the new shard, and the moved fraction concentrates around 1/(S+1)."""
    import numpy as np

    from perfect_bloomfilter_ray.functions.hashing import jump_hash, splitmix64

    h = splitmix64(np.arange(200_000, dtype=np.uint64))
    for S in (4, 16, 64):
        a = jump_hash(h, S)
        b = jump_hash(h, S + 1)
        moved = a != b
        assert ((b[moved]) == S).all(), "jump hash must move keys only to the new shard"
        frac = moved.mean()
        ideal = 1.0 / (S + 1)
        assert abs(frac - ideal) < 0.2 * ideal, (S, frac, ideal)
