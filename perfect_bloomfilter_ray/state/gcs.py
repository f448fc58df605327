"""Golomb-compressed set — near-entropy-optimal STATIC membership.

The storage-efficiency end of the library's AMQ family (Putze, Sanders &
Singler 2007 "Cache-, Hash- and Space-Efficient Bloom Filters" §4; deployed
form: Chrome Safe Browsing's prefix sets and Bitcoin BIP-158 Golomb-coded
block filters): n keys hash uniformly into [0, n·2^p); the SORTED distinct
values are delta-encoded with Golomb-Rice parameter p. Size ≈ n·(p + 1.6)
bits at FPR 2^-p — within half a bit per key of the information-theoretic
lower bound n·p, where a Bloom filter needs 1.44·n·p.

Split-stream Rice layout (the standard vectorizable variant): stream A holds
ONLY the unary quotients (runs of 1s, one 0 terminator each — so A's zero
positions decode every quotient in one ``np.diff``), stream B holds the
fixed p-bit remainders. Both encode and decode are pure numpy; no Python
bit loop.

Static contract (same as Xor8): build once from the full shard key set —
no incremental insert, no merge (the modulus n·2^p is data-dependent).
Shard the key space for distribution; the reference's grow-by-rollover
cascade remains the dynamic structure.

No false negatives by construction (a member's mapped value is in the set);
false positives ≈ 2^-p when a fresh key maps onto an occupied value.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def _map_to_range(h: np.ndarray, n_range: int) -> np.ndarray:
    """Fast-range map of uniform 64-bit hashes into [0, n_range): the high
    64 bits of h * n_range — order-preserving per hash, uniform.

    Full 64x64 -> high-64 multiply (no uint128 in numpy): split BOTH
    operands into 32-bit halves and sum the four partial products. The
    two-halves-of-h-only shortcut overflows once n_range >= 2^32 (a*m
    wraps), silently collapsing mapped values into [0, 2^32) — i.e. any
    shard over 2^(32-p) keys — so the general form is required here.
    The cross term fits uint64: (2^32-1)^2 + 2*(2^32-1) < 2^64."""
    h = np.asarray(h, dtype=_U64)
    a = h >> _U64(32)
    b = h & _U64(0xFFFFFFFF)
    m = int(n_range)
    if m >= 1 << 64:
        raise ValueError("n_range must fit in 64 bits")
    c = _U64(m >> 32)
    d = _U64(m & 0xFFFFFFFF)
    bd = b * d
    cross = (bd >> _U64(32)) + (a * d & _U64(0xFFFFFFFF)) + b * c
    return a * c + (a * d >> _U64(32)) + (cross >> _U64(32))


class GolombSet:
    def __init__(self, key_hashes: np.ndarray, p: int = 10):
        if not (2 <= p <= 24):
            raise ValueError("p must be in 2..24")
        self.p = p
        h = np.unique(np.asarray(key_hashes, dtype=_U64))
        # range sized from the distinct HASH count; distinct hashes may still
        # collide after range mapping, so n below is the stored-value count
        self.n_range = max(1, int(len(h)) << p)
        vals = np.unique(_map_to_range(h, self.n_range)) if len(h) else np.empty(0, _U64)
        self._vals = vals.astype(np.int64)  # decoded form, cached for probes
        self.n = int(len(vals))
        self._encode(self._vals)

    # -- rice coding ----------------------------------------------------------

    def _encode(self, vals: np.ndarray) -> None:
        p = self.p
        if len(vals) == 0:
            self.stream_a = np.empty(0, np.uint8)
            self.stream_b = np.empty(0, np.uint8)
            self.n_codes = 0
            return
        deltas = np.diff(vals, prepend=np.int64(0)).astype(np.uint64)
        q = (deltas >> _U64(p)).astype(np.int64)
        r = (deltas & ((_U64(1) << _U64(p)) - _U64(1))).astype(np.uint64)
        # stream A: q_i ones then a 0, per code — zeros sit at cumsum(q+1)-1
        total_a = int((q + 1).sum())
        bits_a = np.ones(total_a, np.uint8)
        bits_a[np.cumsum(q + 1) - 1] = 0
        self.stream_a = np.packbits(bits_a)
        # stream B: fixed p-bit remainders, MSB first
        bits_b = np.empty((len(vals), p), np.uint8)
        for k in range(p):
            bits_b[:, k] = ((r >> _U64(p - 1 - k)) & _U64(1)).astype(np.uint8)
        self.stream_b = np.packbits(bits_b.ravel())
        self.n_codes = len(vals)

    @staticmethod
    def _decode(stream_a: np.ndarray, stream_b: np.ndarray, n: int, p: int) -> np.ndarray:
        if n == 0:
            return np.empty(0, np.int64)
        bits_a = np.unpackbits(stream_a)
        zeros = np.nonzero(bits_a == 0)[0][:n]
        q = np.diff(zeros, prepend=np.int64(-1)) - 1
        bits_b = np.unpackbits(stream_b)[: n * p].reshape(n, p).astype(np.int64)
        r = np.zeros(n, np.int64)
        for k in range(p):
            r = (r << 1) | bits_b[:, k]
        deltas = (q.astype(np.int64) << p) | r
        return np.cumsum(deltas)

    # -- queries ----------------------------------------------------------

    def contains(self, key_hashes: np.ndarray) -> np.ndarray:
        v = _map_to_range(key_hashes, self.n_range).astype(np.int64)
        idx = np.searchsorted(self._vals, v)
        ok = idx < len(self._vals)
        safe = np.minimum(idx, max(len(self._vals) - 1, 0))
        return ok & (self._vals[safe] == v) if len(self._vals) else np.zeros(len(v), bool)

    @property
    def bits_per_key(self) -> float:
        if self.n == 0:
            return 0.0
        return 8.0 * (len(self.stream_a) + len(self.stream_b)) / self.n

    # -- serialization ------------------------------------------------------

    def to_state(self) -> tuple[int, int, int, bytes, bytes]:
        return (self.p, self.n, self.n_range, self.stream_a.tobytes(), self.stream_b.tobytes())

    @classmethod
    def from_state(cls, state: tuple[int, int, int, bytes, bytes]) -> "GolombSet":
        p, n, n_range, sa, sb = state
        out = cls.__new__(cls)
        out.p = p
        out.n = n
        out.n_range = n_range
        out.stream_a = np.frombuffer(sa, np.uint8)
        out.stream_b = np.frombuffer(sb, np.uint8)
        out.n_codes = n
        out._vals = cls._decode(out.stream_a, out.stream_b, n, p)
        return out
