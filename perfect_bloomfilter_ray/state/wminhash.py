"""Weighted MinHash via Ioffe's Consistent Weighted Sampling (ICWS).

Ioffe 2010 ("Improved Consistent Sampling, Weighted Minhash and L1
Sketching", ICDM): for a non-negative weighted set S = {(i, w_i)}, each of
K independent samples picks one (feature, t) pair such that two sets
collide on sample k with probability EXACTLY their weighted Jaccard
J_w(A, B) = Σ_i min(a_i, b_i) / Σ_i max(a_i, b_i) — the weighted
generalization of plain MinHash (stages/dedup), needed when multiplicity
matters (term-frequency profiles, host traffic vectors) and a 0/1 shingle
set would throw the counts away.

Per sample k and feature i (all quantities derived DETERMINISTICALLY from
splitmix64 counter streams keyed on (hash(feature), k) — signatures are
reproducible across workers/runs, the property every signer in this repo
maintains):

    r ~ Gamma(2,1),  c ~ Gamma(2,1),  β ~ Uniform[0,1)
    t   = ⌊ln(w_i)/r + β⌋
    ln y = r·(t − β)
    ln a = ln c − ln y − r
    sample k = (i*, t*) for i* = argmin_i ln a

Gamma(2,1) = −ln(u₁·u₂) with independent uniforms — inverse-CDF-free and
fully vectorized: the whole signature is one (K, n) numpy evaluation.

Scale shape: signatures are computed per ENTITY from its aggregated
weighted vector (a bounded-vocabulary groupby — the same narrow exchange
as stages/vocab); entity pair candidate generation then bands signature
rows exactly like unweighted MinHash-LSH. Nothing here shuffles row-level
data.

Reference parity: no counterpart in /root/reference (648-line Bloom core);
[RULE] inventory row "weighted near-dup / similarity sketches".
"""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.functions.hashing import splitmix64

_U64 = np.uint64
_INV53 = 1.0 / (1 << 53)


def _uniform(h: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic Uniform(0,1] stream from a u64 array + salt."""
    m = splitmix64(h ^ _U64(salt))
    # top 53 bits → (0, 1]: add 1 so ln() never sees 0
    return ((m >> _U64(11)).astype(np.float64) + 1.0) * _INV53


def icws_signature(
    feature_hashes: np.ndarray, weights: np.ndarray, num_perms: int = 64, seed: int = 0x1C55
) -> np.ndarray:
    """(num_perms, 2) int64 signature [(feature_hash_as_i64, t), ...] of one
    weighted set. Features with weight <= 0 are dropped."""
    h = np.asarray(feature_hashes, dtype=np.uint64)
    w = np.asarray(weights, dtype=np.float64)
    keep = w > 0
    h, w = h[keep], w[keep]
    if len(h) == 0:
        return np.full((num_perms, 2), -1, dtype=np.int64)
    perm_salt = splitmix64(np.arange(num_perms, dtype=_U64) + _U64(seed))
    hk = h[None, :] ^ perm_salt[:, None]  # (K, n) independent streams
    r = -np.log(_uniform(hk, 0xA1) * _uniform(hk, 0xA2))
    c = -np.log(_uniform(hk, 0xB1) * _uniform(hk, 0xB2))
    beta = _uniform(hk, 0xC1) - _INV53  # [0, 1)
    ln_w = np.log(w)[None, :]
    t = np.floor(ln_w / r + beta)
    ln_y = r * (t - beta)
    ln_a = np.log(c) - ln_y - r
    pick = np.argmin(ln_a, axis=1)  # (K,)
    rows = np.arange(num_perms)
    out = np.empty((num_perms, 2), dtype=np.int64)
    out[:, 0] = h[pick].view(np.int64)
    out[:, 1] = t[rows, pick].astype(np.int64)
    return out


def icws_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Estimated weighted Jaccard: fraction of (feature, t) collisions.
    An empty-set sentinel signature (all −1) estimates 0.0 against anything
    — J_w(∅, ·) = 0, matching :func:`exact_weighted_jaccard`."""
    if len(sig_a) != len(sig_b):
        raise ValueError("signatures must have equal length")
    if len(sig_a) == 0 or (sig_a == -1).all() or (sig_b == -1).all():
        return 0.0
    eq = (sig_a[:, 0] == sig_b[:, 0]) & (sig_a[:, 1] == sig_b[:, 1])
    return float(eq.mean())


def exact_weighted_jaccard(
    ha: np.ndarray, wa: np.ndarray, hb: np.ndarray, wb: np.ndarray
) -> float:
    """Σ min / Σ max over the union of features (exact, for calibration)."""
    da = dict(zip(np.asarray(ha, np.uint64).tolist(), np.asarray(wa, np.float64).tolist()))
    db = dict(zip(np.asarray(hb, np.uint64).tolist(), np.asarray(wb, np.float64).tolist()))
    s_min = sum(min(da.get(k, 0.0), db.get(k, 0.0)) for k in set(da) | set(db))
    s_max = sum(max(da.get(k, 0.0), db.get(k, 0.0)) for k in set(da) | set(db))
    return s_min / s_max if s_max else 0.0
