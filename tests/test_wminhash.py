"""ICWS weighted MinHash: collision probability == weighted Jaccard."""

from __future__ import annotations

import numpy as np

from perfect_bloomfilter_ray.state.wminhash import (
    exact_weighted_jaccard,
    icws_estimate,
    icws_signature,
)


def _random_weighted_set(rng, universe, size):
    feats = rng.choice(universe, size=size, replace=False).astype(np.uint64)
    w = rng.gamma(2.0, 2.0, size=size) + 0.1
    return feats, w


def test_icws_estimates_weighted_jaccard_within_tolerance():
    """K=256 samples → std ≈ sqrt(J(1−J)/K) ≤ 0.031; assert within 4σ over
    several overlap regimes (deterministic signatures, fixed data seed)."""
    rng = np.random.RandomState(0)
    universe = np.arange(1, 5000, dtype=np.uint64)
    for overlap in (0.9, 0.5, 0.2):
        ha, wa = _random_weighted_set(rng, universe, 400)
        n_keep = int(400 * overlap)
        hb = np.concatenate([ha[:n_keep], _random_weighted_set(rng, universe + 10_000, 400 - n_keep)[0]])
        wb = np.concatenate([wa[:n_keep] * rng.uniform(0.5, 2.0, n_keep), rng.gamma(2.0, 2.0, 400 - n_keep) + 0.1])
        exact = exact_weighted_jaccard(ha, wa, hb, wb)
        sa = icws_signature(ha, wa, num_perms=256)
        sb = icws_signature(hb, wb, num_perms=256)
        est = icws_estimate(sa, sb)
        sigma = np.sqrt(max(exact * (1 - exact), 1e-4) / 256)
        assert abs(est - exact) < 4 * sigma + 1e-9, (overlap, exact, est)


def test_icws_identical_sets_collide_fully():
    rng = np.random.RandomState(1)
    h, w = _random_weighted_set(rng, np.arange(1, 1000, dtype=np.uint64), 100)
    assert icws_estimate(icws_signature(h, w), icws_signature(h, w)) == 1.0


def test_icws_disjoint_sets_rarely_collide():
    rng = np.random.RandomState(2)
    ha, wa = _random_weighted_set(rng, np.arange(1, 1000, dtype=np.uint64), 100)
    hb, wb = _random_weighted_set(rng, np.arange(10_000, 11_000, dtype=np.uint64), 100)
    assert icws_estimate(icws_signature(ha, wa, 256), icws_signature(hb, wb, 256)) < 0.02


def test_icws_deterministic_and_scale_sensitive():
    rng = np.random.RandomState(3)
    h, w = _random_weighted_set(rng, np.arange(1, 500, dtype=np.uint64), 50)
    s1, s2 = icws_signature(h, w, 64), icws_signature(h.copy(), w.copy(), 64)
    np.testing.assert_array_equal(s1, s2)  # reproducible across calls/workers
    # doubling ALL weights changes J_w(A, 2A) = 1/2 — the estimator must see it
    s_half = icws_signature(h, 2 * w, 256)
    est = icws_estimate(icws_signature(h, w, 256), s_half)
    assert 0.35 < est < 0.65  # J = 0.5, 4σ ≈ 0.125


def test_icws_empty_and_zero_weight():
    sig = icws_signature(np.array([], dtype=np.uint64), np.array([]), 16)
    assert (sig == -1).all()
    h = np.array([5, 7], dtype=np.uint64)
    sig2 = icws_signature(h, np.array([0.0, 3.0]), 16)
    # the zero-weight feature must never be sampled: every sample picks h[1]
    assert (sig2[:, 0] == h[1:].view(np.int64)[0]).all()


def test_wminhash_lsh_pairs_weighted_distinction(ray_session):
    """Identical docs pair at 1.0; a small edit stays a near-dup; a doc
    with the SAME word set but 60x-skewed multiplicities must NOT pair —
    the exact distinction set-Jaccard LSH cannot make."""
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.dedup import wminhash_lsh_pairs

    df = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": [
                "the cat sat on the mat " * 5,
                "the cat sat on the mat " * 5,
                "the cat sat on the mat " + "spam " * 60,
                "completely different words entirely here now",
                "the cat sat on the mat " * 5 + "tiny tail",
            ],
        }
    )
    out = (
        wminhash_lsh_pairs(
            ray.data.from_pandas(df), "text", "doc_id", num_perms=64, bands=16, threshold=0.5
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert out.loc[(out["id_a"] == 0) & (out["id_b"] == 1), "est_jaccard"].iloc[0] == 1.0
    assert (0, 4) in pairs and (1, 4) in pairs
    assert not any(2 in p or 3 in p for p in pairs)
