"""PPJoin prefix-filtered set-similarity join: exact parity with brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _tokens(text: str) -> frozenset[str]:
    import re

    return frozenset(re.findall(r"[a-z0-9]+", text.lower()))


def _brute(df: pd.DataFrame, t: float):
    rows = [(int(r.doc_id), _tokens(r.text)) for r in df.itertuples()]
    out = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, wa), (ib, wb) = rows[i], rows[j]
            if not wa or not wb:
                continue
            inter = len(wa & wb)
            union = len(wa) + len(wb) - inter
            jac = inter / union
            if jac >= t:
                a, b = min(ia, ib), max(ia, ib)
                out[(a, b)] = (len(wa) if ia < ib else len(wb), len(wb) if ia < ib else len(wa), inter, jac)
    return out


@pytest.mark.parametrize("threshold", [0.6, 0.9])
def test_ppjoin_matches_bruteforce(ray_session, threshold):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ppjoin import ppjoin_pairs

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(60)]
    texts, base = [], None
    for i in range(150):
        if i % 5 == 0 or base is None:
            base = list(rng.choice(vocab, size=rng.integers(5, 25), replace=False))
        # near-dup cluster: mutate the base slightly
        doc = list(base)
        for _ in range(int(rng.integers(0, 3))):
            doc.append(str(rng.choice(vocab)))
        texts.append(" ".join(doc))
    texts.append("")  # empty doc: excluded from every pair
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})

    got = ppjoin_pairs(rd.from_pandas(df), "doc_id", "text", threshold=threshold, num_blocks=5).to_pandas()
    exp = _brute(df, threshold)
    got_keys = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert got_keys == set(exp)
    for r in got.itertuples():
        sz_a, sz_b, inter, jac = exp[(int(r.id_a), int(r.id_b))]
        assert (int(r.sz_a), int(r.sz_b), int(r.inter)) == (sz_a, sz_b, inter)
        assert r.jaccard == jac  # float division of exact ints: bitwise
    # no duplicate pair rows survive the multi-bucket verify
    assert len(got) == len(got_keys)


def test_prefix_length_rule():
    from perfect_bloomfilter_ray.stages.ppjoin import _prefix_len

    assert _prefix_len(10, 0.8) == 3
    assert _prefix_len(10, 1.0) == 1  # exact-duplicate mode: rarest token only
    assert _prefix_len(1, 0.5) == 1
