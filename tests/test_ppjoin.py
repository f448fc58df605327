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


@pytest.mark.parametrize("threshold", [0.5, 0.85])
def test_ppjoin_rs_matches_bruteforce(ray_session, threshold):
    """Cross-collection R-S join: exact parity with the brute-force cross
    product, and never a same-side pair."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ppjoin import ppjoin_pairs_rs

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(50)]

    def mk(n, id0):
        texts = []
        base = None
        for i in range(n):
            if i % 4 == 0 or base is None:
                base = list(rng.choice(vocab, size=rng.integers(5, 20), replace=False))
            doc = list(base)
            for _ in range(int(rng.integers(0, 3))):
                doc.append(str(rng.choice(vocab)))
            texts.append(" ".join(doc))
        texts.append("")
        return pd.DataFrame({"doc_id": np.arange(id0, id0 + len(texts)), "text": texts})

    df_r = mk(60, 0)
    df_s = mk(80, 1000)
    # guarantee cross-side near-dups: S also carries mutated copies of R docs
    extra = df_r.head(20).copy()
    extra["doc_id"] = np.arange(2000, 2000 + len(extra))
    extra["text"] = extra["text"] + " w0"
    df_s = pd.concat([df_s, extra], ignore_index=True)
    got = (
        ppjoin_pairs_rs(
            rd.from_pandas(df_r), rd.from_pandas(df_s), "doc_id", "text", threshold=threshold
        )
        .to_pandas()
        .sort_values(["id_r", "id_s"])
        .reset_index(drop=True)
    )
    # brute cross product
    want = {}
    rows_r = [(int(r.doc_id), _tokens(r.text)) for r in df_r.itertuples()]
    rows_s = [(int(r.doc_id), _tokens(r.text)) for r in df_s.itertuples()]
    for ir, wr in rows_r:
        for js, ws in rows_s:
            if not wr or not ws:
                continue
            inter = len(wr & ws)
            jac = inter / (len(wr) + len(ws) - inter)
            if jac >= threshold:
                want[(ir, js)] = (len(wr), len(ws), inter)
    got_keys = set(zip(got["id_r"], got["id_s"]))
    assert got_keys == set(want)
    assert (got["id_r"] < 1000).all() and (got["id_s"] >= 1000).all()
    for _, row in got.iterrows():
        szr, szs, inter = want[(int(row["id_r"]), int(row["id_s"]))]
        assert (int(row["sz_r"]), int(row["sz_s"]), int(row["inter"])) == (szr, szs, inter)
        assert row["jaccard"] == inter / (szr + szs - inter)


def test_ppjoin_rs_empty_result_keeps_schema(ray_session):
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ppjoin import ppjoin_pairs_rs

    df_r = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "gamma delta"]})
    df_s = pd.DataFrame({"doc_id": [10, 11], "text": ["epsilon zeta", "eta theta"]})
    out = ppjoin_pairs_rs(
        rd.from_pandas(df_r), rd.from_pandas(df_s), "doc_id", "text", threshold=0.9
    )
    assert out.count() == 0
    # Dataset-level schema survives the empty result (Ray's to_pandas() on an
    # empty Dataset drops columns — downstream code must read .schema())
    assert out.schema().names == ["id_r", "id_s", "sz_r", "sz_s", "inter", "jaccard"]
