"""TF-IDF featurization (stages/vocab.py) and shard packing
(stages/shards.py): brute-force parity and packing invariants."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30), p=None))
        for _ in range(200)
    ]
    texts[3] = ""  # empty doc
    texts[7] = "!!! ??? ..."  # no tokens after normalization
    return texts


def _brute_tfidf(texts: list[str], min_df: int):
    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    df = Counter()
    for t in texts:
        df.update(set(tok(t)))
    n = len(texts)
    idf = {w: math.log(n / c) for w, c in df.items() if c >= min_df}
    scores = [sum(idf.get(w, 0.0) for w in tok(t)) for t in texts]
    ntoks = [len(tok(t)) for t in texts]
    return df, idf, scores, ntoks


def test_tfidf_matches_bruteforce(ray_session, corpus):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.vocab import (
        document_frequency,
        idf_broadcast,
        tfidf_score,
    )

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
    ).repartition(6)
    bdf, bidf, bscores, bntoks = _brute_tfidf(corpus, min_df=3)

    dfreq = {r["token"]: r["df"] for r in document_frequency(ds, "text", min_df=3).take_all()}
    assert dfreq == {w: c for w, c in bdf.items() if c >= 3}

    ref = idf_broadcast(rd.from_items([{"token": w, "df": c} for w, c in sorted(dfreq.items())]), len(corpus))
    out = (
        tfidf_score(ds, ref, "text")
        .select_columns(["doc_id", "score", "n_toks"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["score"].to_numpy(), np.array(bscores), rtol=1e-12, atol=1e-12)
    assert out["n_toks"].tolist() == bntoks


def test_pack_shards_matches_sequential_greedy(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import pack_shards

    rng = np.random.default_rng(5)
    n, budget = 500, 1000
    ids = np.arange(n, dtype=np.int64)
    cost = rng.integers(1, 400, size=n).astype(np.int64)
    okey = (ids * 2654435761) % 1000003
    part = okey % 8
    t = pa.table(
        {"doc_id": ids, "cost": cost, "okey": okey, "part": part}
    )
    out = (
        pack_shards(rd.from_arrow(t).repartition(5), "cost", budget, "part", "okey", "doc_id")
        .to_pandas()
        .sort_values(["part", "okey", "doc_id"])
        .reset_index(drop=True)
    )
    # brute force: per part, order by (okey, id), exclusive cumsum // budget
    df = pd.DataFrame({"doc_id": ids, "cost": cost, "okey": okey, "part": part})
    df = df.sort_values(["part", "okey", "doc_id"]).reset_index(drop=True)
    exp = []
    for _, g in df.groupby("part", sort=True):
        cum = np.concatenate([[0], np.cumsum(g["cost"].to_numpy())[:-1]])
        exp.append(pd.Series(cum // budget, index=g.index))
    df["shard_seq"] = pd.concat(exp).sort_index()
    assert out["shard_seq"].tolist() == df["shard_seq"].tolist()

    # packing invariants: seqs start at 0 and are contiguous per part; every
    # shard but the last in a part ends because adding its successor's first
    # doc would cross the budget — equivalently each non-final shard's total
    # plus the next doc exceeds budget only via a doc, so shard totals are
    # < budget + max single cost.
    g = df.groupby(["part", "shard_seq"])["cost"].sum()
    assert (g < budget + cost.max()).all()
    for _, grp in df.groupby("part"):
        seqs = sorted(grp["shard_seq"].unique())
        assert seqs == list(range(len(seqs)))


def test_pack_shards_empty_and_single(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import pack_shards

    one = pa.table({"doc_id": [1], "cost": [10**7], "okey": [0], "part": [0]})
    out = pack_shards(rd.from_arrow(one), "cost", 100, "part", "okey", "doc_id").take_all()
    assert out[0]["shard_seq"] == 0  # oversized doc still lands in shard 0


def test_unigram_nll_matches_bruteforce(ray_session, corpus):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.vocab import (
        token_counts,
        unigram_logprob_broadcast,
        unigram_nll_score,
    )

    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    cnt = Counter(w for t in corpus for w in tok(t))
    total = sum(cnt.values())
    vocab = {w: c for w, c in cnt.items() if c >= 4}
    exp = []
    for t in corpus:
        ws = tok(t)
        nll = sum(-math.log(vocab.get(w, 0.5) / total) for w in ws)
        exp.append(nll / len(ws) if ws else 0.0)

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
    ).repartition(6)
    cds = token_counts(ds, "text", min_count=4)
    got_cnt = {r["token"]: r["cnt"] for r in cds.take_all()}
    assert got_cnt == vocab
    ref = unigram_logprob_broadcast(cds, total)
    out = (
        unigram_nll_score(ds, ref, "text")
        .select_columns(["doc_id", "nll_per_tok"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["nll_per_tok"].to_numpy(), np.array(exp), rtol=1e-12, atol=1e-12)


def test_write_jsonl_shards_roundtrip_and_resume(ray_session, tmp_path):
    import json
    import os

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import pack_shards, write_jsonl_shards

    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc {i}" for i in range(n)],
            "cost": np.full(n, 7, dtype=np.int64),
            "part": (np.arange(n) % 3).astype(np.int64),
        }
    )
    packed = pack_shards(
        rd.from_pandas(df).repartition(4), "cost", budget=100, part_col="part",
        order_col="doc_id", id_col="doc_id",
    )
    out = str(tmp_path / "shards")
    man = write_jsonl_shards(packed, out, part_col="part", order_cols=["doc_id"])
    assert man["num_written"] == man["num_shards"] > 3 and man["num_resumed"] == 0
    assert man["total_rows"] == n

    # every record round-trips; files are internally ordered
    back = rd.read_json([s["path"] for s in man["shards"]]).to_pandas()
    assert len(back) == n
    assert sorted(back["doc_id"]) == list(range(n))

    # re-run: nothing rewritten, same manifest shape
    mtimes = {s["path"]: os.path.getmtime(s["path"]) for s in man["shards"]}
    man2 = write_jsonl_shards(packed, out, part_col="part", order_cols=["doc_id"])
    assert man2["num_resumed"] == man["num_shards"] and man2["num_written"] == 0
    assert {s["path"]: os.path.getmtime(s["path"]) for s in man2["shards"]} == mtimes
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh)["total_rows"] == n


def test_categorical_encode_freq_order_nulls_mincount(ray_session):
    import ray

    from perfect_bloomfilter_ray.stages.vocab import categorical_encode

    vals = ["b"] * 50 + ["a"] * 50 + ["c"] * 30 + ["rare"] * 2 + [None] * 3
    ds = ray.data.from_pandas(pd.DataFrame({"k": vals, "i": range(len(vals))}))
    out = (
        categorical_encode(ds, "k", min_count=5)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    code = dict(zip(out["k"], out["k_code"]))
    # ties on count=50 break by value: a before b; c next; rare/null -> null
    assert code["a"] == 0 and code["b"] == 1 and code["c"] == 2
    assert out.loc[out["k"] == "rare", "k_code"].isna().all()
    assert out.loc[out["k"].isna(), "k_code"].isna().all()
    assert str(out["k_code"].dtype) in ("Int64", "float64", "object")


def test_bigram_nll_matches_bruteforce(ray_session, corpus):
    import math
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.vocab import (
        bigram_counts,
        bigram_logprob_broadcast,
        bigram_nll_score,
        token_counts,
        unigram_count_broadcast,
    )

    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    uni_min, big_min = 3, 2
    c1 = Counter()
    c2 = Counter()
    total = 0
    for s in corpus:
        t = tok(s)
        total += len(t)
        c1.update(t)
        c2.update(zip(t, t[1:]))
    vocab = {
        (a, b): math.log(c1[a]) - math.log(n)
        for (a, b), n in c2.items()
        if n >= big_min and c1[a] >= uni_min
    }
    floor = -math.log(0.5 / total)

    ds = rd.from_pandas(pd.DataFrame({"text": corpus, "i": range(len(corpus))}))
    uni = token_counts(ds, "text", min_count=uni_min)
    uref = unigram_count_broadcast(uni)
    big = bigram_counts(ds, "text", min_count=big_min)
    lp = bigram_logprob_broadcast(big, uref, total)
    out = (
        bigram_nll_score(ds, lp, "text")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    for i, s in enumerate(corpus):
        t = tok(s)
        pairs = list(zip(t, t[1:]))
        assert out["n_bigrams"][i] == len(pairs)
        exp = (
            sum(vocab.get(p, floor) for p in pairs) / len(pairs) if pairs else 0.0
        )
        assert abs(out["nll2_per_tok"][i] - exp) < 1e-9


def _budget_brute(df, budget):
    d = df.sort_values(["score", "id"], ascending=[False, True])
    cum = d["cost"].cumsum()
    return set(d.loc[cum <= budget, "id"])


@pytest.mark.parametrize("budget_frac", [0.0, 0.1, 0.5, 0.9, 1.5])
def test_select_within_budget_matches_prefix_rule(ray_session, budget_frac):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import select_within_budget

    rng = np.random.default_rng(int(budget_frac * 10) + 1)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            # heavy ties: scores drawn from a small set of values
            "score": rng.choice([0.1, 0.5, 0.5, 2.0, 3.25, 7.0], size=n),
            "cost": rng.integers(1, 50, size=n).astype(np.int64),
        }
    )
    budget = float(df["cost"].sum()) * budget_frac
    out = select_within_budget(
        rd.from_pandas(df), "score", "cost", "id", budget,
        bins=8, refine_rounds=3, boundary_limit=64,
    ).to_pandas()
    got = set(out["id"]) if "id" in out.columns else set()  # all-empty loses schema
    assert got == _budget_brute(df, budget)


def test_select_within_budget_all_tied_scores(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import select_within_budget

    df = pd.DataFrame(
        {
            "id": np.arange(500, dtype=np.int64),
            "score": np.full(500, 4.2),
            "cost": np.full(500, 10, dtype=np.int64),
        }
    )
    out = select_within_budget(
        rd.from_pandas(df), "score", "cost", "id", 1005.0,
        bins=8, refine_rounds=3, boundary_limit=64,
    ).to_pandas()
    # ties broken by id: first 100 ids fit (100*10 = 1000 <= 1005)
    assert sorted(out["id"]) == list(range(100))


def test_bm25_matches_bruteforce(corpus):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.vocab import bm25_query_stats, bm25_score

    terms = ["w0", "w1", "w17", "zzz-absent"]
    # zzz-absent never tokenizes to a match (df=0) — idf formula must not
    # divide by zero thanks to the +0.5 smoothing.
    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(corpus)]).repartition(7)

    dfs, total = bm25_query_stats(ds, "text", terms)
    exp_df = Counter()
    for t in corpus:
        exp_df.update(set(tok(t)) & set(terms))
    assert dfs == {t: exp_df.get(t, 0) for t in terms}
    assert total == sum(len(tok(t)) for t in corpus)

    n = len(corpus)
    avgdl = total / n
    k1, b = 1.2, 0.75
    out = (
        bm25_score(ds, "text", terms, dfs, n, avgdl, k1=k1, b=b)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    idf = {t: math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in terms}
    for i, text in enumerate(corpus):
        ws = tok(text)
        dl = len(ws)
        exp = 0.0
        nm = 0
        for t in terms:
            tf = ws.count(t)
            if tf:
                nm += 1
                exp += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        row = out.iloc[i]
        assert row["dl"] == dl
        assert row["n_terms"] == nm
        assert row["score"] == pytest.approx(exp, abs=1e-9)


def test_top_keyterms_matches_bruteforce(corpus):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.vocab import (
        document_frequency,
        int_idf_broadcast,
        top_keyterms,
    )

    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    n = len(corpus)
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(corpus)]
    ).repartition(6)
    dfreq = document_frequency(ds, "text", min_df=3)
    ref = int_idf_broadcast(dfreq, n)
    out = (
        top_keyterms(ds, ref, "text", "doc_id", k=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )

    df = Counter()
    for t in corpus:
        df.update(set(tok(t)))
    idf_i = {w: (n * 1_000_000) // c for w, c in df.items() if c >= 3}
    exp_rows = []
    for i, text in enumerate(corpus):
        tf = Counter(w for w in tok(text) if w in idf_i)
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1] * idf_i[kv[0]], kv[0]))[:2]
        for r, (w, c) in enumerate(ranked, 1):
            exp_rows.append((i, r, w, c, c * idf_i[w]))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "rnk", "token", "tf", "score"])
    pd.testing.assert_frame_equal(out, exp)


def test_greedy_max_coverage_matches_brute(ray_session):
    """5-round greedy over word 5-grams equals a brute-force set greedy,
    including min-id ties and early stop once everything is covered."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import greedy_max_coverage

    texts = {
        1: "a b c d e f g h i j",          # grams: 6 distinct
        2: "a b c d e f g h i j",          # duplicate of 1 -> 0 marginal gain
        3: "k l m n o p q r",              # 4 distinct, disjoint
        4: "a b c d e k l m n o",          # overlaps both
        5: "z z z z",                      # shorter than n -> no grams
    }
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = greedy_max_coverage(docs, k=5, n=5)

    def gramset(s):
        w = s.split()
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    sets = {d: gramset(s) for d, s in texts.items()}
    covered: set[str] = set()
    want = []
    for step in range(1, 6):
        gains = {d: len(g - covered) for d, g in sets.items()}
        best = min((d for d in gains), key=lambda d: (-gains[d], d))
        if gains[best] == 0:
            break
        covered |= sets[best]
        want.append((step, best, gains[best], len(covered)))
    assert [tuple(int(v) for v in r) for r in got.itertuples(index=False)] == want
    assert len(got) < 5  # early stop: coverage exhausted before k rounds


def test_kneser_ney_distribution_normalizes(ray_session):
    """Interpolated KN with d=0.75 must yield sum_w P(w|v) == 1 for every
    history v when extended over the full continuation vocabulary — the
    smoothing invariant the pkn formula implements; checked on a toy
    corpus plus the query's own top-20 output at sf0.001."""
    import collections

    from perfect_bloomfilter_ray.pipelines.extras import kneser_ney_bigram_probs

    text = "the cat sat on the mat the cat ran to the mat".split()
    bg = collections.Counter(zip(text, text[1:]))
    cv = collections.Counter()
    nv = collections.Counter()
    nw = collections.Counter()
    for (a, b), c in bg.items():
        cv[a] += c
        nv[a] += 1
        nw[b] += 1
    B = len(bg)
    d = 0.75
    vocab = set(nw)
    for v in cv:
        s = sum(
            max(bg.get((v, w), 0) - d, 0) / cv[v] + d * nv[v] / cv[v] * (nw[w] / B)
            for w in vocab
        )
        assert abs(s - 1.0) < 1e-12, (v, s)

    out = kneser_ney_bigram_probs("/root/testdata/sf0.001")
    assert len(out) == 20
    # each pkn matches its own row's closed form and is a probability
    import numpy as np

    expect = (out["c"] - 0.75) / out["cv"] + 0.75 * out["nv"] / out["cv"] * (
        out["nw"] / out["b"].astype(float)
    )
    assert np.allclose(out["pkn"], expect)
    assert ((out["pkn"] > 0) & (out["pkn"] <= 1)).all()
