"""dup_ngram_stats (stages/ngramdup.py) vs a brute-force Python reference."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd


def _brute(texts: dict[int, str], n: int, min_docs: int) -> pd.DataFrame:
    grams = {}
    for i, t in texts.items():
        toks = re.findall(r"[a-z0-9]+", t.lower())
        grams[i] = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
    docs_of = Counter()
    for i, gs in grams.items():
        for g in set(gs):
            docs_of[g] += 1
    rows = []
    for i, gs in grams.items():
        if not gs:
            continue
        nd = sum(1 for g in gs if docs_of[g] >= min_docs)
        rows.append({"doc_id": i, "n_grams": len(gs), "n_dup": nd, "dup_frac": nd / len(gs)})
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


def test_dup_ngram_stats_matches_brute(ray_session):
    from perfect_bloomfilter_ray.stages.ngramdup import dup_ngram_stats

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for i in range(120):
        words = list(rng.choice(vocab, rng.integers(2, 30)))  # some docs < n tokens
        texts[i] = " ".join(words)
    # engineered duplication: a shared boilerplate sentence in a third of docs,
    # plus exact-duplicate pairs and a doc that repeats its own 5-gram (intra-
    # doc repeats count every position but only one doc)
    boiler = "the quick brown fox jumps over the lazy dog"
    for i in range(0, 120, 3):
        texts[i] = texts[i] + " " + boiler
    texts[7] = texts[11]
    texts[100] = "a b c d e a b c d e a b c d e"
    df = pd.DataFrame({"doc_id": list(texts), "text": [texts[i] for i in texts]})
    for n, min_docs in ((5, 2), (3, 3)):
        got = (
            dup_ngram_stats(
                rd.from_pandas(df).repartition(7), "text", "doc_id", n=n, min_docs=min_docs, num_blocks=4
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = _brute(texts, n, min_docs)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def _brute_removal(texts: dict[int, str], n: int, min_docs: int) -> pd.DataFrame:
    toks = {
        i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in texts.items()
    }
    docs_of = Counter()
    for i, ts in toks.items():
        for g in {" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)}:
            docs_of[g] += 1
    rows = []
    for i, ts in toks.items():
        if not ts:
            continue
        cov = [False] * len(ts)
        for j in range(len(ts) - n + 1):
            if docs_of[" ".join(ts[j : j + n])] >= min_docs:
                for k in range(j, j + n):
                    cov[k] = True
        kept = [w for w, c in zip(ts, cov) if not c]
        rows.append(
            {
                "doc_id": i,
                "n_tokens": len(ts),
                "n_removed": sum(cov),
                "text_clean": " ".join(kept),
            }
        )
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


def test_remove_dup_spans_matches_brute(ray_session):
    from perfect_bloomfilter_ray.stages.ngramdup import remove_dup_spans

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for i in range(100):
        texts[i] = " ".join(rng.choice(vocab, rng.integers(2, 25)))
    boiler = "subscribe to our newsletter for daily updates and offers"
    for i in range(0, 100, 4):
        texts[i] = boiler + " " + texts[i] + " " + boiler
    texts[3] = texts[9]  # full duplicates → fully removed
    df = pd.DataFrame({"doc_id": list(texts), "text": [texts[i] for i in texts]})
    got = (
        remove_dup_spans(
            rd.from_pandas(df).repartition(6), "text", "doc_id", n=5, min_docs=2, num_blocks=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _brute_removal(texts, 5, 2)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert got.loc[got.doc_id == 3, "text_clean"].iloc[0] == ""
