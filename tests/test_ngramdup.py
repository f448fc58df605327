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
