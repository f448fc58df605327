"""Benchmark decontamination (stages/decontam.py): brute-force parity,
drop/flag duality, and short-document edge cases."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest


def _brute_contaminated(corpus: list[str], bench: list[str], n: int) -> set[int]:
    """Reference semantics in plain Python: set-of-string n-grams."""

    def grams(text: str) -> set[tuple[str, ...]]:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bset = set()
    for t in bench:
        bset |= grams(t)
    return {i for i, t in enumerate(corpus) if grams(t) & bset}


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    bench = [" ".join(rng.choice(vocab, size=rng.integers(8, 20))) for _ in range(10)]
    corpus = [" ".join(rng.choice(vocab, size=rng.integers(3, 25))) for _ in range(120)]
    # plant exact 5-gram contamination in some corpus docs
    for i in (4, 17, 60):
        src = bench[i % len(bench)].split()
        corpus[i] = corpus[i] + " " + " ".join(src[:5])
    # punctuation / case must not matter
    corpus[4] = corpus[4].upper().replace(" ", ", ")
    return corpus, bench


def test_decontaminate_matches_bruteforce(ray_session, docs):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.decontam import build_blocklist, decontaminate

    corpus, bench = docs
    n = 5
    expected = _brute_contaminated(corpus, bench, n)
    assert expected >= {4, 17, 60}

    bench_ds = rd.from_arrow(pa.table({"text": bench}))
    corp_ds = rd.from_arrow(
        pa.table({"i": list(range(len(corpus))), "text": corpus})
    ).repartition(4)
    bl = build_blocklist(bench_ds, "text", n=n)
    flagged = decontaminate(corp_ds, bl, n=n, drop=False).to_pandas()
    got = set(flagged[flagged["contaminated"]]["i"])
    assert got == expected

    kept = decontaminate(corp_ds, bl, n=n, drop=True).to_pandas()
    assert set(kept["i"]) == set(range(len(corpus))) - expected


def test_decontaminate_short_docs_and_empty_blocklist(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.decontam import build_blocklist, decontaminate

    # every doc shorter than n tokens -> nothing contaminated, empty blocklist
    short = rd.from_arrow(pa.table({"text": ["a b c", "one two", ""]}))
    bl = build_blocklist(short, "text", n=5)
    assert len(bl) == 0
    out = decontaminate(short, bl, n=5, drop=True).to_pandas()
    assert len(out) == 3

    # an empty blocklist must keep everything even for long docs
    long = rd.from_arrow(pa.table({"text": [" ".join("x" * 3 for _ in range(30))]}))
    assert len(decontaminate(long, bl, n=5, drop=True).to_pandas()) == 1


def test_contamination_fraction_matches_bruteforce(ray_session):
    import re

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.decontam import (
        build_blocklist,
        contamination_fraction,
    )

    n = 3
    bench = ["the quick brown fox jumps", "hello world again and again"]
    corpus = [
        "the quick brown fox jumps over the lazy dog",  # shares grams
        "completely different text with no overlap at all here",
        "hello world again and AGAIN yes",  # case-insensitive overlap
        "too short",  # < n tokens -> 0 grams
    ]

    def grams(s):
        t = re.findall(r"[a-z0-9]+", s.lower())
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    bgrams = set().union(*(grams(b) for b in bench))
    bl = build_blocklist(rd.from_arrow(pa.table({"text": bench})), "text", n=n)
    out = (
        contamination_fraction(
            rd.from_arrow(pa.table({"text": corpus, "i": list(range(len(corpus)))})),
            bl,
            n=n,
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    for i, doc in enumerate(corpus):
        g = grams(doc)
        assert out["n_grams"][i] == len(g)
        exp = (len(g & bgrams) / len(g)) if g else 0.0
        assert abs(out["contam_frac"][i] - exp) < 1e-12
