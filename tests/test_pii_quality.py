"""PII scrubbing (stages/pii.py) and Gopher-style repetition filtering
(stages/quality.py): kernel parity with brute-force Python, and the Dataset
paths."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import polars as pl
import pyarrow as pa
import pytest


def test_scrub_batch_redacts_and_counts():
    from perfect_bloomfilter_ray.stages.pii import scrub_batch

    texts = pl.Series(
        [
            "mail a.b+c@ex-1.org now",
            "call 555-123-4567 or +01 555.123.4567 from 10.0.0.1",
            "two mails x@y.io z@w.co and none",
            "nothing here",
        ]
    )
    red, counts = scrub_batch(texts)
    assert red.to_list() == [
        "mail <EMAIL> now",
        "call <PHONE> or +01 <PHONE> from <IP>",
        "two mails <EMAIL> <EMAIL> and none",
        "nothing here",
    ]
    assert counts["email"].to_list() == [1, 0, 2, 0]
    assert counts["phone"].to_list() == [0, 2, 0, 0]
    assert counts["ipv4"].to_list() == [0, 1, 0, 0]


def test_scrub_order_email_consumes_dotted_quad():
    from perfect_bloomfilter_ray.stages.pii import scrub_batch

    # the dotted quad inside the email host must be eaten by the email rule
    red, counts = scrub_batch(pl.Series(["root@10.0.0.1.example.com pinged 10.1.2.3"]))
    assert red.to_list() == ["<EMAIL> pinged <IP>"]
    assert counts["email"].to_list() == [1] and counts["ipv4"].to_list() == [1]


def test_scrub_pii_dataset_path(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.pii import scrub_pii

    ds = rd.from_arrow(pa.table({"text": ["a@b.co", "clean", "10.2.3.4"]}))
    out = scrub_pii(ds, "text", out_col="red").to_pandas().sort_values("text")
    assert list(out.columns) == ["text", "red", "n_email", "n_phone", "n_ipv4"]
    assert out.set_index("text")["red"].to_dict() == {
        "a@b.co": "<EMAIL>",
        "clean": "clean",
        "10.2.3.4": "<IP>",
    }


def _brute_metrics(text: str) -> tuple[int, float, float, float]:
    toks = re.findall(r"[a-z0-9]+", text.lower())
    n = len(toks)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    fd = 1.0 - len(set(toks)) / n
    mwl = sum(len(t) for t in toks) / n
    if n < 2:
        return n, fd, mwl, 0.0
    top = Counter(zip(toks, toks[1:])).most_common(1)[0][1]
    return n, fd, mwl, top / (n - 1)


@pytest.mark.parametrize("seed", [0, 1])
def test_repetition_metrics_match_bruteforce(seed):
    from perfect_bloomfilter_ray.stages.quality import repetition_metrics

    rng = np.random.default_rng(seed)
    vocab = ["aa", "bee", "cccc", "dd1", "e"]
    texts = [
        " ".join(rng.choice(vocab, size=int(k)))
        for k in rng.integers(0, 30, size=50)
    ] + ["", "solo", "x x x x x x", "Ab ab AB ab"]
    m = repetition_metrics(pl.Series(texts))
    for i, t in enumerate(texts):
        n, fd, mwl, tbf = _brute_metrics(t)
        assert m["n_tokens"][i] == n
        assert m["frac_dup_words"][i] == pytest.approx(fd, abs=1e-12)
        assert m["mean_word_len"][i] == pytest.approx(mwl, abs=1e-12)
        assert m["top_bigram_frac"][i] == pytest.approx(tbf, abs=1e-12), t


def test_gopher_filter_drop_matches_flag(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quality import gopher_filter

    texts = [
        " ".join(f"word{j}" for j in range(40)),  # varied, long enough to keep
        "x x x x x x x x",
        "ok ok ok fine fine",
    ]
    ds = rd.from_arrow(pa.table({"i": [0, 1, 2], "text": texts}))
    flagged = gopher_filter(ds, "text", drop=False).to_pandas().sort_values("i")
    kept = gopher_filter(ds, "text", drop=True).to_pandas()
    assert set(kept["i"]) == set(flagged[flagged["keep"]]["i"])
    assert 1 not in set(kept["i"])  # pure repetition must be dropped


def test_validate_rules_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.validate import validate_rules

    df = pd.DataFrame(
        {
            "id": [1, 2, 2, 3, 4],
            "v": [0.5, -1.0, 2.0, None, 9.0],
            "s": ["a", "b", "zz", None, "a"],
            "txt": ["k: 1", "nope", "k: 22", None, "k: x"],
        }
    )
    rules = [
        {"rule": "unique", "col": "id"},
        {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 5.0},
        {"rule": "in_set", "col": "s", "values": ["a", "b"]},
        {"rule": "not_null", "col": "v"},
        {"rule": "matches", "col": "txt", "pattern": r"k: [0-9]+"},
    ]
    out = validate_rules(rd.from_pandas(df), rules).set_index("rule_id")
    assert out.loc[0, "n_violations"] == 1  # one surplus copy of id=2
    assert out.loc[1, "n_violations"] == 2  # -1.0 and 9.0 (null skips)
    assert out.loc[2, "n_violations"] == 1  # "zz" (null skips)
    assert out.loc[3, "n_violations"] == 1  # one null v
    assert out.loc[4, "n_violations"] == 2  # "nope", "k: x" (null skips)

    # unique with NULL keys matches SQL count(*) - count(DISTINCT): every
    # null row is a violation
    df2 = pd.DataFrame({"id": [1.0, None, None, 2.0]})
    out2 = validate_rules(rd.from_pandas(df2), [{"rule": "unique", "col": "id"}])
    assert out2["n_violations"][0] == 2


def test_compression_filter_stats_exact(ray_session):
    """Rows-only query contract: every byte count and keep decision equals
    a driver-side zlib recompute at sf0.01."""
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.extras import compression_filter_stats

    got = compression_filter_stats("/root/testdata/sf0.01")
    src = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text", "lang"]
    ).to_pandas()
    rows = []
    for lang, grp in src.groupby("lang"):
        raws = [(s or "").encode("utf-8") for s in grp["text"]]
        comps = [len(zlib.compress(r, 6)) if r else 0 for r in raws]
        ratios = [c / len(r) if r else 1.0 for c, r in zip(comps, raws)]
        rows.append(
            {
                "lang": lang,
                "n_docs": len(grp),
                "n_kept": sum(x >= 0.25 for x in ratios),
                "raw_bytes": sum(len(r) for r in raws),
                "comp_bytes": sum(comps),
            }
        )
    want = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    assert got.astype("object").equals(want.astype("object")), (got, want)


def test_compression_ratio_discriminates(ray_session):
    from perfect_bloomfilter_ray.stages.quality import compression_ratio

    natural = "the quick brown fox jumps over the lazy dog and keeps running far"
    repetitive = "spam " * 200
    r = compression_ratio([natural * 3, repetitive, "", None])
    assert r[0] > 0.3 and r[1] < 0.1 and r[2] == 1.0 and r[3] == 1.0
