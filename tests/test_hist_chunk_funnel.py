"""histogram (stages/quantiles), chunk_documents (stages/shards) and
funnel_counts (stages/windows) vs brute-force references."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd


def test_histogram_matches_numpy(ray_session):
    from perfect_bloomfilter_ray.stages.quantiles import histogram

    rng = np.random.default_rng(2)
    v = np.concatenate([rng.uniform(-10, 110, 5000), [np.nan, -10.0, 110.0, 0.0]])
    df = pd.DataFrame({"value": v})
    out = (
        histogram(rd.from_pandas(df).repartition(9), "value", 0.0, 100.0, 10)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    inr = v[~np.isnan(v)]
    inr = inr[(inr >= 0.0) & (inr < 100.0)]
    ref, _ = np.histogram(inr, bins=10, range=(0.0, 100.0))
    assert list(out["bin"]) == list(np.flatnonzero(ref))
    assert list(out["n"]) == list(ref[ref > 0])
    assert out["bin_lo"].iloc[0] == 0.0 and out["bin_hi"].iloc[-1] == 100.0
    assert int(out["n"].sum()) == len(inr)


def test_chunk_documents_matches_brute(ray_session):
    from perfect_bloomfilter_ray.stages.shards import chunk_documents

    rng = np.random.default_rng(9)
    texts = {
        i: " ".join(f"t{x}" for x in rng.integers(0, 50, rng.integers(1, 40)))
        for i in range(60)
    }
    texts[58] = "one two"  # < size → single chunk
    texts[59] = "!!! ..."  # no tokens → no chunks
    df = pd.DataFrame({"doc_id": list(texts), "text": [texts[i] for i in texts]})
    size, overlap = 10, 3
    step = size - overlap
    got = (
        chunk_documents(rd.from_pandas(df).repartition(5), "text", "doc_id", size, overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    rows = []
    for i, t in texts.items():
        toks = re.findall(r"[a-z0-9]+", t.lower())
        if not toks:
            continue
        k = 0
        while True:
            chunk = toks[k * step : k * step + size]
            rows.append(
                {"doc_id": i, "chunk_idx": k, "n_tokens": len(chunk), "chunk": " ".join(chunk)}
            )
            if k * step + size >= len(toks):
                break
            k += 1
    ref = pd.DataFrame(rows).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert 59 not in set(got["doc_id"])


def test_funnel_counts_matches_brute(ray_session):
    from perfect_bloomfilter_ray.stages.windows import funnel_counts

    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 150, n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "et": np.array(["A", "B", "C", "X"])[rng.integers(0, 4, n)],
        }
    )
    got = funnel_counts(
        rd.from_pandas(df).repartition(7), "u", "ts", "et", ["A", "B", "C"], num_blocks=4
    )
    ref = [0, 0, 0]
    for _, g in df.groupby("u"):
        g = g.sort_values("ts")
        prev = pd.Timestamp.min
        for si, s in enumerate(["A", "B", "C"]):
            cand = g[(g["et"] == s) & (g["ts"] > prev)]
            if len(cand) == 0:
                break
            prev = cand["ts"].min()
            ref[si] += 1
    assert list(got["users"]) == ref
    assert list(got["stage"]) == ["A", "B", "C"]


def test_setops_match_pandas(ray_session):
    from perfect_bloomfilter_ray.stages.setops import except_distinct, intersect_distinct

    rng = np.random.default_rng(6)
    a = pd.DataFrame({"x": rng.integers(0, 30, 800), "y": np.array(list("pqrs"))[rng.integers(0, 4, 800)]})
    b = pd.DataFrame({"x": rng.integers(15, 45, 700), "y": np.array(list("pqrs"))[rng.integers(0, 4, 700)]})
    da, db = rd.from_pandas(a).repartition(5), rd.from_pandas(b).repartition(4)
    got_i = (
        intersect_distinct(da, db, ["x", "y"]).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    )
    got_e = (
        except_distinct(da, db, ["x", "y"]).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    )
    sa = set(map(tuple, a.drop_duplicates().values))
    sb = set(map(tuple, b.drop_duplicates().values))
    ref_i = pd.DataFrame(sorted(sa & sb), columns=["x", "y"])
    ref_e = pd.DataFrame(sorted(sa - sb), columns=["x", "y"])
    pd.testing.assert_frame_equal(got_i, ref_i, check_dtype=False)
    pd.testing.assert_frame_equal(got_e, ref_e, check_dtype=False)


def test_grouped_path_string_truncation(ray_session):
    from perfect_bloomfilter_ray.stages.windows import grouped_path_string

    rng = np.random.default_rng(12)
    n = 1500
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 60, n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "eid": np.arange(n, dtype=np.int64),
            "et": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
        }
    )
    got = (
        grouped_path_string(
            rd.from_pandas(df).repartition(6), "u", "ts", "et", sep="|", tie_cols=["eid"], num_blocks=4
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["u", "ts", "eid"])
        .groupby("u")["et"]
        .agg(n_steps="size", path=lambda s: "|".join(s))
        .reset_index()
    )
    assert list(got["u"]) == list(ref["u"])
    assert list(got["n_steps"]) == list(ref["n_steps"])
    assert list(got["path"]) == list(ref["path"])
    # truncation keeps the first k steps but reports the true count
    got3 = (
        grouped_path_string(
            rd.from_pandas(df), "u", "ts", "et", sep="|", tie_cols=["eid"], max_steps=3
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert list(got3["n_steps"]) == list(ref["n_steps"])
    assert all(p.count("|") <= 2 for p in got3["path"])
    assert all(full.startswith(p) for full, p in zip(ref["path"], got3["path"]))


def test_robust_zscore_matches_pandas(ray_session):
    from perfect_bloomfilter_ray.stages.quantiles import robust_zscore

    rng = np.random.default_rng(41)
    n = 2500
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 12, n),
            "x": rng.normal(10.0, 3.0, n),
        }
    )
    df.loc[df["k"] == 5, "x"] = 7.0  # constant group → MAD 0 → null
    got = (
        robust_zscore(rd.from_pandas(df).repartition(7), "k", "x", num_blocks=4)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )

    def rz(s):
        med = s.median()
        mad = (s - med).abs().median()
        return (s - med) / (1.4826 * mad) if mad > 0 else pd.Series(np.nan, index=s.index)

    ref = df.groupby("k")["x"].transform(rz)
    m = df["k"].eq(5).to_numpy()
    assert np.isnan(got["rz"].to_numpy()[m]).all()
    np.testing.assert_allclose(got["rz"].to_numpy()[~m], ref.to_numpy()[~m], rtol=1e-9)


def test_cooccurrence_counts_matches_brute(ray_session):
    from itertools import combinations

    from perfect_bloomfilter_ray.stages.cooccur import cooccurrence_counts

    rng = np.random.default_rng(8)
    n = 3000
    # ~7 obs per key over 9 items → distinct-item counts straddle the cap
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 400, n),
            "it": np.array([f"i{j}" for j in range(9)])[rng.integers(0, 9, n)],
        }
    )
    for cap in (None, 4):
        got = (
            cooccurrence_counts(
                rd.from_pandas(df).repartition(6), "k", "it", max_items=cap, num_blocks=4
            )
            .to_pandas()
            .sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )
        from collections import Counter

        ref = Counter()
        for _, g in df.groupby("k"):
            items = sorted(set(g["it"]))
            if cap is not None and len(items) > cap:
                continue
            for a, b in combinations(items, 2):
                ref[(a, b)] += 1
        ref_df = (
            pd.DataFrame(
                [{"item_a": a, "item_b": b, "n": c} for (a, b), c in sorted(ref.items())]
            )
            .sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref_df, check_dtype=False)


def test_triple_support_counts_matches_brute(ray_session):
    from collections import Counter
    from itertools import combinations

    from perfect_bloomfilter_ray.stages.cooccur import triple_support_counts

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n),
            "it": np.array([f"i{j}" for j in range(8)])[rng.integers(0, 8, n)],
        }
    )
    for cap in (None, 4):
        got = (
            triple_support_counts(
                rd.from_pandas(df).repartition(6), "k", "it", max_items=cap, num_blocks=4
            )
            .to_pandas()
            .sort_values(["item_a", "item_b", "item_c"])
            .reset_index(drop=True)
        )
        ref = Counter()
        for _, g in df.groupby("k"):
            items = sorted(set(g["it"]))
            if cap is not None and len(items) > cap:
                continue
            for a, b, c in combinations(items, 3):
                ref[(a, b, c)] += 1
        ref_df = (
            pd.DataFrame(
                [
                    {"item_a": a, "item_b": b, "item_c": c, "n": cnt}
                    for (a, b, c), cnt in sorted(ref.items())
                ]
            )
            .sort_values(["item_a", "item_b", "item_c"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref_df, check_dtype=False)
