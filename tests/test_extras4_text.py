"""Round-4 text / DTW queries — brute-force and property verification."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _sstem(w: str) -> str:
    if w.endswith("ies") and not (w.endswith("eies") or w.endswith("aies")):
        return w[:-3] + "y"
    if w.endswith("es") and not (
        w.endswith("aes") or w.endswith("ees") or w.endswith("oes")
    ):
        return w[:-1]
    if w.endswith("s") and not (w.endswith("us") or w.endswith("ss")):
        return w[:-1]
    return w


def test_sstemmer_rules():
    # Terrier-consistent ladder: a failed exception falls through to the
    # next rule (so "trees" strips the bare -s), matching the SQL CASE
    cases = {
        "studies": "study", "babies": "baby",
        "churches": "churche", "cats": "cat",
        "bus": "bus", "class": "class", "dog": "dog",
        "eies": "eie", "aies": "aie", "goes": "goe", "trees": "tree",
        "es": "e",
    }
    for w, exp in cases.items():
        assert _sstem(w) == exp, (w, _sstem(w), exp)


def test_sstemmer_query_vs_bruteforce(ray_session):
    import re

    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.sstemmer_vocab_top20(SF)
    texts = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").df()["text"]
    counts: dict = {}
    forms: dict = {}
    for txt in texts:
        for w in re.findall(r"[a-z]+", (txt or "").lower()):
            s = _sstem(w)
            counts[s] = counts.get(s, 0) + 1
            forms.setdefault(s, set()).add(w)
    exp = sorted(
        ((n, s) for s, n in counts.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    assert list(zip(out["n_tokens"], out["stem"])) == [(n, s) for n, s in exp]
    for _, r in out.iterrows():
        assert int(r["n_forms"]) == len(forms[r["stem"]])


def _dtw_ref(x, y):
    # independent reference DP (different traversal from the engine's)
    n, m = len(x), len(y)
    import itertools

    best = {(0, 0): 0}
    INF = float("inf")
    for i, j in itertools.product(range(1, n + 1), range(1, m + 1)):
        c = abs(int(x[i - 1]) - int(y[j - 1]))
        best[(i, j)] = c + min(
            best.get((i - 1, j), INF), best.get((i, j - 1), INF), best.get((i - 1, j - 1), INF)
        )
    return best[(n, m)]


def test_dtw_kernel_properties():
    from perfect_bloomfilter_ray.pipelines.extras4 import dtw_int

    rng = np.random.RandomState(0)
    for _ in range(20):
        x = rng.randint(0, 100, 24).astype(np.int64)
        y = rng.randint(0, 100, 24).astype(np.int64)
        assert dtw_int(x, y) == _dtw_ref(x, y)
        assert dtw_int(x, x) == 0  # identity
        assert dtw_int(x, y) == dtw_int(y, x)  # symmetric
    # phase shift: DTW of a rolled series is far below the L1 distance
    base = (100 * (1 + np.sin(np.arange(24) / 24 * 2 * np.pi))).astype(np.int64)
    rolled = np.roll(base, 3)
    assert dtw_int(base, rolled) < int(np.abs(base - rolled).sum())


def test_dtw_query_shape(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.dtw_type_profile_distances(SF)
    assert (out["type_a"] < out["type_b"]).all()
    assert (out["dtw_cost"] >= 0).all()
    k = pd.concat([out["type_a"], out["type_b"]]).nunique()
    assert len(out) == k * (k - 1) // 2


def test_sentence_stats_vs_bruteforce(ray_session):
    import re

    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.sentence_stats_per_lang(SF).set_index("lang")
    df = duckdb.sql(f"SELECT lang, text FROM '{SF}/documents.parquet'").df()
    for lang, sub in df.groupby("lang"):
        n_sent = n_tok = 0
        for txt in sub["text"]:
            txt = txt or ""
            n_sent += sum(1 for s in re.findall(r"[^.!?]+", txt) if s.strip())
            n_tok += len(re.findall(r"\S+", txt))
        assert int(out.loc[lang, "n_docs"]) == len(sub)
        assert int(out.loc[lang, "n_sentences"]) == n_sent
        assert int(out.loc[lang, "n_tokens"]) == n_tok


def test_sketched_profile_within_hll_bound(ray_session):
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.documents_profile_sketched(SF).set_index("column")
    for col in ("doc_id", "text", "lang", "source", "n_chars"):
        exact = duckdb.sql(
            f'SELECT count(DISTINCT "{col}") AS d, count(*) AS n, '
            f'sum(CASE WHEN "{col}" IS NULL THEN 1 ELSE 0 END) AS z '
            f"FROM '{SF}/documents.parquet'"
        ).df().iloc[0]
        est = int(out.loc[col, "ndv_est"])
        d = int(exact["d"])
        # HLL p=12 -> rel error ~1.04/sqrt(4096) = 1.6%; allow 5 sigma + slack for tiny d
        assert abs(est - d) <= max(0.09 * d, 3), (col, est, d)
        assert int(out.loc[col, "n_rows"]) == int(exact["n"])
        assert int(out.loc[col, "n_nulls"]) == int(exact["z"] or 0)


def test_hilbert_curve_properties_and_locality(ray_session):
    import numpy as np

    from perfect_bloomfilter_ray.stages.partitioning import hilbert_key2, zorder_key2

    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert_key2(xs.ravel(), ys.ravel(), bits)
    assert sorted(d) == list(range(n * n))  # bijection onto [0, 4^bits)
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps_h = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps_h == 1).all()  # every consecutive key pair is adjacent
    z = zorder_key2(xs.ravel(), ys.ravel(), bits)
    zo = np.argsort(z)
    steps_z = np.abs(np.diff(xs.ravel()[zo])) + np.abs(np.diff(ys.ravel()[zo]))
    assert steps_h.mean() < steps_z.mean()  # the locality win over Morton


def test_interval_scheduling_dp_vs_bruteforce(ray_session):
    import itertools

    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.user_max_nonoverlap_activity(SF).set_index("user_id")
    ivs = duckdb.sql(
        f"""SELECT user_id, event_type, date_trunc('day', ts) AS d,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS s,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS e,
                   CAST(count(*) AS BIGINT) AS w
            FROM '{SF}/events.parquet' GROUP BY 1, 2, 3"""
    ).df()
    checked = 0
    for u, g in ivs.groupby("user_id"):
        rows = sorted(g[["s", "e", "w"]].itertuples(index=False), key=lambda r: r.e)
        if len(rows) <= 12:
            # exhaustive subset search for small users
            best = 0
            for r in range(len(rows) + 1):
                for sub in itertools.combinations(rows, r):
                    if all(
                        a.e < b.s or b.e < a.s
                        for a, b in itertools.combinations(sub, 2)
                    ):
                        best = max(best, sum(x.w for x in sub))
        else:
            # independent quadratic DP (different formulation from engine's
            # searchsorted p(i) path): best ending AT interval i
            n = len(rows)
            endat = [0] * n
            for i in range(n):
                prev = 0
                for j in range(i):
                    if rows[j].e < rows[i].s:
                        prev = max(prev, endat[j])
                endat[i] = rows[i].w + prev
            best = max(endat) if endat else 0
        assert int(out.loc[u, "best_weight"]) == best, u
        checked += 1
        if checked >= 25:
            break
    assert checked >= 10


def test_huffman_between_entropy_bounds(ray_session):
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.huffman_code_lengths_per_lang(SF).set_index("lang")
    freq = duckdb.sql(
        f"""SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9 ]')) AS ch
            FROM '{SF}/documents.parquet'"""
    ).df().groupby(["lang", "ch"]).size()
    for lang in out.index:
        f = freq[lang].to_numpy().astype(float)
        p = f / f.sum()
        h_bits = float(-(p * np.log2(p)).sum() * f.sum())
        got = float(out.loc[lang, "weighted_code_bits"])
        n = float(out.loc[lang, "n_chars"])
        assert h_bits - 1e-6 <= got < h_bits + n  # H <= L < H+1 per char
        assert int(out.loc[lang, "n_chars"]) == int(f.sum())


def test_vocab_js_drift_properties(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.vocab_js_drift_halves(SF)
    assert 1 <= len(out) <= 1000  # tiny synthetic vocab at sf0.001
    js = out["js_part"].sum()
    assert 0 <= js <= np.log(2) + 1e-9  # JS divergence bounds (nats)
    # symmetric formula: swapping halves flips c1/c2 but not |js_part| total
    sym = out.rename(columns={"c1": "c2", "c2": "c1"})
    assert abs(js - sym["js_part"].sum()) < 1e-12


def test_boilerplate_rule_vs_bruteforce(ray_session):
    import re

    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.boilerplate_line_filter_stats(SF).set_index("lang")
    df = duckdb.sql(f"SELECT lang, text FROM '{SF}/documents.parquet'").df()
    for lang, sub in df.groupby("lang"):
        kept = dropped = kept_chars = 0
        for txt in sub["text"]:
            for line in (txt or "").split("\n"):
                if not line.strip(" "):  # DuckDB trim(): spaces only
                    continue
                nc = len(line)  # length() = characters
                na = len(re.findall(r"[a-zA-Z]", line))
                nw = len(re.findall(r"\S+", line))
                if nw >= 5 and na * 2 >= nc:
                    kept += 1
                    kept_chars += nc
                else:
                    dropped += 1
        assert int(out.loc[lang, "kept_lines"]) == kept
        assert int(out.loc[lang, "dropped_lines"]) == dropped
        assert int(out.loc[lang, "kept_chars"]) == kept_chars


def test_mojibake_regex_detects_classic_artifacts():
    import re

    pat = re.compile("\u00c3[\u00a1-\u00bf]|\u00e2\u20ac|\u00c2[ -\u00bf]|\u00ef\u00bf\u00bd")
    assert pat.search("caf\u00c3\u00a9")  # double-encoded e-acute
    assert pat.search("\u00e2\u20ac\u0153quoted")
    assert pat.search("nbsp artifact \u00c2 here")
    assert pat.search("lost \u00ef\u00bf\u00bd char")
    assert not pat.search("plain ascii text")
    assert not pat.search("proper caf\u00e9 and na\u00efve UTF-8")


def test_word_burstiness_identities(ray_session):
    import re

    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.word_burstiness_top200(SF)
    assert (out["df2"] <= out["df"]).all()  # recurrence can't beat presence
    assert out["df"].is_monotonic_decreasing
    # spot-check one token against brute force
    tok = out["token"].iloc[0]
    texts = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").df()["text"]
    df_n = df2_n = 0
    for txt in texts:
        words = re.findall(r"[a-z]+", (txt or "").lower())
        c = words.count(tok)
        if c >= 1:
            df_n += 1
        if c >= 2:
            df2_n += 1
    assert int(out["df"].iloc[0]) == df_n
    assert int(out["df2"].iloc[0]) == df2_n


def test_curation_waterfall_monotone(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.curation_waterfall(SF)
    assert (out["pass_length"] <= out["n_docs"]).all()
    assert (out["pass_encoding"] <= out["pass_length"]).all()  # gates compose
    assert (out["pass_all"] <= out["pass_encoding"]).all()
    assert out["n_docs"].sum() > 0
