"""Round-5 extras: model-weights inference, codec-backed multimodal
additions, and scale-pattern queries.

Registered into the same QUERIES/ORACLE_SQL dicts as pipelines/queries.py
(imported at its tail, before the SQL-first registration reorder).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from perfect_bloomfilter_ray.pipelines.queries import _t, q

# Fixed MLP weights for the oracle-backed inference query. Every constant is
# an EXACT binary fraction (k/2^m), so the only rounding either engine ever
# performs is in the additions — and both build the identical left-to-right
# IEEE-754 expression tree (see stages/inference.py determinism contract).
_W1 = [[0.25, -0.5, 0.125], [0.0625, 0.75, -0.25]]  # (2 features × 3 hidden)
_B1 = [0.5, -1.0, 0.25]
_W2 = [1.5, -0.75, 0.5]  # (3 hidden → 1 logit)
_B2 = -0.25


@q(
    "mlp_purchase_propensity",
    sql="""
    WITH f AS (
      SELECT event_id,
             CAST(CAST(extract(hour FROM ts) AS BIGINT) AS DOUBLE) AS h,
             value AS v
      FROM events WHERE value IS NOT NULL
    ),
    hid AS (
      SELECT event_id,
             greatest(h * 0.25   + v * 0.0625 + 0.5,  0.0) AS u1,
             greatest(h * -0.5   + v * 0.75   + -1.0, 0.0) AS u2,
             greatest(h * 0.125  + v * -0.25  + 0.25, 0.0) AS u3
      FROM f
    ),
    z AS (
      SELECT event_id, u1 * 1.5 + u2 * -0.75 + u3 * 0.5 + -0.25 AS logit
      FROM hid
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      FROM z
    ),
    topk AS (
      SELECT event_id, logit FROM z ORDER BY logit DESC, event_id LIMIT 20
    )
    SELECT t.event_id, t.logit, a.n, a.n_pos
    FROM topk t, agg a ORDER BY t.logit DESC, t.event_id
    """,
)
def mlp_purchase_propensity(sf_dir: str):
    """Model-weights inference at scale: a 2-layer MLP (fixed exact-binary
    weights) scores every event through the broadcast-weights actor pool
    (stages/inference.py — ray.put once, ray.get once per actor in
    __init__, vectorized forward per batch). Output: global positive count
    (logit > 0 — the integer-exact full-scan readout) + the top-20 logits
    (raw doubles — bit-identical expression trees both sides)."""
    from perfect_bloomfilter_ray.stages.inference import model_score_dataset

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("value")))

    ds = _t(sf_dir, "events", ["event_id", "ts", "value"]).map_batches(
        drop_null, batch_format="pyarrow"
    )

    def feats(t: pa.Table) -> np.ndarray:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        h = pc.cast(pc.hour(ts), pa.int64()).to_numpy().astype(np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        return np.stack([h, v], axis=1)

    weights = {
        "layers": [
            (np.array(_W1, np.float64), np.array(_B1, np.float64)),
            (np.array(_W2, np.float64).reshape(3, 1), np.array([_B2], np.float64)),
        ]
    }
    scored = model_score_dataset(ds, weights, feats, id_cols=["event_id"], out_col="logit")

    def partial(t: pa.Table) -> pa.Table:
        z = t.column("logit").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -z))[:20]  # per-block top-k partial
        return pa.table(
            {
                "event_id": pa.array(ids[order]),
                "logit": pa.array(z[order]),
                "n": pa.array([len(z)] + [0] * (len(order) - 1) if len(order) else [], pa.int64()),
                "n_pos": pa.array(
                    [int((z > 0).sum())] + [0] * (len(order) - 1) if len(order) else [], pa.int64()
                ),
            }
        )

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    n_pos = int(parts["n_pos"].sum())
    top = parts.sort_values(["logit", "event_id"], ascending=[False, True]).head(20)
    return pd.DataFrame(
        {
            "event_id": top["event_id"].to_numpy(),
            "logit": top["logit"].to_numpy(),
            "n": np.full(len(top), n, dtype=np.int64),
            "n_pos": np.full(len(top), n_pos, dtype=np.int64),
        }
    ).reset_index(drop=True)


def _lang_word_counts(sf_dir: str) -> pd.DataFrame:
    """Distinct (lang, word, count) over documents — the bounded-vocabulary
    narrow exchange (stages/vocab tokenization: lower + [a-z0-9]+)."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.with_columns(
                pl.col("text").str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("word")
            )
            .drop("text")
            .explode("word")
            .drop_nulls("word")
            .group_by(["lang", "word"])
            .len(name="pc")
            .with_columns(pl.col("pc").cast(pl.Int64))
            .to_arrow()
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Sum("pc", alias_name="c"))
        .to_pandas()
    )


@q(
    "weighted_jaccard_lang_pairs",
    sql="""
    WITH tok AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents
    ),
    w AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY lang, word),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM w GROUP BY lang),
    mn AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS s_min
      FROM w a JOIN w b ON a.word = b.word AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT m.lang_a, m.lang_b, m.s_min, ta.t AS tot_a, tb.t AS tot_b,
           CAST(m.s_min AS DOUBLE) / CAST(ta.t + tb.t - m.s_min AS DOUBLE) AS jw
    FROM mn m
    JOIN tot ta ON ta.lang = m.lang_a
    JOIN tot tb ON tb.lang = m.lang_b
    ORDER BY lang_a, lang_b
    """,
)
def weighted_jaccard_lang_pairs(sf_dir: str):
    """EXACT pairwise weighted Jaccard between language term-frequency
    profiles: J_w = Σ min(c_a, c_b) / (tot_a + tot_b − Σ min) — the
    multiplicity-aware similarity that 0/1 shingle Jaccard throws away
    (state/wminhash.py module docstring).  All sums exact int64 from one
    bounded-vocabulary groupby; jw is ONE division, identical both sides.
    The ICWS sketch twin (estimator) is icws_lang_similarity [rows]."""
    w = _lang_word_counts(sf_dir)
    tot = w.groupby("lang", as_index=False)["c"].sum().rename(columns={"c": "t"})
    piv = w.pivot_table(index="word", columns="lang", values="c", fill_value=0)
    langs = sorted(piv.columns)
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            s_min = int(np.minimum(piv[la].to_numpy(), piv[lb].to_numpy()).sum())
            if s_min == 0:
                continue  # mirror the SQL inner join on shared words
            ta = int(tot.loc[tot["lang"] == la, "t"].iloc[0])
            tb = int(tot.loc[tot["lang"] == lb, "t"].iloc[0])
            rows.append(
                {
                    "lang_a": la,
                    "lang_b": lb,
                    "s_min": s_min,
                    "tot_a": ta,
                    "tot_b": tb,
                    "jw": float(s_min) / float(ta + tb - s_min),
                }
            )
    out = pd.DataFrame(rows).sort_values(["lang_a", "lang_b"]).reset_index(drop=True)
    return out.astype({"s_min": "int64", "tot_a": "int64", "tot_b": "int64"})


@q("audio_fingerprint_dup_pairs")
def audio_fingerprint_dup_pairs(sf_dir: str):
    """Audio near-dup pairs on REAL signal processing: each doc's text
    renders to a real WAV clip, the actor-pool spectral-fingerprint stage
    (stdlib wave decode → rFFT → dominant-band landmarks → 64-bit word)
    fingerprints every clip, and the shared pigeonhole banding engine
    surfaces pairs within Hamming ≤ 7 bits (pigeonhole: 8 bands). A re-ingested snapshot slice
    (doc_id % 50 == 0, shifted ids) guarantees byte-identical clips —
    those MUST collide at Hamming 0 (pytest contract). Rows-only (no SQL
    can run an FFT)."""
    from perfect_bloomfilter_ray.stages.dedup import hamming_pairs_u64
    from perfect_bloomfilter_ray.stages.multimodal import (
        AudioSpectralFingerprintStage,
        text_to_wav_payload,
    )

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": text_to_wav_payload(t.column("text"), n_samples=2048),
            }
        )

    def dup_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = t.filter(pa.array(ids % 50 == 0))
        return pa.table(
            {
                "media_id": pc.add(keep.column("doc_id"), pa.scalar(1_000_000, pa.int64())),
                "payload": text_to_wav_payload(keep.column("text"), n_samples=2048),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow").union(
        ds.map_batches(dup_slice, batch_format="pyarrow")
    )
    fps = media.map_batches(
        AudioSpectralFingerprintStage,
        batch_size=256,
        concurrency=(1, 4),
        batch_format="pyarrow",
    )

    def sig(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("media_id"), "sig64": t.column("afp")})

    pairs = hamming_pairs_u64(
        fps.map_batches(sig, batch_format="pyarrow"), "sig64", "doc_id", max_hamming=7, bands=8
    )
    out = pairs.to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "id_a": np.array([], dtype="int64"),
                "id_b": np.array([], dtype="int64"),
                "hamming": np.array([], dtype="int64"),
            }
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


@q("sliding_hll_trailing_distinct")
def sliding_hll_trailing_distinct(sf_dir: str):
    """ONE mergeable sliding-HLL summary answers distinct-user counts for
    EVERY trailing window simultaneously (state/slidinghll.py: Pareto-front
    registers; plain HLL cannot forget expired items). Per-batch partials
    tree-merge exactly like every sketch in the suite; each window row
    carries the exact COUNT(DISTINCT) twin computed in-frame, and the
    pytest gate bounds |est − exact| by 5·(1.04/√m) per window. Rows-only
    (sketch estimates have no SQL)."""
    import duckdb

    from perfect_bloomfilter_ray.state.slidinghll import SlidingHLL

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        s = SlidingHLL(p=12)
        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        s.update_column(t.column("user_id"), ts_us.to_numpy(zero_copy_only=False))
        return pa.table({"part": pa.array([s.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # fan-in-bounded merge rounds, then a driver fold of the survivors
    def merge_rows(t: pa.Table) -> pa.Table:
        s = SlidingHLL(p=12)
        for raw in t.column("part"):
            s.merge(SlidingHLL.from_bytes(raw.as_py()))
        return pa.table({"part": pa.array([s.to_bytes()], pa.binary())})

    merged = parts.map_batches(merge_rows, batch_format="pyarrow", batch_size=64)
    s = SlidingHLL(p=12)
    for row in merged.take_all():
        s.merge(SlidingHLL.from_bytes(row["part"]))

    exact = duckdb.sql(
        f"""
        WITH m AS (SELECT max(ts) AS mx FROM '{sf_dir}/events.parquet')
        SELECT w.hours,
               (SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet', m
                WHERE ts >= m.mx - to_hours(CAST(w.hours AS BIGINT))) AS exact_distinct,
               (SELECT epoch_us(mx) FROM m) AS mx_us
        FROM (VALUES (24), (168), (720), (87600)) AS w(hours)
        ORDER BY w.hours
        """
    ).df()
    rows = []
    for _, r in exact.iterrows():
        cutoff = int(r["mx_us"]) - int(r["hours"]) * 3_600_000_000
        rows.append(
            {
                "window_hours": int(r["hours"]),
                "exact_distinct": int(r["exact_distinct"]),
                "hll_estimate": round(float(s.estimate(cutoff)), 1),
            }
        )
    return pd.DataFrame(rows)


@q("icws_lang_similarity")
def icws_lang_similarity(sf_dir: str):
    """Weighted-MinHash (ICWS, Ioffe 2010) estimates of the lang-pair
    weighted Jaccard, next to the exact value — the sketch-accuracy-audit
    shape (sketch vs exact twin in one table). Rows-only (the sampler's
    gamma streams are no SQL); calibration is pytest-pinned
    (test_wminhash: |est − exact| bounded at K=256 over random sets)."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.state.wminhash import icws_estimate, icws_signature

    w = _lang_word_counts(sf_dir)
    w["h"] = hash64(pa.array(w["word"].astype(str)), 0x1C55).astype(np.uint64)
    sigs = {}
    for lang, g in w.groupby("lang"):
        sigs[lang] = icws_signature(g["h"].to_numpy(), g["c"].to_numpy(np.float64), num_perms=256)
    piv = w.pivot_table(index="word", columns="lang", values="c", fill_value=0)
    langs = sorted(sigs)
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            a, b = piv[la].to_numpy(np.float64), piv[lb].to_numpy(np.float64)
            exact = float(np.minimum(a, b).sum() / np.maximum(a, b).sum())
            rows.append(
                {
                    "lang_a": la,
                    "lang_b": lb,
                    "jw_exact": round(exact, 4),
                    "jw_icws": round(icws_estimate(sigs[la], sigs[lb]), 4),
                }
            )
    return pd.DataFrame(rows).sort_values(["lang_a", "lang_b"]).reset_index(drop=True)


@q(
    "theil_sen_daily_trend",
    sql="""
    WITH d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    p AS (
      SELECT (CAST(b.c AS DOUBLE) - CAST(a.c AS DOUBLE))
             / (CAST(b.day AS DOUBLE) - CAST(a.day AS DOUBLE)) AS slope
      FROM d a JOIN d b ON b.day > a.day
    )
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           quantile_disc(slope, 0.5) AS theil_sen_slope
    FROM p
    """,
)
def theil_sen_daily_trend(sf_dir: str):
    """Theil-Sen robust trend of daily event volume (Theil 1950, Sen 1968):
    the median of all pairwise slopes — 29.3%-breakdown where OLS has 0%,
    the right trend line for a drifting crawl pipeline with outage days.
    Scale shape: ONE narrow day-groupby (bounded buckets), then the O(days²)
    pair fold runs driver-side on the bounded day count.  Each slope is one
    int-difference division (identical tree both sides); the median is the
    DISC quantile — an element of the slope multiset, hash-exact across
    engines (no interpolation)."""
    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        return pa.table({"day": pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()), 86400000000.0)), pa.int64())})

    from ray.data.aggregate import Count

    d = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    day = d["day"].to_numpy(np.float64)
    c = d["c"].to_numpy(np.float64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = (c[j] - c[i]) / (day[j] - day[i])
    slopes.sort(kind="stable")
    n = len(slopes)
    med = float(slopes[max(int(np.ceil(0.5 * n)) - 1, 0)]) if n else np.nan
    return pd.DataFrame(
        {"n_days": [len(d)], "n_pairs": [n], "theil_sen_slope": [med]}
    ).astype({"n_days": "int64", "n_pairs": "int64"})


@q("model_gated_curation_census")
def model_gated_curation_census(sf_dir: str):
    """End-to-end LEARNED curation gate: train the distributed logreg on a
    weak-supervision signal (docs labeled 'keep' when the heuristic quality
    score clears 0.5), then gate the SAME corpus through the broadcast-
    weights inference filter (pipelines/curate.model_quality_filter) and
    report kept/total per lang with the mean quality logit.  The full
    train→broadcast→filter loop of a production quality classifier, on real
    features (length, token count, stopword fraction). Rows-only
    (iterative GD has no SQL); determinism pinned by the sorted-partial
    accumulation contract of stages/logreg."""
    import polars as pl

    from perfect_bloomfilter_ray.functions.text import quality_score, token_count
    from perfect_bloomfilter_ray.pipelines.curate import model_quality_filter
    from perfect_bloomfilter_ray.stages.logreg import logreg_fit
    from ray.data.aggregate import Count, Mean

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])

    def feats(t: pa.Table) -> np.ndarray:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.float64)
        n_tok = token_count(txt).to_numpy(zero_copy_only=False).astype(np.float64)
        return np.stack([n_chars, n_tok], axis=1)

    def label(t: pa.Table) -> np.ndarray:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        return quality_score(txt).to_numpy(zero_copy_only=False) >= 0.5

    fit = logreg_fit(ds, feats, label, n_features=2, iters=15, lr=0.5, tag_col="doc_id")
    gated = model_quality_filter(ds, fit, feats, threshold=0.0)
    kept = (
        gated.groupby("lang")
        .aggregate(Count(alias_name="n_kept"), Mean("quality_logit", alias_name="avg_logit"))
        .to_pandas()
    )
    total = ds.groupby("lang").aggregate(Count(alias_name="n_total")).to_pandas()
    out = (
        total.merge(kept, on="lang", how="left")
        .fillna({"n_kept": 0, "avg_logit": 0.0})
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["avg_logit"] = out["avg_logit"].round(4)
    return out[["lang", "n_total", "n_kept", "avg_logit"]]


@q("weighted_minhash_dedup_pairs")
def weighted_minhash_dedup_pairs(sf_dir: str):
    """WEIGHTED near-dup pairs: per-doc term-frequency ICWS signatures
    through the unchanged LSH banding/verify engine (stages/dedup
    wminhash_lsh_pairs) — est_jaccard is the estimated weighted Jaccard,
    the multiplicity-aware dedup lens (a template block repeated 50x vs
    once is near-identical as a SET but far apart weighted; the smoke
    contract in tests pins exactly that distinction). Rows-only (sampler
    gamma streams have no SQL); calibration via test_wminhash."""
    from perfect_bloomfilter_ray.stages.dedup import wminhash_lsh_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = wminhash_lsh_pairs(ds, "text", "doc_id", num_perms=64, bands=16, threshold=0.5)
    df = out.to_pandas()
    if len(df):
        df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        df["est_jaccard"] = df["est_jaccard"].round(4)
    return df


@q("qdigest_nchars_quantiles")
def qdigest_nchars_quantiles(sf_dir: str):
    """q-digest quantiles of document length (Shrivastava 2004,
    state/qdigest.py) — the bounded-integer-universe member of the quantile
    family (KLL/REQ: rank error over comparables; t-digest: relative rank;
    DDSketch: relative value; q-digest: dyadic tree over [0, 2^L), size in
    log(universe) not n). Built through the standard SketchAgg partial +
    combine tree; each row carries the guaranteed rank-error bound.
    Rows-only; error bound + merge laws pytest-pinned (test_qdigest)."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.qdigest import QDigest

    ds = _t(sf_dir, "documents", ["n_chars"])
    s = sketch_global(ds, "n_chars", lambda: QDigest(log_universe=20, k=512), name="qd")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return pd.DataFrame(
        {
            "q": qs,
            "n_chars_quantile": [int(s.quantile(x)) for x in qs],
            "rank_bound": [round(s.rank_bound(), 1)] * len(qs),
        }
    )


@q(
    "siegel_repeated_median_trend",
    sql="""
    WITH d AS (
      SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    p AS (
      SELECT a.day AS ad,
             (CAST(b.c AS DOUBLE) - CAST(a.c AS DOUBLE))
             / (CAST(b.day AS DOUBLE) - CAST(a.day AS DOUBLE)) AS slope
      FROM d a JOIN d b ON b.day <> a.day
    ),
    m AS (SELECT ad, quantile_disc(slope, 0.5) AS med FROM p GROUP BY ad)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           quantile_disc(med, 0.5) AS repeated_median_slope
    FROM m
    """,
)
def siegel_repeated_median_trend(sf_dir: str):
    """Siegel's repeated-median slope (Siegel 1982): per day, the median of
    slopes to every OTHER day; then the median of those medians — 50%
    breakdown (vs Theil-Sen's 29.3%), the sturdiest classical trend line.
    Same scale shape as theil_sen_daily_trend: one narrow day-groupby, then
    the bounded O(days²) fold driver-side. Both medians are DISC quantiles
    (elements of the multiset, ceil(q·n)−1 on sorted values) — hash-exact
    across engines, no interpolation anywhere."""
    from ray.data.aggregate import Count

    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        return pa.table({"day": pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()), 86400000000.0)), pa.int64())})

    d = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    day = d["day"].to_numpy(np.float64)
    c = d["c"].to_numpy(np.float64)
    n = len(d)

    def disc_median(x: np.ndarray) -> float:
        s = np.sort(x, kind="stable")
        return float(s[max(int(np.ceil(0.5 * len(s))) - 1, 0)])

    slopes = (c[None, :] - c[:, None]) / (day[None, :] - day[:, None] + np.where(np.eye(n, dtype=bool), np.nan, 0.0))
    meds = np.array([disc_median(slopes[i][~np.isnan(slopes[i])]) for i in range(n)])
    return pd.DataFrame(
        {"n_days": [n], "repeated_median_slope": [disc_median(meds)]}
    ).astype({"n_days": "int64"})
