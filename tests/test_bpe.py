"""BPE trainer: incremental pair maintenance must equal a naive full-recount
reference; merges are deterministic; the distributed word count is exact."""

from collections import Counter

import pyarrow as pa

from perfect_bloomfilter_ray.stages.bpe import _EOW, train_bpe


def _naive_bpe(words, counts, num_merges):
    """Reference: recount every pair from scratch each round."""
    syms = [list(w) + [_EOW] for w in words]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for s, c in zip(syms, counts):
            for p in zip(s, s[1:]):
                pc[p] += c
        best = None
        for p, c in pc.items():
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None or best[1] <= 0:
            break
        (l, r), support = best
        merges.append((l, r, support))
        for wi, s in enumerate(syms):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
    return merges


def test_classic_sennrich_example():
    merges = train_bpe(["low", "lower", "newest", "widest"], [5, 2, 6, 3], 3)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", _EOW, 9)


def test_incremental_equals_naive_recount():
    import random

    rng = random.Random(13)
    vocab = ["".join(rng.choices("abcdef", k=rng.randint(1, 8))) for _ in range(300)]
    words = sorted(set(vocab))
    counts = [rng.randint(1, 50) for _ in words]
    assert train_bpe(words, counts, 40) == _naive_bpe(words, counts, 40)


def test_deterministic_across_input_order():
    words = ["abc", "abd", "bcd", "cde"]
    counts = [4, 3, 2, 1]
    a = train_bpe(words, counts, 10)
    order = [2, 0, 3, 1]
    b = train_bpe([words[i] for i in order], [counts[i] for i in order], 10)
    assert a == b


def test_exhausts_gracefully():
    merges = train_bpe(["ab"], [1], 100)
    # "ab</w>" has 2 pairs -> at most 2 merges, then stop
    assert len(merges) == 2


def test_distributed_word_count_exact(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.bpe import word_frequencies

    rows = [{"text": "the cat sat"}, {"text": "the cat"}, {"text": "the"}]
    ds = rd.from_items(rows)
    wf = word_frequencies(ds, "text", top_words=10)
    got = {w: c for w, c in zip(wf.column("w").to_pylist(), wf.column("cnt").to_pylist())}
    assert got == {"the": 3, "cat": 2, "sat": 1}


def test_levenshtein_matches_reference():
    from perfect_bloomfilter_ray.stages.fuzzy import levenshtein

    cases = [("abc", "abc", 0), ("abc", "axc", 1), ("abc", "ab", 1),
             ("kitten", "sitting", 3), ("", "abc", 3), ("ab", "cd", 2),
             ("flaw", "lawn", 2)]
    for a, b, d in cases:
        assert levenshtein(a, b) == d, (a, b)
        assert levenshtein(b, a) == d
    assert levenshtein("kitten", "sitting", cap=2) == 3  # cap+1 on overflow


def test_edit_vocab_pairs_blocking_is_exact(ray_session):
    import itertools

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.fuzzy import edit_vocab_pairs, levenshtein

    words = ["cat", "cart", "card", "cap", "dog", "dot", "do", "ab", "cd", "abc"]
    ds = rd.from_items([{"text": " ".join(words)} for _ in range(3)])
    got = edit_vocab_pairs(ds, "text", top_words=100, max_distance=2)
    got_pairs = set(zip(got.column("wa").to_pylist(), got.column("wb").to_pylist(), got.column("dist").to_pylist()))
    exp = set()
    for a, b in itertools.combinations(sorted(words), 2):
        d = levenshtein(a, b)
        if d <= 2:
            exp.add((a, b, d))
    assert got_pairs == exp


def test_skyline_matches_bruteforce(ray_session):
    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    from perfect_bloomfilter_ray.stages.skyline import skyline_2d

    @settings(max_examples=25, deadline=None)
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=60
        )
    )
    def inner(pts):
        ds = rd.from_items([{"x": float(a), "y": float(b), "i": i} for i, (a, b) in enumerate(pts)])
        got = skyline_2d(ds, "x", "y")
        got_ids = sorted(got.column("i").to_pylist())
        exp = []
        for i, (a, b) in enumerate(pts):
            dominated = any(
                (c >= a and d >= b and (c > a or d > b)) for j, (c, d) in enumerate(pts) if j != i
            )
            if not dominated:
                exp.append(i)
        assert got_ids == sorted(exp), (pts, got_ids, exp)

    inner()


def test_interval_coverage_matches_bruteforce(ray_session):
    """The gaps-and-islands kernel inside user_coverage_intervals, via the
    registered query on a scratch parquet dir shaped like the testdata."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(21)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
            "user_id": rng.integers(0, 12, n),
            "event_type": "view",
            "value": np.round(rng.uniform(-1, 30, n), 2),
            "props": "{}",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))
        got = QUERIES["user_coverage_intervals"](d)
    # brute force: merge intervals per user
    exp = {}
    for uid, g in df.groupby("user_id"):
        s = (g["ts"].astype("int64") // 1000).to_numpy()
        dur = np.trunc(g["value"].to_numpy() * 60000000.0).astype(np.int64)
        e = np.maximum(s + dur, s)
        order = np.lexsort((e, s))
        covered, islands = 0, 0
        cur_s, cur_e = None, None
        for i in order:
            if cur_e is None or s[i] > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s[i], e[i]
                islands += 1
            else:
                cur_e = max(cur_e, e[i])
        covered += cur_e - cur_s
        exp[uid] = (islands, covered)
    for row in got.itertuples():
        assert exp[row.user_id] == (row.n_islands, row.covered_us), row


def test_kmeans_matches_local_lloyd(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.kmeans import _assign, kmeans_full

    import numpy as np2

    rng = np2.random.default_rng(5)
    vecs = np2.concatenate(
        [np2.array([5.0, 0.0]) + rng.normal(0, 0.3, (60, 2)),
         np2.array([-5.0, 0.0]) + rng.normal(0, 0.3, (60, 2)),
         np2.array([0.0, 6.0]) + rng.normal(0, 0.3, (60, 2))]
    )
    rows = [{"vec_id": i, "embedding": vecs[i].astype("float32").tolist()} for i in range(len(vecs))]
    ds = rd.from_items(rows).repartition(4)
    cents, stats = kmeans_full(ds, "embedding", "vec_id", k=3, iters=8, seed=3)
    # three well-separated blobs -> perfect recovery regardless of init
    sizes = sorted(stats.column("n").to_pylist())
    assert sizes == [60, 60, 60]
    a = _assign(vecs.astype(np2.float64), cents)
    # each blob uniform
    for blk in range(3):
        blob = a[blk * 60:(blk + 1) * 60]
        assert len(set(blob.tolist())) == 1
    # inertia ~ per-point noise variance, far below separated-cluster scale
    assert sum(stats.column("inertia").to_pylist()) < 60.0


def test_kmeans_deterministic_rerun(ray_session):
    import numpy as np2
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.kmeans import kmeans_full

    rng = np2.random.default_rng(9)
    rows = [{"vec_id": i, "embedding": rng.normal(0, 1, 4).astype("float32").tolist()} for i in range(200)]
    ds = rd.from_items(rows).repartition(3)
    c1, s1 = kmeans_full(ds, "embedding", "vec_id", k=4, iters=5, seed=7)
    c2, s2 = kmeans_full(ds, "embedding", "vec_id", k=4, iters=5, seed=7)
    assert np2.array_equal(c1, c2)
    assert s1.equals(s2)


def test_mmr_matches_local_reference(ray_session):
    import numpy as np2
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.mmr import mmr_select

    rng = np2.random.default_rng(17)
    vecs = rng.normal(0, 1, (120, 8)).astype("float32")
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    ds = rd.from_items(rows).repartition(4)
    q = rng.normal(0, 1, 8)
    got = mmr_select(ds, "embedding", "vec_id", q, k=10, lam=0.6)
    got_ids = got.column("vec_id").to_pylist()

    # local greedy reference (identical float ops)
    qq = q / np2.linalg.norm(q)
    v = vecs.astype(np2.float64)
    unit = v / np2.maximum(np2.linalg.norm(v, axis=1), 1e-12)[:, None]
    rel = unit @ qq
    picked = []
    for _ in range(10):
        red = (unit @ unit[picked].T).max(axis=1) if picked else np2.zeros(len(unit))
        score = 0.6 * rel - 0.4 * red
        score[picked] = -np2.inf
        order = np2.lexsort((np2.arange(len(unit)), -score))
        picked.append(int(order[0]))
    assert got_ids == picked
    # first pick is the most relevant; later picks trade relevance for diversity
    assert got_ids[0] == int(np2.lexsort((np2.arange(len(unit)), -rel))[0])


def test_logreg_matches_local_reference(ray_session):
    import numpy as np2
    import pyarrow as pa2
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.logreg import logreg_fit

    rng = np2.random.default_rng(23)
    n = 600
    x = rng.normal(0, 1, (n, 2))
    # separable-ish: label depends on x0 + 2*x1
    y = (x[:, 0] + 2 * x[:, 1] + rng.normal(0, 0.3, n)) > 0
    rows = [{"i": i, "a": float(x[i, 0]), "b": float(x[i, 1]), "y": bool(y[i])} for i in range(n)]
    ds = rd.from_items(rows).repartition(4)

    def feats(t):
        return np2.stack(
            [t.column("a").to_numpy(zero_copy_only=False), t.column("b").to_numpy(zero_copy_only=False)],
            axis=1,
        ).astype(np2.float64)

    def label(t):
        return t.column("y").to_numpy(zero_copy_only=False)

    fit = logreg_fit(ds, feats, label, n_features=2, iters=50, lr=0.5, tag_col="i")
    assert fit["accuracy"] > 0.9, fit
    # weights aligned with the generating direction (ratio ~2 after shared scaling)
    w = fit["w"]
    assert w[1] > w[0] > 0
    # deterministic rerun
    fit2 = logreg_fit(ds, feats, label, n_features=2, iters=50, lr=0.5, tag_col="i")
    assert np2.array_equal(fit["w"], fit2["w"])


def test_cdc_chunking_properties():
    import numpy as np2

    from perfect_bloomfilter_ray.stages.cdc import _window_hashes, chunk_hashes

    rng = np2.random.default_rng(3)
    doc = bytes(rng.integers(0, 256, 20000, dtype=np2.uint8))
    ch = chunk_hashes(doc)
    assert sum(l for _, l in ch) == len(doc), "chunks must tile the document"
    assert chunk_hashes(doc) == ch, "deterministic"
    assert all(32 <= l <= 4096 or l == ch[-1][1] for _, l in ch)
    # shift resistance: a 100-byte prepend keeps >80% of chunk hashes
    doc2 = bytes(rng.integers(0, 256, 100, dtype=np2.uint8)) + doc
    shared = len({h for h, _ in ch} & {h for h, _ in chunk_hashes(doc2)})
    assert shared > 0.8 * len(ch), (shared, len(ch))
    # identical windows hash identically regardless of position
    a = np2.frombuffer(b"abcdefghij" * 3, dtype=np2.uint8)
    h = _window_hashes(a, 10)
    assert h[0] == h[10] == h[20]


def test_cdc_dedup_counts_duplicates(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.cdc import cdc_dedup_stats

    base = "the quick brown fox jumps over the lazy dog " * 40
    rows = [{"doc_id": i, "text": base} for i in range(10)]  # 10 identical docs
    ds = rd.from_items(rows)
    out = cdc_dedup_stats(ds, "text", "doc_id", window=16, mask_bits=5, min_len=16, max_len=256)
    ct = out.column("chunks_total")[0].as_py()
    cd = out.column("chunks_distinct")[0].as_py()
    assert ct == 10 * cd, "identical docs must share every chunk"
    assert out.column("bytes_distinct")[0].as_py() * 10 == out.column("bytes_total")[0].as_py()


def test_poisson_bootstrap_ci_covers_true_mean(ray_session):
    import os
    import tempfile

    import numpy as np2
    import pandas as pd2
    import pyarrow as pa2
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    rng = np2.random.default_rng(31)
    n = 20_000
    vals = rng.normal(50, 10, n)
    df = pd2.DataFrame(
        {
            "event_id": np2.arange(n),
            "ts": pd2.to_datetime(rng.integers(0, 10_000, n), unit="s"),
            "user_id": rng.integers(0, 50, n),
            "event_type": "view",
            "value": vals,
            "props": "{}",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa2.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))
        out = QUERIES["bootstrap_mean_ci_value"](d)
    m, lo, hi = out["mean"][0], out["ci_lo"][0], out["ci_hi"][0]
    assert lo < m < hi
    # CI width ~ 2*1.96*sigma/sqrt(n) ~ 0.28; allow generous band
    assert 0.1 < hi - lo < 1.0, (lo, hi)
    true_mean = vals.mean()
    assert lo - 0.2 < true_mean < hi + 0.2
    # determinism
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa2.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))
        out2 = QUERIES["bootstrap_mean_ci_value"](d)
    pd2.testing.assert_frame_equal(out, out2)


def test_dd_rollup_keeps_alpha_contract(ray_session):
    """Merged-from-hourly day quantiles must stay within alpha of the exact
    per-day quantiles (merge is exact bucket addition)."""
    import os
    import tempfile

    import numpy as np2
    import pandas as pd2
    import pyarrow as pa2
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    rng = np2.random.default_rng(41)
    n = 30_000
    df = pd2.DataFrame(
        {
            "event_id": np2.arange(n),
            "ts": pd2.to_datetime(rng.integers(0, 3 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 50, n),
            "event_type": "view",
            "value": rng.lognormal(3, 1, n),
            "props": "{}",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa2.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))
        out = QUERIES["dd_quantile_rollup"](d)
    assert len(out) == 3
    df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
    for row in out.itertuples():
        vals = np2.sort(df.loc[df["day"] == row.day, "value"].to_numpy())
        for q, est in ((0.5, row.p50_est), (0.99, row.p99_est)):
            true = vals[int(q * (len(vals) - 1))]
            assert abs(est - true) <= 0.0101 * abs(true) + 1e-6, (row.day, q, est, true)


def test_bpe_encoder_applies_merges_in_rank_order():
    from perfect_bloomfilter_ray.stages.bpe import _EOW, encode_word, train_bpe

    merges = train_bpe(["low", "lower", "newest", "widest"], [5, 2, 6, 3], 6)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    # 'newest' fully merges through es -> est -> est</w> -> ...
    enc = encode_word("newest", ranks)
    assert "".join(enc) == "newest" + _EOW
    assert len(enc) < len("newest") + 1, "merges must reduce token count"
    # unknown word: no applicable merge pairs beyond trained ones
    assert encode_word("zzz", ranks) == ["z", "z", "z", _EOW]
