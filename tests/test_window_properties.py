"""Property tests: keyed window/join kernels vs brute-force oracles.

The packed-composite searchsorted kernels (asof join, sliding windows) and
the run-based sessionizer have key-boundary edge cases that example tests
can miss; hypothesis drives random keys/timestamps through them and checks
against O(n^2) per-row oracles.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st


_keys = st.integers(min_value=0, max_value=4)
_ts = st.integers(min_value=0, max_value=50)


@st.composite
def events_and_build(draw):
    n_e = draw(st.integers(1, 25))
    n_b = draw(st.integers(0, 25))
    events = [(draw(_keys), draw(_ts)) for _ in range(n_e)]
    build = sorted({(draw(_keys), draw(_ts)) for _ in range(n_b)})
    return events, build


@settings(max_examples=30, deadline=None)
@given(events_and_build())
def test_asof_matches_bruteforce(ray_session, data):
    import ray.data as rd
    import pyarrow as pa

    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    events, build = data
    edf = pd.DataFrame(
        {
            "k": [k for k, _ in events],
            "t": pd.to_datetime([t for _, t in events], unit="s"),
            "eid": range(len(events)),
        }
    )
    if not build:
        build = [(99, 0)]  # non-empty build side; key 99 matches nothing
    bdf = pd.DataFrame(
        {
            "bk": [k for k, _ in build],
            "bt": pd.to_datetime([t for _, t in build], unit="s"),
            "payload": range(len(build)),
        }
    )
    got = (
        asof_join_broadcast(
            rd.from_pandas(edf).repartition(2), pa.Table.from_pandas(bdf), on="k", big_ts="t", right_on="bk", small_ts="bt"
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        cand = bdf[(bdf["bk"] == row["k"]) & (bdf["bt"] <= row["t"])]
        if len(cand):
            want = cand.sort_values(["bt", "payload"]).iloc[-1]["payload"]
            assert row["asof_payload"] == want, (row.to_dict(), want)
        else:
            assert pd.isna(row["asof_payload"]), row.to_dict()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_keys, _ts, st.floats(0.125, 10, width=32)), min_size=1, max_size=40))
def test_sliding_window_matches_bruteforce(ray_session, rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import sliding_window_agg

    df = pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "v": [float(r[2]) for r in rows],
            "rid": range(len(rows)),
        }
    )
    W = pd.Timedelta("10s")
    got = (
        sliding_window_agg(rd.from_pandas(df).repartition(2), "k", "ts", value_col="v", window="10s", out_sum="w_sum")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        frame = df[(df["k"] == row["k"]) & (df["ts"] >= row["ts"] - W) & (df["ts"] <= row["ts"])]
        assert row["w_count"] == len(frame), row.to_dict()
        # prefix-sum difference: absolute error ~ eps * running-sum magnitude
        # (documented in the stage docstring), hence atol
        np.testing.assert_allclose(row["w_sum"], frame["v"].sum(), rtol=1e-9, atol=1e-7)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_keys, _ts), min_size=1, max_size=40))
def test_sessionize_matches_bruteforce(ray_session, rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import sessionize

    df = pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
        }
    )
    GAP = pd.Timedelta("7s")
    got = (
        sessionize(rd.from_pandas(df).repartition(2), "k", "ts", gap="7s")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for k, g in df.groupby("k"):
        ts = g["ts"].sort_values()
        n_sessions = int((ts.diff() > GAP).sum()) + 1
        row = got[got["k"] == k].iloc[0]
        assert row["n_sessions"] == n_sessions, (k, n_sessions, row.to_dict())
        assert row["n_events"] == len(g)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, _ts, st.integers(-100, 100)), min_size=1, max_size=40
    ),
    st.integers(1, 5),
)
def test_rolling_row_agg_matches_pandas(ray_session, rows, n_rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import rolling_row_agg

    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    df["t"] = pd.to_datetime(df["t"], unit="s")
    df["rid"] = range(len(df))
    df["v"] = df["v"].astype(float)
    out = (
        rolling_row_agg(
            rd.from_pandas(df), "k", "t", "v", n_rows=n_rows,
            tie_cols=["rid"], out_mean="m", out_sum="s", out_median="md", num_blocks=3,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "t", "rid"]).copy()
    g = exp.groupby("k")["v"]
    exp["m"] = g.transform(lambda s: s.rolling(n_rows, min_periods=1).mean())
    exp["s"] = g.transform(lambda s: s.rolling(n_rows, min_periods=1).sum())
    exp["md"] = g.transform(lambda s: s.rolling(n_rows, min_periods=1).median())
    exp = exp.sort_values("rid").reset_index(drop=True)
    np.testing.assert_allclose(out["m"].to_numpy(), exp["m"].to_numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(out["s"].to_numpy(), exp["s"].to_numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(out["md"].to_numpy(), exp["md"].to_numpy(), rtol=1e-9, atol=1e-9)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(_keys, _ts, st.sampled_from("abc")), min_size=1, max_size=40)
)
def test_transition_counts_matches_bruteforce(ray_session, rows):
    from collections import Counter

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import transition_counts

    df = pd.DataFrame(rows, columns=["k", "t", "s"])
    df["t"] = pd.to_datetime(df["t"], unit="s")
    df["rid"] = range(len(df))
    exp = Counter()
    for _, g in df.sort_values(["t", "rid"]).groupby("k"):
        seq = g["s"].tolist()
        exp.update(zip(seq, seq[1:]))
    out = (
        transition_counts(rd.from_pandas(df), "k", "t", "s", tie_cols=["rid"], num_blocks=3)
        .to_pandas()
    )
    got = {(r.state_from, r.state_to): r.n for r in out.itertuples()}
    assert got == dict(exp)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, _ts, st.floats(-100, 100, allow_nan=False)),
        min_size=1, max_size=60,
    ),
    st.floats(0.05, 0.95),
)
def test_ewma_matches_pandas(ray_session, rows, alpha):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import ewma

    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    df["t"] = pd.to_datetime(df["t"], unit="s")
    df["rid"] = range(len(df))
    out = (
        ewma(rd.from_pandas(df), "k", "t", "v", alpha=alpha,
             tie_cols=["rid"], num_blocks=3)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "t", "rid"]).copy()
    exp["e"] = exp.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=alpha, adjust=False).mean()
    )
    exp = exp.sort_values("rid").reset_index(drop=True)
    np.testing.assert_allclose(out["ewma"].to_numpy(), exp["e"].to_numpy(),
                               rtol=1e-9, atol=1e-9)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, _ts, st.one_of(st.none(), st.integers(-50, 50))),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_ffill_matches_pandas(ray_session, rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import grouped_ffill

    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    df["t"] = pd.to_datetime(df["t"], unit="s")
    df["rid"] = range(len(df))
    df["v"] = df["v"].astype("float64")
    out = (
        grouped_ffill(rd.from_pandas(df), "k", "t", ["v"], tie_cols=["rid"], num_blocks=3)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "t", "rid"]).copy()
    exp["v"] = exp.groupby("k")["v"].ffill()
    exp = exp.sort_values("rid").reset_index(drop=True)
    pd.testing.assert_series_equal(out["v"], exp["v"], check_names=False)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)),  # (start, duration)
        min_size=1,
        max_size=30,
    )
)
def test_peak_concurrency_matches_bruteforce(ray_session, spans):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import peak_concurrency

    df = pd.DataFrame(
        {"t0": [s for s, _ in spans], "t1": [s + d for s, d in spans]}
    ).astype("int64")
    bucket = 10
    out = peak_concurrency(rd.from_pandas(df).repartition(4), "t0", "t1", bucket_us=bucket)

    # brute force: sweep every boundary in (t asc, opens-first) order
    bounds = sorted(
        [(r.t0, 1) for r in df.itertuples()] + [(r.t1, -1) for r in df.itertuples()],
        key=lambda x: (x[0], -x[1]),
    )
    conc, per_bucket_peak, per_bucket_n = 0, {}, {}
    for t, d in bounds:
        conc += d
        b = (t // bucket) * bucket
        per_bucket_peak[b] = max(per_bucket_peak.get(b, -(10**9)), conc)
        per_bucket_n[b] = per_bucket_n.get(b, 0) + 1
    exp = pd.DataFrame(
        sorted((b, per_bucket_n[b], per_bucket_peak[b]) for b in per_bucket_peak),
        columns=["bucket_us", "n_bound", "peak"],
    ).astype("int64")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_ordered_running_max_matches_bruteforce(ray_session):
    """Exclusive running max over a scrambled order equals the O(n) driver
    scan, including null for the global first row and tie-breaking."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import ordered_running_max

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "o": rng.integers(0, 800, n).astype("int64"),  # heavy ties
            "t": np.arange(n, dtype="int64"),
            "v": rng.integers(-1000, 1000, n).astype("int64"),
        }
    )
    out = (
        ordered_running_max(rd.from_pandas(df), "o", "t", "v", out_col="rm", num_buckets=7)
        .to_pandas()
        .sort_values(["o", "t"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["o", "t"]).reset_index(drop=True)
    want = ref["v"].cummax().shift(1)
    got = out["rm"]
    assert pd.isna(got.iloc[0]) and pd.isna(want.iloc[0])
    assert np.array_equal(got.iloc[1:].to_numpy(dtype="int64"), want.iloc[1:].to_numpy(dtype="int64"))


def test_ordered_running_max_extreme_order_range(ray_session):
    """Order keys spanning nearly the whole int64 range must not overflow
    the bucket routing (division-first + float fallback)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import ordered_running_max

    rng = np.random.default_rng(9)
    o = np.concatenate(
        [
            rng.integers(-(1 << 62), -(1 << 40), 200),
            rng.integers(1 << 40, (1 << 62) + (1 << 61), 200).astype(np.uint64).astype(np.int64),
        ]
    ).astype("int64")
    df = pd.DataFrame(
        {"o": o, "t": np.arange(len(o), dtype="int64"),
         "v": rng.integers(-5000, 5000, len(o)).astype("int64")}
    )
    out = (
        ordered_running_max(rd.from_pandas(df), "o", "t", "v", out_col="rm", num_buckets=11)
        .to_pandas()
        .sort_values(["o", "t"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["o", "t"]).reset_index(drop=True)["v"].cummax().shift(1)
    assert pd.isna(out["rm"].iloc[0])
    assert np.array_equal(
        out["rm"].iloc[1:].to_numpy(dtype="int64"), want.iloc[1:].to_numpy(dtype="int64")
    )


@st.composite
def _rd_rows(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        rows.append((draw(_keys), draw(_ts), draw(st.integers(0, 3)), i))
    return rows


@settings(max_examples=30, deadline=None)
@given(_rd_rows())
def test_running_distinct_matches_bruteforce(ray_session, rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import running_distinct

    df = pd.DataFrame(rows, columns=["k", "ts", "v", "id"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    ds = rd.from_pandas(df)
    got = (
        running_distinct(ds, "k", "ts", "v", "id", out_col="rd")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    want = {}
    for k in df["k"].unique():
        sub = df[df["k"] == k].sort_values(["ts", "id"])
        seen = set()
        for _, r in sub.iterrows():
            seen.add(r["v"])
            want[r["id"]] = len(seen)
    assert got.set_index("id")["rd"].to_dict() == want


@settings(max_examples=30, deadline=None)
@given(events_and_build())
def test_asof_nearest_matches_bruteforce(ray_session, data):
    import pyarrow as pa
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import asof_join_nearest

    events, build = data
    edf = pd.DataFrame(
        {
            "k": [k for k, _ in events],
            "t": pd.to_datetime([t for _, t in events], unit="s"),
            "eid": range(len(events)),
        }
    )
    if not build:
        build = [(99, 0)]
    bdf = pd.DataFrame(
        {
            "bk": [k for k, _ in build],
            "bt": pd.to_datetime([t for _, t in build], unit="s"),
            "payload": range(len(build)),
        }
    )
    got = (
        asof_join_nearest(
            rd.from_pandas(edf).repartition(2), pa.Table.from_pandas(bdf),
            on="k", big_ts="t", right_on="bk", small_ts="bt",
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        cand = bdf[bdf["bk"] == row["k"]]
        if len(cand) == 0:
            assert pd.isna(row["nearest_payload"]), row.to_dict()
            continue
        # nearest |bt - t|, equidistant tie -> earlier bt; within equal bt
        # the build dedup convention is last payload wins (sorted order)
        cand = cand.assign(dist=(cand["bt"] - row["t"]).abs())
        best = cand.sort_values(["dist", "bt", "payload"]).iloc[0]
        same = cand[(cand["dist"] == best["dist"]) & (cand["bt"] == best["bt"])]
        want = same["payload"].max()
        assert row["nearest_payload"] == want, (row.to_dict(), want)


def test_resample_linear_hourly_bruteforce(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import resample_linear_hourly

    # key "a": observations at hours 0 and 3 -> lerp at 1, 2
    # key "b": only hour 2 -> null everywhere else
    base = pd.Timestamp("2025-01-01")
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "ts": [base, base, base + pd.Timedelta(hours=3), base + pd.Timedelta(hours=2)],
            "v": [1.0, 3.0, 8.0, 5.0],
        }
    )
    out = (
        resample_linear_hourly(rd.from_pandas(df), "k", "ts", "v")
        .to_pandas()
        .sort_values(["k", "h"])
        .reset_index(drop=True)
    )
    a = out[out["k"] == "a"]["value_interp"].tolist()
    # hour0 mean = 2.0, hour3 = 8.0, lerp -> 4.0, 6.0
    assert a == [2.0, 4.0, 6.0, 8.0]
    b = out[out["k"] == "b"].set_index("h")["value_interp"]
    hmin = int(out["h"].min())
    assert pd.isna(b.loc[hmin]) and pd.isna(b.loc[hmin + 1])
    assert b.loc[hmin + 2] == 5.0 and pd.isna(b.loc[hmin + 3])


@settings(max_examples=30, deadline=None)
@given(_rd_rows())
def test_longest_streak_matches_bruteforce(ray_session, rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import longest_value_streak

    df = pd.DataFrame(rows, columns=["k", "ts", "v", "id"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    got = (
        longest_value_streak(rd.from_pandas(df), "k", "ts", "v", "id")
        .to_pandas()
        .set_index("k")
    )
    for k in df["k"].unique():
        sub = df[df["k"] == k].sort_values(["ts", "id"])
        runs = []  # (len, start_pos, value)
        prev_v, run_len, start = None, 0, 0
        for pos, (_, r) in enumerate(sub.iterrows()):
            if prev_v is not None and r["v"] == prev_v:
                run_len += 1
            else:
                if prev_v is not None:
                    runs.append((run_len, start, prev_v))
                prev_v, run_len, start = r["v"], 1, pos
        runs.append((run_len, start, prev_v))
        best = sorted(runs, key=lambda x: (-x[0], x[1]))[0]
        assert int(got.loc[k, "streak_len"]) == best[0], (k, runs)
        assert got.loc[k, "streak_value"] == best[2]
