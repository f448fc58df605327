"""Chow structural-break F-test: synthetic break detection sanity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from perfect_bloomfilter_ray.pipelines.extras import _chow_ssr


def _f_from_xy(x: np.ndarray, y: np.ndarray, brk: int):
    def stats(m):
        xs, ys = x[m].astype(object), y[m].astype(object)
        return dict(
            n=int(m.sum()), sx=int(xs.sum()), sy=int(ys.sum()),
            sxx=int((xs * xs).sum()), sxy=int((xs * ys).sum()), syy=int((ys * ys).sum()),
        )

    s1, s2 = stats(x < brk), stats(x >= brk)
    sp = {c: s1[c] + s2[c] for c in s1}
    r1, r2, rp = _chow_ssr(**s1), _chow_ssr(**s2), _chow_ssr(**sp)
    return ((rp - r1 - r2) / 2.0) / ((r1 + r2) / (s1["n"] + s2["n"] - 4.0))


def test_strong_break_yields_large_f():
    rng = np.random.RandomState(0)
    x = np.repeat(np.arange(100), 5)
    noise = rng.randint(-3, 4, len(x))
    y_break = np.where(x < 50, 10 + 2 * x, 500 - 4 * x) + noise
    y_flat = 10 + 2 * x + noise
    f_break = _f_from_xy(x, y_break, 50)
    f_flat = _f_from_xy(x, y_flat, 50)
    assert f_break > 100
    assert f_flat < 5
    assert f_break > 20 * f_flat


def test_degenerate_segment_returns_none():
    assert _chow_ssr(n=2, sx=1, sy=1, sxx=1, sxy=1, syy=1) is None
    # zero x-variance within a segment
    assert _chow_ssr(n=5, sx=10, sy=7, sxx=20, sxy=14, syy=11) is None


def test_mann_kendall_known_trends(ray_session):
    """S > 0 on a rising series, ~0 on noise, tie term exact."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os
    import pandas as pd

    import perfect_bloomfilter_ray.pipelines.extras as ex

    base = pd.Timestamp("2025-03-01")
    rows = []
    eid = 0
    # 'up' fires k times in hour k (monotone rise); 'flat' fires twice/hour
    for k in range(6):
        for _ in range(k + 1):
            rows.append(("up", base + pd.Timedelta(hours=k)))
            eid += 1
        for _ in range(2):
            rows.append(("flat", base + pd.Timedelta(hours=k)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["event_id"] = range(len(df))
    df["user_id"] = 1
    df["value"] = 1.0
    df["props"] = "{}"
    d = tempfile.mkdtemp()
    pq.write_table(pa.Table.from_pandas(df[["event_id", "ts", "user_id", "event_type", "value", "props"]]), os.path.join(d, "events.parquet"))
    out = ex.mann_kendall_hourly_trend(d).set_index("event_type")
    n = 6
    assert int(out.loc["up", "s_stat"]) == n * (n - 1) // 2  # all pairs rising
    assert int(out.loc["flat", "s_stat"]) == 0
    # flat: one tie group of 6 equal counts -> 6*5*17
    assert int(out.loc["flat", "tie_term"]) == 6 * 5 * 17


def test_seasonal_mann_kendall_ignores_diurnal_cycle(ray_session):
    """A pure diurnal cycle (no day-over-day trend) must give S_seasonal=0;
    a day-over-day rise must give the maximal positive S."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    import perfect_bloomfilter_ray.pipelines.extras as ex

    base = pd.Timestamp("2025-03-01")
    rows = []
    for day in range(4):
        for hod in (6, 18):
            # 'cycle': hod-dependent volume, identical every day
            for _ in range(3 if hod == 6 else 9):
                rows.append(("cycle", base + pd.Timedelta(days=day, hours=hod)))
            # 'rise': volume grows with the day within every hod stratum
            for _ in range(day + 1):
                rows.append(("rise", base + pd.Timedelta(days=day, hours=hod)))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["event_id"] = range(len(df))
    df["user_id"] = 1
    df["value"] = 1.0
    df["props"] = "{}"
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.Table.from_pandas(df[["event_id", "ts", "user_id", "event_type", "value", "props"]]),
        os.path.join(d, "events.parquet"),
    )
    out = ex.seasonal_mann_kendall_trend(d).set_index("event_type")
    assert int(out.loc["cycle", "s_seasonal"]) == 0
    # 2 strata x C(4,2)=6 rising pairs each
    assert int(out.loc["rise", "s_seasonal"]) == 12
    assert int(out.loc["rise", "n_seasons"]) == 2
