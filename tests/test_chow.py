"""Chow structural-break F-test: synthetic break detection sanity."""

from __future__ import annotations

import numpy as np

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
