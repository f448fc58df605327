"""Sequential-pattern support via segmented bitmask scans."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from perfect_bloomfilter_ray.stages.seqpat import _segmented_or_scan_exclusive_simple


def test_segmented_or_scan_fuzz():
    rng = np.random.RandomState(7)
    for _ in range(100):
        n = rng.randint(1, 80)
        key = np.sort(rng.randint(0, 6, n))
        x = rng.randint(0, 1 << 60, n).astype(np.uint64)
        got = _segmented_or_scan_exclusive_simple(x, key)
        acc: dict = {}
        for i in range(n):
            assert got[i] == acc.get(key[i], np.uint64(0))
            acc[key[i]] = acc.get(key[i], np.uint64(0)) | x[i]


def _brute_support(df: pd.DataFrame):
    want: dict = {}
    for u, sub in df.groupby("u"):
        seq = sub.sort_values(["ts", "id"])["t"].tolist()
        found = set()
        for i, j, k in itertools.combinations(range(len(seq)), 3):
            found.add((seq[i], seq[j], seq[k]))
        for p in found:
            want[p] = want.get(p, 0) + 1
    return want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # user
            st.integers(0, 20),         # ts
            st.sampled_from(list("abcde")),  # type (5 distinct -> 2 lanes)
        ),
        min_size=3,
        max_size=30,
    )
)
def test_triple_support_matches_bruteforce(ray_session, rows):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.seqpat import subsequence_triple_support

    df = pd.DataFrame(rows, columns=["u", "ts", "t"])
    df["id"] = range(len(df))
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    got = subsequence_triple_support(rd.from_pandas(df), "u", "ts", "t", "id")
    got_map = {
        (r.type_a, r.type_b, r.type_c): r.n_keys for r in got.itertuples(index=False)
    }
    assert got_map == _brute_support(df)
