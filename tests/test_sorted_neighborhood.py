"""sorted-neighborhood blocking: exact parity with the rank-window oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _brute(df: pd.DataFrame, window: int) -> set[tuple[int, int, int]]:
    r = df.sort_values(["kk", "id"]).reset_index(drop=True)
    ids = r["id"].to_numpy()
    out = set()
    for d in range(1, window):
        for i in range(len(ids) - d):
            out.add((int(ids[i]), int(ids[i + d]), d))
    return out


@pytest.mark.parametrize("window", [2, 5])
def test_sorted_neighborhood_matches_bruteforce(ray_session, window):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.fuzzy import sorted_neighborhood_pairs

    rng = np.random.default_rng(7)
    n = 400
    # skewed keys: many shared prefixes (incl. a hot one), some empty
    alph = list("abc")
    keys = ["".join(rng.choice(alph, size=rng.integers(0, 6))) for _ in range(n)]
    keys[: n // 4] = ["aa" + k for k in keys[: n // 4]]  # hot 2-char prefix
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "kk": keys})

    got = sorted_neighborhood_pairs(rd.from_pandas(df), "id", "kk", window=window, num_blocks=7).to_pandas()
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int), got["rank_gap"].astype(int)))
    assert got_set == _brute(df, window)
    # each pair emitted exactly once
    assert len(got) == len(got_set)


def test_sorted_neighborhood_tiny_and_ties(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.fuzzy import sorted_neighborhood_pairs

    # all-identical keys: order falls back to id; n < window
    df = pd.DataFrame({"id": np.array([3, 1, 2], dtype=np.int64), "kk": ["x", "x", "x"]})
    got = sorted_neighborhood_pairs(rd.from_pandas(df), "id", "kk", window=5, num_blocks=3).to_pandas()
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int), got["rank_gap"].astype(int)))
    assert got_set == {(1, 2, 1), (2, 3, 1), (1, 3, 2)}


def test_empty_inputs_all_new_stages(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.cooccur import distinct_pairs
    from perfect_bloomfilter_ray.stages.fuzzy import sorted_neighborhood_pairs
    from perfect_bloomfilter_ray.stages.graph import triangle_count
    from perfect_bloomfilter_ray.stages.ppjoin import ppjoin_pairs

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "text": pd.Series([], dtype="object"), "kk": pd.Series([], dtype="object")})
    )
    assert len(sorted_neighborhood_pairs(docs, "doc_id", "kk", window=4, num_blocks=3).to_pandas()) == 0
    assert len(ppjoin_pairs(docs, "doc_id", "text", threshold=0.8, num_blocks=3).to_pandas()) == 0
    e = rd.from_pandas(pd.DataFrame({"item_a": pd.Series([], dtype="int64"), "item_b": pd.Series([], dtype="int64")}))
    t = triangle_count(e, num_blocks=3)
    assert t.iloc[0].tolist() == [0, 0, 0]
    kv = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64"), "item": pd.Series([], dtype="int64")}))
    assert len(distinct_pairs(kv, "k", "item", num_blocks=3).to_pandas()) == 0
