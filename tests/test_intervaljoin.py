"""interval_overlap_join — brute-force parity, emit-once, edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from perfect_bloomfilter_ray.stages.intervaljoin import interval_overlap_join


def _run(la, lb, ra, rb, chunk_us):
    import ray

    left = ray.data.from_pandas(
        pd.DataFrame({"lid": np.arange(len(la)), "ls": la, "le": lb})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"rid": np.arange(len(ra)), "rs": ra, "re": rb})
    )
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", ["lid"], ["rid"], chunk_us
    ).to_pandas()
    if len(got) == 0:
        return set()
    return set(zip(got["lid"].astype(int), got["rid"].astype(int)))


def _brute(la, lb, ra, rb):
    out = set()
    for i in range(len(la)):
        for j in range(len(ra)):
            if la[i] <= rb[j] and ra[j] <= lb[i]:
                out.add((i, j))
    return out


@pytest.mark.parametrize("chunk_us", [10, 100, 1000])
def test_parity_random_intervals(ray_session, chunk_us):
    rng = np.random.RandomState(chunk_us)
    n, m = 120, 90
    la = rng.randint(0, 2000, n).astype(np.int64)
    lb = la + rng.randint(0, 300, n)  # spans cross many chunks at chunk=10
    ra = rng.randint(0, 2000, m).astype(np.int64)
    rb = ra + rng.randint(0, 300, m)
    assert _run(la, lb, ra, rb, chunk_us) == _brute(la, lb, ra, rb)


def test_inclusive_endpoints_and_emit_once(ray_session):
    # touching intervals overlap (inclusive); each pair appears exactly once
    import ray

    la = np.array([0, 50], dtype=np.int64)
    lb = np.array([10, 260], dtype=np.int64)  # second spans 3 chunks at 100
    ra = np.array([10, 0], dtype=np.int64)
    rb = np.array([20, 300], dtype=np.int64)
    left = ray.data.from_pandas(pd.DataFrame({"lid": [0, 1], "ls": la, "le": lb}))
    right = ray.data.from_pandas(pd.DataFrame({"rid": [0, 1], "rs": ra, "re": rb}))
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", ["lid"], ["rid"], 100
    ).to_pandas()
    pairs = list(zip(got["lid"].astype(int), got["rid"].astype(int)))
    assert sorted(pairs) == [(0, 0), (0, 1), (1, 1)]  # no duplicates
    assert len(pairs) == len(set(pairs))


def test_no_overlap_and_collision_guard(ray_session):
    import ray

    la = np.array([0], dtype=np.int64)
    assert _run(la, la + 5, la + 100, la + 110, 50) == set()
    left = ray.data.from_pandas(pd.DataFrame({"id": [0], "ls": [0], "le": [1]}))
    right = ray.data.from_pandas(pd.DataFrame({"id": [0], "rs": [0], "re": [1]}))
    with pytest.raises(ValueError):
        interval_overlap_join(left, right, "ls", "le", "rs", "re", ["id"], ["id"], 10)
