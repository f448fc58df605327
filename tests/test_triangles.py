"""Triangle counting: brute-force parity on random + skewed graphs."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest


def _brute_triangles(edges: set[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for a, b in edges:
        n += len(adj[a] & adj[b])
    return n // 3


def _rand_edges(rng, n_nodes: int, m: int) -> set[tuple[int, int]]:
    out = set()
    while len(out) < m:
        a, b = rng.integers(0, n_nodes, size=2)
        if a != b:
            out.add((int(min(a, b)), int(max(a, b))))
    return out


@pytest.mark.parametrize("broadcast_max_edges", [10_000_000, 0])
def test_triangle_count_matches_bruteforce(ray_session, broadcast_max_edges):
    """Both closure paths (broadcast probe / co-partitioned probe) are exact,
    including under a hub node (star + clique skew)."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import triangle_count

    rng = np.random.default_rng(5)
    edges = _rand_edges(rng, 60, 300)
    edges |= {(0, i) for i in range(1, 50)}  # hub: degree-ordering stress
    edges |= {(int(a), int(b)) for a, b in itertools.combinations(range(50, 58), 2)}  # clique
    df = pd.DataFrame(
        {"item_a": np.array([a for a, _ in edges], dtype=np.int64), "item_b": np.array([b for _, b in edges], dtype=np.int64)}
    )
    got = triangle_count(rd.from_pandas(df), num_blocks=5, broadcast_max_edges=broadcast_max_edges)
    assert int(got["n_edges"].iloc[0]) == len(edges)
    assert int(got["n_triangles"].iloc[0]) == _brute_triangles(edges)


def test_triangle_count_degenerate(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import triangle_count

    # a single path a-b-c: one wedge, zero triangles
    df = pd.DataFrame({"item_a": np.array([1, 2], dtype=np.int64), "item_b": np.array([2, 3], dtype=np.int64)})
    got = triangle_count(rd.from_pandas(df), num_blocks=3)
    assert int(got["n_triangles"].iloc[0]) == 0
    assert int(got["n_nodes"].iloc[0]) == 3


def test_distinct_pairs_matches_cooccurrence_keys(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.cooccur import cooccurrence_counts, distinct_pairs

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=600).astype(np.int64),
            "item": rng.integers(0, 25, size=600).astype(np.int64),
        }
    )
    a = cooccurrence_counts(rd.from_pandas(df), "k", "item", num_blocks=5).to_pandas()
    b = distinct_pairs(rd.from_pandas(df), "k", "item", num_blocks=5).to_pandas()
    sa = set(zip(a["item_a"].astype(int), a["item_b"].astype(int)))
    sb = set(zip(b["item_a"].astype(int), b["item_b"].astype(int)))
    assert sa == sb
    assert len(b) == len(sb)  # truly distinct


def _brute_per_node(edges: set[tuple[int, int]]) -> dict[int, tuple[int, int]]:
    """node -> (deg, tri) by explicit neighborhood intersection."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tri[c] += 0  # counted below per corner
    for v, nb in adj.items():
        cnt = 0
        for x, y in itertools.combinations(sorted(nb), 2):
            if (min(x, y), max(x, y)) in edges:
                cnt += 1
        tri[v] = cnt
    return {v: (len(adj[v]), tri[v]) for v in adj}


@pytest.mark.parametrize("broadcast_max_edges", [10_000_000, 0])
def test_triangle_count_per_node_matches_bruteforce(ray_session, broadcast_max_edges):
    """per_node=True is exact on both closure paths: every node's triangle
    participation count matches explicit neighborhood intersection, and
    sum(tri) == 3 * n_triangles."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import triangle_count

    rng = np.random.default_rng(11)
    edges = _rand_edges(rng, 40, 160)
    # hub skew: star center 0 + a clique among its first neighbors
    for v in range(1, 25):
        edges.add((0, v))
    for a in range(1, 8):
        for b in range(a + 1, 8):
            edges.add((a, b))

    ds = rd.from_pandas(
        pd.DataFrame(
            {"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]}
        )
    )
    got = triangle_count(
        ds, "item_a", "item_b", broadcast_max_edges=broadcast_max_edges, per_node=True
    )
    want = _brute_per_node(edges)
    assert len(got) == len(want)
    for _, row in got.iterrows():
        d, t = want[int(row["node"])]
        assert (int(row["deg"]), int(row["tri"])) == (d, t), row["node"]
    total = triangle_count(ds, "item_a", "item_b", broadcast_max_edges=broadcast_max_edges)
    assert int(got["tri"].sum()) == 3 * int(total["n_triangles"].iloc[0])


def test_triangle_count_per_node_empty(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import triangle_count

    ds = rd.from_pandas(pd.DataFrame({"item_a": pd.array([], dtype="int64"), "item_b": pd.array([], dtype="int64")}))
    out = triangle_count(ds, "item_a", "item_b", per_node=True)
    assert list(out.columns) == ["node", "deg", "tri"] and len(out) == 0
