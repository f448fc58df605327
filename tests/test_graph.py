"""PageRank (stages/graph.py) vs driver-side numpy power iteration."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa


def _np_pagerank(edges, iters, d):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in set(edges):
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - d) / n)
        for a, b in set(edges):
            nr[idx[b]] += d * r[idx[a]] / out[idx[a]]
        r = nr
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import pagerank

    rng = np.random.default_rng(13)
    edges = [tuple(e) for e in rng.integers(0, 12, size=(60, 2)).tolist()]
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    out = pagerank(rd.from_arrow(t), iters=4, damping=0.85)
    exp = _np_pagerank(edges, 4, 0.85)
    got = dict(zip(out["node"], out["rank"]))
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12
    # ranks are a (leaky, due to dangling) distribution: bounded by 1
    assert 0 < sum(got.values()) <= 1.0 + 1e-9

def test_pagerank_dataset_matches_broadcast(ray_session):
    """The co-partitioned Dataset resolve must agree with the broadcast
    path on the same graph (float tolerance: addition order differs)."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import pagerank, pagerank_dataset

    rng = np.random.default_rng(7)
    edges = rng.integers(0, 300, size=(2500, 2))
    t = pa.table(
        {
            "src": pa.array(edges[:, 0], pa.int64()),
            "dst": pa.array(edges[:, 1], pa.int64()),
        }
    )
    bcast = pagerank(rd.from_arrow(t), iters=3, damping=0.85)
    dist = (
        pagerank_dataset(rd.from_arrow(t), iters=3, damping=0.85)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(dist["node"]) == list(bcast["node"])
    np.testing.assert_allclose(dist["rank"].to_numpy(), bcast["rank"].to_numpy(), rtol=1e-9)


def test_pagerank_gate_delegates_above_broadcast_budget(ray_session):
    """broadcast_max_nodes below the node count must route through the
    Dataset path and still produce the same ranks."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import pagerank

    rng = np.random.default_rng(3)
    edges = rng.integers(0, 50, size=(400, 2))
    t = pa.table(
        {
            "src": pa.array(edges[:, 0], pa.int64()),
            "dst": pa.array(edges[:, 1], pa.int64()),
        }
    )
    full = pagerank(rd.from_arrow(t), iters=3)
    gated = pagerank(rd.from_arrow(t), iters=3, broadcast_max_nodes=10)
    assert list(gated["node"]) == list(full["node"])
    np.testing.assert_allclose(gated["rank"].to_numpy(), full["rank"].to_numpy(), rtol=1e-9)


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_bfs_levels_chain_cycle_disconnected(ray_session, lme):
    """Exact BFS distances on a graph with a chain, a cycle shortcut, and a
    disconnected island; depth cap honored."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import bfs_levels

    # chain 0-1-2-3-4-5-6-7 with shortcut 0-5; island 100-101
    edges = [(i, i + 1) for i in range(7)] + [(0, 5), (100, 101)]
    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    )
    out = bfs_levels(ds, 0, max_depth=6, local_max_edges=lme)
    got = dict(zip(out["node"], out["dist"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 2, 7: 3}

    capped = bfs_levels(ds, 0, max_depth=1, local_max_edges=lme)
    assert dict(zip(capped["node"], capped["dist"])) == {0: 0, 1: 1, 5: 1}

    # source with no edges at all still returns itself at dist 0
    lone = bfs_levels(ds, 42, max_depth=3, local_max_edges=lme)
    assert dict(zip(lone["node"], lone["dist"])) == {42: 0}


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_sssp_bellman_ford_exact(ray_session, lme):
    """Weighted SSSP matches a driver-side Dijkstra on a graph with a
    tempting-but-heavier direct edge, and honors the distance cap."""
    import heapq

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import sssp_bellman_ford

    edges = [(0, 1, 2), (1, 2, 2), (0, 2, 10), (2, 3, 1), (0, 4, 9), (4, 5, 9), (6, 7, 1)]
    ds = rd.from_pandas(
        pd.DataFrame(
            {"item_a": [a for a, _, _ in edges],
             "item_b": [b for _, b, _ in edges],
             "w": [w for _, _, w in edges]}
        )
    )
    got = sssp_bellman_ford(ds, 0, max_dist=12, local_max_edges=lme)
    # reference Dijkstra
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {0: 0}
    pq = [(0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    want = {k: v for k, v in dist.items() if v <= 12}
    assert dict(zip(got["node"], got["dist"])) == want
    # node 4 reachable at 9 (direct), node 5 at 18 -> excluded by the cap
    assert 5 not in set(got["node"])


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_multi_source_bfs_matches_single_source(ray_session, lme):
    """The bitmask multi-source BFS agrees with per-source bfs_levels on a
    graph with shortcuts, shared frontiers and an unreachable island."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import bfs_levels, multi_source_bfs

    edges = [(i, i + 1) for i in range(9)] + [(0, 5), (2, 7), (100, 101), (101, 102)]
    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    )
    srcs = [0, 3, 100]
    multi = multi_source_bfs(ds, srcs, max_depth=4, local_max_edges=lme)
    for s in srcs:
        single = bfs_levels(ds, s, max_depth=4)
        got = multi[multi["source"] == s][["node", "dist"]].reset_index(drop=True)
        assert got.equals(single[["node", "dist"]].sort_values(["dist", "node"]).reset_index(drop=True)), s


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_kcore_peel_matches_brute_fixpoint(ray_session, lme):
    """When the peel converges within the round budget it equals the true
    k-core: parity with an explicit sequential peel."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import kcore_peel

    rng = np.random.default_rng(7)
    edges = set()
    while len(edges) < 300:
        a, b = rng.integers(0, 60, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    # brute sequential peel to the true 4-core
    alive = {v for e in edges for v in e}
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        nxt = {v for v in alive if deg.get(v, 0) >= 4}
        if nxt == alive:
            break
        alive = nxt
    want = {v: deg[v] for v in alive}

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    )
    got = kcore_peel(ds, k=4, rounds=64, local_max_edges=lme)
    assert dict(zip(got["node"], got["deg"])) == want

    # k larger than any degree: empty core, stable schema
    empty = kcore_peel(ds, k=1000, rounds=8, local_max_edges=lme)
    assert len(empty) == 0 and list(empty.columns) == ["node", "deg"]


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_ktruss_peel_matches_brute(ray_session, lme):
    """Bounded-round k-truss equals an explicit sequential peel when it
    converges within the budget; both closure paths agree."""
    import itertools as it

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import ktruss_peel

    rng = np.random.default_rng(23)
    edges = set()
    while len(edges) < 260:
        a, b = rng.integers(0, 45, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    # plant a clique so a nontrivial truss survives
    for a, b in it.combinations(range(100, 108), 2):
        edges.add((a, b))

    k = 4

    def brute(es: set) -> dict:
        es = set(es)
        while True:
            adj = {}
            for a, b in es:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
            nxt = {e for e in es if sup[e] >= k - 2}
            if nxt == es:
                return {e: sup[e] for e in es}
            es = nxt

    want = brute(edges)
    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    )
    got = ktruss_peel(ds, k=k, rounds=64, local_max_edges=lme)
    got_map = {(int(r.x), int(r.y)): int(r.support) for r in got.itertuples()}
    assert got_map == want
    # clique of 8: every clique edge survives with support 6
    for a, b in it.combinations(range(100, 108), 2):
        assert got_map[(a, b)] >= 6


def test_hits_matches_numpy_power(ray_session):
    """HITS sum-normalized rounds equal an explicit numpy adjacency-matrix
    computation on a directed graph with a clear hub and authority."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import hits

    edges = [(0, 3), (1, 3), (2, 3), (0, 4), (3, 5), (0, 5)]
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in edges:
        A[idx[a], idx[b]] = 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(2):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    got = hits(
        rd.from_pandas(pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})),
        iters=2,
    )
    assert np.allclose(got["hub"].to_numpy(), h, atol=1e-12)
    assert np.allclose(got["authority"].to_numpy(), a, atol=1e-12)
    # node 0 links to the most authorities: top hub; node 3 is top authority
    assert int(got.loc[got["hub"].idxmax(), "node"]) == 0
    assert int(got.loc[got["authority"].idxmax(), "node"]) == 3


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_label_propagation_matches_brute_rounds(ray_session, lme):
    """4 synchronous LPA rounds (min-label ties) on two triangles joined by
    a bridge equal a brute-force per-node simulation, on both the local and
    the fully distributed (local_max_edges=0) paths."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import label_propagation

    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10), (20, 21)]

    def brute(iters: int) -> dict[int, int]:
        nbrs: dict[int, list[int]] = {}
        for a, b in edges:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
        lab = {v: v for v in nbrs}
        for _ in range(iters):
            new = {}
            for v, ns in nbrs.items():
                cnt: dict[int, int] = {}
                for u in ns:
                    cnt[lab[u]] = cnt.get(lab[u], 0) + 1
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            lab = new
        return lab

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    )
    got = label_propagation(ds, iters=4, local_max_edges=lme)
    want = brute(4)
    assert {int(r.node): int(r.label) for r in got.itertuples()} == want
    # the two triangles each collapse onto their own min label
    got_map = {int(r.node): int(r.label) for r in got.itertuples()}
    assert len({got_map[0], got_map[10]}) == 2


def test_personalized_pagerank_matches_numpy(ray_session):
    """Seeded-teleport PPR equals an explicit numpy recurrence, seeds
    normalized 1/|S|, and differs from global PR in favoring the seeds'
    neighborhood."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[idx[a]] += 1
    s = np.zeros(n)
    for v in (3, 4):
        s[idx[v]] = 1 / 2
    r = s.copy()
    d = 0.85
    for _ in range(3):
        inc = np.zeros(n)
        for a, b in edges:
            inc[idx[b]] += r[idx[a]] / outdeg[idx[a]]
        r = (1 - d) * s + d * inc
    got = pagerank(
        rd.from_pandas(pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})),
        iters=3,
        seeds=[3, 4],
    )
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-15)
    assert got.loc[got["node"] == 3, "rank"].iloc[0] > got.loc[got["node"] == 0, "rank"].iloc[0]


def test_simrank_matches_brute_reference(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import simrank

    # small directed graph with shared in-neighbors and a source node (no in-edges)
    edges = pd.DataFrame(
        {"src": ["a", "a", "b", "b", "c", "d"], "dst": ["b", "c", "c", "d", "d", "b"]}
    )
    got = simrank(rd.from_pandas(edges).repartition(2), c=0.8, iters=4)

    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in zip(edges["src"], edges["dst"]):
        A[idx[s], idx[d]] = 1.0
    S = np.eye(n)
    for _ in range(4):
        new = np.zeros((n, n))
        for a in range(n):
            for b in range(n):
                if a == b:
                    new[a, b] = 1.0
                    continue
                ia = np.flatnonzero(A[:, a])
                ib = np.flatnonzero(A[:, b])
                if len(ia) == 0 or len(ib) == 0:
                    continue
                acc = sum(S[u, v] for u in ia for v in ib)
                new[a, b] = 0.8 / (len(ia) * len(ib)) * acc
        S = new
    for _, r in got.iterrows():
        want = S[idx[r["node_a"]], idx[r["node_b"]]]
        assert abs(r["sim"] - want) < 1e-12, (r["node_a"], r["node_b"])
    # 'a' has no in-neighbors: similarity 0 to everything
    assert (got[(got["node_a"] == "a")]["sim"] == 0.0).all()


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_stress_centrality_matches_bruteforce(ray_session, gate):
    """Forward sigma-BFS + backward DAG accumulation == per-source
    enumeration of shortest-path-through-v counts; local and distributed
    paths byte-identical."""
    import collections

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import stress_centrality

    rng = np.random.RandomState(11)
    edges = set()
    while len(edges) < 80:
        a, b = rng.randint(0, 40, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)

    K = 3
    sources = sorted({a for a, _ in edges})[:6]
    stress = collections.defaultdict(int)
    for s in sources:
        dist, sig = {s: 0}, {s: 1}
        frontier = [s]
        for d in range(1, K + 1):
            nxt = collections.defaultdict(int)
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        nxt[w] += sig[u]
            frontier = []
            for w, c in nxt.items():
                dist[w], sig[w] = d, c
                frontier.append(w)
        levels = collections.defaultdict(list)
        for v, dd in dist.items():
            levels[dd].append(v)
        P = {v: 0 for v in dist}
        for d in range(max(levels) - 1, 0, -1):
            for v in levels[d]:
                P[v] = sum(1 + P[w] for w in adj[v] if dist.get(w) == d + 1)
        for v, dd in dist.items():
            if dd >= 1:
                stress[v] += sig[v] * P[v]
    want = (
        pd.DataFrame(
            [(v, c) for v, c in stress.items() if c > 0], columns=["node", "stress"]
        )
        .sort_values(["stress", "node"], ascending=[False, True])
        .reset_index(drop=True)
    )

    ds = rd.from_pandas(
        pd.DataFrame(
            {"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]}
        )
    ).repartition(3)
    got = stress_centrality(ds, sources, max_depth=K, local_max_edges=gate)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_luby_mis_matches_bruteforce_and_is_valid(ray_session, gate):
    import collections

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import luby_mis

    rng = np.random.RandomState(3)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(0, 50, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)

    def pri(v):
        return (v * 2654435761) % 4294967296

    nodes = sorted({x for e in edges for x in e})
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    active, decided = set(nodes), {}
    for r in range(1, 7):
        winners = [
            v
            for v in active
            if all((pri(u), u) > (pri(v), v) for u in adj[v] if u in active)
        ]
        if not winners:
            break
        for v in winners:
            decided[v] = r
        drop = set(winners) | {u for v in winners for u in adj[v] if u in active}
        active -= drop
    want = (
        pd.DataFrame(
            [(v, decided[v]) for v in decided] + [(v, -1) for v in active],
            columns=["node", "round"],
        )
        .sort_values(["round", "node"])
        .reset_index(drop=True)
    )

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(3)
    got = luby_mis(ds, rounds=6, local_max_edges=gate)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    mis = set(got[got["round"] > 0]["node"])
    assert not any(a in mis and b in mis for a, b in edges), "independence violated"
    # maximality: every non-member is adjacent to a member (when fully decided)
    if (got["round"] == -1).sum() == 0:
        for v in nodes:
            assert v in mis or any(u in mis for u in adj[v]), v


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_densest_subgraph_peel_matches_brute(ray_session, lme):
    """Bahmani batch-peel parity with an explicit sequential implementation
    of the same rounds (deg*V <= eps_num*E peels), on both closure paths."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import densest_subgraph_peel

    rng = np.random.default_rng(11)
    edges = set()
    # planted dense core (clique on 0..9) + sparse periphery
    for a in range(10):
        for b in range(a + 1, 10):
            edges.add((a, b))
    while len(edges) < 120:
        a, b = rng.integers(0, 80, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))

    # brute sequential rounds
    want_rows = []
    alive = None
    for r in range(9):
        if alive is None:
            sub = list(edges)
        else:
            sub = [(a, b) for a, b in edges if a in alive and b in alive]
        deg = {}
        for a, b in sub:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nodes = sorted(deg)
        if not nodes:
            break
        v, e = len(nodes), len(sub)
        want_rows.append(
            {
                "round": r,
                "n_nodes": v,
                "n_edges": e,
                "density": e / v,
                "id_sum": sum(nodes),
                "id_min": nodes[0],
                "id_max": nodes[-1],
            }
        )
        if r == 8:
            break
        nxt = {n for n in nodes if deg[n] * v > 3 * e}
        if len(nxt) == len(nodes):
            break
        alive = nxt
    want = pd.DataFrame(want_rows)
    best = want["density"].max()
    want["is_best"] = (want["density"] == best) & (
        want[want["density"] == best]["round"].min() == want["round"]
    )

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(3)
    got = densest_subgraph_peel(ds, rounds=8, eps_num=3, local_max_edges=lme)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted clique must survive to the best round's subgraph
    assert got[got["is_best"]]["density"].iloc[0] >= 4.0


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_greedy_maximal_matching_brute_and_cover(ray_session, gate):
    """Locally-lightest matching parity with a sequential implementation of
    the same rounds, on both closure paths; plus matching validity,
    maximality, and the Gavril 2-approx vertex-cover audit against the
    brute-force optimum cover."""
    import itertools

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import greedy_maximal_matching

    rng = np.random.RandomState(7)
    edges = set()
    while len(edges) < 90:
        a, b = rng.randint(0, 40, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)

    def pri(u, v):
        return (u * 2654435761 + v * 40503) % (1 << 20)

    matched_nodes: set = set()
    decided = {}
    for r in range(1, 9):
        act = [(u, v) for u, v in edges if u not in matched_nodes and v not in matched_nodes]
        if not act:
            break
        best = {}
        for u, v in act:
            k = (pri(u, v), u, v)
            for n in (u, v):
                if n not in best or k < best[n]:
                    best[n] = k
        winners = [
            (u, v) for u, v in act if best[u] == (pri(u, v), u, v) == best[v]
        ]
        if not winners:
            break
        for u, v in winners:
            decided[(u, v)] = r
            matched_nodes |= {u, v}
    leftovers = [
        (u, v) for u, v in edges if u not in matched_nodes and v not in matched_nodes
    ]
    want = (
        pd.DataFrame(
            [(u, v, r) for (u, v), r in decided.items()]
            + [(u, v, -1) for u, v in leftovers],
            columns=["node_u", "node_v", "round"],
        )
        .sort_values(["round", "node_u", "node_v"])
        .reset_index(drop=True)
    )

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(3)
    got = greedy_maximal_matching(ds, rounds=8, local_max_edges=gate)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    m = got[got["round"] > 0]
    # validity: no two matched edges share a node
    ends = list(m["node_u"]) + list(m["node_v"])
    assert len(ends) == len(set(ends)), "matching shares a node"
    assert (got["round"] == -1).sum() == 0, "8 rounds must decide this graph"
    # maximality == the matched-node set is a vertex cover
    cover = set(ends)
    assert all(u in cover or v in cover for u, v in edges), "cover misses an edge"
    # Gavril: |cover| = 2|M| <= 2 * optimum cover. Brute-forcing the
    # optimum on the 40-node graph is infeasible; audit the bound on a
    # small graph where exhaustive search is cheap.
    small = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6), (6, 7)]
    sds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in small], "item_b": [b for _, b in small]})
    )
    sm = greedy_maximal_matching(sds, rounds=8, local_max_edges=gate)
    scover = set(sm[sm["round"] > 0]["node_u"]) | set(sm[sm["round"] > 0]["node_v"])
    assert all(u in scover or v in scover for u, v in small)
    snodes = sorted({x for e in small for x in e})
    opt = next(
        k
        for k in range(1, len(snodes) + 1)
        for cand in itertools.combinations(snodes, k)
        if all(u in set(cand) or v in set(cand) for u, v in small)
    )
    assert len(scover) <= 2 * opt


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_jones_plassmann_coloring_brute(ray_session, gate):
    """Round-for-round parity with a sequential implementation of the same
    Jones-Plassmann schedule, plus proper-coloring validity and the
    greedy bound colors <= maxdeg + 1, on both closure paths."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import jones_plassmann_coloring

    rng = np.random.RandomState(11)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(0, 45, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)

    def pri(v):
        return (v * 2654435761) % (1 << 32)

    nbrs: dict = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    color = {n: -1 for n in nbrs}
    rnd = {n: -1 for n in nbrs}
    for r in range(1, 11):
        unc = [n for n in nbrs if color[n] < 0]
        if not unc:
            break
        winners = [
            n
            for n in unc
            if all(
                color[o] >= 0 or (pri(n), n) < (pri(o), o) for o in nbrs[n]
            )
        ]
        for n in winners:  # winners are independent: assignment order irrelevant
            used = {color[o] for o in nbrs[n] if color[o] >= 0}
            c = 0
            while c in used:
                c += 1
            color[n] = c
            rnd[n] = r
    want = (
        pd.DataFrame(
            {"node": list(nbrs), "color": [color[n] for n in nbrs], "round": [rnd[n] for n in nbrs]}
        )
        .sort_values("node")
        .reset_index(drop=True)
    )

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(3)
    got = jones_plassmann_coloring(ds, rounds=10, local_max_edges=gate)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    cmap = dict(zip(got["node"], got["color"]))
    assert all(v >= 0 for v in cmap.values()), "10 rounds must color this graph"
    assert all(cmap[u] != cmap[v] for u, v in edges), "improper coloring"
    maxdeg = max(len(s) for s in nbrs.values())
    assert got["color"].max() <= maxdeg


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_wl_refinement_properties(ray_session, gate):
    """WL invariants: parity with a sequential multiset-hash refinement,
    automorphic nodes keep equal colors forever, refinement is monotone
    (distinct-color count never decreases), both closure paths agree."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import wl_refinement

    # two disjoint 4-cycles (every node automorphic) + a path P4 glued to
    # one cycle via node 0 to break symmetry there
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12), (12, 13), (13, 10),
             (0, 20), (20, 21), (21, 22)]
    M, A, B, C = 1048573, 2654435761, 40503, 2246822519
    nbrs: dict = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    c = {n: len(v) % M for n, v in nbrs.items()}
    hist = {n: [c[n]] for n in nbrs}
    for _ in range(3):
        c = {
            n: (c[n] * A + sum(c[o] * B + C for o in nbrs[n])) % M
            for n in nbrs
        }
        for n in nbrs:
            hist[n].append(c[n])

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(2)
    got = wl_refinement(ds, rounds=3, local_max_edges=gate)
    want = (
        pd.DataFrame(
            [{"node": n, **{f"c{i}": hist[n][i] for i in range(4)}} for n in nbrs]
        )
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    g = got.set_index("node")
    # the pristine 4-cycle stays monochromatic across all rounds
    for col in ["c0", "c1", "c2", "c3"]:
        assert len({g.loc[n, col] for n in (10, 11, 12, 13)}) == 1
    # symmetric pair (1, 3) adjacent to the glued node 0 stays equal
    for col in ["c0", "c1", "c2", "c3"]:
        assert g.loc[1, col] == g.loc[3, col]
    # refinement monotonicity
    ncolors = [got[c].nunique() for c in ["c0", "c1", "c2", "c3"]]
    assert all(a <= b for a, b in zip(ncolors, ncolors[1:]))
    # the glued cycle must separate from the pristine one by round 1
    assert g.loc[1, "c1"] != g.loc[11, "c1"]


@pytest.mark.parametrize("lme", [2_000_000, 0])
def test_neighborhood_function_matches_bfs(ray_session, lme):
    """N(h) parity with all-pairs BFS on a graph with a chain (diameter >
    max_h), a clique, and a disconnected island; matmul and distributed
    pair-Dataset paths must agree."""
    import collections

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import neighborhood_function

    edges = (
        [(i, i + 1) for i in range(8)]                     # chain 0..8
        + [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]  # K5
        + [(100, 101)]                                     # island
    )
    nbrs: dict = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)

    def bfs_ball(src, h):
        seen = {src}
        frontier = {src}
        for _ in range(h):
            frontier = {o for n in frontier for o in nbrs[n]} - seen
            seen |= frontier
        return len(seen)

    want = []
    for h in range(4):
        want.append(sum(bfs_ball(s, h) for s in nbrs))

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(3)
    got = neighborhood_function(ds, max_h=3, local_max_edges=lme)
    assert list(got["pairs"]) == want
    assert list(got["h"]) == [0, 1, 2, 3]
    nv = len(nbrs)
    assert (got["n_nodes"] == nv).all()
    assert got["ratio"].iloc[0] == 1.0 / nv
    # monotone, bounded by V^2
    p = list(got["pairs"])
    assert all(a <= b for a, b in zip(p, p[1:])) and p[-1] <= nv * nv


@pytest.mark.parametrize("gate", [2_000_000, 0])
def test_boruvka_msf_matches_kruskal(ray_session, gate):
    """The bounded-contraction Boruvka forest equals the unique Kruskal
    MSF on a multi-component graph, on both closure paths; spanning and
    acyclicity audited."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import boruvka_msf

    rng = np.random.RandomState(31)
    edges = set()
    while len(edges) < 140:
        a, b = rng.randint(0, 50, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges |= {(100, 101), (101, 102), (100, 102)}  # second component w/ cycle
    edges = sorted(edges)
    nodes = sorted({x for e in edges for x in e})
    ranks = {n: i for i, n in enumerate(nodes)}

    def key(u, v):
        return (
            (((u * 2654435761 + v * 40503) % (1 << 20)) << 42)
            | (ranks[u] << 21)
            | ranks[v]
        )

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for u, v in sorted(edges, key=lambda e: key(*e)):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            mst.add((u, v))

    ds = rd.from_pandas(
        pd.DataFrame({"item_a": [a for a, _ in edges], "item_b": [b for _, b in edges]})
    ).repartition(3)
    got = boruvka_msf(ds, rounds=12, contract_steps=8, local_max_edges=gate)
    got_edges = set(zip(got["node_u"], got["node_v"]))
    assert got_edges == mst
    # forest size = V - #components (2 components here)
    assert len(got_edges) == len(nodes) - 2
    # acyclic by construction of the Kruskal reference; spanning audit:
    roots = {find(n) for n in nodes}
    assert len(roots) == 2
