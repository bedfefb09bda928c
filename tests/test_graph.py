"""Fixed-point PageRank (stages/pagerank.py) — brute-force parity."""

import pyarrow as pa
import pytest
import ray.data

from encode_ingest_ray.stages.pagerank import pagerank_fixed_point


def _brute(edge_list, iterations=3, init=1000, d=850):
    nodes = sorted({s for s, _ in edge_list})
    deg = {n: sum(1 for s, _ in edge_list if s == n) for n in nodes}
    rank = {n: init for n in nodes}
    base = (1000 - d) * init // 1000
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in edge_list:
            if v in s:
                s[v] += rank[u] // deg[u]
        rank = {n: base + (d * s[n]) // 1000 for n in nodes}
    return rank


def test_pagerank_matches_bruteforce(ray_session):
    # parallel edge (1->2 twice), a cycle, and node 4 with out- but no
    # in-edges (gets the base rank)
    edges = [(1, 2), (1, 2), (2, 3), (3, 1), (4, 1)]
    t = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = (
        pagerank_fixed_point(ray.data.from_arrow(t), iterations=3)
        .to_pandas()
        .set_index("id")["rank_milli"]
        .to_dict()
    )
    assert out == _brute(edges)


def test_pagerank_single_iteration(ray_session):
    edges = [(1, 2), (2, 1)]
    t = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = (
        pagerank_fixed_point(ray.data.from_arrow(t), iterations=1)
        .to_pandas()
        .set_index("id")["rank_milli"]
        .to_dict()
    )
    # each node receives the other's full rank: 150 + 850*1000//1000 = 1000
    assert out == {1: 1000, 2: 1000}


# --------------------------------------------------------------------- BFS


def _brute_bfs(edge_list, source, rounds):
    hops = {source: 0}
    frontier = {source}
    for k in range(1, rounds + 1):
        nxt = {v for u, v in edge_list if u in frontier} - hops.keys()
        for v in nxt:
            hops[v] = k
        frontier = nxt
    return hops


def test_bfs_hops_matches_bruteforce(ray_session):
    from encode_ingest_ray.stages.bfs import bfs_hops

    # chain + branch + cycle back, plus an unreachable island (7, 8)
    edges = [(1, 2), (2, 3), (2, 4), (3, 1), (4, 5), (5, 6), (7, 8)]
    t = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    for rounds in (1, 3, 10):
        out = (
            bfs_hops(ray.data.from_arrow(t), source=1, rounds=rounds)
            .to_pandas().set_index("id")["hop"].to_dict()
        )
        assert out == _brute_bfs(edges, 1, rounds)


def test_bfs_hops_cohash_fallback_matches_broadcast(ray_session):
    from encode_ingest_ray.stages.bfs import bfs_hops

    rng = __import__("numpy").random.default_rng(11)
    src = rng.integers(0, 200, 2000)
    dst = rng.integers(0, 200, 2000)
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    a = bfs_hops(ds, source=0, rounds=3).to_pandas().set_index("id")["hop"].to_dict()
    b = (
        bfs_hops(ds, source=0, rounds=3, broadcast_limit=0)  # force cohash path
        .to_pandas().set_index("id")["hop"].to_dict()
    )
    assert a == b == _brute_bfs(list(zip(src.tolist(), dst.tolist())), 0, 3)


def test_sssp_matches_bellman_ford_brute_force(ray_session):
    """Random sparse digraph: engine distances at K rounds == textbook
    Bellman-Ford limited to K relaxation sweeps (path <= K edges)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from encode_ingest_ray.stages.bfs import sssp_dists

    rng = np.random.default_rng(5)
    n_nodes, n_edges, K = 60, 400, 4
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    w = rng.integers(1, 20, n_edges).astype(np.int64)
    t = pa.table({"src": src, "dst": dst, "w": w})
    ds = ray.data.from_arrow([t.slice(0, 200), t.slice(200)])

    got = (
        sssp_dists(ds, source=0, rounds=K, num_buckets=4)
        .to_pandas()
        .set_index("id")["dist"]
        .to_dict()
    )

    INF = 1 << 60
    d = {0: 0}
    for _ in range(K):
        nd = dict(d)
        for s, e, ww in zip(src, dst, w):
            if s in d and d[s] + ww < nd.get(e, INF):
                nd[e] = d[s] + ww
        d = nd
    assert got == d


def _peel_brute(src, dst, k, rounds):
    import numpy as np

    edges = list(zip(src.tolist(), dst.tolist()))
    for _ in range(rounds):
        deg = {}
        for s, _d in edges:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        edges = [(s, d) for s, d in edges if s in keep and d in keep]
    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    return deg


@pytest.mark.parametrize("broadcast_limit", [5_000_000, 1])
def test_kcore_matches_brute_force_peel(ray_session, broadcast_limit):
    """Random multigraph (parallel edges included): engine peels == the
    textbook per-round degree filter, on BOTH the broadcast-survivor path
    and the cohash semi-join fallback (broadcast_limit=1)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from encode_ingest_ray.stages.kcore import k_core

    rng = np.random.default_rng(9)
    n_nodes, n_edges, k, rounds = 50, 600, 4, 3
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    t = pa.table({"src": src, "dst": dst})
    ds = ray.data.from_arrow([t.slice(0, 500), t.slice(500)])

    got = (
        k_core(ds, k=k, rounds=rounds, broadcast_limit=broadcast_limit)
        .to_pandas()
        .set_index("id")["deg"]
        .to_dict()
    )
    assert got == _peel_brute(src, dst, k, rounds)
