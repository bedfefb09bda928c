"""Fixed-point PageRank (stages/pagerank.py) — brute-force parity."""

import pyarrow as pa
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
