"""Triangle-counting kernels (stages/triangles.py) — tiny-graph parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.triangles import (
    group_pair_edges,
    pairs_within_groups,
    triangle_count,
)


def _edges(pairs):
    return pa.Table.from_pylist(
        [{"u": u, "v": v} for u, v in pairs],
        schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]),
    )


def test_pairs_within_groups_dedup_and_order():
    t = pa.Table.from_pylist(
        [
            {"k": 1, "i": 3},
            {"k": 1, "i": 1},
            {"k": 1, "i": 3},  # duplicate member collapses
            {"k": 1, "i": 2},
            {"k": 2, "i": 5},  # singleton group: no pairs
            {"k": 3, "i": 7},
            {"k": 3, "i": 6},
        ],
        schema=pa.schema([("k", pa.int64()), ("i", pa.int64())]),
    )
    out = pairs_within_groups(t, "k", "i").to_pylist()
    got = {(r["u"], r["v"]) for r in out}
    assert got == {(1, 2), (1, 3), (2, 3), (6, 7)}
    assert len(out) == 4  # no duplicate pairs
    assert all(r["u"] < r["v"] for r in out)


def _count(pairs, **kw):
    return triangle_count(ray.data.from_arrow(_edges(pairs)), **kw)


def test_triangle_count_broadcast_and_exchange_paths(ray_session):
    # K4 has 4 triangles; the pendant edge (4,5) adds none
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    assert _count(k4) == 4
    # force the exchange path: same answer
    assert _count(k4, broadcast_max_edges=0) == 4


def test_triangle_count_no_triangles(ray_session):
    assert _count([(1, 2), (3, 4), (2, 3)]) == 0
    assert _count([]) == 0


def test_group_pair_edges_distinct_across_keys(ray_session):
    # pair (1,2) co-occurs under two keys -> one edge
    t = pa.Table.from_pylist(
        [
            {"k": 10, "i": 1},
            {"k": 10, "i": 2},
            {"k": 20, "i": 1},
            {"k": 20, "i": 2},
            {"k": 20, "i": 3},
        ],
        schema=pa.schema([("k", pa.int64()), ("i", pa.int64())]),
    )
    out = group_pair_edges(ray.data.from_arrow(t), "k", "i").take_all()
    got = {(r["u"], r["v"]) for r in out}
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert len(out) == 3
