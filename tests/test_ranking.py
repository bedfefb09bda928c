"""Window ranking kernels (stages/ranking.py) — tiny-table parity."""

import numpy as np
import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.ranking import (
    _ntile_of,
    global_rank,
    rank_table,
    window_rank,
)


def _orders(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("cust", pa.int64()), ("ok", pa.int64()), ("price", pa.int64())]
        ),
    )


def test_rank_table_tie_semantics():
    # cust 1: prices 50, 30, 30, 10 -> rn 1..4; rnk 1,2,2,4; drnk 1,2,2,3
    t = _orders(
        [
            {"cust": 1, "ok": 4, "price": 30},
            {"cust": 1, "ok": 1, "price": 50},
            {"cust": 1, "ok": 3, "price": 30},
            {"cust": 1, "ok": 9, "price": 10},
            {"cust": 2, "ok": 7, "price": 99},
        ]
    )
    out = rank_table(
        t, ["cust"], [("price", True)], ["ok"], ntile=2
    ).to_pylist()
    c1 = [r for r in out if r["cust"] == 1]
    assert [r["ok"] for r in c1] == [1, 3, 4, 9]  # tie on 30 broken by ok
    assert [r["rn"] for r in c1] == [1, 2, 3, 4]
    assert [r["rnk"] for r in c1] == [1, 2, 2, 4]
    assert [r["drnk"] for r in c1] == [1, 2, 2, 3]
    assert [r["tile4" if False else "tile2"] for r in c1] == [1, 1, 2, 2]
    c2 = [r for r in out if r["cust"] == 2]
    assert c2[0]["rn"] == c2[0]["rnk"] == c2[0]["drnk"] == 1


def test_ntile_uneven_sizes():
    # SQL NTILE(3) over 7 rows: tiles sized 3,2,2
    rn = np.arange(1, 8, dtype=np.int64)
    size = np.full(7, 7, dtype=np.int64)
    assert _ntile_of(rn, size, 3).tolist() == [1, 1, 1, 2, 2, 3, 3]
    # fewer rows than tiles: each row its own tile
    rn = np.arange(1, 3, dtype=np.int64)
    size = np.full(2, 2, dtype=np.int64)
    assert _ntile_of(rn, size, 4).tolist() == [1, 2]


def test_window_rank_partitions_split_across_blocks(ray_session):
    # the same cust arrives in two input blocks; the exchange must reunite it
    b1 = _orders([{"cust": 1, "ok": 1, "price": 10}])
    b2 = _orders([{"cust": 1, "ok": 2, "price": 20}])
    out = (
        window_rank(
            ray.data.from_arrow([b1, b2]),
            ["cust"],
            [("price", True)],
            ["ok"],
        )
        .to_pandas()
        .sort_values("rn")
    )
    assert out["ok"].tolist() == [2, 1] and out["rn"].tolist() == [1, 2]


def test_global_rank_total_order_and_ties(ray_session):
    # 3 blocks, duplicate prices across blocks; ranks must be a permutation
    # of 1..n in (price desc, ok asc) order
    rows = [
        {"ok": i, "price": p}
        for i, p in enumerate([30, 10, 30, 50, 10, 30, 77, 50, 1])
    ]
    t = pa.Table.from_pylist(
        rows, schema=pa.schema([("ok", pa.int64()), ("price", pa.int64())])
    )
    ds = ray.data.from_arrow([t.slice(0, 3), t.slice(3, 3), t.slice(6, 3)])
    out = global_rank(
        ds, "price", "ok", descending=True, num_partitions=3
    ).to_pandas()
    expected = sorted(rows, key=lambda r: (-r["price"], r["ok"]))
    got = out.sort_values("rn")
    assert got["ok"].tolist() == [r["ok"] for r in expected]
    assert got["rn"].tolist() == list(range(1, len(rows) + 1))
