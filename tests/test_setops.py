"""Presence-flag set-op kernel (stages/setops.py) — tiny-table parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.setops import presence_flags


def _flags(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("k", pa.int64()), ("in_a", pa.int64()), ("in_b", pa.int64())]
        ),
    )


def test_presence_flags_or_across_blocks(ray_session):
    # key 1 witnesses side a in block 1 and side b in block 2 -> (1,1);
    # key 2 only side a; key 3 only side b
    b1 = _flags([{"k": 1, "in_a": 1, "in_b": 0}, {"k": 2, "in_a": 1, "in_b": 0}])
    b2 = _flags([{"k": 1, "in_a": 0, "in_b": 1}, {"k": 3, "in_a": 0, "in_b": 1}])
    out = {
        r["k"]: (r["in_a"], r["in_b"])
        for r in presence_flags(
            ray.data.from_arrow([b1, b2]), ["k"], ["in_a", "in_b"]
        ).take_all()
    }
    assert out == {1: (1, 1), 2: (1, 0), 3: (0, 1)}


def test_presence_flags_dedupes_repeats(ray_session):
    # 4 witnesses of the same (key, side) collapse to one row, flag still 1
    b = _flags([{"k": 7, "in_a": 1, "in_b": 0}] * 4)
    out = presence_flags(ray.data.from_arrow(b), ["k"], ["in_a", "in_b"]).take_all()
    assert out == [{"k": 7, "in_a": 1, "in_b": 0}]
