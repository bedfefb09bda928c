"""Deletion-neighborhood fuzzy join (stages/fuzzyjoin.py) — parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.fuzzyjoin import _lev_le1, edit1_pairs


def test_lev_le1_cases():
    assert _lev_le1("abc", "abc")          # equal
    assert _lev_le1("abc", "axc")          # substitution
    assert _lev_le1("abc", "abxc")         # insertion
    assert _lev_le1("abc", "ab")           # deletion
    assert _lev_le1("", "x")
    assert not _lev_le1("abc", "axx")      # two substitutions
    assert not _lev_le1("abc", "abcxx")    # length gap 2
    assert not _lev_le1("abc", "xabx")


def test_edit1_pairs_blocking_and_verify(ray_session):
    rows = [
        {"id": 1, "name": "alpha", "blk": 0},
        {"id": 2, "name": "alphx", "blk": 0},   # sub of 1
        {"id": 3, "name": "alpha", "blk": 1},   # other block: no pair with 1
        {"id": 4, "name": "alpha!", "blk": 0},  # insertion of 1
        {"id": 5, "name": "zzzzz", "blk": 0},   # far from everything
        {"id": 6, "name": "alph", "blk": 0},    # deletion of 1
    ]
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("id", pa.int64()), ("name", pa.string()), ("blk", pa.int64())]
        ),
    )
    ds = ray.data.from_arrow([t.slice(0, 3), t.slice(3, 3)])
    out = {
        (r["u"], r["v"])
        for r in edit1_pairs(ds, "id", "name", "blk").take_all()
    }
    # 2~1 (sub), 4~1 (ins), 6~1 (del), 6~2? "alph"/"alphx" dist 1 (ins) yes,
    # 6~4? "alph"/"alpha!" dist 2 no, 2~4? "alphx"/"alpha!" dist 2 no
    assert out == {(1, 2), (1, 4), (1, 6), (2, 6)}
