"""Property tests: new pure kernels vs brute-force references (no Ray)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from encode_ingest_ray.stages.intervals import coverage_table
from encode_ingest_ray.stages.ranking import rank_table
from encode_ingest_ray.stages.triangles import pairs_within_groups

rows_st = st.lists(
    st.tuples(
        st.integers(0, 4),        # partition / group key
        st.integers(-50, 50),     # order value (ties likely)
        st.integers(0, 10**6),    # tie-break id (unique-ish)
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(rows_st)
def test_rank_table_matches_bruteforce(rows):
    # unique tie-break ids per row
    rows = [(k, v, i) for i, (k, v, _) in enumerate(rows)]
    t = pa.Table.from_pylist(
        [{"k": k, "v": v, "i": i} for k, v, i in rows],
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64()), ("i", pa.int64())]),
    )
    out = rank_table(t, ["k"], [("v", True)], ["i"], ntile=3).to_pylist()
    by_part: dict[int, list] = {}
    for k, v, i in rows:
        by_part.setdefault(k, []).append((v, i))
    for part, members in by_part.items():
        members.sort(key=lambda m: (-m[0], m[1]))
        got = sorted(
            (r for r in out if r["k"] == part), key=lambda r: r["rn"]
        )
        assert [g["i"] for g in got] == [m[1] for m in members]
        for pos, g in enumerate(got):
            # rank: 1 + count of strictly-greater values
            assert g["rnk"] == 1 + sum(1 for v, _ in members if v > members[pos][0])
            assert g["drnk"] == len({v for v, _ in members if v > members[pos][0]}) + 1
            # SQL NTILE(3)
            s, n = len(members), 3
            q, r = divmod(s, n)
            rn = pos + 1
            tile = (
                (rn - 1) // (q + 1) + 1
                if rn <= r * (q + 1)
                else r + (rn - r * (q + 1) - 1) // max(q, 1) + 1
            )
            assert g["tile3"] == tile


iv_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(1, 30)),
    min_size=0,
    max_size=50,
)


@settings(max_examples=60, deadline=None)
@given(iv_st)
def test_coverage_matches_point_union(ivs):
    t = pa.Table.from_pylist(
        [{"k": k, "s": s, "e": s + d} for k, s, d in ivs],
        schema=pa.schema([("k", pa.int64()), ("s", pa.int64()), ("e", pa.int64())]),
    )
    out = {r["k"]: r["covered"] for r in coverage_table(t, "k", "s", "e").to_pylist()}
    truth: dict[int, set] = {}
    for k, s, d in ivs:
        truth.setdefault(k, set()).update(range(s, s + d))
    assert out == {k: len(pts) for k, pts in truth.items()}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 8)), max_size=40))
def test_pairs_within_groups_matches_bruteforce(rows):
    t = pa.Table.from_pylist(
        [{"g": g, "i": i} for g, i in rows],
        schema=pa.schema([("g", pa.int64()), ("i", pa.int64())]),
    )
    got = {
        (r["u"], r["v"]) for r in pairs_within_groups(t, "g", "i").to_pylist()
    }
    want = set()
    by_g: dict[int, set] = {}
    for g, i in rows:
        by_g.setdefault(g, set()).add(i)
    for members in by_g.values():
        ms = sorted(members)
        for a_i in range(len(ms)):
            for b_i in range(a_i + 1, len(ms)):
                want.add((ms[a_i], ms[b_i]))
    assert got == want
