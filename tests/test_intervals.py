"""Gaps-and-islands coverage (stages/intervals.py) — tiny-table parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.intervals import coverage_table, interval_coverage


def _iv(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("k", pa.int64()), ("s", pa.int64()), ("e", pa.int64())]
        ),
    )


def test_coverage_merges_overlaps_and_gaps():
    t = _iv(
        [
            # k=1: [0,10) + [5,15) merge to 15; [20,25) is its own island
            {"k": 1, "s": 0, "e": 10},
            {"k": 1, "s": 5, "e": 15},
            {"k": 1, "s": 20, "e": 25},
            # k=2: touching intervals [0,10),[10,20): s == prev end is NOT
            # > prev_max, so they merge (closed-open semantics)
            {"k": 2, "s": 0, "e": 10},
            {"k": 2, "s": 10, "e": 20},
            # k=3: contained interval must not extend the island
            {"k": 3, "s": 0, "e": 100},
            {"k": 3, "s": 10, "e": 20},
        ]
    )
    out = {r["k"]: r["covered"] for r in coverage_table(t, "k", "s", "e").to_pylist()}
    assert out == {1: 20, 2: 20, 3: 100}


def test_coverage_key_boundary_does_not_leak(ray_session):
    # k=1 ends at 100; k=2 starts at 0 — the running max must reset
    b1 = _iv([{"k": 1, "s": 0, "e": 100}])
    b2 = _iv([{"k": 2, "s": 0, "e": 5}, {"k": 2, "s": 50, "e": 60}])
    out = {
        r["k"]: r["covered"]
        for r in interval_coverage(
            ray.data.from_arrow([b1, b2]), "k", "s", "e"
        ).take_all()
    }
    assert out == {1: 100, 2: 15}


def test_coverage_overflow_guard_path_matches_fast_path():
    # force the guarded path with a span x segment product past 2^62 and
    # assert it agrees with the fast path on the same (rescaled) intervals
    import numpy as np

    from encode_ingest_ray.stages.intervals import coverage_table

    rng = np.random.RandomState(3)
    small = [
        {"k": int(k), "s": int(s), "e": int(s + d)}
        for k, s, d in zip(
            rng.randint(0, 5, 40), rng.randint(0, 500, 40), rng.randint(1, 60, 40)
        )
    ]
    fast = {
        r["k"]: r["covered"]
        for r in coverage_table(_iv(small), "k", "s", "e").to_pylist()
    }
    big_unit = 10**15  # 5 segs x ~5e17 span > 2^62 -> guarded path
    scaled = [
        {"k": r["k"], "s": r["s"] * big_unit, "e": r["e"] * big_unit}
        for r in small
    ]
    slow = {
        r["k"]: r["covered"] // big_unit
        for r in coverage_table(_iv(scaled), "k", "s", "e").to_pylist()
    }
    assert fast == slow
