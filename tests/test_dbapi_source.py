"""S4 partitioned DB-API source (sources/dbapi.py) against DuckDB."""

import duckdb
import pyarrow as pa

from encode_ingest_ray.sources.dbapi import _plan_partitions, read_dbapi


def _make_factory():
    # a CLOSURE (pickled by value) — module-level test functions pickle by
    # reference and Ray workers cannot import the tests package
    def factory():
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW t AS SELECT range AS k, range * 2 AS v, "
            "CASE WHEN range % 2 = 0 THEN 'even' ELSE 'odd' END AS parity "
            "FROM range(0, 1000)"
        )
        return con

    return factory


def test_partition_planning_covers_range_without_overlap():
    parts = _plan_partitions(_make_factory(), "t", "k", 7, None)
    assert parts[0].lo == 0 and parts[-1].hi == 1000
    for a, b in zip(parts, parts[1:]):
        assert a.hi == b.lo  # contiguous, no overlap
    assert sum(p.hi - p.lo for p in parts) == 1000


def test_read_dbapi_full_scan_matches_sql():
    ds = read_dbapi(_make_factory(), "t", key="k", num_partitions=5)
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(got) == 1000
    assert list(got.columns) == ["k", "v", "parity"]
    assert got["v"].tolist() == [2 * i for i in range(1000)]


def test_read_dbapi_pruning_and_pushdown():
    ds = read_dbapi(
        _make_factory(),
        "t",
        key="k",
        columns=["k", "parity"],
        predicate="parity = 'even'",
        num_partitions=4,
    )
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got.columns) == ["k", "parity"]
    assert len(got) == 500 and (got["parity"] == "even").all()
    # the predicate also narrowed the planned key range (applied in planning)
    parts = _plan_partitions(_make_factory(), "t", "k", 4, "parity = 'even'")
    assert parts[0].lo == 0 and parts[-1].hi == 999


def test_read_dbapi_empty_table():
    def make_empty():
        def empty():
            con = duckdb.connect()
            con.execute("CREATE VIEW t AS SELECT 1 AS k WHERE false")
            return con

        return empty

    ds = read_dbapi(make_empty(), "t", key="k", num_partitions=4)
    assert ds.count() == 0


def test_generic_cursor_fallback():
    """A DB-API cursor without .arrow() goes through fetchall."""
    from encode_ingest_ray.sources.dbapi import _to_arrow

    class FakeCursor:
        description = [("a",), ("b",)]

        def fetchall(self):
            return [(1, "x"), (2, "y")]

    t = _to_arrow(FakeCursor())
    assert t == pa.table({"a": [1, 2], "b": ["x", "y"]})
