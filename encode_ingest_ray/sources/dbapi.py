"""S4 — the SQL-database source, re-imagined for Ray Data.

The reference's explorer backfill reads BigQuery through Spark JDBC
(/root/reference/explorer/file-backfill/src/main/scala/.../
FileBackfillGenerator.scala:16-74: one partitioned SELECT, column pruning,
predicate pushdown via dbtable subquery).  JDBC/JVM is out of scope here, so
the Ray-native equivalent is a *partitioned DB-API 2.0 source*:

* the driver plans N key-range partitions from ``MIN(key)``/``MAX(key)``
  (one cheap aggregate query — the JDBC ``partitionColumn/lowerBound/
  upperBound/numPartitions`` contract);
* each partition becomes ONE Ray task that opens its own connection in the
  task (connections never cross process boundaries), runs
  ``SELECT <cols> FROM <table> WHERE key >= lo AND key < hi [AND pred]``,
  and emits Arrow — so reads stream with the rest of the pipeline and scale
  with the cluster;
* column pruning and predicate pushdown are first-class arguments, as in
  the reference's dbtable subquery.

``connection_factory`` must be a picklable zero-arg callable returning a
DB-API connection (e.g. ``lambda: duckdb.connect('file.db')`` wrapped in a
module-level function).  Tested against DuckDB, the in-container engine.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray
import ray.data


@dataclass
class _Partition:
    lo: int
    hi: int  # exclusive, except the last partition which is inclusive
    last: bool


def _plan_partitions(
    connection_factory, table: str, key: str, num_partitions: int, predicate: str | None
) -> list[_Partition]:
    con = connection_factory()
    try:
        where = f" WHERE {predicate}" if predicate else ""
        cur = con.execute(f"SELECT MIN({key}), MAX({key}) FROM {table}{where}")
        lo, hi = cur.fetchone()
    finally:
        con.close()
    if lo is None:
        return []
    span = max(1, (int(hi) - int(lo) + 1))
    num_partitions = min(num_partitions, span)
    step = -(-span // num_partitions)
    parts = []
    for i in range(num_partitions):
        p_lo = int(lo) + i * step
        p_hi = min(int(lo) + (i + 1) * step, int(hi) + 1)
        if p_lo > int(hi):
            break
        parts.append(_Partition(p_lo, p_hi, i == num_partitions - 1))
    return parts


def read_dbapi(
    connection_factory,
    table: str,
    *,
    key: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Partitioned read of a SQL table into a Ray Dataset.

    One planning query on the driver, then ``num_partitions`` independent
    range-scan tasks (``from_items`` of partition descriptors →
    ``flat_map``-style ``map_batches`` that replaces each descriptor with
    its rows).  At 100 TB the planning stays O(1) and every scan is an
    index-range read a warehouse can serve in parallel.
    """
    parts = _plan_partitions(connection_factory, table, key, num_partitions, predicate)
    cols = ", ".join(columns) if columns else "*"
    pred = f" AND ({predicate})" if predicate else ""

    if not parts:
        return ray.data.from_items([])

    descriptors = ray.data.from_items(
        [{"lo": p.lo, "hi": p.hi} for p in parts]
    ).repartition(len(parts))

    def scan(batch: pa.Table) -> pa.Table:
        tables = []
        for lo, hi in zip(batch.column("lo").to_pylist(), batch.column("hi").to_pylist()):
            con = connection_factory()
            try:
                cur = con.execute(
                    f"SELECT {cols} FROM {table} "
                    f"WHERE {key} >= {lo} AND {key} < {hi}{pred}"
                )
                tables.append(_to_arrow(cur))
            finally:
                con.close()
        return pa.concat_tables(tables) if tables else pa.table({})

    return descriptors.map_batches(
        scan, batch_format="pyarrow", batch_size=None
    )


def _to_arrow(cursor) -> pa.Table:
    """Cursor → Arrow: native fast path (duckdb .arrow()) with a generic
    DB-API fetchall fallback."""
    arrow = getattr(cursor, "arrow", None) or getattr(cursor, "fetch_arrow_table", None)
    if arrow is not None:
        return arrow()
    rows = cursor.fetchall()
    names = [d[0] for d in cursor.description]
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table({n: list(c) for n, c in zip(names, cols)})
