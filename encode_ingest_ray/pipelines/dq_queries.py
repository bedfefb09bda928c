"""Data-quality verification queries (stages/dq.py — the deequ shape).

The constraint suite compiles to one streaming scan (per-block metric
partials, tiny repartition(1) verdict) plus one distinct-key exchange for
the uniqueness constraint; the result is a six-row verdict table.  The
oracle is a UNION ALL of the equivalent SQL assertions with identical check
labels and integer metrics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.dq import dq_suite

DQ_SQL = """
SELECT 'row_count' AS check, CAST(COUNT(*) AS BIGINT) AS metric,
       CAST(COUNT(*) > 0 AS BIGINT) AS passed FROM orders
UNION ALL
SELECT 'not_null:o_custkey',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS BIGINT)
FROM orders
UNION ALL
SELECT 'not_null:o_orderdate',
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0 AS BIGINT)
FROM orders
UNION ALL
SELECT 'accepted:o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) = 0
            AS BIGINT)
FROM orders
UNION ALL
SELECT 'bounds:o_totalprice',
       CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     BETWEEN 1 AND 100000000 THEN 0 ELSE 1 END) AS BIGINT),
       CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     BETWEEN 1 AND 100000000 THEN 0 ELSE 1 END) = 0 AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique:o_orderkey',
       CAST(COUNT(*) FILTER (n > 1) AS BIGINT),
       CAST(COUNT(*) FILTER (n > 1) = 0 AS BIGINT)
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
"""


@register("dq_checks_orders", DQ_SQL)
def dq_checks_orders(sf_dir: str):
    """Declarative data-quality gate over ``orders``: NOT NULL on the FK
    and the date, an accepted-values set on the status enum, integer-cent
    bounds on the price, and primary-key uniqueness — one scan + one
    distinct-key exchange, six verdict rows out.  The shape a 100 TB ingest
    runs between "table written" and "manifest committed"."""
    ds = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )
    return dq_suite(
        ds,
        [
            ("not_null", "o_custkey"),
            ("not_null", "o_orderdate"),
            ("accepted", "o_orderstatus", ["O", "F", "P"]),
            ("bounds", "o_totalprice", 1, 100_000_000, _cents),
            ("unique", "o_orderkey"),
        ],
    )
