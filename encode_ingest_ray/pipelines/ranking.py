"""Window-ranking queries: PARTITION BY ranks and a global total-order rank.

The reference's aggregations are all fold-style (SURVEY.md §2.5); ranking
windows are the other half of the warehouse aggregation surface.  Both
queries are exact — ranks are integers, the ordering keys are integer cents
with a deterministic tie-break, so the DuckDB window functions reproduce the
distributed result bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.ranking import global_rank, window_rank

WINDOW_RANK_SQL = """
WITH t AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY price_cents DESC, o_orderkey) AS rn,
       RANK()       OVER (PARTITION BY o_custkey
                          ORDER BY price_cents DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_custkey
                          ORDER BY price_cents DESC) AS drnk,
       NTILE(4)     OVER (PARTITION BY o_custkey
                          ORDER BY price_cents DESC, o_orderkey) AS tile4
FROM t
"""


@register("window_rank_orders", WINDOW_RANK_SQL)
def window_rank_orders(sf_dir: str):
    """ROW_NUMBER / RANK / DENSE_RANK / NTILE(4) per customer over order
    price (cents, descending; orderkey tie-break for the total-order
    functions, price-only ties for RANK/DENSE_RANK — ANSI semantics).

    One hash exchange on o_custkey; each bucket ranks ALL its partitions in
    one Arrow sort + O(rows) numpy pass (stages/ranking.rank_table) — no
    per-customer Python call.
    """
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "price_cents": _cents(t.column("o_totalprice")),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return window_rank(
        pre,
        partition_keys=["o_custkey"],
        order_by=[("price_cents", True)],
        tie_breakers=["o_orderkey"],
        ntile=4,
    )


GLOBAL_RANK_SQL = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       ROW_NUMBER() OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                          o_orderkey) AS rn
FROM orders
"""


@register("global_rank_orders", GLOBAL_RANK_SQL)
def global_rank_orders(sf_dir: str):
    """Global ROW_NUMBER() over every order by price (desc, orderkey
    tie-break) — distributed total-order ranking: strided per-block sample
    -> distinct range splits (ties never straddle a boundary) -> per-block
    searchsorted assignment -> per-partition local sort+rank shifted by the
    exclusive prefix sum of partition counts (stages/ranking.global_rank).
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "price_cents": _cents(t.column("o_totalprice")),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return global_rank(
        pre, order_col="price_cents", tie_breaker="o_orderkey", descending=True
    )
