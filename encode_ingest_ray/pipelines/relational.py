"""Wide-aggregation relational shapes: PIVOT and ROLLUP.

Rounds out the aggregation family (SURVEY.md §2.5) beyond plain GROUP BY:
the reference's fold-style aggregations are all single-level; a
warehouse-style consumer of the same tables immediately reaches for
conditional-count pivots and hierarchical totals.  Both are expressed as
combiner partials + the repo's standard single hash-bucket exchange
(stages/aggregate.py) — the input is scanned exactly once per query at any
scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.aggregate import pivot_count_columns, rollup_sums

#: The generator's closed event-type domain (TESTDATA.md) — the distributed
#: pivot contract requires a fixed category list so the output schema is not
#: data-dependent.
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*)                                        AS n_total
FROM events
GROUP BY user_id
"""


@register("pivot_event_counts", PIVOT_SQL)
def pivot_event_counts(sf_dir: str):
    """PIVOT: one wide row per user with a count column per event type.

    Per-block boolean-mask partials go wide BEFORE the exchange (one row
    per (block, user), never per (block, user, type)), then one hash-bucket
    exchange + C++ sum per bucket (stages/aggregate.pivot_count_columns).
    """
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_count_columns(ds, "user_id", "event_type", EVENT_TYPES)


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_pricing", ROLLUP_SQL)
def rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP(returnflag, linestatus): per-(flag,status) sums plus
    per-flag subtotals plus the grand total, rolled-up positions NULL.

    Two-phase (stages/aggregate.rollup_sums): only the finest level touches
    the input; every super-aggregate level reduces the finest RESULT, so the
    full lattice costs one scan + one real exchange.
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "sum_disc_cents": _cents(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(1.0, t.column("l_discount")),
                    )
                ),
                "count_order": pa.array([1] * n, pa.int64()),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return rollup_sums(
        pre,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_disc_cents", "count_order"],
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_pricing", CUBE_SQL)
def cube_pricing(sf_dir: str):
    """GROUP BY CUBE(returnflag, linestatus): the full 2^2 grouping-set
    lattice — per-(flag,status), per-flag, per-status, grand total — via
    `rollup_sums(grouping_sets=...)`; the input is scanned once (finest
    level), every other set reduces the materialized finest result.
    """
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "count_order": pa.array([1] * t.num_rows, pa.int64()),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    keys = ["l_returnflag", "l_linestatus"]
    return rollup_sums(
        pre,
        keys,
        ["sum_qty", "count_order"],
        grouping_sets=[keys, ["l_returnflag"], ["l_linestatus"], []],
    )
