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


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", Q5_SQL)
def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — the canonical star-join plan at scale: the two
    FACT-fact joins (orders⋈customer, then ⋈lineitem) each pay ONE co-hashed
    exchange with the local-supplier filter and the revenue partial pushed
    INSIDE the join task; the true dimensions (region→nation, supplier→
    nation) broadcast once as integer lookups.  Only (nationkey, partial
    cents) rows survive the last exchange.
    """
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine
    from encode_ingest_ray.stages.joins import cohash_join

    # dimensions: tiny by construction (TPC-H: |region|=5, |nation|=25,
    # |supplier|=SF*10k) — the broadcast side of the plan
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    asia_key = {
        r["r_regionkey"] for r in region.to_pylist() if r["r_name"] == "ASIA"
    }
    nat_rows = [r for r in nation.to_pylist() if r["n_regionkey"] in asia_key]
    asia_nations = np.array(sorted(r["n_nationkey"] for r in nat_rows), np.int64)
    nat_name = {r["n_nationkey"]: r["n_name"] for r in nat_rows}

    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sup_keys = supplier.column("s_suppkey").to_numpy()
    sup_nat = supplier.column("s_nationkey").to_numpy().astype(np.int64)
    order_ = np.argsort(sup_keys)
    sup_ref = ray.put((sup_keys[order_], sup_nat[order_]))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust_orders = cohash_join(
        orders,
        customer,
        "o_custkey",
        "c_custkey",
        map_joined=lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "c_nat": pc.cast(t.column("c_nationkey"), pa.int64()),
            }
        ),
    )

    line = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep_line(t: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        keys = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, keys)
        pos[pos >= len(sk)] = 0
        s_nat = np.where(sk[pos] == keys, sn[pos], -1)
        keep = np.isin(s_nat, asia_nations)  # local-ASIA suppliers only
        out = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "s_nat": pa.array(s_nat),
                "disc_cents": _cents(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(1.0, t.column("l_discount")),
                    )
                ),
            }
        )
        return out.filter(pa.array(keep))

    line_asia = line.map_batches(
        prep_line, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def local_revenue(t: pa.Table) -> pa.Table:
        # local-supplier condition + per-nation partial, inside the join task
        t = t.filter(pc.equal(t.column("c_nat"), t.column("s_nat")))
        g = t.group_by(["c_nat"]).aggregate([("disc_cents", "sum")])
        return g.rename_columns(["c_nat", "revenue_cents"])

    partials = cohash_join(
        cust_orders,
        line_asia,
        "o_orderkey",
        "l_orderkey",
        map_joined=local_revenue,
    )
    summed = bucketed_sum_combine(
        partials, ["c_nat"], ["revenue_cents"], num_buckets=1
    )

    def fin(t: pa.Table) -> pa.Table:
        names = [nat_name[k] for k in t.column("c_nat").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    return summed.map_batches(fin, batch_format="pyarrow", batch_size=None)


def _zorder_sql():
    from encode_ingest_ray.stages.zorder import zorder_oracle_sql

    return zorder_oracle_sql(
        "orders",
        "o_custkey",
        "epoch_us(o_orderdate) // 86400000000",
        ["o_orderkey"],
    )


@register("zorder_orders_layout", _zorder_sql())
def zorder_orders_layout(sf_dir: str):
    """Z-order clustering keys over (custkey, order day) — the lakehouse
    OPTIMIZE ZORDER primitive: a Morton-interleaved key + its partition
    prefix per row, so files written partitioned by `zpart` prune for
    range predicates on EITHER dimension (stages/zorder.py).  Pure
    vectorized bit arithmetic at the scan; no shuffle at all."""
    import pyarrow.compute as _pc

    from encode_ingest_ray.stages.zorder import zorder_keys

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "day": _pc.divide(
                    _pc.cast(t.column("o_orderdate"), pa.int64()), 86400000000
                ),
            }
        )

    pre = ds.map_batches(
        day, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return zorder_keys(pre, "o_custkey", "day", ["o_orderkey"])


UNPIVOT_SQL = """
WITH p AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
         COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
         COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
         COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
  FROM events GROUP BY user_id
)
SELECT user_id, event_type, CAST(n AS BIGINT) AS n FROM p
UNPIVOT (n FOR event_type IN (
  n_click AS 'click', n_error AS 'error', n_purchase AS 'purchase',
  n_signup AS 'signup', n_view AS 'view'))
"""


@register("unpivot_event_counts", UNPIVOT_SQL)
def unpivot_event_counts(sf_dir: str):
    """UNPIVOT: the pivoted per-user count matrix melted back to
    (user_id, event_type, n) long form — zero rows included, proving the
    reshape family round-trips.  The melt itself is block-local column
    slicing (stages/explode.melt_table, no exchange); the only exchange is
    the pivot's own."""
    from encode_ingest_ray.stages.explode import melt_table

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    wide = pivot_count_columns(ds, "user_id", "event_type", EVENT_TYPES)
    value_cols = {f"n_{e}": e for e in EVENT_TYPES}
    return wide.map_batches(
        lambda t: melt_table(t, ["user_id"], value_cols, "event_type", "n"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       epoch_us(o_orderdate) AS o_date_us,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_date_us, o_orderpriority
ORDER BY revenue_cents DESC, o_date_us, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_SQL)
def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the join→aggregate→global-ordered-top-k plan:
    both date predicates and the segment filter push into the parquet
    reads (only qualifying row groups decode), the two fact joins each pay
    one co-hashed exchange, the revenue aggregation completes INSIDE the
    second join task (orderkey is the bucket key, so groups never split),
    and each bucket forwards only its local ordered top-10 to the final
    reduce — the global sort touches num_buckets×10 rows, not the
    aggregate."""
    import datetime
    import os

    import pyarrow.dataset as pads
    import ray.data

    from encode_ingest_ray.stages.joins import cohash_join

    cutoff = datetime.datetime(1998, 6, 1)

    # size-aware block counts (the M10/filtered-read pattern): without
    # override_num_blocks Ray splits the filtered read into 64 tiny blocks
    # and both joins inherit a 64-bucket exchange of near-empty groups
    # (measured 9.9 s -> 1.5 s at sf0.01)
    def _blocks(name: str) -> int:
        sz = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
        return max(1, min(64, sz // (8 << 20)))

    customer = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey"],
        filter=(pads.field("c_mktsegment") == "BUILDING"),
        override_num_blocks=_blocks("customer"),
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") < cutoff),
        override_num_blocks=_blocks("orders"),
    )
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") > cutoff),
        override_num_blocks=_blocks("lineitem"),
    )
    num_buckets = max(2, _blocks("lineitem"))

    cust_orders = cohash_join(
        orders,
        customer,
        "o_custkey",
        "c_custkey",
        num_buckets=num_buckets,
        map_joined=lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_date_us": pc.cast(t.column("o_orderdate"), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
    )

    def agg_topk(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(1.0, t.column("l_discount")),
            )
        )
        t2 = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_date_us": t.column("o_date_us"),
                "o_orderpriority": t.column("o_orderpriority"),
                "rev": rev,
            }
        )
        g = t2.group_by(["l_orderkey", "o_date_us", "o_orderpriority"]).aggregate(
            [("rev", "sum")]
        )
        g = g.rename_columns(
            ["l_orderkey", "o_date_us", "o_orderpriority", "revenue_cents"]
        )
        g = g.sort_by(
            [
                ("revenue_cents", "descending"),
                ("o_date_us", "ascending"),
                ("l_orderkey", "ascending"),
            ]
        ).slice(0, 10)
        return g.select(
            ["l_orderkey", "revenue_cents", "o_date_us", "o_orderpriority"]
        )

    joined = cohash_join(
        line, cust_orders, "l_orderkey", "o_orderkey",
        num_buckets=num_buckets, map_joined=agg_topk,
    )
    return joined.sort(
        ["revenue_cents", "o_date_us", "l_orderkey"],
        descending=[True, False, False],
    ).limit(10)


# ---------------------------------------------------------------------------
# MERGE INTO — conditional matched/not-matched actions (stages/merge.py)
# ---------------------------------------------------------------------------

MERGE_SQL = """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
),
ch AS (
  SELECT o_orderkey AS key, 'delete' AS action, CAST(NULL AS BIGINT) AS new_val
  FROM t WHERE o_orderkey % 11 = 3
  UNION ALL
  SELECT o_orderkey, 'update', price_cents + price_cents // 10
  FROM t WHERE o_orderkey % 11 <> 3 AND o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'insert', price_cents + 500
  FROM t WHERE o_orderkey % 13 = 5
)
SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
       CASE WHEN ch.action = 'update' THEN ch.new_val
            ELSE t.price_cents END AS price_cents
FROM t LEFT JOIN ch ON t.o_orderkey = ch.key
WHERE ch.action IS NULL OR ch.action <> 'delete'
UNION ALL
SELECT ch.key, NULL, NULL, ch.new_val
FROM ch LEFT JOIN t ON ch.key = t.o_orderkey
WHERE ch.action = 'insert' AND t.o_orderkey IS NULL
"""


@register("merge_into_orders", MERGE_SQL)
def merge_into_orders(sf_dir: str):
    """SQL:2003 MERGE: a deterministic change set (delete every key = 3 mod
    11; +10% price update on the remaining multiples of 7; brand-new keys
    inserted at +10M for keys = 5 mod 13) applied onto ``orders`` in one key
    exchange with per-bucket Arrow joins — the general conditional-action
    sibling of the CDC engine's fixed LWW upsert.  Mod/div arithmetic stays
    on non-negative ints so DuckDB's truncating ``//`` equals numpy floor
    division."""
    from encode_ingest_ray.stages.merge import merge_into

    def to_target(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_orderstatus": t.column("o_orderstatus"),
                "price_cents": _cents(t.column("o_totalprice")),
            }
        )

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    target = _read(sf_dir, "orders", cols).map_batches(
        to_target, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def to_changes(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").combine_chunks()
        price = _cents(t.column("o_totalprice")).combine_chunks()
        # integer mod via divide-multiply (pc has no modulo kernel)
        mod11 = pc.subtract(k, pc.multiply(pc.divide(k, 11), 11))
        mod7 = pc.subtract(k, pc.multiply(pc.divide(k, 7), 7))
        mod13 = pc.subtract(k, pc.multiply(pc.divide(k, 13), 13))
        is_del = pc.equal(mod11, 3)
        is_upd = pc.and_(pc.not_equal(mod11, 3), pc.equal(mod7, 0))
        is_ins = pc.equal(mod13, 5)
        dels = pa.table(
            {
                "o_orderkey": k.filter(is_del),
                "action": pa.array(["delete"] * pc.sum(pc.cast(is_del, pa.int64())).as_py()),
                "new_val": pa.nulls(pc.sum(pc.cast(is_del, pa.int64())).as_py(), pa.int64()),
            }
        )
        pu = price.filter(is_upd)
        upds = pa.table(
            {
                "o_orderkey": k.filter(is_upd),
                "action": pa.array(["update"] * len(pu)),
                "new_val": pc.add(pu, pc.divide(pu, 10)),
            }
        )
        pi = price.filter(is_ins)
        inss = pa.table(
            {
                "o_orderkey": pc.add(k.filter(is_ins), 10_000_000),
                "action": pa.array(["insert"] * len(pi)),
                "new_val": pc.add(pi, 500),
            }
        )
        return pa.concat_tables([dels, upds, inss])

    changes = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        to_changes, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return merge_into(
        target,
        changes,
        key="o_orderkey",
        payload_cols=["o_custkey", "o_orderstatus", "price_cents"],
        set_col="price_cents",
        new_val_col="new_val",
    )


# ---------------------------------------------------------------------------
# Composed star-schema flagship: weekly revenue report per region
# ---------------------------------------------------------------------------

WAREHOUSE_SQL = """
WITH fact AS (
  SELECT r.r_name AS region,
         epoch_us(o.o_orderdate) // 604800000000 AS wk,
         o.o_custkey AS custkey,
         l.l_partkey AS partkey,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
),
agg AS (
  SELECT region, wk,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_customers
  FROM fact GROUP BY region, wk
),
per_part AS (
  SELECT region, wk, partkey, CAST(SUM(cents) AS BIGINT) AS pc
  FROM fact GROUP BY region, wk, partkey
),
top_part AS (
  SELECT region, wk, partkey AS top_partkey FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY region, wk ORDER BY pc DESC, partkey) AS rn
    FROM per_part
  ) WHERE rn = 1
)
SELECT a.region, a.wk, a.revenue_cents, a.n_items, a.n_customers,
       t.top_partkey
FROM agg a JOIN top_part t USING (region, wk)
"""


@register("warehouse_weekly_report", WAREHOUSE_SQL)
def warehouse_weekly_report(sf_dir: str):
    """Composed star-schema report — the relational flagship the way
    corpus_prep is the LLM-prep flagship: per (region, order-week) the
    revenue, item count, DISTINCT customer count and top part by revenue.
    Plan shape at 100 TB: the three true dimensions (customer→nation→
    region) fold driver-side into ONE int-keyed lookup and broadcast once;
    lineitem⋈orders pays the single co-hashed fact exchange with the
    region/week/part columns attached in-task; the three aggregates
    (sums, distinct-customer presence partials, per-part argmax) all ride
    per-block combiners into ONE bucketed exchange keyed (region, wk) —
    a final in-bucket pass computes the distinct count and the top part,
    so only partial rows ever shuffle."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from encode_ingest_ray.pipelines.analogs import _cents, _read
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
    from encode_ingest_ray.stages.joins import cohash_join

    # dims: customer -> region name (driver-side fold of tiny tables;
    # |customer| = 150k/SF — broadcast as int arrays, not Python dicts)
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    # nation/region are O(25)/O(5) rows — fold them into dense positional
    # take-arrays so the customer-scale mapping below is ONE vectorized
    # double-take (no Python loop over the 150k/SF-row customer dim; the
    # old list-comprehension fold was the driver-side hot spot at SF100).
    nk = nation.column("n_nationkey").to_numpy()
    reg_of_nat_arr = np.zeros(int(nk.max()) + 1, dtype=np.int64)
    reg_of_nat_arr[nk] = nation.column("n_regionkey").to_numpy()
    rk = region.column("r_regionkey").to_numpy()
    name_of_reg_arr = np.empty(int(rk.max()) + 1, dtype=object)
    name_of_reg_arr[rk] = region.column("r_name").to_numpy(zero_copy_only=False)
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy()
    order_ck = np.argsort(ck)
    cust_sorted = ck[order_ck]
    regname_sorted = name_of_reg_arr[reg_of_nat_arr[cn[order_ck]]]
    lookup = ray.put((cust_sorted, regname_sorted))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64())
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "custkey": t.column("o_custkey"),
                "wk": pc.divide(us, 604800000000),
            }
        )

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "partkey": t.column("l_partkey"),
                "cents": _cents(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(1.0, t.column("l_discount")),
                    )
                ),
            }
        )

    def attach_region(t: pa.Table) -> pa.Table:
        cs, rs = ray.get(lookup)
        k = t.column("custkey").combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cs, k)
        return t.append_column("region", pa.array(rs[pos]))

    # ONE fact exchange: lineitem ⋈ orders on orderkey; region attached and
    # (region, wk, custkey, partkey) partials pre-combined inside the task
    def partials(t: pa.Table) -> pa.Table:
        t = attach_region(t)
        g = (
            t.select(["region", "wk", "custkey", "partkey", "cents"])
            .group_by(["region", "wk", "custkey", "partkey"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["region", "wk", "custkey", "partkey", "cents", "n"])

    joined = cohash_join(
        line.map_batches(l_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        orders.map_batches(o_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "l_orderkey", "o_orderkey",
        map_joined=partials,
    )

    def report(t: pa.Table) -> pa.Table:
        g = t.group_by(["region", "wk", "custkey", "partkey"]).aggregate(
            [("cents", "sum"), ("n", "sum")]
        )
        g = g.rename_columns(["region", "wk", "custkey", "partkey", "cents", "n"])
        idx = pc.sort_indices(
            g, sort_keys=[("region", "ascending"), ("wk", "ascending")]
        )
        g = g.take(idx)
        reg = g.column("region").combine_chunks()
        codes = reg.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        wk = g.column("wk").combine_chunks().to_numpy(zero_copy_only=False)
        n = g.num_rows
        starts = np.flatnonzero(
            np.r_[True, (codes[1:] != codes[:-1]) | (wk[1:] != wk[:-1])]
        )
        bounds = np.r_[starts, n]
        cents = g.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        cnt = g.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        custk = g.column("custkey").combine_chunks().to_numpy(zero_copy_only=False)
        partk = g.column("partkey").combine_chunks().to_numpy(zero_copy_only=False)
        out = {"region": [], "wk": [], "revenue_cents": [], "n_items": [],
               "n_customers": [], "top_partkey": []}
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            out["region"].append(reg[int(lo)].as_py())
            out["wk"].append(int(wk[lo]))
            out["revenue_cents"].append(int(cents[lo:hi].sum()))
            out["n_items"].append(int(cnt[lo:hi].sum()))
            out["n_customers"].append(int(np.unique(custk[lo:hi]).size))
            # top part: sum cents per part, argmax with min-partkey tiebreak
            pk = partk[lo:hi]
            o = np.argsort(pk, kind="stable")
            pks, cs = pk[o], cents[lo:hi][o]
            ps = np.flatnonzero(np.r_[True, pks[1:] != pks[:-1]])
            sums = np.add.reduceat(cs, ps)
            cand = pks[ps]
            best = np.lexsort((cand, -sums))[0]
            out["top_partkey"].append(int(cand[best]))
        return pa.table(
            {
                "region": pa.array(out["region"], pa.string()),
                "wk": pa.array(out["wk"], pa.int64()),
                "revenue_cents": pa.array(out["revenue_cents"], pa.int64()),
                "n_items": pa.array(out["n_items"], pa.int64()),
                "n_customers": pa.array(out["n_customers"], pa.int64()),
                "top_partkey": pa.array(out["top_partkey"], pa.int64()),
            }
        )

    return bucketed_groupby_apply(joined, ["region", "wk"], report)


# ---------------------------------------------------------------------------
# TPC-H Q18: large-volume customers (group-HAVING semi-join into two joins)
# ---------------------------------------------------------------------------

Q18_SQL = """
WITH heavy AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 250
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       epoch_us(o.o_orderdate) AS o_date_us,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents,
       h.sum_qty
FROM heavy h
JOIN orders o ON o.o_orderkey = h.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("q18_large_volume", Q18_SQL)
def q18_large_volume(sf_dir: str):
    """TPC-H Q18 shape — aggregate-then-HAVING as a semi-join driver:
    per-block partial quantity sums combine in ONE orderkey-bucketed
    exchange (``bucketed_sum_combine`` — the full lineitem never
    re-shuffles), the >250 filter leaves only the heavy orderkeys, and
    those drive two co-hashed joins (orders, then customer) whose left
    side is already tiny.  Quantities are integral doubles → ROUND+BIGINT
    keeps the HAVING boundary exact at any scale.  The threshold is
    sf-invariant (lines-per-order and per-line quantity don't grow with
    sf), so the result stays non-empty from sf0.001 up."""
    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine
    from encode_ingest_ray.stages.joins import cohash_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(
            pc.round(t.column("l_quantity"), 0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        g = pa.table({"l_orderkey": t.column("l_orderkey"), "sum_qty": q})
        g = g.group_by(["l_orderkey"]).aggregate([("sum_qty", "sum")])
        return g.rename_columns(["l_orderkey", "sum_qty"])

    partials = line.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    heavy = bucketed_sum_combine(partials, ["l_orderkey"], ["sum_qty"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("sum_qty"), 250)),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    heavy_orders = cohash_join(
        heavy,
        orders,
        "l_orderkey",
        "o_orderkey",
        # pyarrow's inner join emits the LEFT key column only
        map_joined=lambda t: pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_date_us": pc.cast(t.column("o_orderdate"), pa.int64()),
                "price_cents": _cents(t.column("o_totalprice")),
                "sum_qty": t.column("sum_qty"),
            }
        ),
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return cohash_join(
        heavy_orders,
        customer,
        "o_custkey",
        "c_custkey",
        map_joined=lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "o_orderkey": t.column("o_orderkey"),
                "o_date_us": t.column("o_date_us"),
                "price_cents": t.column("price_cents"),
                "sum_qty": t.column("sum_qty"),
            }
        ),
    )
