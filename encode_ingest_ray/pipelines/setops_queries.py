"""Set-operation and distributed-moment queries.

INTERSECT / EXCEPT round out the dedup/distinct family (SURVEY.md §2.7):
both reduce to per-key presence flags OR-combined before one exchange
(stages/setops.py).  ``grouped_moments`` is the textbook distributed
variance shape — (n, Σx, Σx²) integer partials that merge associatively;
the float stddev is one driver-side expression away, while the partials
themselves are bit-exact against SQL.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.aggregate import partial_groupby_sum
from encode_ingest_ray.stages.setops import presence_flags

INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""

EXCEPT_SQL = """
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
"""


def _click_purchase_flags(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "in_click": pc.cast(
                    pc.fill_null(pc.equal(et, "click"), False), pa.int64()
                ),
                "in_purchase": pc.cast(
                    pc.fill_null(pc.equal(et, "purchase"), False), pa.int64()
                ),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return presence_flags(pre, ["user_id"], ["in_click", "in_purchase"])


@register("intersect_users", INTERSECT_SQL)
def intersect_users(sf_dir: str):
    """INTERSECT: users who clicked AND purchased.  Per-block presence-flag
    partials, one exchange, filter both flags — raw rows never shuffle."""
    flags = _click_purchase_flags(sf_dir)

    def fin(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("in_click"), 1), pc.equal(t.column("in_purchase"), 1)
        )
        return t.filter(keep).select(["user_id"])

    return flags.map_batches(fin, batch_format="pyarrow", batch_size=None)


@register("except_urgent_unreturned", EXCEPT_SQL)
def except_urgent_unreturned(sf_dir: str):
    """Cross-table EXCEPT: urgent orders with no returned lineitem.  Each
    side is filtered AT THE READ, projected to (key, flag) and unioned; the
    presence-flag kernel then pays one exchange over distinct-key partials —
    the classic way a multi-source set difference stays shuffle-light."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def prep_a(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
        n = t.num_rows
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "in_a": pa.array([1] * n, pa.int64()),
                "in_b": pa.array([0] * n, pa.int64()),
            }
        )

    def prep_b(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        n = t.num_rows
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "in_a": pa.array([0] * n, pa.int64()),
                "in_b": pa.array([1] * n, pa.int64()),
            }
        )

    both = orders.map_batches(
        prep_a, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        line.map_batches(
            prep_b, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )
    flags = presence_flags(both, ["o_orderkey"], ["in_a", "in_b"])

    def fin(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("in_a"), 1), pc.equal(t.column("in_b"), 0)
        )
        return t.filter(keep).select(["o_orderkey"])

    return flags.map_batches(fin, batch_format="pyarrow", batch_size=None)


MOMENTS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
       CAST(SUM(bal_cents * bal_cents) AS BIGINT) AS sumsq_cents2
FROM (
  SELECT c_mktsegment, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
)
GROUP BY c_mktsegment
"""


@register("grouped_moments", MOMENTS_SQL)
def grouped_moments(sf_dir: str):
    """Distributed second-moment partials per market segment: (n, Σcents,
    Σcents²) merge associatively across blocks — the shape every mean /
    variance / stddev at scale reduces to.  Integer partials are bit-exact;
    stddev = sqrt((Σx² - Σx²/n)/n) is a trivial driver-side epilogue.

    Overflow bound (documented contract): Σx² stays under 2^63 up to ~9e18
    cents² — with |acctbal| ≤ ~1e4 dollars that is ~9×10^6 rows per GROUP at
    full precision; shift to milli-dollar units or split groups by salt
    beyond that.
    """
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal"))
        return pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "bal_cents": cents,
                "sq": pc.multiply_checked(cents, cents),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return partial_groupby_sum(
        pre,
        ["c_mktsegment"],
        {"sum_cents": "bal_cents", "sumsq_cents2": "sq"},
        count_alias="n",
    )


BLOOM_SEMI_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@register("bloom_semi_join_urgent", BLOOM_SEMI_SQL)
def bloom_semi_join_urgent(sf_dir: str):
    """Semi-join at beyond-broadcast scale: lineitems of urgent orders via
    a distributed-built Bloom filter (per-block partials OR-merged, ~100x
    smaller than the exact key set) broadcast to prune the scan, then ONE
    co-hashed exchange over only the survivors erases the false positives
    (stages/bloomjoin.py).  Exact despite the sketch — the Bloom never
    drops a match and the verify never keeps a non-match."""
    from encode_ingest_ray.stages.bloomjoin import bloom_semi_join

    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": pc.cast(t.column("l_linenumber"), pa.int32()),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )

    big = line.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.equal(t.column("o_orderpriority"), "1-URGENT")
        ).select(["o_orderkey"])

    keys = orders.map_batches(
        urgent, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    n_keys = max(1024, keys.count())
    return bloom_semi_join(
        big, "l_orderkey", keys, "o_orderkey", capacity=n_keys, fp_rate=0.01
    )


FUZZY_SQL = """
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
"""


@register("fuzzy_name_pairs", FUZZY_SQL)
def fuzzy_name_pairs(sf_dir: str):
    """Fuzzy join: same-nation customer pairs whose names are within edit
    distance 1.  Deletion-neighborhood blocking (stages/fuzzyjoin.py):
    each name emits |s|+1 int64 variant hashes, one exchange groups equal
    variants, run-scan pair-gen, exact distance verify erases collisions —
    never the O(n²) distance matrix the oracle evaluates."""
    from encode_ingest_ray.stages.fuzzyjoin import edit1_pairs

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    pairs = edit1_pairs(cust, "c_custkey", "c_name", "c_nationkey")
    return pairs.map_batches(
        lambda t: t.rename_columns(["cust_a", "cust_b"]),
        batch_format="pyarrow",
        batch_size=None,
    )
