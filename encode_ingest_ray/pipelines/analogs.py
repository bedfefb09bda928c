"""Reference-operator analogs over the driver testdata (SURVEY.md §2.2-2.7).

Each query is the Ray-Data expression of one reference operator family, with
an exact DuckDB oracle.  Aggregates over monetary doubles are encoded as
integer cents (ROUND half-away, then BIGINT sum) so results are bit-stable
under any summation order — float sums are order-dependent and would break
the driver's value-hash.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.dedup import dedup_exact, distinct_values
from encode_ingest_ray.stages.explode import explode_list
from encode_ingest_ray.stages.joins import broadcast_join, cohash_join, semi_join_filter
from encode_ingest_ray.stages.normalize import (
    dict_lookup,
    extract_id,
    json_int_field,
    parse_age_bounds,
    parse_paired_end,
    remove_unknowns,
    url_prefix,
)


def _read(sf_dir: str, table: str, columns=None):
    """Query-table read with size-aware parallelism: Ray's default heuristic
    targets 2 blocks per cpu, which shreds a single small parquet file into
    64+ tiny blocks and makes every later bucketed exchange pay ~50ms of
    per-block scheduling (measured 9s of a 15k-row join).  Target ~8MB per
    block instead, bounded to [1, 64]."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    blocks = max(1, min(64, os.path.getsize(path) // (8 << 20)))
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=blocks)


def _cents(expr_col):
    """double → integer cents, half-away rounding (matches DuckDB ROUND)."""
    return pc.cast(
        pc.round(pc.multiply(expr_col, 100.0), 0, round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------------------
# M1 removeUnknowns
# ---------------------------------------------------------------------------
@register(
    "normalize_unknowns",
    """SELECT doc_id, NULLIF(lang, 'unknown') AS lang_norm,
              NULLIF(source, 'unknown') AS source_norm
       FROM documents""",
)
def normalize_unknowns(sf_dir: str):
    """removeUnknowns (M1): strip the literal 'unknown'/'Unknown' sentinels to null, vectorized."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def fn(t: pa.Table) -> pa.Table:
        t = remove_unknowns(t)
        return t.rename_columns(["doc_id", "lang_norm", "source_norm"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M2 transformId (regex id extraction)
# ---------------------------------------------------------------------------
@register(
    "extract_id",
    "SELECT doc_id, regexp_extract(source, 'src([0-9]+)', 1) AS src_num FROM documents",
)
def extract_id_q(sf_dir: str):
    """transformId/readId (M2): regex-extract the trailing id segment from reference URLs."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return ds.map_batches(
        lambda t: extract_id(t, "source", "src_num", r"src(?P<id>[0-9]+)").drop_columns(
            ["source"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M3 convertToEncodeUrl
# ---------------------------------------------------------------------------
@register(
    "url_prefix",
    """SELECT doc_id, 'https://www.encodeproject.org/' || source AS url FROM documents""",
)
def url_prefix_q(sf_dir: str):
    """convertToEncodeUrl (M3): prefix relative ids into absolute URLs, vectorized concat."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return ds.map_batches(
        lambda t: url_prefix(t, "source", "url", "https://www.encodeproject.org/").drop_columns(
            ["source"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M4 computeAgeLowerAndUpperbounds — synthesize the reference's age-string
# shapes deterministically from events, then parse with the real operator
# ---------------------------------------------------------------------------
@register(
    "age_bounds",
    """WITH aged AS (
         SELECT event_id,
                CASE event_id % 3
                  WHEN 0 THEN CAST(user_id % 90 AS VARCHAR) || '-' || CAST(user_id % 90 + 3 AS VARCHAR)
                  WHEN 1 THEN CAST(user_id % 90 AS VARCHAR)
                  ELSE CAST(user_id % 90 AS VARCHAR) || ' or above'
                END AS age
         FROM events)
       SELECT event_id,
              CAST(user_id % 90 AS DOUBLE) AS age_lower,
              CASE event_id % 3
                WHEN 0 THEN CAST(user_id % 90 + 3 AS DOUBLE)
                WHEN 1 THEN CAST(user_id % 90 AS DOUBLE)
                ELSE NULL END AS age_upper
       FROM events""",
)
def age_bounds_q(sf_dir: str):
    """Age-bounds parse (M4): split 'N-M'/'N' age strings into numeric lower/upper bounds."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid, uid = t.column("event_id"), t.column("user_id")
        base = pc.cast(pc.subtract(uid, pc.multiply(pc.divide(uid, 90), 90)), pa.string())
        upper = pc.cast(
            pc.add(pc.subtract(uid, pc.multiply(pc.divide(uid, 90), 90)), 3), pa.string()
        )
        emod = pc.subtract(eid, pc.multiply(pc.divide(eid, 3), 3))
        age = pc.if_else(
            pc.equal(emod, 0),
            pc.binary_join_element_wise(base, upper, "-"),
            pc.if_else(
                pc.equal(emod, 1), base, pc.binary_join_element_wise(base, " or above", "")
            ),
        )
        t2 = pa.table({"event_id": eid, "age": age})
        return parse_age_bounds(t2, "age").drop_columns(["age"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M5 summarizeAudits (level→color), raw JSON field read
# ---------------------------------------------------------------------------
@register(
    "audit_color",
    """SELECT event_id,
              CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS level,
              CASE WHEN CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) >= 60 THEN 'red'
                   WHEN CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) >= 50 THEN 'orange'
                   WHEN CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) >= 40 THEN 'yellow'
                   ELSE 'white' END AS audit_color
       FROM events""",
)
def audit_color_q(sf_dir: str):
    """Audit max-level -> color mapping (M5 slice), dictionary-encoded case-when."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        t = json_int_field(t, "props", "k", "level")
        lvl = t.column("level")
        color = pc.if_else(
            pc.greater_equal(lvl, 60),
            "red",
            pc.if_else(
                pc.greater_equal(lvl, 50),
                "orange",
                pc.if_else(pc.greater_equal(lvl, 40), "yellow", "white"),
            ),
        )
        return pa.table(
            {"event_id": t.column("event_id"), "level": lvl, "audit_color": color}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M6 assay-term → data-modality dict lookup with '!' sentinel
# ---------------------------------------------------------------------------
_MODALITY = {
    "click": "engagement",
    "view": "engagement",
    "purchase": "conversion",
    "signup": "conversion",
}


@register(
    "lookup_modality",
    """SELECT event_id,
              CASE event_type
                WHEN 'click' THEN 'engagement'
                WHEN 'view' THEN 'engagement'
                WHEN 'purchase' THEN 'conversion'
                WHEN 'signup' THEN 'conversion'
                ELSE '!' || event_type END AS modality
       FROM events""",
)
def lookup_modality_q(sf_dir: str):
    """Assay-term -> modality dictionary lookup (M6) with the '!' unknown sentinel."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    return ds.map_batches(
        lambda t: dict_lookup(t, "event_type", "modality", _MODALITY).drop_columns(
            ["event_type"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M7/M8 case-when + paired-end parser
# ---------------------------------------------------------------------------
@register(
    "paired_end_parse",
    """SELECT event_id,
              CASE user_id % 4 WHEN 0 THEN '1' WHEN 1 THEN '2'
                               WHEN 2 THEN '1,2' ELSE 'x' END AS paired_end,
              CASE user_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE NULL END AS paired_end_int
       FROM events""",
)
def paired_end_q(sf_dir: str):
    """Paired-end flag parse (M7/M8): case-when over string codes to boolean + run type."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def fn(t: pa.Table) -> pa.Table:
        umod = pc.subtract(
            t.column("user_id"), pc.multiply(pc.divide(t.column("user_id"), 4), 4)
        )
        pe = pc.if_else(
            pc.equal(umod, 0),
            "1",
            pc.if_else(pc.equal(umod, 1), "2", pc.if_else(pc.equal(umod, 2), "1,2", "x")),
        )
        t2 = pa.table({"event_id": t.column("event_id"), "paired_end": pe})
        return parse_paired_end(t2, "paired_end", "paired_end_int")

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M10 pushed-down filter + projection (+ computed revenue)
# ---------------------------------------------------------------------------
@register(
    "filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity,
              CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_cents
       FROM lineitem
       WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_discount > 0.02""",
)
def filter_project(sf_dir: str):
    """Filter + projection with the predicate PUSHED INTO the Parquet scan (M10) — only matching row groups decode."""
    import datetime

    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        # row-group/pushdown filter at the read (prune before any compute)
        filter=(pads.field("l_shipdate") < datetime.datetime(1995, 6, 1))
        & (pads.field("l_discount") > 0.02),
    )

    def fn(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "l_quantity": t.column("l_quantity"),
                "revenue_cents": rev,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# A1 grouped aggregate (TPC-H Q1 shape, integer-exact)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
              CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape (A1/A2): per-block combiner pre-aggregation, integer cents encodings, tiny global groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(
                t.column("l_shipdate"), pa.scalar("1998-09-02").cast(pa.timestamp("us"))
            )
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "base_cents": _cents(t.column("l_extendedprice")),
                "disc_cents": _cents(
                    pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))
                ),
            }
        )

    from encode_ingest_ray.stages.aggregate import partial_groupby_sum

    pre = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return partial_groupby_sum(
        pre,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": "qty", "sum_base_cents": "base_cents", "sum_disc_cents": "disc_cents"},
        count_alias="count_order",
    )


# ---------------------------------------------------------------------------
# §2.6 global sort + limit (top-k)
# ---------------------------------------------------------------------------
@register(
    "topk_orders",
    """SELECT o_orderkey, o_custkey,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def topk_orders(sf_dir: str):
    """Global top-k by value (§2.6): Dataset.sort + limit, deterministic tie-break."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "totalprice_cents": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# D2 distinctBy — deterministic first event per user
# ---------------------------------------------------------------------------
@register(
    "dedup_first_event",
    """SELECT user_id, event_id AS first_event_id, event_type
       FROM events
       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1""",
)
def dedup_first_event(sf_dir: str):
    """distinctBy key (D2): deterministic first-event winner via combiner + one bucketed exchange."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    out = dedup_exact(ds, ["user_id"], ["ts", "event_id"], keep_max=False)
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "first_event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
            }
        ),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# distinct values (keyed distinct streams)
# ---------------------------------------------------------------------------
@register("distinct_event_types", "SELECT DISTINCT event_type FROM events")
def distinct_event_types(sf_dir: str):
    """Distinct values of one column (D3): per-block unique -> one bucketed exchange."""
    return distinct_values(_read(sf_dir, "events", ["event_type"]), "event_type")


# ---------------------------------------------------------------------------
# M11 FK-unnest explode (list column with ordinality)
# ---------------------------------------------------------------------------
@register(
    "explode_embeddings",
    """SELECT vec_id,
              UNNEST(range(len(embedding)))  AS pos,
              UNNEST(embedding)              AS val
       FROM embeddings WHERE vec_id < 100""",
)
def explode_embeddings(sf_dir: str):
    """FK-unnest explode (M11): one output row per list element, vectorized ListArray flatten."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), 100)),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    return ds.map_batches(
        lambda t: explode_list(t, "embedding", value_out="val", index_out="pos").select(
            ["vec_id", "pos", "val"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M12/D1 stream split + tagged union
# ---------------------------------------------------------------------------
@register(
    "split_streams",
    """SELECT event_id, 'high' AS band FROM events WHERE value >= 10
       UNION ALL
       SELECT event_id, 'low'  AS band FROM events WHERE value < 10""",
)
def split_streams(sf_dir: str):
    """Stream split by predicate (M12/D1): one input scan fanned into tagged substreams."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    hi = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.filter(pc.greater_equal(t.column("value"), 10.0)).column("event_id"),
            }
        ).append_column("band", pa.array(["high"] * len(t.filter(pc.greater_equal(t.column("value"), 10.0))))),
        batch_format="pyarrow", batch_size=None)
    lo = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.filter(pc.less(t.column("value"), 10.0)).column("event_id"),
            }
        ).append_column("band", pa.array(["low"] * len(t.filter(pc.less(t.column("value"), 10.0))))),
        batch_format="pyarrow", batch_size=None)
    return hi.union(lo)


# ---------------------------------------------------------------------------
# J1/J4 broadcast dimension joins (customer ⟕ nation ⟕ region)
# ---------------------------------------------------------------------------
@register(
    "join_broadcast_dims",
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
              CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
       FROM customer JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name""",
)
def join_broadcast_dims(sf_dir: str):
    """Broadcast dimension join (J1/J4/J8): ray.put the small side once, probe per batch — no shuffle."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    ds = broadcast_join(ds, nation, "c_nationkey", "n_nationkey", how="inner")
    ds = broadcast_join(ds, region, "n_regionkey", "r_regionkey", how="inner")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": t.column("r_name"),
                "n_name": t.column("n_name"),
                "acctbal_cents": _cents(t.column("c_acctbal")),
            }
        )

    from encode_ingest_ray.stages.aggregate import partial_groupby_sum

    pre = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return partial_groupby_sum(
        pre, ["r_name", "n_name"], {"acctbal_cents": "acctbal_cents"}, count_alias="n_customers"
    ).map_batches(
        lambda t: t.select(["r_name", "n_name", "n_customers", "acctbal_cents"]),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# J12-style large-large co-hash join (orders ⋈ lineitem)
# ---------------------------------------------------------------------------
@register(
    "join_cohash",
    """SELECT o_orderpriority, COUNT(*) AS n_items,
              CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY o_orderpriority""",
)
def join_cohash(sf_dir: str):
    """Broadcast-or-cohash join (J5): both sides bucketed by key hash, pa C++ join per bucket, partial agg inside the join task."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        # per-bucket partial INSIDE the join task: only (priority, count,
        # cents) partials leave the bucket, not the full join result
        t = pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )
        return t.group_by("o_orderpriority").aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        ).rename_columns(["o_orderpriority", "price_cents", "n_items"])

    joined = cohash_join(
        orders, items, "o_orderkey", "l_orderkey", num_buckets=32, map_joined=prep
    )

    from encode_ingest_ray.stages.aggregate import partial_groupby_sum

    return partial_groupby_sum(
        joined,
        ["o_orderpriority"],
        {"price_cents": "price_cents", "n_items": "n_items"},
    ).map_batches(
        lambda t: t.select(["o_orderpriority", "n_items", "price_cents"]),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# J12 semi-join filter (broadcast key set)
# ---------------------------------------------------------------------------
@register(
    "join_semi",
    """SELECT l_partkey, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
       GROUP BY l_partkey""",
)
def join_semi(sf_dir: str):
    """Broadcast semi-join filter (J12): keep rows whose key exists in the broadcast side."""
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"])
    keys = part.filter(pc.greater(part.column("p_size"), 40)).column("p_partkey")
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    ds = semi_join_filter(ds, keys.combine_chunks(), "l_partkey")
    ds = ds.map_batches(
        lambda t: pa.table(
            {"l_partkey": t.column("l_partkey"), "qty": pc.cast(t.column("l_quantity"), pa.int64())}
        ),
        batch_format="pyarrow", batch_size=None)
    from encode_ingest_ray.stages.aggregate import partial_groupby_sum

    return partial_groupby_sum(
        ds, ["l_partkey"], {"sum_qty": "qty"}, count_alias="n"
    ).map_batches(lambda t: t.select(["l_partkey", "n", "sum_qty"]), batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# A3 deterministic sorted-list collect per group
# ---------------------------------------------------------------------------
@register(
    "collect_sorted_parts",
    """SELECT l_orderkey,
              string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS parts_csv
       FROM lineitem WHERE l_orderkey % 97 = 0
       GROUP BY l_orderkey""",
)
def collect_sorted_parts(sf_dir: str):
    """Sorted-list collect per group (A3): vectorized ListArray build + binary_join."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.equal(pc.subtract(t.column("l_orderkey"), pc.multiply(pc.divide(t.column("l_orderkey"), 97), 97)), 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)

    def collect_bucket(t: pa.Table) -> pa.Table:
        # vectorized per bucket: sort (order, part), run boundaries, one
        # ListArray + binary_join — no per-key tasks or Python loops
        import numpy as np

        from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply  # noqa: F401

        idx = pc.sort_indices(
            t, sort_keys=[("l_orderkey", "ascending"), ("l_partkey", "ascending")]
        )
        g = t.take(idx)
        ok = g.column("l_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        offsets = pa.array(np.r_[starts, g.num_rows].astype(np.int32))
        parts_str = pc.cast(g.column("l_partkey").combine_chunks(), pa.string())
        lists = pa.ListArray.from_arrays(offsets, parts_str)
        return pa.table(
            {
                "l_orderkey": pa.array(ok[starts], pa.int64()),
                "parts_csv": pc.binary_join(lists, ","),
            }
        )

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    return bucketed_groupby_apply(ds, ["l_orderkey"], collect_bucket)


# ---------------------------------------------------------------------------
# A4 cardinality validation per group
# ---------------------------------------------------------------------------
@register(
    "cardinality_check",
    """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
              COUNT(DISTINCT l_suppkey) > 1 AS multi
       FROM lineitem GROUP BY l_orderkey""",
)
def cardinality_check(sf_dir: str):
    """Cardinality validation (A4): per-key distinct counts with violation flags."""
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("l_suppkey", "count_distinct")])
        n = g.column("l_suppkey_count_distinct")
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "n_supp": pc.cast(n, pa.int64()),
                "multi": pc.greater(n, 1),
            }
        )

    return bucketed_groupby_apply(ds, ["l_orderkey"], per_bucket, num_buckets=64)


# ---------------------------------------------------------------------------
# §2.8 tumbling-window aggregate (streaming-shaped)
# ---------------------------------------------------------------------------
@register(
    "window_tumbling",
    """SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
       FROM events GROUP BY user_id, hour_bucket""",
)
def window_tumbling(sf_dir: str):
    """Tumbling time window aggregate (§2.8): integer bucket of event time + combiner groupby."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        bucket = pc.divide(us, 3600000000)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "hour_bucket": bucket,
                "value_cents": _cents(t.column("value")),
            }
        )

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    pre = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "hour_bucket"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")]
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "hour_bucket": g.column("hour_bucket"),
                "n_events": pc.cast(g.column("value_cents_count"), pa.int64()),
                "value_cents": g.column("value_cents_sum"),
            }
        )

    # ~95k (user, hour) groups at sf0.1: bucketed exchange + one vectorized
    # pa.group_by per bucket beats per-group map_groups calls 10x+
    return bucketed_groupby_apply(pre, ["user_id", "hour_bucket"], per_bucket, num_buckets=64)


# ---------------------------------------------------------------------------
# J9 tagged-union grouped join: N streams, one shuffle
# ---------------------------------------------------------------------------
@register(
    "group_join_tagged",
    """SELECT c.c_custkey,
              (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
              CAST(COALESCE((SELECT SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                             FROM orders o WHERE o.o_custkey = c.c_custkey), 0) AS BIGINT) AS total_cents,
              (SELECT COUNT(*) FROM customer c2 WHERE c2.c_custkey = c.c_custkey) AS n_customer_rows
       FROM customer c""",
)
def group_join_tagged(sf_dir: str):
    """Reference J9 pattern (TransformationPipelineBuilder.scala:589-623):
    customer + orders tagged, unioned, grouped once on custkey."""
    from encode_ingest_ray.stages.groupjoin import multi_stream_group_join

    customers = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def assemble(key, tables: dict) -> pa.Table:
        cust = tables["cust"]
        ords = tables["ord"]
        if cust.num_rows == 0:
            return pa.table(
                {"c_custkey": pa.array([], pa.int64()), "n_orders": pa.array([], pa.int64()),
                 "total_cents": pa.array([], pa.int64()), "n_customer_rows": pa.array([], pa.int64())}
            )
        total = (
            pc.sum(_cents(ords.column("o_totalprice"))).as_py() or 0
            if ords.num_rows
            else 0
        )
        return pa.table(
            {
                "c_custkey": pa.array([key], pa.int64()),
                "n_orders": pa.array([ords.num_rows], pa.int64()),
                "total_cents": pa.array([int(total)], pa.int64()),
                "n_customer_rows": pa.array([cust.num_rows], pa.int64()),
            }
        )

    return multi_stream_group_join(
        {"cust": (customers, "c_custkey"), "ord": (orders, "o_custkey")},
        assemble,
        key_out="c_custkey_k",
    )


# ---------------------------------------------------------------------------
# J6 two-hop join + exact dedup on key (distinctBy)
# ---------------------------------------------------------------------------
@register(
    "two_hop_first_customer",
    """SELECT l_partkey, o_custkey AS first_custkey
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       QUALIFY row_number() OVER (
           PARTITION BY l_partkey ORDER BY o_orderdate, l_orderkey, l_linenumber) = 1""",
)
def two_hop_first_customer(sf_dir: str):
    """Reference J6 (getExperimentByLibrary, TransformationPipelineBuilder.
    scala:427-462): 2-hop join then ``distinctBy`` with a deterministic
    winner — here: per part, the customer of its earliest order."""
    items = _read(sf_dir, "lineitem", ["l_partkey", "l_orderkey", "l_linenumber"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    joined = cohash_join(items, orders, "l_orderkey", "o_orderkey", num_buckets=32)
    first = dedup_exact(
        joined, ["l_partkey"], ["o_orderdate", "l_orderkey", "l_linenumber"]
    )
    return first.map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "first_custkey": t.column("o_custkey"),
            }
        ),
        batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# §2.8 session windows (streaming-shaped: gap-based sessionization)
# ---------------------------------------------------------------------------
@register(
    "session_windows",
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
       marked AS (
         SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
                          OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       sess AS (
         SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM marked)
       SELECT user_id, session_id, MIN(us) AS start_us, MAX(us) AS end_us,
              COUNT(*) AS n_events
       FROM sess GROUP BY user_id, session_id""",
)
def session_windows(sf_dir: str):
    """Sessionize per user with a 30-minute inactivity gap: events are an
    ordered partitioned log; sessions materialize inside ONE vectorized pass
    per hash bucket of users (SURVEY.md §2.8) — per-key ``map_groups`` costs
    ~10x the aggregation at this group count (CLAUDE.md measured rule)."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    GAP = 1_800_000_000  # 30 min in us

    def sessionize_bucket(t: pa.Table) -> pa.Table:
        # all users of the bucket at once: sort (user, ts, event_id), then a
        # single boundary scan — session starts where the user changes or the
        # gap exceeds GAP; per-user session_id = global id rebased per user
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = t.take(idx)
        n = g.num_rows
        us = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        uid = g.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        new_s = np.ones(n, dtype=bool)
        new_s[1:] = (uid[1:] != uid[:-1]) | (np.diff(us) > GAP)
        sid_global = np.cumsum(new_s)  # 1-based over the bucket
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        # rebase: session_id restarts at 1 for each user
        user_base = np.repeat(
            sid_global[new_user] - 1, np.diff(np.flatnonzero(np.append(new_user, True)))
        )
        bounds = np.flatnonzero(new_s)
        ends = np.append(bounds[1:], n) - 1
        return pa.table(
            {
                "user_id": pa.array(uid[bounds], pa.int64()),
                "session_id": pa.array(
                    (sid_global[bounds] - user_base[bounds]), pa.int64()
                ),
                "start_us": pa.array(us[bounds], pa.int64()),
                "end_us": pa.array(us[ends], pa.int64()),
                "n_events": pa.array(np.append(bounds[1:], n) - bounds, pa.int64()),
            }
        )

    return bucketed_groupby_apply(ds, ["user_id"], sessionize_bucket)


# ---------------------------------------------------------------------------
# J11 composite-key group then broadcast join (analysisActivity pattern)
# ---------------------------------------------------------------------------
@register(
    "composite_group_join",
    """SELECT s_name, l_returnflag, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY s_name, l_returnflag""",
)
def composite_group_join(sf_dir: str):
    """Reference J11 (TransformationPipelineBuilder.scala:549-580): group on
    a composite key, then resolve a small dimension by broadcast — one
    exchange on the composite key, zero join shuffles."""
    import pyarrow.parquet as pq

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    items = _read(sf_dir, "lineitem", ["l_suppkey", "l_returnflag", "l_quantity"])
    joined = broadcast_join(items, supplier, "l_suppkey", "s_suppkey", how="inner")

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column("qty", pc.cast(t.column("l_quantity"), pa.int64()))
        g = t.group_by(["s_name", "l_returnflag"]).aggregate(
            [("qty", "sum"), ("qty", "count")]
        )
        return pa.table(
            {
                "s_name": g.column("s_name"),
                "l_returnflag": g.column("l_returnflag"),
                "n_items": pc.cast(g.column("qty_count"), pa.int64()),
                "sum_qty": g.column("qty_sum"),
            }
        )

    return bucketed_groupby_apply(joined, ["s_name", "l_returnflag"], per_bucket)


# ---------------------------------------------------------------------------
# anti-join (broadcast NOT-IN filter)
# ---------------------------------------------------------------------------
@register(
    "anti_join",
    """SELECT l_returnflag, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem
       WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size > 40)
       GROUP BY l_returnflag""",
)
def anti_join(sf_dir: str):
    """Anti-join via broadcast key set (semi_join_filter(anti=True)) —
    the complement of the reference's in-record intersect semi-join."""
    import pyarrow.parquet as pq

    from encode_ingest_ray.stages.aggregate import partial_groupby_sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"])
    keys = part.filter(pc.greater(part.column("p_size"), 40)).column("p_partkey")
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag", "l_quantity"])
    ds = semi_join_filter(ds, keys.combine_chunks(), "l_partkey", anti=True)
    ds = ds.map_batches(
        lambda t: pa.table(
            {"l_returnflag": t.column("l_returnflag"),
             "qty": pc.cast(t.column("l_quantity"), pa.int64())}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return partial_groupby_sum(ds, ["l_returnflag"], {"sum_qty": "qty"}, count_alias="n").map_batches(
        lambda t: t.select(["l_returnflag", "n", "sum_qty"]), batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# §2.8 sliding-window aggregate (each event contributes to every window
# covering it — the replicate-into-windows expansion)
# ---------------------------------------------------------------------------
@register(
    "sliding_window_counts",
    """SELECT user_id, wstart,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
       FROM (
         SELECT user_id, value, epoch_us(ts) // 3600000000 AS wstart FROM events
         UNION ALL
         SELECT user_id, value, epoch_us(ts) // 3600000000 - 1 FROM events
       ) GROUP BY user_id, wstart""",
)
def sliding_window_counts(sf_dir: str):
    """2h-wide windows sliding by 1h, keyed by window-start hour: each event
    is replicated into the two windows that cover it inside map_batches, then
    one bucketed grouped aggregation — the standard expansion that keeps
    sliding windows a single exchange."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def expand(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        bucket = us // 3_600_000_000
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([uid, uid])),
                "wstart": pa.array(np.concatenate([bucket, bucket - 1])),
                "value_cents": pa.array(np.concatenate([cents, cents])),
            }
        )

    expanded = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "wstart"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")]
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "wstart": g.column("wstart"),
                "n_events": pc.cast(g.column("value_cents_count"), pa.int64()),
                "value_cents": g.column("value_cents_sum"),
            }
        )

    return bucketed_groupby_apply(expanded, ["user_id", "wstart"], per_bucket)


# ---------------------------------------------------------------------------
# top-k per group (window-function shape)
# ---------------------------------------------------------------------------
@register(
    "topk_per_group",
    """SELECT o_custkey, o_orderkey,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
       FROM orders
       QUALIFY row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2""",
)
def topk_per_group(sf_dir: str):
    """Top-2 orders per customer: one bucketed exchange, then a vectorized
    sort + per-key rank (boundary cumcount) per bucket — no per-group Python
    calls, no global sort."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("o_custkey", "ascending"),
                ("o_totalprice", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        s = t.take(idx)
        keys = s.column("o_custkey").to_numpy(zero_copy_only=False)
        n = len(keys)
        starts = np.zeros(n, dtype=np.int64)
        newgrp = np.flatnonzero(np.diff(keys)) + 1
        run_id = np.zeros(n, np.int64)
        run_id[newgrp] = 1
        run_id = np.cumsum(run_id)
        run_starts = np.concatenate(([0], newgrp))
        rank = np.arange(n) - run_starts[run_id]
        out = s.filter(pa.array(rank < 2))
        return pa.table(
            {
                "o_custkey": out.column("o_custkey"),
                "o_orderkey": out.column("o_orderkey"),
                "totalprice_cents": _cents(out.column("o_totalprice")),
            }
        )

    return bucketed_groupby_apply(ds, ["o_custkey"], per_bucket)


# ---------------------------------------------------------------------------
# approximate distinct (HLL sketch) — EXACT oracle: the md5-derived 64-bit
# hash, register fill, exact-integer harmonic sum, and libm-ln linear-counting
# branch are all reproduced in DuckDB SQL bit-for-bit (stages/sketch.py).
# ---------------------------------------------------------------------------
_HLL_P = 12
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
APPROX_DISTINCT_SQL = f"""
WITH h AS (
  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT) AS h
  FROM events
),
rr AS (
  -- idx = top p bits; rest = (h << p) | (2^p - 1) with 64-bit wraparound;
  -- rank = clz64(rest) + 1 == 65 - bitlength(rest)
  SELECT (h >> {64 - _HLL_P}) AS idx,
         65 - length(bin(((h % CAST({1 << (64 - _HLL_P)} AS UBIGINT))
                          * CAST({_HLL_M} AS UBIGINT))
                         + CAST({_HLL_M - 1} AS UBIGINT))) AS rank
  FROM h
),
regs AS (SELECT idx, MAX(rank) AS r FROM rr GROUP BY idx),
allregs AS (
  SELECT COALESCE(regs.r, 0) AS r
  FROM (SELECT unnest(range({_HLL_M})) AS i) g LEFT JOIN regs ON regs.idx = g.i
),
agg AS (
  SELECT SUM(CAST(1 AS HUGEINT) << (64 - r)) AS s,
         SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros
  FROM allregs
),
raw AS (
  SELECT CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M} * 18446744073709551616.0
           / CAST(s AS DOUBLE) AS e,
         zeros
  FROM agg
)
SELECT CAST(floor(CASE WHEN e <= {2.5 * _HLL_M!r} AND zeros > 0
                       THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / zeros)
                       ELSE e END) AS BIGINT) AS approx_distinct_users
FROM raw
"""


@register("approx_distinct_users", APPROX_DISTINCT_SQL)
def approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id): mergeable per-block
    sketches, no dedup shuffle (stages/sketch.py).  The estimate is floored
    to an integer; the DuckDB oracle reproduces the sketch exactly."""
    import math

    from encode_ingest_ray.stages.sketch import approx_distinct

    ds = _read(sf_dir, "events", ["user_id"])
    est = approx_distinct(ds, "user_id")
    return pa.table(
        {"approx_distinct_users": pa.array([int(math.floor(est))], pa.int64())}
    )


# ---------------------------------------------------------------------------
# exact grouped median (discrete quantile)
# ---------------------------------------------------------------------------
@register(
    "grouped_median",
    """SELECT user_id,
              (list(CAST(ROUND(value * 100) AS BIGINT) ORDER BY CAST(ROUND(value * 100) AS BIGINT)))
                  [((COUNT(*) - 1) // 2) + 1] AS median_cents
       FROM events GROUP BY user_id""",
)
def grouped_median(sf_dir: str):
    """Exact per-group discrete median (element at (n-1)//2 of the sorted
    group) — one bucketed exchange, vectorized sort + boundary indexing."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["user_id", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"user_id": t.column("user_id"), "cents": _cents(t.column("value"))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("cents", "ascending")]
        )
        s = t.take(idx)
        keys = s.column("user_id").to_numpy(zero_copy_only=False)
        cents = s.column("cents").to_numpy(zero_copy_only=False)
        n = len(keys)
        newgrp = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate(([0], newgrp))
        ends = np.concatenate((newgrp, [n]))
        med_idx = starts + (ends - starts - 1) // 2
        return pa.table(
            {
                "user_id": pa.array(keys[starts], pa.int64()),
                "median_cents": pa.array(cents[med_idx], pa.int64()),
            }
        )

    return bucketed_groupby_apply(ds, ["user_id"], per_bucket)
