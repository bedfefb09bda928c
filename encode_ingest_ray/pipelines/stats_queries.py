"""Statistical-analytics queries: ROWS-frame moving aggregate, OHLC
downsampling, z-score anomaly detection, grouped regression partials, and
ANALYZE-style column profiling.

All five are exact: values are integer-encoded (cents / milli-units, µs
epochs), the outlier boundary is an integer inequality, and profiling
extrema are VARCHAR casts of native-typed min/max — so each DuckDB oracle
reproduces the distributed result bit-for-bit.  Kernels in stages/stats.py;
scale shapes documented there.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.aggregate import partial_groupby_sum
from encode_ingest_ray.stages.stats import (
    grouped_mad,
    grouped_outlier,
    moving_sum,
    ohlc,
    profile_dataset,
    skyline,
)


def _milli(col):
    return pc.cast(
        pc.round(pc.multiply(col, 1000.0), 0, round_mode="half_towards_infinity"),
        pa.int64(),
    )


MOVING_SUM_SQL = """
WITH t AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents,
       CAST(SUM(price_cents) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving4_cents
FROM t
"""


@register("moving_sum_orders", MOVING_SUM_SQL)
def moving_sum_orders(sf_dir: str):
    """ROWS-frame window aggregate: per customer, the moving 4-order price
    sum in orderkey sequence (3 PRECEDING..CURRENT ROW).  One hash exchange
    on o_custkey, then one vectorized sort + clamped cumulative-sum
    difference per bucket (stages/stats.moving_sum_table) — no
    per-customer Python calls."""
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
    return moving_sum(
        pre,
        partition_keys=["o_custkey"],
        order_cols=["o_orderkey"],
        value_col="price_cents",
        preceding=3,
        out_col="moving4_cents",
    )


OHLC_SQL = """
WITH t AS (
  SELECT event_id, user_id,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
), w AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, day
                            ORDER BY ts_us, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, day
                            ORDER BY ts_us DESC, event_id DESC) AS rn_d
  FROM t
)
SELECT user_id, day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_milli,
       CAST(MAX(v) AS BIGINT) AS high_milli,
       CAST(MIN(v) AS BIGINT) AS low_milli,
       CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_milli,
       COUNT(*) AS n
FROM w
GROUP BY user_id, day
"""


@register("ohlc_user_daily", OHLC_SQL)
def ohlc_user_daily(sf_dir: str):
    """Telemetry downsampling: per (user, day) OHLC bars — first (open) /
    max (high) / min (low) / last (close) event value, (ts, event_id)
    tie-broken.  MERGEABLE partials: each block folds to one row per
    (block, key); only partials cross the one exchange
    (stages/stats.ohlc).  Raw events never shuffle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": us,
                "day": pc.divide(us, 86400000000),
                "v": _milli(t.column("value")),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    bars = ohlc(pre, ["user_id", "day"], "ts_us", "event_id", "v")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": t.column("day"),
                "open_milli": t.column("open_v"),
                "high_milli": t.column("max_v"),
                "low_milli": t.column("min_v"),
                "close_milli": t.column("close_v"),
                "n": t.column("n"),
            }
        )

    return bars.map_batches(fin, batch_format="pyarrow", batch_size=None)


OUTLIER_SQL = """
WITH t AS (
  SELECT event_id, user_id, CAST(ROUND(value * 1000) AS BIGINT) AS value_milli
  FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(value_milli) AS BIGINT) AS s1,
         CAST(SUM(value_milli * value_milli) AS BIGINT) AS s2
  FROM t GROUP BY user_id
)
SELECT t.event_id, t.user_id, t.value_milli
FROM t JOIN s USING (user_id)
WHERE s.n >= 2
  AND (s.n * t.value_milli - s.s1) * (s.n * t.value_milli - s.s1)
      > 4 * (s.n * s.s2 - s.s1 * s.s1)
"""


@register("outlier_zscore_events", OUTLIER_SQL)
def outlier_zscore_events(sf_dir: str):
    """Anomaly detection: events whose value sits more than 2 population
    standard deviations from the user's mean.  Two passes: per-user
    (n, Σx, Σx²) integer partials reduce, broadcast once, then the fact
    stream is flagged by the exact integer inequality (n·x − S1)² >
    4·(n·S2 − S1²) — no float sqrt, no boundary drift
    (stages/stats.grouped_outlier; scale contracts documented there)."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value_milli": _milli(t.column("value")),
            }
        )

    def rd():
        return _read(sf_dir, "events", ["event_id", "user_id", "value"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    stats_in = rd().select_columns(["user_id", "value_milli"])
    return grouped_outlier(
        rd(), stats_in, key="user_id", value_col="value_milli", k=2, min_n=2
    )


REGRESSION_SQL = """
WITH t AS (
  SELECT l_suppkey,
         CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
), g AS (
  SELECT l_suppkey, COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS sx,
         CAST(SUM(p) AS BIGINT) AS sy,
         CAST(SUM(q * p) AS BIGINT) AS sxy,
         CAST(SUM(q * q) AS BIGINT) AS sxx
  FROM t GROUP BY l_suppkey
)
SELECT l_suppkey, n, sx, sy, sxy, sxx,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM g
"""


@register("grouped_regression_supplier", REGRESSION_SQL)
def grouped_regression_supplier(sf_dir: str):
    """Per-supplier least-squares regression of line price on quantity,
    kept in exact integer partials: (n, Σx, Σy, Σxy, Σx²) merge
    associatively across blocks (the covariance extension of
    grouped_moments); slope = slope_num/slope_den is a driver-side float
    epilogue while the partials are bit-exact.

    Overflow contract: n·Σxy < 2^63 needs n·Σ(q·p) bounded — with q ≤ 50
    and p ≤ ~10^7 cents that is ~10^5 rows per supplier; salt or
    milli→centi re-encode beyond."""
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        q = pc.cast(
            pc.round(t.column("l_quantity"), 0, round_mode="half_towards_infinity"),
            pa.int64(),
        )
        p = _cents(t.column("l_extendedprice"))
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "q": q,
                "p": p,
                "qp": pc.multiply_checked(q, p),
                "qq": pc.multiply_checked(q, q),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    g = partial_groupby_sum(
        pre,
        ["l_suppkey"],
        {"sx": "q", "sy": "p", "sxy": "qp", "sxx": "qq"},
        count_alias="n",
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t.column("n")
        num = pc.subtract_checked(
            pc.multiply_checked(n, t.column("sxy")),
            pc.multiply_checked(t.column("sx"), t.column("sy")),
        )
        den = pc.subtract_checked(
            pc.multiply_checked(n, t.column("sxx")),
            pc.multiply_checked(t.column("sx"), t.column("sx")),
        )
        return pa.table(
            {
                "l_suppkey": t.column("l_suppkey"),
                "n": n,
                "sx": t.column("sx"),
                "sy": t.column("sy"),
                "sxy": t.column("sxy"),
                "sxx": t.column("sxx"),
                "slope_num": num,
                "slope_den": den,
            }
        )

    return g.map_batches(derive, batch_format="pyarrow", batch_size=None)


SKYLINE_SQL = """
WITH t AS (
  SELECT p_partkey, p_size,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
)
SELECT a.p_partkey, a.p_size, a.price_cents
FROM t a
WHERE NOT EXISTS (
  SELECT 1 FROM t b
  WHERE b.p_size <= a.p_size AND b.price_cents <= a.price_cents
    AND (b.p_size < a.p_size OR b.price_cents < a.price_cents)
)
"""


@register("skyline_parts", SKYLINE_SQL)
def skyline_parts(sf_dir: str):
    """2-D Pareto skyline of parts (minimize size AND price, strict
    dominance; duplicate points all survive).  The oracle's O(n²) NOT
    EXISTS becomes a per-block local skyline + one tiny merge — the local
    pass can never drop a global survivor (stages/stats.skyline)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "p_size": t.column("p_size"),
                "price_cents": _cents(t.column("p_retailprice")),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return skyline(pre, "p_size", "price_cents")


SAMPLE_SQL = """
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, rn FROM r WHERE rn <= 5
"""


@register("stratified_sample_docs", SAMPLE_SQL)
def stratified_sample_docs(sf_dir: str):
    """Deterministic stratified sampling: exactly 5 documents per language,
    picked by md5-of-id rank (a seeded uniform draw that SQL replays).
    Per-block local top-5 per stratum BEFORE the exchange (a block
    contributes at most 5 rows per language), then one bucketed final rank
    — the class-balancing primitive of training-set assembly.

    The md5 evaluation is per-row by construction (it IS the sample's
    randomness, same documented trade as shuffle_order/train_val_split)."""
    import hashlib

    import pyarrow.compute as _pc

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
    from encode_ingest_ray.stages.ranking import rank_table

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        h = [hashlib.md5(str(i).encode("ascii")).hexdigest() for i in ids]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "h": pa.array(h, pa.string()),
            }
        )

    def top5(t: pa.Table, keep_rn: bool) -> pa.Table:
        r = rank_table(t, ["lang"], [("h", False)], ["doc_id"])
        r = r.filter(_pc.less_equal(r.column("rn"), 5))
        return (
            r.select(["doc_id", "lang", "rn"])
            if keep_rn
            else r.select(["doc_id", "lang", "h"])
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    capped = pre.map_batches(
        lambda t: top5(t, keep_rn=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return bucketed_groupby_apply(capped, ["lang"], lambda t: top5(t, keep_rn=True))


MAD_SQL = """
WITH v AS (
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
m AS (
  SELECT o_custkey,
         (list(c ORDER BY c))[((COUNT(*) - 1) // 2) + 1] AS median_cents
  FROM v GROUP BY o_custkey
),
d AS (
  SELECT v.o_custkey, m.median_cents, ABS(v.c - m.median_cents) AS ad
  FROM v JOIN m ON v.o_custkey = m.o_custkey
)
SELECT o_custkey, median_cents,
       (list(ad ORDER BY ad))[((COUNT(*) - 1) // 2) + 1] AS mad_cents
FROM d GROUP BY o_custkey, median_cents
"""


@register("grouped_mad_orders", MAD_SQL)
def grouped_mad_orders(sf_dir: str):
    """Robust per-customer location/scale: lower median of the order price
    and the median absolute deviation around it — the outlier baseline a
    few extreme orders cannot drag (unlike outlier_zscore_events' moment
    stats).  Both rank selections are discrete (element (n-1)//2), so the
    oracle's list-indexing reproduces them exactly; distributed shape is
    ONE co-hash exchange with both selections chained in-bucket
    (stages/stats.grouped_mad — co-hashing replaces the broadcast a
    two-phase median→deviation plan would need)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    pre = ds.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "c": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return grouped_mad(pre, "o_custkey", "c", "median_cents", "mad_cents")


PROFILE_SQL = """
WITH t AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderstatus, o_orderpriority
  FROM orders
)
SELECT 'o_orderkey' AS col, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
FROM t
UNION ALL
SELECT 'price_cents', COUNT(*),
       CAST(SUM(CASE WHEN price_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(price_cents) AS VARCHAR), CAST(MAX(price_cents) AS VARCHAR)
FROM t
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM t
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
FROM t
"""


@register("profile_orders_columns", PROFILE_SQL)
def profile_orders_columns(sf_dir: str):
    """ANALYZE-style column profiling of orders (row count, per-column null
    count, native-typed min/max cast to VARCHAR) in ONE streaming pass:
    per-block fixed-size partial rows, a repartition(1) reduce over one
    tiny row per block, tall reshape (stages/stats.profile_dataset) — the
    statistics-collection primitive a query optimizer or data-quality
    monitor runs over every table."""
    ds = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "price_cents": _cents(t.column("o_totalprice")),
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return profile_dataset(
        pre, ["o_orderkey", "price_cents", "o_orderstatus", "o_orderpriority"]
    )


_NTILES = 16

EQUI_DEPTH_SQL = f"""
WITH r AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders
), t AS (
  SELECT cents, NTILE({_NTILES}) OVER (ORDER BY cents, o_orderkey) AS bucket
  FROM r
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
FROM t GROUP BY bucket
"""


@register("equi_depth_prices", EQUI_DEPTH_SQL)
def equi_depth_prices(sf_dir: str):
    """Equal-frequency (equi-depth) histogram of order prices: global
    NTILE(16) boundaries + per-bucket counts and [lo, hi] cents ranges —
    the quantile-binning feature-engineering op (and the stats a
    cost-based optimizer's equi-depth histograms are built from).  Rides
    the distributed total-order machinery (stages/ranking.global_rank:
    strided sample → DISTINCT range splits → local rank + exclusive
    prefix-sum offsets); the NTILE assignment is a closed-form function of
    (rn, N) applied per block, and only 16-row (bucket, n, lo, hi)
    partials leave — raw prices shuffle exactly once, inside global_rank's
    range exchange."""
    import numpy as np

    from encode_ingest_ray.stages.ranking import global_rank

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    n_total = ds.count()  # parquet metadata count, no scan

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "cents": _cents(t.column("o_totalprice"))}
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    ranked = global_rank(pre, "cents", "o_orderkey", descending=False)
    q, r = divmod(n_total, _NTILES)
    thr = r * (q + 1)

    def bucket_partial(t: pa.Table) -> pa.Table:
        rn = t.column("rn").combine_chunks().to_numpy(zero_copy_only=False)
        # exact SQL NTILE: the first (N % b) buckets hold ceil(N/b) rows
        b = np.where(
            rn <= thr,
            (rn - 1) // (q + 1) + 1,
            r + (rn - thr - 1) // max(q, 1) + 1,
        ).astype(np.int64)
        part = pa.table(
            {
                "bucket": pa.array(b),
                "n": pa.array(np.ones(len(b), np.int64)),
                "lo_cents": t.column("cents"),
                "hi_cents": t.column("cents"),
            }
        )
        g = part.group_by(["bucket"]).aggregate(
            [("n", "sum"), ("lo_cents", "min"), ("hi_cents", "max")]
        )
        return g.rename_columns(["bucket", "n", "lo_cents", "hi_cents"])

    parts = ranked.map_batches(
        bucket_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["bucket"]).aggregate(
            [("n", "sum"), ("lo_cents", "min"), ("hi_cents", "max")]
        )
        return g.rename_columns(["bucket", "n", "lo_cents", "hi_cents"])

    return parts.repartition(1).map_batches(
        merge, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


CHI2_SQL = """
WITH d AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow FROM events
),
o AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY event_type, dow),
r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS row_n FROM o GROUP BY event_type),
c AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS col_n FROM o GROUP BY dow),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n FROM o)
SELECT o.event_type, o.dow, o.n,
       CAST((2000 * (CAST(o.n AS HUGEINT) * tot_n - CAST(row_n AS HUGEINT) * col_n)
                  * (CAST(o.n AS HUGEINT) * tot_n - CAST(row_n AS HUGEINT) * col_n)
             + CAST(row_n AS HUGEINT) * col_n * tot_n)
            // (2 * CAST(row_n AS HUGEINT) * col_n * tot_n) AS BIGINT) AS contrib_milli
FROM o JOIN r USING (event_type) JOIN c USING (dow), tot
"""


@register("chi2_event_dow", CHI2_SQL)
def chi2_event_dow(sf_dir: str):
    """Chi-square independence crosstab (event_type x day-of-week): each
    cell's Pearson contribution (obs - exp)^2 / exp in round-half-up milli
    units, computed as PURE INTEGER arithmetic — (o*N - r*c)^2 / (r*c*N)
    scaled by 1000 — so the distributed result is bit-identical to the
    HUGEINT oracle (the statistical-hypothesis-test op a float chi2 could
    never oracle exactly).  Count partials cross one tiny exchange; the
    |types|x7 contingency table and all marginals live in ONE final task
    with Python ints (the squared numerators overflow int64 past ~100k
    rows; arbitrary-precision on 35 cells is free)."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def count_partial(t: pa.Table) -> pa.Table:
        us = (
            pc.cast(t.column("ts"), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dow = (us // 86400000000) % 7
        part = pa.table(
            {
                "event_type": t.column("event_type"),
                "dow": pa.array(dow, pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = part.group_by(["event_type", "dow"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "dow", "n"])

    counts = bucketed_sum_combine(
        ds.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["event_type", "dow"],
        ["n"],
        1,
    )

    def chi2(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        dow = t.column("dow").to_pylist()
        n = t.column("n").to_pylist()
        row_n: dict = {}
        col_n: dict = {}
        for e, d, c in zip(et, dow, n):
            row_n[e] = row_n.get(e, 0) + c
            col_n[d] = col_n.get(d, 0) + c
        tot = sum(n)
        contrib = []
        for e, d, c in zip(et, dow, n):
            num = c * tot - row_n[e] * col_n[d]
            den = row_n[e] * col_n[d] * tot
            contrib.append((2000 * num * num + den) // (2 * den))
        return pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "dow": pa.array(dow, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "contrib_milli": pa.array(contrib, pa.int64()),
            }
        )

    return counts.repartition(1).map_batches(
        chi2, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


TRIMMED_MEAN_SQL = """
WITH r AS (
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders
),
w AS (
  SELECT o_custkey, cents,
         row_number() OVER (PARTITION BY o_custkey ORDER BY cents, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM r
),
k AS (SELECT o_custkey, cents, n FROM w WHERE rn > n // 20 AND rn <= n - n // 20)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS kept_n,
       CAST(SUM(cents) AS BIGINT) AS kept_sum_cents,
       CAST((2000 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS trimmed_avg_milli
FROM k GROUP BY o_custkey
"""


@register("trimmed_mean_orders", TRIMMED_MEAN_SQL)
def trimmed_mean_orders(sf_dir: str):
    """Robust 5%-trimmed mean of order prices per customer: drop the n//20
    lowest and highest ranked cents values ((cents, orderkey)-deterministic
    ranks), average the rest in half-up milli — integer-exact end to end.
    Same one-co-hash-exchange rank-selection shape as grouped_mad: per
    bucket ONE vectorized sort, run boundaries, then kept sums are
    prefix-sum differences (no per-key loop, raw rows shuffle once)."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "cents": _cents(t.column("o_totalprice")),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("o_custkey", "ascending"),
                ("cents", "ascending"),
                ("o_orderkey", "ascending"),
            ],
        )
        g = t.take(idx)
        cust = g.column("o_custkey").combine_chunks().to_numpy(zero_copy_only=False)
        cents = g.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        ends = np.r_[starts[1:], len(cust)]
        n = ends - starts
        trim = n // 20
        lo, hi = starts + trim, ends - trim
        P = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        kept_sum = P[hi] - P[lo]
        kept_n = hi - lo
        avg = (2000 * kept_sum + kept_n) // (2 * kept_n)
        return pa.table(
            {
                "o_custkey": pa.array(cust[starts], pa.int64()),
                "kept_n": pa.array(kept_n.astype(np.int64)),
                "kept_sum_cents": pa.array(kept_sum),
                "trimmed_avg_milli": pa.array(avg.astype(np.int64)),
            }
        )

    return bucketed_groupby_apply(pre, ["o_custkey"], bucket)


ROLLING_MEDIAN_SQL = """
WITH t AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
)
SELECT event_id, user_id, v AS value_milli,
       CAST(quantile_disc(v, 0.5) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS med7_milli
FROM t
"""


@register("rolling_median_user", ROLLING_MEDIAN_SQL)
def rolling_median_user(sf_dir: str):
    """Sliding ORDER-STATISTIC window: per user, the discrete (lower)
    median of the trailing 7 event values — the robust denoising sibling of
    moving_sum (a sum decomposes into cumsums; an order statistic doesn't,
    so the kernel pads each key's series with 6 +inf sentinels, takes ONE
    C-level np.sort over the (rows x 7) sliding-window view, and picks
    index (k-1)//2 per row for the ragged warm-up prefixes).  One hash
    exchange; windows never cross keys by construction."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "v": _milli(t.column("value")),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    W = 7
    SENTINEL = np.iinfo(np.int64).max

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "value_milli": pa.array([], pa.int64()),
                    "med7_milli": pa.array([], pa.int64()),
                }
            )
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        us = t.column("us").combine_chunks().to_numpy(zero_copy_only=False)
        v = t.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, vv = uid[order], v[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        # ordinal of each row's key and position within its key's run
        key_ord = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        within = np.arange(n) - starts[key_ord]
        # pad each key's series with W-1 sentinels so every window is W wide
        padded = np.full(n + (W - 1) * len(starts), SENTINEL, np.int64)
        pos = np.arange(n) + (W - 1) * (key_ord + 1)
        padded[pos] = vv
        windows = np.lib.stride_tricks.sliding_window_view(padded, W)[pos - (W - 1)]
        swin = np.sort(windows, axis=1)
        k = np.minimum(within + 1, W)
        med = swin[np.arange(n), (k - 1) // 2]
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": pa.array(u),
                "value_milli": pa.array(vv),
                "med7_milli": pa.array(med),
            }
        )

    return bucketed_groupby_apply(pre, ["user_id"], bucket)


# ----------------------------------------------------------- Shannon entropy

ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
),
n AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM c GROUP BY user_id
)
SELECT c.user_id, n.n_events, n.n_types,
       CAST(SUM(CAST(FLOOR(c * ln(CAST(n_events AS DOUBLE) / c) / n_events
                           * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
FROM c JOIN n USING (user_id)
GROUP BY c.user_id, n.n_events, n.n_types
"""


@register("entropy_user_events", ENTROPY_SQL)
def entropy_user_events(sf_dir: str):
    """Shannon entropy of each user's event-type distribution, in micro-nats
    — the information-theoretic aggregate (feature skew / diversity scoring
    for training-data curation).  Exactness comes from rounding each TERM
    c·ln(N/c)/N to an int64 micro-nat before the per-user sum: the sum is
    then order-independent, and both sides evaluate the identical libm
    double expression (Python math.log == DuckDB ln, the precedent
    stages/sketch.py's HLL estimate established).  Shape: per-block count
    partials (user, type, n) shrink the stream before ONE exchange on
    user_id; each bucket folds counts -> per-user N -> per-term micro-nats
    with one libm call per DISTINCT (c, N) pair."""
    from encode_ingest_ray.stages.stats import grouped_entropy_table

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def count_partial(t: pa.Table) -> pa.Table:
        part = t.append_column("n", pa.array(__import__("numpy").ones(t.num_rows, "int64")))
        g = part.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["user_id", "event_type", "n"])

    partials = ds.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def bucket_fn(t: pa.Table) -> pa.Table:
        return grouped_entropy_table(t, "user_id", "event_type", "n")

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    return bucketed_groupby_apply(partials, ["user_id"], bucket_fn)


# ------------------------------------------------------------------- CUSUM

CUSUM_DRIFT_MILLI = 5000

CUSUM_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
),
p AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(v - 5000) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
  FROM e
)
SELECT user_id, event_id,
       CAST(pre - LEAST(0, MIN(pre) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS cusum_milli
FROM p
"""


@register("cusum_user_value", CUSUM_SQL)
def cusum_user_value(sf_dir: str):
    """One-sided CUSUM control statistic per user over the event stream —
    change-point / drift detection: s_i = max(0, s_{i-1} + (value_i - k)),
    k = 5 units, in the (ts, event_id) total order.  The max(0, ...) clamp
    is recursive state no lag or frame window expresses directly, but it
    has the loop-free closed form s_i = P_i - min(0, running-min P_j) over
    prefix sums — ONE exchange on user_id, one vectorized pass per bucket
    (stages/stats.cusum_table).  Integer-exact in milli units against the
    double-window oracle."""
    from encode_ingest_ray.stages.stats import cusum

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column("v", _milli(t.column("value"))).drop_columns(["value"])

    prepped = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return cusum(
        prepped,
        ["user_id"],
        ["ts", "event_id"],
        "v",
        CUSUM_DRIFT_MILLI,
        out_col="cusum_milli",
        keep_cols=["user_id", "event_id"],
    )


# -------------------------------------------------------------------- Gini

GINI_SQL = """
WITH v AS (
  SELECT o_orderpriority AS prio,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT prio, cents,
         ROW_NUMBER() OVER (PARTITION BY prio ORDER BY cents) AS i
  FROM v
),
s AS (
  SELECT prio,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS six
  FROM r GROUP BY prio
)
SELECT prio,
       CAST(n AS BIGINT) AS n_orders,
       CAST(sx AS BIGINT) AS sum_cents,
       CAST((2000000 * (2 * six - (n + 1) * sx) + n * sx)
            // (2 * n * sx) AS BIGINT) AS gini_micro
FROM s
"""


@register("gini_order_value", GINI_SQL)
def gini_order_value(sf_dir: str):
    """Gini inequality coefficient of order value per priority class, in
    round-half-up micro units.  Scale shape: per-block (prio, cents) count
    partials collapse the stream to one row per DISTINCT (group, value)
    pair — bounded by the value DOMAIN, not the row count — cross one
    exchange, then a single tiny task folds each group's sorted distinct
    values with the closed-form rank sum v·(c·m + c(c+1)/2) in PYTHON INTS
    (the rank-weighted sum overflows int64 past ~1e6 rows; the oracle uses
    HUGEINT).  Tie order never changes Σ i·x, so ROW_NUMBER's arbitrary
    tie-break is safe on both sides."""
    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine
    from encode_ingest_ray.stages.stats import gini_from_counts

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def count_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        part = pa.table(
            {
                "prio": t.column("o_orderpriority"),
                "cents": _cents(t.column("o_totalprice")),
                "c": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = part.group_by(["prio", "cents"]).aggregate([("c", "sum")])
        return g.rename_columns(["prio", "cents", "c"])

    partials = ds.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    counts = bucketed_sum_combine(partials, ["prio", "cents"], ["c"], None)

    def final(t: pa.Table) -> pa.Table:
        return gini_from_counts(t, "prio", "cents", "c")

    return counts.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


# ------------------------------------------------- mean imputation


IMPUTE_SQL = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(ROUND(value * 1000) AS BIGINT) AS v,
         (event_id % 13 = 0) AS miss
  FROM events
),
g AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN NOT miss THEN v END) AS BIGINT) AS s,
         CAST(COUNT(*) FILTER (NOT miss) AS BIGINT) AS n
  FROM e GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       CASE WHEN e.miss THEN g.s ELSE e.v END AS fill_num,
       CASE WHEN e.miss THEN g.n ELSE 1 END AS fill_den
FROM e JOIN g USING (user_id)
"""


@register("impute_mean_events", IMPUTE_SQL)
def impute_mean_events(sf_dir: str):
    """Group-mean imputation — the numeric missing-data repair step of a
    training-data pipeline (sibling of gap_fill's LOCF): values at the
    deterministic missing mask (event_id % 13 == 0) are replaced by their
    user's mean over PRESENT values.  Exact-integer contract: each row
    emits (fill_num, fill_den) — (v, 1) when present, (group Σv, group n)
    when imputed — so no division order can diverge; the float mean is one
    driver expression.  Two passes, zero exchange on the fact stream: the
    per-user partials come from one pre-combined aggregation, broadcast
    once (ray.put) and probed per block (the outlier_zscore two-pass
    broadcast shape; a user dimension too large to broadcast would switch
    to the cohash join, the documented guard)."""
    import numpy as np

    import ray

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def pre(t: pa.Table) -> pa.Table:
        eid = t.column("event_id")
        v = _milli(t.column("value"))
        present = pc.not_equal(
            pc.subtract(eid, pc.multiply(pc.divide(eid, 13), 13)), 0
        )
        tt = pa.table({"user_id": t.column("user_id"), "v": v}).filter(present)
        g = tt.group_by(["user_id"]).aggregate([("v", "sum"), ([], "count_all")])
        return g.rename_columns(["user_id", "s", "n"])

    partials = bucketed_sum_combine(
        ds.map_batches(
            pre, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["user_id"],
        ["s", "n"],
    )
    tabs = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    gt = pa.concat_tables(tabs).combine_chunks()
    uid = gt.column("user_id").to_numpy(zero_copy_only=False)
    order = np.argsort(uid)
    ref = ray.put(
        (
            uid[order],
            gt.column("s").to_numpy(zero_copy_only=False)[order],
            gt.column("n").to_numpy(zero_copy_only=False)[order],
        )
    )

    def fill(t: pa.Table, _ref=ref) -> pa.Table:
        uids, s, n = ray.get(_ref)
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        u = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        v = (
            _milli(t.column("value"))
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        miss = (eid % 13) == 0
        if len(uids):
            pos = np.searchsorted(uids, u)
            pos[pos == len(uids)] = 0
            hit = uids[pos] == u
        else:  # nobody has a present value anywhere
            pos = np.zeros(len(u), np.int64)
            hit = np.zeros(len(u), bool)
            s = n = np.zeros(1, np.int64)
        num = np.where(miss, np.where(hit, s[pos], 0), v)
        den = np.where(miss, np.where(hit, n[pos], 0), 1)
        # a user whose EVERY value is missing has no present-value partial:
        # SQL emits (NULL, 0) there — mask the num, zero the den
        null_num = miss & ~hit
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "fill_num": pa.array(num.astype(np.int64), mask=null_num),
                "fill_den": pa.array(den.astype(np.int64)),
            }
        )

    return ds.map_batches(
        fill, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Two-sample nonparametric tests: KS + Mann-Whitney (stages/hypothesis.py)
# ---------------------------------------------------------------------------

#: shared distinct-value count CTE: A vs R extended-price distributions
_TWO_SAMPLE_VALS = """
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
"""

KS_SQL = f"""
WITH vals AS ({_TWO_SAMPLE_VALS}),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cb) AS BIGINT) AS n_b FROM vals),
cum AS (SELECT CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb FROM vals)
SELECT n_a, n_b, CAST(MAX(ABS(cuma * n_b - cumb * n_a)) AS BIGINT) AS d_num
FROM cum, tot GROUP BY n_a, n_b
"""

MWU_SQL = f"""
WITH vals AS ({_TWO_SAMPLE_VALS}),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cb) AS BIGINT) AS n_b FROM vals),
cum AS (SELECT ca, ca + cb AS c,
               CAST(SUM(ca + cb) OVER (ORDER BY v) - (ca + cb) AS BIGINT)
                 AS cum_excl
        FROM vals)
SELECT n_a, n_b,
       CAST(SUM(ca * (2 * cum_excl + c + 1)) AS BIGINT)
         - n_a * (n_a + 1) AS u2_a
FROM cum, tot GROUP BY n_a, n_b
"""


def _two_sample_counts(sf_dir: str):
    """Per-block partial counts per distinct price: (v_cents, ca, cb)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("l_returnflag"), value_set=pa.array(["A", "R"]))
        t = t.filter(keep)
        part = pa.table(
            {
                "v": _cents(t.column("l_extendedprice")),
                "ca": pc.cast(pc.equal(t.column("l_returnflag"), "A"), pa.int64()),
                "cb": pc.cast(pc.equal(t.column("l_returnflag"), "R"), pa.int64()),
            }
        )
        g = part.group_by(["v"]).aggregate([("ca", "sum"), ("cb", "sum")])
        return g.rename_columns(["v", "ca", "cb"])

    return ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


@register("ks_test_price_flag", KS_SQL)
def ks_test_price_flag(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov statistic (returned vs accepted
    line-item price distributions) as the EXACT integer numerator
    ``d_num = max_v |cumA(v)*n_b - cumB(v)*n_a|`` over denominator
    ``n_a*n_b``: per-block distinct-value count partials, one range
    exchange with distinct sampled splits, per-partition offset cumsums,
    ≤32-row Python-int final reduce (stages/hypothesis.py)."""
    from encode_ingest_ray.stages.hypothesis import two_sample_scan

    return two_sample_scan(_two_sample_counts(sf_dir)).select(
        ["n_a", "n_b", "d_num"]
    )


@register("mannwhitney_price_flag", MWU_SQL)
def mannwhitney_price_flag(sf_dir: str):
    """Mann-Whitney rank-sum statistic ``u2_a = 2*U_A`` with exact midrank
    tie handling (every midrank doubles to the integer ``2*cum_excl+c+1``),
    over the same distributed CDF scan as the KS sibling."""
    from encode_ingest_ray.stages.hypothesis import two_sample_scan

    return two_sample_scan(_two_sample_counts(sf_dir)).select(
        ["n_a", "n_b", "u2_a"]
    )


# ---------------------------------------------------------------------------
# Distribution-drift monitor: Population Stability Index (per-bucket, exact)
# ---------------------------------------------------------------------------

PSI_SQL = """
WITH v AS (
  SELECT event_id, CAST(ROUND(value * 1000) AS BIGINT) AS v FROM events
),
mid AS (SELECT MAX(event_id) // 2 AS m FROM events),
rng AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM v),
b AS (
  SELECT (v.v - rng.lo) * 16 // (rng.hi - rng.lo + 1) AS bucket,
         CASE WHEN v.event_id <= mid.m THEN 1 ELSE 0 END AS in_a
  FROM v, mid, rng
),
c AS (
  SELECT bucket, CAST(SUM(in_a) AS BIGINT) AS ca,
         CAST(SUM(1 - in_a) AS BIGINT) AS cb
  FROM b GROUP BY bucket
),
t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM c)
SELECT bucket, ca, cb,
  CAST(FLOOR((((ca + 1.0) / (na + 16) - (cb + 1.0) / (nb + 16))
        * ln(((ca + 1.0) / (na + 16)) / ((cb + 1.0) / (nb + 16))))
       * 1000000 + 0.5) AS BIGINT) AS contrib_micro
FROM c, t
"""


def _value_milli_range(sf_dir: str) -> tuple[int, int]:
    """(lo, hi) of ROUND(value*1000) from parquet FOOTER statistics — no
    data pass (rounding is monotonic, so the per-row min/max equals the
    rounded column min/max).  Positive-domain guard: the half-away formula
    below is floor(x+0.5) which only equals DuckDB ROUND for x >= 0."""
    import math
    import os

    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata
    idx = next(
        i for i in range(md.num_columns) if md.schema.column(i).name == "value"
    )
    lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
    hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
    if lo < 0:
        raise ValueError("psi_value_drift requires non-negative values "
                         "(half-away rounding shortcut)")
    return int(math.floor(lo * 1000 + 0.5)), int(math.floor(hi * 1000 + 0.5))


@register("psi_value_drift", PSI_SQL)
def psi_value_drift(sf_dir: str):
    """Population Stability Index between the first and second half of the
    change stream (split at the max-event-id midpoint, read from footer
    stats): 16 equi-width value buckets, Laplace-smoothed shares, per-bucket
    contribution in round-half-up MICRO-nats — the drift gate an ML-data
    pipeline runs before accepting a new training batch.  Per-block bucket
    count partials cross one tiny exchange; the 16-row divergence reduce
    runs scalar ``math.log`` (libm — bit-equal to DuckDB ``ln``, the same
    equivalence the HLL/entropy oracles rely on)."""
    import math

    import numpy as np

    from encode_ingest_ray.pipelines.cdc_queries import _events_lsn_hi
    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    lo, hi = _value_milli_range(sf_dir)
    mid = _events_lsn_hi(sf_dir) // 2
    width = hi - lo + 1

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def count_partial(t: pa.Table) -> pa.Table:
        v = _milli(t.column("value")).to_numpy(zero_copy_only=False)
        bucket = ((v - lo) * 16) // width
        in_a = (
            t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
            <= mid
        )
        pre = pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                "ca": pa.array(in_a.astype(np.int64)),
                "cb": pa.array((~in_a).astype(np.int64)),
            }
        )
        g = pre.group_by(["bucket"]).aggregate([("ca", "sum"), ("cb", "sum")])
        return g.rename_columns(["bucket", "ca", "cb"])

    counts = bucketed_sum_combine(
        ds.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["bucket"],
        ["ca", "cb"],
        1,
    )

    def divergence(t: pa.Table) -> pa.Table:
        bucket = t.column("bucket").to_pylist()
        ca = t.column("ca").to_pylist()
        cb = t.column("cb").to_pylist()
        na, nb = sum(ca), sum(cb)
        contrib = []
        for a, b in zip(ca, cb):
            pa_ = (a + 1.0) / (na + 16)
            pb_ = (b + 1.0) / (nb + 16)
            contrib.append(
                int(math.floor((pa_ - pb_) * math.log(pa_ / pb_) * 1000000 + 0.5))
            )
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "ca": pa.array(ca, pa.int64()),
                "cb": pa.array(cb, pa.int64()),
                "contrib_micro": pa.array(contrib, pa.int64()),
            }
        )

    return counts.repartition(1).map_batches(
        divergence, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# RANGE-frame window: trailing 1-hour time-based sum per user
# ---------------------------------------------------------------------------

RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) OVER w AS BIGINT)
         AS range_sum_milli,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@register("range_frame_sum_user", RANGE_FRAME_SQL)
def range_frame_sum_user(sf_dir: str):
    """Time-based (RANGE) window frame — the variable-row-count sibling of
    ``moving_sum_orders``'s ROWS frame: per event, the sum/count of the
    user's values in the trailing HOUR.  RANGE semantics include CURRENT
    ROW's ts-peers, so both bounds come from two ``searchsorted`` probes
    ([ts−1h, left) and (ts, right]) over the user's sorted timestamps;
    sums are cumsum differences.  One user-bucketed exchange; per-user
    segments loop in Python but every probe/sum inside is vectorized."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "v": _milli(t.column("value")),
            }
        )

    def window_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts_us", "ascending")]
        )
        g = t.take(idx)
        uid = g.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").combine_chunks().to_numpy(zero_copy_only=False)
        v = g.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        sums = np.empty(n, np.int64)
        cnts = np.empty(n, np.int64)
        bounds = np.r_[
            np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]), n
        ]
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            seg = ts[s:e]
            cs = np.r_[0, np.cumsum(v[s:e])]
            lo = np.searchsorted(seg, seg - HOUR_US, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            sums[s:e] = cs[hi] - cs[lo]
            cnts[s:e] = hi - lo
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "range_sum_milli": pa.array(sums),
                "n_in_window": pa.array(cnts),
            }
        )

    return bucketed_groupby_apply(
        ds.map_batches(
            keyed, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["user_id"],
        window_bucket,
    )


# ---------------------------------------------------------------------------
# Feature engineering: leave-one-out target encoding
# ---------------------------------------------------------------------------

TARGET_ENCODE_SQL = """
WITH t AS (
  SELECT event_id, event_type, CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
),
g AS (
  SELECT event_type, CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM t GROUP BY event_type
)
SELECT t.event_id, t.event_type,
       CAST(g.s - t.v AS BIGINT) AS loo_num,
       CAST(g.n - 1 AS BIGINT) AS loo_den
FROM t JOIN g USING (event_type)
"""


@register("target_encode_event_type", TARGET_ENCODE_SQL)
def target_encode_event_type(sf_dir: str):
    """Leave-one-out TARGET ENCODING of the event_type category against the
    value column — the feature-engineering transform that replaces a
    category with the mean target of its OTHER members (LOO kills the
    self-leakage a plain mean encoding has).  Exact integer num/den pair
    per row: (S_g − x_i, n_g − 1).  Per-category (S, n) partials reduce to
    a handful of rows, broadcast once via ``ray.put``, and the fact stream
    is encoded in one vectorized dictionary-lookup pass — no join exchange
    (the impute_mean / outlier broadcast-moments shape)."""
    import numpy as np
    import ray as _ray

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        pre = pa.table(
            {
                "event_type": t.column("event_type"),
                "s": _milli(t.column("value")),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = pre.group_by(["event_type"]).aggregate([("s", "sum"), ("n", "sum")])
        return g.rename_columns(["event_type", "s", "n"])

    stats = bucketed_sum_combine(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["event_type"],
        ["s", "n"],
        1,
    ).take_all()  # |event types| rows
    keys = sorted(r["event_type"] for r in stats)
    s_of = {r["event_type"]: r["s"] for r in stats}
    n_of = {r["event_type"]: r["n"] for r in stats}
    lookup = _ray.put(
        (
            np.array(keys, dtype=object),
            np.array([s_of[k] for k in keys], np.int64),
            np.array([n_of[k] for k in keys], np.int64),
        )
    )

    def encode(t: pa.Table) -> pa.Table:
        ks, ss, ns = _ray.get(lookup)
        d = t.column("event_type").combine_chunks().dictionary_encode()
        uniq = np.array(d.dictionary.to_pylist(), dtype=object)
        pos = np.searchsorted(ks, uniq)
        codes = d.indices.to_numpy(zero_copy_only=False)
        v = (
            _milli(t.column("value")).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "loo_num": pa.array(ss[pos][codes] - v),
                "loo_den": pa.array(ns[pos][codes] - 1),
            }
        )

    return ds.map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Feature engineering: quantile normalization onto the global distribution
# ---------------------------------------------------------------------------

QNORM_SQL = """
WITH t AS (
  SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
r AS (
  SELECT o_orderkey, o_custkey, c,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY c, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM t
),
g AS (
  SELECT c AS norm_cents, ROW_NUMBER() OVER (ORDER BY c, o_orderkey) AS grn
  FROM t
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_n FROM t)
SELECT r.o_orderkey, g.norm_cents
FROM r, tot
JOIN g ON g.grn = (r.rk * total_n + r.n - 1) // r.n
"""


@register("quantile_normalize_prices", QNORM_SQL)
def quantile_normalize_prices(sf_dir: str):
    """QUANTILE NORMALIZATION of per-customer order prices onto the global
    price distribution — the ML-preprocessing transform that maps each
    row's within-group quantile to the global value at the same quantile
    (rank r of n → global sorted value at ceil(r·N/n), ties broken by
    orderkey on both sides so the mapping is total-order deterministic).
    Three distributed pieces wired together: the repo's global_rank
    total-order scan over (cents, orderkey); per-customer rank+size in one
    bucketed pass; and one cohash join of target-index == global-rank (two
    int64 columns — the wide payload never rides the join)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
    from encode_ingest_ray.stages.joins import cohash_join
    from encode_ingest_ray.stages.ranking import global_rank

    total_n = pq.ParquetFile(os.path.join(sf_dir, "orders.parquet")).metadata.num_rows

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "c": _cents(t.column("o_totalprice")),
            }
        )

    def rd():
        return _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    glob_ranked = global_rank(
        rd().select_columns(["c", "o_orderkey"]), "c", "o_orderkey",
        descending=False,
    )

    def g_prep(t: pa.Table) -> pa.Table:
        return pa.table({"grn": t.column("rn"), "norm_cents": t.column("c")})

    g = glob_ranked.map_batches(
        g_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def cust_ranks(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("o_custkey", "ascending"),
                ("c", "ascending"),
                ("o_orderkey", "ascending"),
            ],
        )
        s = t.take(idx)
        cust = s.column("o_custkey").combine_chunks().to_numpy(zero_copy_only=False)
        m = len(cust)
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        sizes = np.diff(np.r_[starts, m])
        seg = np.repeat(starts, sizes)
        rk = np.arange(m, dtype=np.int64) - seg + 1
        n = np.repeat(sizes.astype(np.int64), sizes)
        target = (rk * total_n + n - 1) // n
        return pa.table(
            {
                "o_orderkey": s.column("o_orderkey"),
                "target": pa.array(target),
            }
        )

    tgt = bucketed_groupby_apply(rd(), ["o_custkey"], cust_ranks)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["o_orderkey", "norm_cents"])

    return cohash_join(
        tgt, g, "target", "grn", how="inner", map_joined=project
    )


CORR_MATRIX_SQL = """
WITH v AS (
  SELECT CAST(l_quantity AS BIGINT)                 AS q,
         CAST(ROUND(l_discount * 100) AS BIGINT)    AS d,
         CAST(ROUND(l_tax * 100) AS BIGINT)         AS x
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT)   AS n,
         CAST(SUM(q) AS BIGINT)     AS sq,
         CAST(SUM(d) AS BIGINT)     AS sd,
         CAST(SUM(x) AS BIGINT)     AS sx,
         CAST(SUM(q * q) AS BIGINT) AS sqq,
         CAST(SUM(d * d) AS BIGINT) AS sdd,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(q * d) AS BIGINT) AS sqd,
         CAST(SUM(q * x) AS BIGINT) AS sqx,
         CAST(SUM(d * x) AS BIGINT) AS sdx
  FROM v
),
h AS (
  -- HUGEINT products: n*Sab and n*Saa overflow BIGINT past ~10^7 rows
  -- (the chi2_event_dow lesson); the engine side folds Python ints
  SELECT CAST(n AS HUGEINT) AS hn,
         sq, sd, sx, sqq, sdd, sxx, sqd, sqx, sdx
  FROM s
)
SELECT col_a, col_b, corr FROM (
  SELECT 'quantity' AS col_a, 'discount' AS col_b,
         CAST(hn * sqd - CAST(sq AS HUGEINT) * sd AS DOUBLE)
           / SQRT(CAST(hn * sqq - CAST(sq AS HUGEINT) * sq AS DOUBLE)
                  * CAST(hn * sdd - CAST(sd AS HUGEINT) * sd AS DOUBLE)) AS corr
  FROM h
  UNION ALL
  SELECT 'quantity', 'tax',
         CAST(hn * sqx - CAST(sq AS HUGEINT) * sx AS DOUBLE)
           / SQRT(CAST(hn * sqq - CAST(sq AS HUGEINT) * sq AS DOUBLE)
                  * CAST(hn * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
  FROM h
  UNION ALL
  SELECT 'discount', 'tax',
         CAST(hn * sdx - CAST(sd AS HUGEINT) * sx AS DOUBLE)
           / SQRT(CAST(hn * sdd - CAST(sd AS HUGEINT) * sd AS DOUBLE)
                  * CAST(hn * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
  FROM h
)
"""


@register("corr_matrix_lineitem", CORR_MATRIX_SQL)
def corr_matrix_lineitem(sf_dir: str):
    """Pairwise Pearson correlation matrix over three lineitem measures in
    ONE distributed pass: per-block integer moment partials (n, Σa, Σa²,
    Σab for every pair — the multi-column extension of grouped_moments)
    merge associatively; the driver folds the tiny partials in Python ints
    (the n·Σab cross terms overflow int64 past ~10^7 rows, the chi2
    lesson) and the final corr = num / sqrt(da·db) is ONE mirrored float64
    expression per pair (the libm-parity trick: same operand order as the
    SQL, so the doubles are bit-equal).  Encodings: quantity integral,
    discount/tax in hundredths."""
    import math

    import numpy as np

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.rint(t.column("l_quantity").to_numpy(zero_copy_only=False)).astype(np.int64)
        d = np.rint(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        x = np.rint(
            t.column("l_tax").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        vals = {
            "n": len(q),
            "sq": int(q.sum()), "sd": int(d.sum()), "sx": int(x.sum()),
            "sqq": int((q * q).sum()), "sdd": int((d * d).sum()),
            "sxx": int((x * x).sum()),
            "sqd": int((q * d).sum()), "sqx": int((q * x).sum()),
            "sdx": int((d * x).sum()),
        }
        return pa.table({k: pa.array([v], pa.int64()) for k, v in vals.items()})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    tot = {k: sum(int(r[k]) for r in parts) for k in parts[0]}
    n = tot["n"]

    def corr(sab: int, sa: int, sb: int, saa: int, sbb: int) -> float:
        num = n * sab - sa * sb           # exact Python ints
        da = n * saa - sa * sa
        db = n * sbb - sb * sb
        return float(num) / math.sqrt(float(da) * float(db))

    return pa.table(
        {
            "col_a": pa.array(["quantity", "quantity", "discount"]),
            "col_b": pa.array(["discount", "tax", "tax"]),
            "corr": pa.array(
                [
                    corr(tot["sqd"], tot["sq"], tot["sd"], tot["sqq"], tot["sdd"]),
                    corr(tot["sqx"], tot["sq"], tot["sx"], tot["sqq"], tot["sxx"]),
                    corr(tot["sdx"], tot["sd"], tot["sx"], tot["sdd"], tot["sxx"]),
                ],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Change-point detection: per-user CUSUM drift ALARM summary
# ---------------------------------------------------------------------------

CUSUM_DRIFT_SQL = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(ROUND(value * 1000) AS BIGINT) - 245000 AS d
  FROM events
),
s AS (
  SELECT user_id, ts_us, event_id,
         SUM(d) OVER w AS ps
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING)
),
c AS (
  SELECT user_id,
         ps - LEAST(0, MIN(ps) OVER w) AS cusum
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT user_id,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum,
       CAST(SUM(CASE WHEN cusum > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over,
       CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY user_id
"""


@register("cusum_drift_user", CUSUM_DRIFT_SQL)
def cusum_drift_user(sf_dir: str):
    """Per-user CUSUM drift ALARM summary — the monitoring consumer of the
    row-level ``cusum_user_value`` statistic: for each user the maximum of
    ``S_t = max(0, S_{t-1} + (x_t - k))`` (k = 245.0 reference, the domain
    midpoint), the number of points above the alarm threshold H = 1000.0,
    and the sequence length.  Rides the same loop-free closed form
    (``stages/stats.cusum_table``: prefix sum minus clamped segmented
    running minimum), then folds per user INSIDE the bucket — one
    user-bucketed exchange, per-user summary rows out, all-integer and
    bit-exact against the window-function oracle."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
    from encode_ingest_ray.stages.stats import cusum_table

    K_MILLI = 245_000
    H_MILLI = 1_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "v": _milli(t.column("value")),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        ct = cusum_table(
            t, ["user_id"], ["ts_us", "event_id"], "v", K_MILLI,
            "cusum", ["user_id"],
        )
        over = pc.cast(pc.greater(ct.column("cusum"), H_MILLI), pa.int64())
        one = pa.array(np.ones(ct.num_rows, np.int64))
        g = (
            ct.append_column("over", over)
            .append_column("one", one)
            .group_by(["user_id"])
            .aggregate([("cusum", "max"), ("over", "sum"), ("one", "sum")])
        )
        return g.rename_columns(["user_id", "max_cusum", "n_over", "n"])

    return bucketed_groupby_apply(
        ds.map_batches(
            keyed, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["user_id"],
        per_bucket,
    )


# ---------------------------------------------------------------------------
# GBDT primitive: histogram-based best-split finding
# ---------------------------------------------------------------------------

BEST_SPLIT_SQL = """
WITH h AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2500000 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1
  FROM orders GROUP BY bucket
),
p AS (
  SELECT bucket,
         CAST(SUM(n)  OVER w AS BIGINT) AS n_left,
         CAST(SUM(n1) OVER w AS BIGINT) AS pos_left,
         CAST((SELECT SUM(n)  FROM h) - SUM(n)  OVER w AS BIGINT) AS n_right,
         CAST((SELECT SUM(n1) FROM h) - SUM(n1) OVER w AS BIGINT) AS pos_right
  FROM h
  WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
)
SELECT bucket AS split_bucket, n_left, pos_left, n_right, pos_right,
       CAST(FLOOR(1000000.0 * (
           (CAST(pos_left * pos_left
                 + (n_left - pos_left) * (n_left - pos_left) AS DOUBLE)
            / n_left)
         + (CAST(pos_right * pos_right
                 + (n_right - pos_right) * (n_right - pos_right) AS DOUBLE)
            / n_right))) AS BIGINT) AS score_micro
FROM p WHERE n_left > 0 AND n_right > 0
"""


@register("best_split_orders", BEST_SPLIT_SQL)
def best_split_orders(sf_dir: str):
    """Gradient-boosting split finding, the histogram method (LightGBM /
    XGBoost-hist): bucket the feature (o_totalprice, fixed-width cent
    buckets), build the per-bucket (count, positive-count) histogram for
    the label (o_orderstatus = 'F'), then score every left/right split by
    the purity gain ``sum_side (pos² + neg²)/n`` — maximizing it minimizes
    weighted Gini impurity.

    Distributed shape: each block folds to ≤20 histogram rows (mergeable
    partials), ONE tiny bucket-combine exchange, and the prefix-sum scan +
    scoring runs on the metadata-sized histogram — the raw table is
    scanned exactly once and only the histogram ever moves.  Counts stay
    < 2^26 per side even at 100×, so squares are exact in both int64 and
    float64, and the score expression is MIRRORED order-for-order against
    the DuckDB oracle (the BM25/PSI float-parity rule) with a FLOOR to
    micro units."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    W = 2_500_000  # cents per histogram bucket (~20 buckets over the domain)
    ds = _read(sf_dir, "orders", ["o_totalprice", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        bucket = pc.divide(_cents(t.column("o_totalprice")), W)
        y = pc.cast(pc.equal(t.column("o_orderstatus"), "F"), pa.int64())
        g = pa.table(
            {"bucket": bucket,
             "n": pa.array(np.ones(t.num_rows, np.int64)),
             "n1": y}
        ).group_by(["bucket"]).aggregate([("n", "sum"), ("n1", "sum")])
        return g.rename_columns(["bucket", "n", "n1"])

    hist = bucketed_sum_combine(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["bucket"], ["n", "n1"], 2,
    )

    def score(t: pa.Table) -> pa.Table:
        s = t.combine_chunks().sort_by([("bucket", "ascending")])
        n = s.column("n").to_numpy(zero_copy_only=False)
        n1 = s.column("n1").to_numpy(zero_copy_only=False)
        nl = np.cumsum(n)
        pl = np.cumsum(n1)
        nr = nl[-1] - nl
        pr = pl[-1] - pl
        keep = (nl > 0) & (nr > 0)
        nl, pl, nr, pr = nl[keep], pl[keep], nr[keep], pr[keep]
        left = (pl * pl + (nl - pl) * (nl - pl)).astype(np.float64) / nl
        right = (pr * pr + (nr - pr) * (nr - pr)).astype(np.float64) / nr
        micro = np.floor(1000000.0 * (left + right)).astype(np.int64)
        return pa.table(
            {
                "split_bucket": pa.array(
                    s.column("bucket").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "n_left": pa.array(nl, pa.int64()),
                "pos_left": pa.array(pl, pa.int64()),
                "n_right": pa.array(nr, pa.int64()),
                "pos_right": pa.array(pr, pa.int64()),
                "score_micro": pa.array(micro, pa.int64()),
            }
        )

    return hist.repartition(1).map_batches(
        score, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Mutual information: event_type x day-of-week dependence, per-cell terms
# ---------------------------------------------------------------------------

MUTUAL_INFO_SQL = """
WITH t AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow
  FROM events
),
cell AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM t GROUP BY event_type, dow
),
mx AS (SELECT event_type, CAST(SUM(n_xy) AS BIGINT) AS n_x
       FROM cell GROUP BY event_type),
my AS (SELECT dow, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cell GROUP BY dow),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cell)
SELECT cell.event_type, cell.dow, cell.n_xy, mx.n_x, my.n_y,
       CAST(FLOOR(1000000 * (CAST(cell.n_xy AS DOUBLE)
              * ln(CAST(cell.n_xy AS DOUBLE) * tot.n
                   / (CAST(mx.n_x AS DOUBLE) * my.n_y))
              / tot.n) + 0.5) AS BIGINT) AS term_micro
FROM cell
JOIN mx USING (event_type)
JOIN my USING (dow)
CROSS JOIN tot
"""


@register("mutual_info_event_dow", MUTUAL_INFO_SQL)
def mutual_info_event_dow(sf_dir: str):
    """Mutual information I(event_type; day-of-week) — the dependence
    measure behind feature selection, emitted as the PER-CELL term table
    ``(n_xy/N)·ln(n_xy·N/(n_x·n_y))`` in micro-nats (summing term_micro
    gives the MI estimate; the chi2_event_dow sibling tests the same
    contingency table parametrically).

    One scan: per-block (type, dow) count partials combine into the ≤35-
    cell contingency table; marginals and terms are metadata-sized driver
    arithmetic.  Each libm double expression is MIRRORED order-for-order
    against the DuckDB oracle (``math.log == duckdb ln``, the
    entropy/PSI/BM25 parity rule), rounded to an int64 micro-nat per CELL
    so no float ever crosses a sum."""
    import math

    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        dow = pc.subtract(
            pc.divide(us, 86400000000),
            pc.multiply(pc.divide(pc.divide(us, 86400000000), 7), 7),
        )
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "dow": dow,
                "n_xy": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ).group_by(["event_type", "dow"]).aggregate([("n_xy", "sum")])
        return g.rename_columns(["event_type", "dow", "n_xy"])

    cells = bucketed_sum_combine(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["event_type", "dow"], ["n_xy"], 2,
    )

    def terms(t: pa.Table) -> pa.Table:
        s = t.combine_chunks().sort_by(
            [("event_type", "ascending"), ("dow", "ascending")]
        )
        et = s.column("event_type").to_pylist()
        dw = s.column("dow").to_pylist()
        nxy = s.column("n_xy").to_pylist()
        n_x = {}
        n_y = {}
        for e, d, c in zip(et, dw, nxy):
            n_x[e] = n_x.get(e, 0) + c
            n_y[d] = n_y.get(d, 0) + c
        n = sum(nxy)
        term = [
            int(math.floor(
                1000000 * (float(c) * math.log(
                    float(c) * n / (float(n_x[e]) * n_y[d])) / n) + 0.5))
            for e, d, c in zip(et, dw, nxy)
        ]
        return pa.table(
            {
                "event_type": pa.array(et),
                "dow": pa.array(dw, pa.int64()),
                "n_xy": pa.array(nxy, pa.int64()),
                "n_x": pa.array([n_x[e] for e in et], pa.int64()),
                "n_y": pa.array([n_y[d] for d in dw], pa.int64()),
                "term_micro": pa.array(term, pa.int64()),
            }
        )

    return cells.repartition(1).map_batches(
        terms, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Weighted sampling: A-ES exponential keys, top-5 per event_type
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_SQL = """
WITH t AS (
  SELECT event_type, event_id, value,
         (1 + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                   AS BIGINT)) / 1152921504606846977.0 AS u
  FROM events
),
k AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 1000) AS BIGINT) AS value_milli,
         CAST(FLOOR(1000000.0 * (ln(u) / value)) AS BIGINT) AS key_micro
  FROM t
)
SELECT event_type, event_id, value_milli, key_micro
FROM k
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY key_micro DESC, event_id) <= 5
"""


@register("weighted_sample_events", WEIGHTED_SAMPLE_SQL)
def weighted_sample_events(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each row draws the deterministic uniform u = md5(event_id)[:15] as a
    60-bit fraction and ranks by the exponential key ln(u)/w (monotone
    image of u^(1/w), w = value) — the top-5 per event_type are the
    weighted sample.  Selection is over the INTEGER key FLOOR(1e6 *
    (ln(u)/w)) with event_id tie-break, so it is engine-independent.

    Float-parity note: the key is computed VECTORIZED with np.log, then
    the rare rows whose micro value sits within 1e-4 of a floor boundary
    are recomputed with scalar libm ``math.log`` (== DuckDB ``ln``, the
    established parity) — np.log's SIMD path drifts from libm by ~1 ulp,
    which can only flip a floor at a boundary; the margin is ~50x the
    worst-case drift.  Everything else (int->double conversion, division,
    multiply, floor) is IEEE-identical by construction.  Per-block local
    head-5 per type makes the exchange carry <=5 rows x types per block."""
    import hashlib
    import math

    import numpy as np

    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])
    SCALE = 1152921504606846977.0  # 2^60 + 1

    def keyed_head(t: pa.Table) -> pa.Table:
        eids = t.column("event_id").to_pylist()
        v = t.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        u = np.array(
            [
                1 + int(hashlib.md5(str(e).encode()).hexdigest()[:15], 16)
                for e in eids
            ],
            np.float64,
        ) / SCALE
        micro = 1000000.0 * (np.log(u) / v)
        k = np.floor(micro)
        for i in np.flatnonzero(np.abs(micro - np.rint(micro)) < 1e-4):
            k[i] = math.floor(1000000.0 * (math.log(u[i]) / v[i]))
        out = pa.table(
            {
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id"),
                "value_milli": _milli(t.column("value")),
                "key_micro": pa.array(k.astype(np.int64)),
            }
        )
        idx = pc.sort_indices(
            out,
            sort_keys=[
                ("event_type", "ascending"),
                ("key_micro", "descending"),
                ("event_id", "ascending"),
            ],
        )
        return _head_per_type(out.take(idx))

    local = ds.map_batches(
        keyed_head, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return local.repartition(1).map_batches(
        _weighted_sample_final, batch_format="pyarrow", batch_size=None
    )


def _head_per_type(s: pa.Table, k: int = 5) -> pa.Table:
    """Vectorized head-k per event_type over a table already sorted by
    (event_type, key DESC, tie): segment-rank via run boundaries, no
    per-row Python."""
    import numpy as np

    if s.num_rows == 0:
        return s
    et = s.column("event_type").combine_chunks().to_numpy(zero_copy_only=False)
    n = len(et)
    starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
    rank = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
    return s.filter(pa.array(rank < k))


def _weighted_sample_final(t: pa.Table) -> pa.Table:
    """Final head-5 per type over the concatenated local heads."""
    s = t.combine_chunks()
    idx = pc.sort_indices(
        s,
        sort_keys=[
            ("event_type", "ascending"),
            ("key_micro", "descending"),
            ("event_id", "ascending"),
        ],
    )
    return _head_per_type(s.take(idx))
