"""Event-analytics queries: sequential funnel and cohort retention.

The events table is the repo's stream analog (TESTDATA.md); beyond windows
(tumbling/sliding/session, analogs.py) a production event pipeline's next
two asks are funnels ("signup → click → purchase, strictly ordered") and
cohort retention ("of the users whose first event fell in week W, how many
were active in week W+k").  Both are exact: timestamps are carried as int64
epoch-microseconds (DuckDB ``epoch_us``) and week buckets are integer floor
divisions, so the oracles reproduce the distributed results bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa

from encode_ingest_ray.pipelines.analogs import _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.funnel import cohort_retention, funnel_first_times

FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t_signup
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t_click
  GROUP BY e.user_id
)
SELECT s0.user_id, s0.t_signup, s1.t_click, s2.t_purchase
FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
"""


@register("funnel_signup_purchase", FUNNEL_SQL)
def funnel_signup_purchase(sf_dir: str):
    """Sequential funnel signup → click → purchase: per entered user, the
    first signup time, the first click STRICTLY after it, and the first
    purchase strictly after that (µs epochs; NULL where never reached).

    One exchange on user_id, then one vectorized kernel per bucket (one
    sort + per-stage ``np.minimum.reduceat``; stages/funnel.funnel_table) —
    the sequential strictly-after logic never leaves the bucket task.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_first_times(
        ds, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    )


RETENTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts)) // 604800000000 AS cohort_week
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
)
SELECT f.cohort_week, a.wk - f.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY f.cohort_week, week_offset
"""


@register("cohort_retention_weekly", RETENTION_SQL)
def cohort_retention_weekly(sf_dir: str):
    """Weekly cohort-retention matrix: cohort = floor(first event µs /
    week); one row per (cohort_week, week_offset) counting distinct users
    from that cohort active in that week.

    One exchange on user_id; each bucket reduces its users to matrix-cell
    partial counts (tiny), then one 8-bucket sum-combine folds the cells —
    the distinct-user set never crosses the wire.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return cohort_retention(ds, "user_id", "ts")


COVERAGE_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
)
SELECT user_id, CAST(SUM(island_len) AS BIGINT) AS covered
FROM (
  SELECT user_id, island, MAX(e) - MIN(s) AS island_len
  FROM isl GROUP BY user_id, island
)
GROUP BY user_id
"""


@register("interval_coverage_user", COVERAGE_SQL)
def interval_coverage_user(sf_dir: str):
    """Gaps-and-islands: total merged activity time per user, treating each
    event as a 5-minute window and counting overlaps once.  One user_id
    exchange, then a single vectorized pass per bucket — the per-key
    running max runs loop-free by lifting each key's interval ends into a
    disjoint numeric band before one global maximum.accumulate
    (stages/intervals.py)."""
    from encode_ingest_ray.stages.intervals import interval_coverage

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.cast(t.column("ts"), pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "s": s,
                "e": pc.add(s, 300_000_000),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return interval_coverage(pre, "user_id", "s", "e")


JSON_PROPS_SQL = """
WITH j AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM j GROUP BY event_type
"""


@register("json_props_stats", JSON_PROPS_SQL)
def json_props_stats(sf_dir: str):
    """Semi-structured projection + aggregate: extract the integer ``$.k``
    field of the props JSON payload (vectorized Rust path kernel,
    stages/jsoncol.py — never a Python row loop) and reduce per event type
    with MERGEABLE (count, sum, min, max) partials: one tiny row per
    (block, type) crosses the single-task final merge; raw payloads never
    shuffle."""
    import pyarrow.compute as pc_

    from encode_ingest_ray.stages.jsoncol import json_extract_int64

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract_partial(t: pa.Table) -> pa.Table:
        j = json_extract_int64(t, "props", "k", "k")
        g = j.select(["event_type", "k"]).group_by(["event_type"]).aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return g.rename_columns(["event_type", "n_k", "sum_k", "min_k", "max_k"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate(
            [("n_k", "sum"), ("sum_k", "sum"), ("min_k", "min"), ("max_k", "max")]
        )
        g = g.rename_columns(["event_type", "n_k", "sum_k", "min_k", "max_k"])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_k": pc_.cast(g.column("n_k"), pa.int64()),
                "sum_k": g.column("sum_k"),
                "min_k": g.column("min_k"),
                "max_k": g.column("max_k"),
            }
        )

    partials = ds.map_batches(
        extract_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
