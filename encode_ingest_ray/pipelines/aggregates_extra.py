"""Aggregation-family extensions: FULL OUTER co-group, mode/argmax,
histogram.

``full_outer_weekly_activity`` shows the distributed FULL OUTER JOIN shape:
both sides pre-aggregated per key inside the blocks, ONE co-hashed exchange,
unmatched sides surfaced as NULL (a full outer join at scale IS a co-group —
tagged partials, sum, NULLIF) — no row-level join ever happens.

``mode_event_type`` is the argmax-per-key aggregate (deterministic
tie-break: highest count, then lexicographically smallest value) — count
partials cross the exchange, the argmax itself is a vectorized in-bucket
epilogue.

``orders_price_histogram`` is the fixed-width histogram every profiling
pass needs: integer bin ids are computed at the read and only (bin, count)
partials move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.aggregate import (
    bucketed_groupby_apply,
    bucketed_sum_combine,
)

_WEEK_US = 7 * 86400 * 10**6

FULL_OUTER_SQL = """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk, COUNT(*) AS n_click
  FROM events WHERE event_type = 'click' GROUP BY user_id, wk
),
p AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk, COUNT(*) AS n_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, wk
)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(c.wk, p.wk) AS wk,
       c.n_click, p.n_purchase
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id AND c.wk = p.wk
"""


@register("full_outer_weekly_activity", FULL_OUTER_SQL)
def full_outer_weekly_activity(sf_dir: str):
    """FULL OUTER JOIN of per-(user, week) click counts against purchase
    counts — weeks with clicks but no purchases (and vice versa) survive
    with the missing side NULL.  Distributed as a co-group: both sides
    become tagged count partials in ONE pass over events, one exchange on
    (user, week), NULLIF(0) restores outer-join semantics."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        t = t.filter(pc.fill_null(keep, False))
        wk = pc.divide(pc.cast(t.column("ts"), pa.int64()), _WEEK_US)
        et = t.column("event_type")
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "wk": wk,
                    "n_click": pc.cast(pc.equal(et, "click"), pa.int64()),
                    "n_purchase": pc.cast(pc.equal(et, "purchase"), pa.int64()),
                }
            )
            .group_by(["user_id", "wk"])
            .aggregate([("n_click", "sum"), ("n_purchase", "sum")])
        )
        return g.rename_columns(["user_id", "wk", "n_click", "n_purchase"])

    local = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    summed = bucketed_sum_combine(
        local, ["user_id", "wk"], ["n_click", "n_purchase"]
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "wk": t.column("wk"),
                "n_click": pc.if_else(
                    pc.equal(t.column("n_click"), 0),
                    pa.scalar(None, pa.int64()),
                    t.column("n_click"),
                ),
                "n_purchase": pc.if_else(
                    pc.equal(t.column("n_purchase"), 0),
                    pa.scalar(None, pa.int64()),
                    t.column("n_purchase"),
                ),
            }
        )

    return summed.map_batches(fin, batch_format="pyarrow", batch_size=None)


MODE_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_type, n AS mode_n
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY n DESC, event_type
  ) AS rn
  FROM c
)
WHERE rn = 1
"""


@register("mode_event_type", MODE_SQL)
def mode_event_type(sf_dir: str):
    """Mode (argmax-per-key with deterministic tie-break: max count, then
    smallest value): per-block (user, type) count partials cross ONE
    exchange; each bucket sums its partials and takes the per-user argmax
    in a single vectorized sort + segment-head pass."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")]
        )
        return g.rename_columns(["user_id", "event_type", "n"])

    local = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def argmax_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        g = g.rename_columns(["user_id", "event_type", "n"]).sort_by(
            [
                ("user_id", "ascending"),
                ("n", "descending"),
                ("event_type", "ascending"),
            ]
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        head = np.ones(len(u), dtype=bool)
        head[1:] = u[1:] != u[:-1]
        out = g.filter(pa.array(head))
        return out.rename_columns(["user_id", "mode_type", "mode_n"])

    return bucketed_groupby_apply(local, ["user_id"], argmax_bucket)


HISTOGRAM_SQL = """
SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000 AS bin,
       COUNT(*) AS n
FROM orders
GROUP BY bin
"""


@register("orders_price_histogram", HISTOGRAM_SQL)
def orders_price_histogram(sf_dir: str):
    """Fixed-width histogram of order totals ($50k bins): the bin id is an
    integer floor-division at the read; only (bin, count) partials move."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        # arrow divide truncates toward zero; prices are non-negative so it
        # equals the oracle's floor division
        b = pc.divide(cents, 5_000_000)
        g = (
            pa.table({"bin": b, "n": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by(["bin"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["bin", "n"])

    local = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_sum_combine(local, ["bin"], ["n"], num_buckets=8)


def _cms_sql():
    from encode_ingest_ray.stages.cms import cms_oracle_sql

    return cms_oracle_sql("user_id", "events", d=4, w=512, seed=41)


@register("cms_user_counts", _cms_sql())
def cms_user_counts(sf_dir: str):
    """Count-Min sketch estimates per user (d=4, w=512, Carter-Wegman
    integer hashes): every block emits its own 16 KB (d×w) partial matrix
    — the sketch allreduce, nothing data-sized moves — and estimates are
    the row-wise MIN via the broadcast merged matrix.  The deterministic
    integer hashes let the SQL oracle rebuild the identical matrix, so
    even the over-estimates match bit-for-bit (stages/cms.py)."""
    from encode_ingest_ray.stages.cms import cms_estimates

    ds = _read(sf_dir, "events", ["user_id"])
    return cms_estimates(ds, "user_id", d=4, w=512, seed=41)
