"""Temporal-join queries: as-of join, interval/range join, lag windows.

These are the custom temporal operators the brief calls out as missing from
Ray Data's Dataset API ("as-of join, range join, windowed aggregate" —
SURVEY.md §2.4/§2.8 custom-operator guidance).  Each is expressed through
the one-exchange kernels in stages/temporal.py and carries an exact DuckDB
oracle (window-function / non-equi-join SQL over the same tables).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _cents, _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
from encode_ingest_ray.stages.temporal import asof_join_bucketed, interval_count_join

ASOF_SQL = """
WITH j AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts, o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM j WHERE rn = 1
"""


@register("asof_latest_order", ASOF_SQL)
def asof_latest_order(sf_dir: str):
    """Backward as-of join: each event picks the latest order (by
    ``o_orderdate``, ties broken by max ``o_orderkey``) of the same customer
    placed at or before the event's timestamp.  One tagged-union hash
    exchange on the key, ``pandas.merge_asof`` over int64 views per bucket
    (stages/temporal.py) — the join-form generalization of the engine's LWW
    latest-wins pick (state/lww.py)."""
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    joined = asof_join_bucketed(
        events,
        orders,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tiebreak="o_orderkey",
        right_cols=["o_orderkey", "o_totalprice"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": _cents(t.column("o_totalprice")),
            }
        )

    return joined.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


RANGE_WINDOW_SQL = """
WITH iv AS (
  SELECT event_id AS anchor_id, ts AS start_ts
  FROM events WHERE event_type = 'error'
)
SELECT iv.anchor_id, COUNT(*) AS n_in_window
FROM iv JOIN events e
  ON e.ts >= iv.start_ts AND e.ts < iv.start_ts + INTERVAL 10 MINUTE
GROUP BY iv.anchor_id
"""

_TEN_MIN_US = 10 * 60 * 1_000_000


@register("range_join_window", RANGE_WINDOW_SQL)
def range_join_window(sf_dir: str):
    """Pure containment range join (no equi key): for every ``error`` event,
    count ALL events inside its 10-minute window.  Time-bin
    co-partitioning (stages/temporal.py): points land in one bin, windows
    replicate to the ≤2 bins they overlap, counts come from clamped
    ``searchsorted`` probes — matched pairs are never materialized."""
    import os

    import pyarrow.dataset as pads
    import ray.data

    points = _read(sf_dir, "events", ["ts"])
    # anchor scan: predicate pushed into the Parquet read (M10 pattern —
    # only matching row groups decode; filter runs before projection).
    # Size-aware block count like _read: without it Ray applies
    # SplitBlocks(64) at plan run and the tiny filtered output becomes 64
    # ~300-row blocks that dominate the bin exchange with per-block
    # overhead (measured 3.7s -> ~1s at sf0.1).
    path = os.path.join(sf_dir, "events.parquet")
    blocks = max(1, min(64, os.path.getsize(path) // (8 << 20)))
    anchors = ray.data.read_parquet(
        path,
        columns=["event_id", "ts"],
        filter=(pads.field("event_type") == "error"),
        override_num_blocks=blocks,
    )
    return interval_count_join(
        points,
        anchors,
        point_ts="ts",
        iv_id="event_id",
        iv_start="ts",
        length_us=_TEN_MIN_US,
        out_count="n_in_window",
    ).map_batches(
        lambda t: t.rename_columns(["anchor_id", "n_in_window"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


LAG_GAPS_SQL = """
WITH g AS (
  SELECT event_id, user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_id, user_id, gap_us FROM g WHERE gap_us IS NOT NULL
"""


@register("event_lag_gaps", LAG_GAPS_SQL)
def event_lag_gaps(sf_dir: str):
    """Lag window: per user, microseconds since that user's previous event
    (first event per user drops).  One hash-bucket exchange on the user,
    then a vectorized lexsort + diff per bucket — the lag/lead window
    family beside the repo's cumulative (conversation_running_totals) and
    gap-session (session_windows) shapes."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_bucket(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((eid, ts, uid))
        u, s = uid[order], ts[order]
        gap = np.empty(len(s), np.int64)
        if len(s):
            gap[0] = 0
            gap[1:] = s[1:] - s[:-1]
        valid = np.zeros(len(s), bool)
        valid[1:] = u[1:] == u[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid[order][valid]),
                "user_id": pa.array(u[valid]),
                "gap_us": pa.array(gap[valid]),
            }
        )

    return bucketed_groupby_apply(ds, ["user_id"], per_bucket)


TRANSITIONS_SQL = """
WITH g AS (
  SELECT event_type,
         lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_transition_counts", TRANSITIONS_SQL)
def event_transition_counts(sf_dir: str):
    """First-order Markov transition matrix of user behavior: for every
    consecutive event pair in each user's (ts, event_id) order, count
    (prev_type → next_type) — the sequence-mining sibling of
    event_lag_gaps (same one-exchange lag shape, but the per-bucket pass
    reduces pairs to |types|² count partials, so only tiny partial rows
    leave the buckets; a final single-task sum folds them)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = t.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        same = np.zeros(len(u), bool)
        same[1:] = u[1:] == u[:-1]
        prev_c = np.empty(len(c), np.int64)
        prev_c[1:] = c[:-1]
        pc_, nc_ = prev_c[same], c[same]
        k = len(et.dictionary)
        pair, n = np.unique(pc_ * k + nc_, return_counts=True)
        names = et.dictionary
        return pa.table(
            {
                "prev_type": names.take(pa.array(pair // k, pa.int64())),
                "next_type": names.take(pa.array(pair % k, pa.int64())),
                "n": pa.array(n, pa.int64()),
            }
        )

    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )

    partials = bucketed_groupby_apply(ds, ["user_id"], per_bucket)
    return bucketed_sum_combine(partials, ["prev_type", "next_type"], ["n"], 1)


GAP_FILL_SQL = """
WITH d AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS ts_us, epoch_us(ts) // 86400000000 AS day
  FROM events
),
b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY user_id),
g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b),
cnt AS (SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM d GROUP BY user_id, day),
lastd AS (
  SELECT user_id, day, event_type FROM d
  QUALIFY row_number() OVER (PARTITION BY user_id, day
                             ORDER BY ts_us DESC, event_id DESC) = 1
)
SELECT g.user_id, g.day, COALESCE(cnt.n_events, 0) AS n_events,
       last_value(lastd.event_type IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type
FROM g LEFT JOIN cnt USING (user_id, day) LEFT JOIN lastd USING (user_id, day)
"""


@register("gap_fill_daily", GAP_FILL_SQL)
def gap_fill_daily(sf_dir: str):
    """Time-series resample + LOCF imputation: densify each user's event
    stream to one row per calendar day (first..last event day), zero-filling
    ``n_events`` on gap days and forward-filling ``last_type`` (latest
    event's type at or before each day's end, (ts, event_id) tie-broken).
    One hash exchange on the key; the dense grid is generated INSIDE the
    bucket task (stages/temporal.gap_fill_daily_bucket) so gap rows never
    cross the wire — the missing-data-imputation family's representative
    beside the downsampling (ohlc_user_daily) and windowed shapes."""
    from encode_ingest_ray.stages.temporal import gap_fill_daily_bucket

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_groupby_apply(pre, ["user_id"], gap_fill_daily_bucket)


LAST_TOUCH_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
t AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         s.event_id AS touch_id, s.event_type AS touch_type,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY s.ts_us DESC, s.event_id DESC) AS rn
  FROM e p JOIN e s
    ON s.user_id = p.user_id
   AND s.event_type IN ('click', 'view')
   AND (s.ts_us < p.ts_us OR (s.ts_us = p.ts_us AND s.event_id < p.event_id))
   AND p.ts_us - s.ts_us <= 1800000000
  WHERE p.event_type = 'purchase'
)
SELECT purchase_id, user_id, touch_id, touch_type FROM t WHERE rn = 1
"""


@register("last_touch_attribution", LAST_TOUCH_SQL)
def last_touch_attribution(sf_dir: str):
    """Marketing-attribution operator: each purchase is attributed to the
    nearest strictly-preceding click/view by the same user within 30
    minutes (stream order (ts, event_id)).  Same one-exchange lag-window
    shape as event_lag_gaps, but the per-bucket kernel is a masked
    ``np.maximum.accumulate`` carry (stages/temporal.last_touch_bucket) —
    the self-table sibling of the asof join."""
    from encode_ingest_ray.stages.temporal import last_touch_bucket

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_groupby_apply(pre, ["user_id"], last_touch_bucket)


_DEBOUNCE_US = 86_400_000_000  # 1 day

DEBOUNCE_SQL = f"""
WITH RECURSIVE e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
keep AS (
  (SELECT user_id, event_type, ts_us, event_id FROM e
   QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts_us, event_id) = 1)
  UNION ALL
  SELECT n.user_id, n.event_type, n.ts_us, n.event_id
  FROM keep k, LATERAL (
    SELECT e.user_id, e.event_type, e.ts_us, e.event_id FROM e
    WHERE e.user_id = k.user_id AND e.event_type = k.event_type
      AND e.ts_us > k.ts_us + {_DEBOUNCE_US}
    ORDER BY e.ts_us, e.event_id LIMIT 1) n
)
SELECT user_id, event_type, ts_us, event_id FROM keep
"""


@register("debounce_events", DEBOUNCE_SQL)
def debounce_events(sf_dir: str):
    """Stateful stream throttle: per (user, event_type), keep an event only
    if it is more than 1 day after the last KEPT event of that key — the
    debounce / notification-rate-limit op.  The kept set is a greedy chain
    no lag or session window can express (each decision depends on the
    previous KEPT row), so it's the brief's stateful-streaming
    custom-operator class: one hash exchange co-locates each key, then a
    sequential-by-construction searchsorted-jump walk per key
    (stages/temporal.debounce_bucket; O(kept·log n), keys parallel).  The
    oracle is the same chain as a recursive LATERAL nearest-successor
    CTE."""
    from encode_ingest_ray.stages.temporal import debounce_bucket

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_groupby_apply(
        pre, ["user_id"], lambda t: debounce_bucket(t, _DEBOUNCE_US)
    )


TWAP_SQL = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
),
w AS (
  SELECT user_id, v,
         (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
             // 1000000 AS gap_s
  FROM t
),
g AS (
  SELECT user_id, CAST(SUM(v * gap_s) AS BIGINT) AS num,
         CAST(SUM(gap_s) AS BIGINT) AS den
  FROM w WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, num, den, (2 * num + den) // (2 * den) AS twap_milli
FROM g WHERE den > 0
"""


@register("twap_user_value", TWAP_SQL)
def twap_user_value(sf_dir: str):
    """Time-weighted average (TWAP): per user, each event's value held
    until the next event and weighted by the held duration in WHOLE SECONDS
    (second-granularity weights keep every product and sum inside int64 —
    µs weights overflow past ~70 events/user at this value range), final
    half-up milli division — integer-exact against the lead-window oracle.
    Same one-exchange lag shape as event_lag_gaps; per-user sums complete
    in-bucket (the key is co-hashed), so only one row per user leaves."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": pc.cast(t.column("ts"), pa.int64()),
                "v": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), 1000.0),
                        0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    pre = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def bucket(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        us = t.column("us").combine_chunks().to_numpy(zero_copy_only=False)
        v = t.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, s, vv = uid[order], us[order], v[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "num": pa.array([], pa.int64()),
                    "den": pa.array([], pa.int64()),
                    "twap_milli": pa.array([], pa.int64()),
                }
            )
        gap_s = np.zeros(n, np.int64)
        gap_s[:-1] = (s[1:] - s[:-1]) // 1_000_000
        same = np.zeros(n, bool)
        same[:-1] = u[1:] == u[:-1]
        w = np.where(same, gap_s, 0)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        Pnum = np.concatenate(([0], np.cumsum(vv * w, dtype=np.int64)))
        Pden = np.concatenate(([0], np.cumsum(w, dtype=np.int64)))
        num = Pnum[ends] - Pnum[starts]
        den = Pden[ends] - Pden[starts]
        keep = den > 0
        num, den = num[keep], den[keep]
        return pa.table(
            {
                "user_id": pa.array(u[starts][keep], pa.int64()),
                "num": pa.array(num),
                "den": pa.array(den),
                "twap_milli": pa.array((2 * num + den) // (2 * den)),
            }
        )

    return bucketed_groupby_apply(pre, ["user_id"], bucket)


AUTOCORR_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
),
p AS (
  SELECT user_id, v AS y,
         lag(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
  FROM e
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(x) AS BIGINT) AS s_x,
       CAST(SUM(y) AS BIGINT) AS s_y,
       CAST(SUM(x * x) AS BIGINT) AS s_xx,
       CAST(SUM(y * y) AS BIGINT) AS s_yy,
       CAST(SUM(x * y) AS BIGINT) AS s_xy
FROM p WHERE x IS NOT NULL
GROUP BY user_id
"""


@register("autocorr_user_value", AUTOCORR_SQL)
def autocorr_user_value(sf_dir: str):
    """Lag-1 autocorrelation partials per user — the time-series
    periodicity / signal-persistence statistic.  Like
    grouped_regression_supplier, the query returns the INTEGER moment
    partials (n, Σx, Σy, Σx², Σy², Σxy over consecutive milli-value
    pairs in the (ts, event_id) order) rather than a float r — the
    partials are what a distributed engine ships, they reconstruct r
    exactly, and they oracle bit-for-bit.  One exchange on user_id; the
    per-bucket pass is the event_lag_gaps lexsort + same-user mask with
    per-user ``np.add.reduceat`` sums, so only one row per user leaves.
    Overflow bound: Σx² per user stays in int64 to ~3e7 pairs/user at
    this value range (milli ≤ 5.6e5)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = (
            pc.cast(
                pc.round(
                    pc.multiply(t.column("value"), 1000.0),
                    0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, ts, uid))
        u, x = uid[order], v[order]
        same = np.zeros(len(u), bool)
        same[1:] = u[1:] == u[:-1]
        up = u[same]
        px = np.empty(len(x), np.int64)
        px[1:] = x[:-1]
        xs, ys = px[same], x[same]
        n = len(up)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                    "s_x": pa.array([], pa.int64()),
                    "s_y": pa.array([], pa.int64()),
                    "s_xx": pa.array([], pa.int64()),
                    "s_yy": pa.array([], pa.int64()),
                    "s_xy": pa.array([], pa.int64()),
                }
            )
        bound = np.zeros(n, bool)
        bound[0] = True
        bound[1:] = up[1:] != up[:-1]
        starts = np.flatnonzero(bound)
        return pa.table(
            {
                "user_id": pa.array(up[starts]),
                "n_pairs": pa.array(np.diff(np.append(starts, n)).astype(np.int64)),
                "s_x": pa.array(np.add.reduceat(xs, starts)),
                "s_y": pa.array(np.add.reduceat(ys, starts)),
                "s_xx": pa.array(np.add.reduceat(xs * xs, starts)),
                "s_yy": pa.array(np.add.reduceat(ys * ys, starts)),
                "s_xy": pa.array(np.add.reduceat(xs * ys, starts)),
            }
        )

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    return bucketed_groupby_apply(ds, ["user_id"], per_bucket)


_EWMA_K = 8

EWMA_SQL = (
    """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 1000) AS BIGINT) AS v
  FROM events
),
l AS (
  SELECT user_id, event_id, v AS v0,
"""
    + ",\n".join(
        f"         lag(v, {j}) OVER w AS v{j}" for j in range(1, _EWMA_K)
    )
    + """
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       """
    + " + ".join(
        f"COALESCE(v{j}, 0) * {1 << (_EWMA_K - 1 - j)}" for j in range(_EWMA_K)
    )
    + """ AS smooth_num,
       CAST("""
    + " + ".join(
        f"(CASE WHEN v{j} IS NULL THEN 0 ELSE {1 << (_EWMA_K - 1 - j)} END)"
        for j in range(_EWMA_K)
    )
    + """ AS BIGINT) AS weight_sum
FROM l
"""
)


@register("ewma_user_value", EWMA_SQL)
def ewma_user_value(sf_dir: str):
    """Truncated exponential smoothing (integer EWMA): per event the
    geometric-weight window over the last 8 same-user values in
    (ts, event_id) order — newest weight 2^7 down to 2^0, missing history
    contributing zero.  Exact-integer contract: the query emits the weighted
    NUMERATOR and the realized WEIGHT SUM (their ratio is the float EWMA —
    the partials are what ships, the division is one driver expression).
    One user_id exchange; per bucket one lexsort + 8 vectorized shifts with
    a positional same-user guard — no per-row Python, no recursive state
    (the untruncated EWMA recurrence y_t = αx + (1-α)y is not
    order-independent and has no exact closed SQL form; the 8-term
    truncation is the distributed-exact variant, error < (1/2)^8 of the
    oldest weight)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = (
            pc.cast(
                pc.round(
                    pc.multiply(t.column("value"), 1000.0),
                    0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, ts, uid))
        u, e, x = uid[order], eid[order], v[order]
        n = len(u)
        num = np.zeros(n, np.int64)
        wsum = np.zeros(n, np.int64)
        for j in range(_EWMA_K):
            w = 1 << (_EWMA_K - 1 - j)
            if j == 0:
                num += x * w
                wsum += w
                continue
            valid = np.zeros(n, bool)
            valid[j:] = u[j:] == u[:-j]  # same user j rows back
            num[j:] += np.where(valid[j:], x[:-j], 0) * w
            wsum[j:] += np.where(valid[j:], w, 0)
        return pa.table(
            {
                "user_id": pa.array(u),
                "event_id": pa.array(e),
                "smooth_num": pa.array(num),
                "weight_sum": pa.array(wsum),
            }
        )

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    return bucketed_groupby_apply(ds, ["user_id"], per_bucket)


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill (the LOCF sibling with exact rationals)
# ---------------------------------------------------------------------------

INTERP_SQL = """
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT user_id, day, v,
         LEAD(day) OVER w AS nd, LEAD(v) OVER w AS nv
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)
),
gaps AS (SELECT user_id, day AS pd, v AS pv, nd, nv FROM b WHERE nd > day + 1),
g AS (
  SELECT user_id,
         pd + CAST(unnest(range(1, CAST(nd - pd AS BIGINT))) AS BIGINT) AS day,
         pd, pv, nd, nv
  FROM gaps
)
SELECT user_id, day,
       CAST(pv * (nd - pd) + (nv - pv) * (day - pd) AS BIGINT) AS interp_num,
       CAST(nd - pd AS BIGINT) AS interp_den
FROM g
"""


@register("gap_fill_interpolate", INTERP_SQL)
def gap_fill_interpolate(sf_dir: str):
    """Linear INTERPOLATION of interior gaps in each user's daily value
    series — the time-series-repair sibling of gap_fill_daily's LOCF: every
    missing day between two observations gets the exact rational
    ``(pv·(nd−pd) + (nv−pv)·(day−pd)) / (nd−pd)`` as an integer num/den
    pair (the impute_mean encoding — no float drift).  Per-block daily-sum
    partials cross one user-keyed exchange; gap rows are GENERATED inside
    the bucket task (repeat + arange over the observed-day diffs — they
    never cross the wire)."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        v = pc.cast(
            pc.round(pc.multiply(t.column("value"), 1000.0), 0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        pre = pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(us, 86400000000),
                "v": v,
            }
        )
        g = pre.group_by(["user_id", "day"]).aggregate([("v", "sum")])
        return g.rename_columns(["user_id", "day", "v"])

    daily = ds.map_batches(
        day_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def interp(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "day"]).aggregate([("v", "sum")])
        g = g.rename_columns(["user_id", "day", "v"])
        idx = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("day", "ascending")]
        )
        g = g.take(idx)
        uid = g.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        day = g.column("day").combine_chunks().to_numpy(zero_copy_only=False)
        v = g.column("v").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "interp_num": pa.array([], pa.int64()),
                "interp_den": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        same = uid[1:] == uid[:-1]
        width = day[1:] - day[:-1]
        gap = same & (width > 1)
        if not gap.any():
            return empty
        gi = np.flatnonzero(gap)  # index of the gap's LEFT observation
        lens = (width[gi] - 1).astype(np.int64)
        total = int(lens.sum())
        rep = np.repeat(np.arange(len(gi)), lens)
        cum_excl = np.concatenate(([0], np.cumsum(lens)[:-1]))
        off = np.arange(total, dtype=np.int64) - np.repeat(cum_excl, lens) + 1
        pd_, pv = day[gi][rep], v[gi][rep]
        nd, nv = day[gi + 1][rep], v[gi + 1][rep]
        return pa.table(
            {
                "user_id": pa.array(uid[gi][rep]),
                "day": pa.array(pd_ + off),
                "interp_num": pa.array(pv * (nd - pd_) + (nv - pv) * off),
                "interp_den": pa.array(nd - pd_),
            }
        )

    return bucketed_groupby_apply(daily, ["user_id"], interp)
