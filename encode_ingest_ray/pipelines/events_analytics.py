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


_DAY_US = 86_400 * 10**6

ROLLING_DAU_SQL = """
WITH du AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS rolling7_users
FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


@register("rolling_active_users", ROLLING_DAU_SQL)
def rolling_active_users(sf_dir: str):
    """Rolling 7-day DISTINCT active users per observed day — the rolling
    window nobody can pre-aggregate with plain sums because DISTINCT does
    not decompose.  Exact decomposition that never re-counts: per user, the
    days covered by "active within the trailing week" form merged islands
    ([first, last+6] for runs of active days ≤ 6 apart), so each user
    contributes ±1 DELTA rows at island boundaries; summing deltas by day
    and prefix-scanning yields the exact distinct count.

    Shape: one user-key exchange (distinct days, island detection, delta
    emission all in-bucket), per-day delta partials combined, then ONE
    final task sorts the ~|distinct days| delta rows and evaluates the
    prefix sum at each observed day — the final is domain-bounded (days,
    not users or events), documented per the custom-operator guidance."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        us = pc_.cast(t.column("ts"), pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc_.divide(us, _DAY_US),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        day = t.column("day").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        # distinct (user, day)
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        # island break: new user, or gap > 6 days (a 7-day-apart pair is two
        # adjacent non-overlapping intervals — separate deltas cancel exactly)
        brk = np.ones(len(u), bool)
        brk[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > 6)
        starts = d[brk]
        last = np.append(brk[1:], True)  # last member of each island
        ends = d[last] + 7               # exclusive delta position
        obs = np.unique(d)
        return pa.table(
            {
                "day": pa.array(
                    np.concatenate([starts, ends, obs]), pa.int64()
                ),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(starts), np.int64),
                            -np.ones(len(ends), np.int64),
                            np.zeros(len(obs), np.int64),
                        ]
                    )
                ),
                "is_obs": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(starts), np.int64),
                            np.zeros(len(ends), np.int64),
                            np.ones(len(obs), np.int64),
                        ]
                    )
                ),
            }
        )

    days = ds.map_batches(
        to_days, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    deltas = bucketed_groupby_apply(days, ["user_id"], per_bucket)
    combined = bucketed_sum_combine(deltas, ["day"], ["delta", "is_obs"], 4)

    def final(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.sort_by([("day", "ascending")])
        d = s.column("day").to_numpy(zero_copy_only=False)
        run = np.cumsum(s.column("delta").to_numpy(zero_copy_only=False))
        obs = s.column("is_obs").to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "day": pa.array(d[obs], pa.int64()),
                "rolling7_users": pa.array(run[obs], pa.int64()),
            }
        )

    return combined.repartition(1).map_batches(
        lambda t: final(t.combine_chunks()), batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Path analysis: global top-k ordered event-type sequences
# ---------------------------------------------------------------------------

TOP_PATHS_SQL = """
WITH p AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id, day
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY path ORDER BY n DESC, path LIMIT 20
"""


@register("top_event_paths", TOP_PATHS_SQL)
def top_event_paths(sf_dir: str):
    """Top-20 most common per-(user, day) event-type SEQUENCES — the
    clickstream path-analysis op behind funnels.  Path build is the
    sorted-collect kernel (one (user,day)-bucketed exchange, run-offset
    ListArray + Arrow binary_join, zero per-group Python); path counting is
    a second bucketed exchange of per-block count partials; the global
    top-k never materializes the path universe (per-block local head-k,
    then one tiny final reduce — the topk_orders shape)."""
    import numpy as np
    import pyarrow.compute as pc

    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(us, 86400000000),
                "ts_us": us,
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
            }
        )

    def build_paths(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("day", "ascending"),
                ("ts_us", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = t.take(idx)
        n = g.num_rows
        uid = g.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        day = g.column("day").combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        )
        offsets = pa.array(np.r_[starts, n].astype(np.int32))
        lists = pa.ListArray.from_arrays(
            offsets, g.column("event_type").combine_chunks()
        )
        paths = pa.table({"path": pc.binary_join(lists, ">")})
        cnt = paths.append_column(
            "n", pa.array(np.ones(paths.num_rows, np.int64))
        ).group_by(["path"]).aggregate([("n", "sum")])
        return cnt.rename_columns(["path", "n"])

    per_key = bucketed_groupby_apply(
        ds.map_batches(
            keyed, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["user_id", "day"],
        build_paths,
    )
    counts = bucketed_sum_combine(per_key, ["path"], ["n"])

    def head(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("path", "ascending")]
        )
        return t.take(idx[:20])

    local = counts.map_batches(
        head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return local.repartition(1).map_batches(
        head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-active-day streak per user
# ---------------------------------------------------------------------------

STREAK_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
r AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak
FROM (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM r GROUP BY user_id, grp)
GROUP BY user_id
"""


@register("longest_streak_user", STREAK_SQL)
def longest_streak_user(sf_dir: str):
    """Longest run of CONSECUTIVE active days per user — the islands side
    of gaps-and-islands (the SQL ``day - ROW_NUMBER()`` grouping trick).
    Per-block distinct (user, day) partials cross one user-bucketed
    exchange; inside each bucket the whole computation is one vectorized
    pass: sort, global distinct, run boundaries where the day step != 1,
    ``reduceat`` run lengths, per-user max."""
    import numpy as np
    import pyarrow.compute as pc

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        d = pa.table(
            {"user_id": t.column("user_id"), "day": pc.divide(us, 86400000000)}
        )
        return d.group_by(["user_id", "day"]).aggregate([])

    def streaks(t: pa.Table) -> pa.Table:
        d = t.group_by(["user_id", "day"]).aggregate([])  # cross-block distinct
        idx = pc.sort_indices(
            d, sort_keys=[("user_id", "ascending"), ("day", "ascending")]
        )
        d = d.take(idx)
        uid = d.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        day = d.column("day").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "longest_streak": pa.array([], pa.int64())}
            )
        new_run = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, n])
        runs = pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "len": pa.array(lens.astype(np.int64)),
            }
        )
        g = runs.group_by(["user_id"]).aggregate([("len", "max")])
        return g.rename_columns(["user_id", "longest_streak"])

    return bucketed_groupby_apply(
        ds.map_batches(
            day_partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["user_id"],
        streaks,
    )


# ---------------------------------------------------------------------------
# Complex-event processing: regex over per-user ordered event-type sequences
# ---------------------------------------------------------------------------

REGEX_MATCH_SQL = """
WITH t AS (
  SELECT user_id, substr(event_type, 1, 1) AS c,
         epoch_us(ts) AS ts_us, event_id
  FROM events
),
s AS (
  SELECT user_id, string_agg(c, '' ORDER BY ts_us, event_id) AS seq
  FROM t GROUP BY user_id
)
SELECT user_id, seq,
       CAST(length(seq) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(seq, 's[cev]*p')) AS BIGINT) AS n_matches
FROM s
"""


@register("event_regex_match", REGEX_MATCH_SQL)
def event_regex_match(sf_dir: str):
    """MATCH_RECOGNIZE-style complex-event processing: each user's events
    become one ordered character string (event types are first-letter
    distinct: c/e/p/s/v), and the pattern ``s[cev]*p`` — a signup followed
    by any non-purchase activity then a purchase — is counted per user.

    The sequence build is the sorted-collect kernel (one user-bucketed
    exchange, per-bucket vectorized sort + run-offset ListArray +
    ``binary_join`` — zero per-user Python); the pattern count is ONE RE2
    kernel call (``count_substring_regex``) over the bucket's sequence
    column.  Both Arrow and DuckDB scan with RE2 leftmost non-overlapping
    semantics and the character classes are disjoint (``[cev]`` excludes
    the terminator ``p``), so greedy matching is unambiguous and the
    oracle is exact — including the full sequence string itself.

    Scale: state per user is bounded by that user's event count (the same
    bound any per-entity collect carries); buckets hold disjoint users, so
    the only all-to-all is the one hash exchange.
    """
    import numpy as np
    import pyarrow.compute as pc

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "c": pc.utf8_slice_codeunits(t.column("event_type"), 0, 1),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts_us", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = t.take(idx)
        n = g.num_rows
        uid = g.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        offsets = pa.array(np.r_[starts, n].astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, g.column("c").combine_chunks())
        seq = pc.binary_join(lists, "")
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "seq": seq,
                "seq_len": pc.cast(pc.utf8_length(seq), pa.int64()),
                "n_matches": pc.cast(
                    pc.count_substring_regex(seq, pattern="s[cev]*p"), pa.int64()
                ),
            }
        )

    return bucketed_groupby_apply(
        ds.map_batches(
            keyed, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["user_id"],
        per_bucket,
    )


# ---------------------------------------------------------------------------
# Process mining: the eventually-follows matrix over first occurrences
# ---------------------------------------------------------------------------

EVENTUALLY_FOLLOWS_SQL = """
WITH f AS (
  SELECT user_id, event_type,
         MIN(epoch_us(ts)) AS t1
  FROM events GROUP BY user_id, event_type
),
fe AS (
  SELECT f.user_id, f.event_type, f.t1,
         (SELECT MIN(e.event_id) FROM events e
          WHERE e.user_id = f.user_id AND e.event_type = f.event_type
            AND epoch_us(e.ts) = f.t1) AS e1
  FROM f
)
SELECT a.event_type AS x, b.event_type AS y,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM fe a JOIN fe b
  ON a.user_id = b.user_id AND a.event_type <> b.event_type
WHERE a.t1 < b.t1 OR (a.t1 = b.t1 AND a.e1 < b.e1)
GROUP BY x, y
"""


@register("eventually_follows_matrix", EVENTUALLY_FOLLOWS_SQL)
def eventually_follows_matrix(sf_dir: str):
    """Process mining's eventually-follows relation: for every ordered
    pair of event types (x, y), the number of users whose FIRST x
    strictly precedes their FIRST y — the matrix behind directly-follows
    graphs / alpha-miner footprints.  First occurrence is the
    (min ts, then min event_id at that ts) two-level minimum, so
    timestamp ties stay deterministic.

    Shape: per-block (user, type) first-occurrence partials (mergeable
    two-level minima) shrink the stream before ONE user-bucketed
    exchange; each bucket pivots its users' ≤5 firsts and emits 20
    pairwise-comparison count partials (vectorized column compares, no
    per-user Python); the ≤20-cell matrix folds in a tiny final combine."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def partial(t: pa.Table) -> pa.Table:
        x = pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "t1": pa.compute.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
            }
        )
        g = x.group_by(["user_id", "event_type"]).aggregate([("t1", "min")])
        g = g.rename_columns(["user_id", "event_type", "tmin"])
        # min event_id among rows AT the min ts (two-level minimum)
        m = x.join(g, keys=["user_id", "event_type"])
        m = m.filter(pa.compute.equal(m.column("t1"), m.column("tmin")))
        e = m.group_by(["user_id", "event_type"]).aggregate(
            [("t1", "min"), ("event_id", "min")]
        )
        return e.rename_columns(["user_id", "event_type", "t1", "e1"])

    def per_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        # merge block partials: two-level min again
        df = t.to_pandas()
        df = df.sort_values(["user_id", "event_type", "t1", "e1"])
        df = df.groupby(["user_id", "event_type"], as_index=False).first()
        piv_t = df.pivot(index="user_id", columns="event_type", values="t1")
        piv_e = df.pivot(index="user_id", columns="event_type", values="e1")
        rows = []
        types = sorted(piv_t.columns)
        for xx in types:
            for yy in types:
                if xx == yy:
                    continue
                tx, ty = piv_t[xx].to_numpy(), piv_t[yy].to_numpy()
                ex, ey = piv_e[xx].to_numpy(), piv_e[yy].to_numpy()
                ok = (~np.isnan(tx)) & (~np.isnan(ty)) & (
                    (tx < ty) | ((tx == ty) & (ex < ey))
                )
                n = int(ok.sum())
                if n:
                    rows.append({"x": xx, "y": yy, "n_users": n})
        if not rows:
            return pa.table(
                {"x": pa.array([], pa.string()), "y": pa.array([], pa.string()),
                 "n_users": pa.array([], pa.int64())}
            )
        return pa.Table.from_pylist(rows).cast(
            pa.schema([("x", pa.string()), ("y", pa.string()),
                       ("n_users", pa.int64())])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    cells = bucketed_groupby_apply(partials, ["user_id"], per_bucket)
    return bucketed_sum_combine(cells, ["x", "y"], ["n_users"], 2)
