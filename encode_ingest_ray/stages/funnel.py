"""Event-analytics operators: sequential funnels and cohort retention.

Both are one-exchange shapes over an event stream keyed by user: hash-bucket
on the user id (every user's history fully contained in one bucket), then a
single vectorized pass per bucket — sort once, then O(stages × rows) numpy
segment arithmetic.  No per-user Python; a bucket holding a million users
pays one Arrow sort and a handful of ``np.minimum.reduceat`` calls.

At 10^10 events this is the canonical design: the per-user sequential logic
(strictly-after timestamps, first-touch cohorts) cannot be expressed as an
algebraic combiner, so it rides the same salted-key exchange discipline as
the CDC engine; the OUTPUT is per-user (funnel) or tiny (retention matrix),
so nothing wide leaves the bucket tasks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import (
    bucketed_groupby_apply,
    bucketed_sum_combine,
)

_INF = np.int64(2**62)


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)


def funnel_table(
    t: pa.Table, user_col: str, ts_col: str, type_col: str, stages: list[str]
) -> pa.Table:
    """Per-user funnel kernel: for each user that performed ``stages[0]``,
    the timestamp (int64 µs) of the first stage-0 event, then the first
    stage-1 event STRICTLY after it, then the first stage-2 event strictly
    after that, ... (one row per entered user; later stages NULL when never
    reached).  Every user must be fully contained in ``t``.
    """
    t = t.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
    n = t.num_rows
    users = t.column(user_col).combine_chunks().to_numpy(zero_copy_only=False)
    ts = _ts_us(t.column(ts_col))
    bound = np.zeros(n, dtype=bool)
    if n:
        bound[0] = True
        bound[1:] = users[1:] != users[:-1]
    starts = np.flatnonzero(bound)
    seg = np.cumsum(bound) - 1  # per-row user index
    n_users = len(starts)

    etype = t.column(type_col)
    prev = np.zeros(n_users, dtype=np.int64) - _INF  # stage -1: no constraint
    out_cols: dict[str, np.ndarray] = {}
    for s in stages:
        mask = pc.fill_null(pc.equal(etype, s), False).to_numpy(
            zero_copy_only=False
        )
        cand = mask & (ts > prev[seg]) if n else mask
        v = np.where(cand, ts, _INF)
        first = (
            np.minimum.reduceat(v, starts) if n_users else np.empty(0, np.int64)
        )
        out_cols[s] = first
        prev = np.where(first < _INF, first, _INF)  # unreached: no successor

    entered = out_cols[stages[0]] < _INF
    cols = {user_col: pa.array(users[starts][entered])}
    for s in stages:
        f = out_cols[s][entered]
        cols[f"t_{s}"] = pa.array(f, pa.int64(), mask=f >= _INF)
    return pa.table(cols)


def funnel_first_times(
    ds,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    num_buckets: int | None = None,
):
    """Distributed sequential funnel: one exchange on ``user_col``, then the
    vectorized ``funnel_table`` kernel per bucket."""

    def bucket_fn(t: pa.Table) -> pa.Table:
        return funnel_table(t, user_col, ts_col, type_col, stages)

    return bucketed_groupby_apply(ds, [user_col], bucket_fn, num_buckets)


def cohort_partials(
    t: pa.Table, user_col: str, ts_col: str, week_us: int = 7 * 86400 * 10**6
) -> pa.Table:
    """Per-bucket retention partial: for every user in ``t`` (fully
    contained), cohort week = floor(first event µs / week), activity weeks =
    distinct event weeks; emit (cohort_week, week_offset, n_users) counts.
    """
    users = t.column(user_col).combine_chunks().to_numpy(zero_copy_only=False)
    wk = _ts_us(t.column(ts_col)) // week_us
    pairs = (
        pa.table({"u": pa.array(users), "wk": pa.array(wk)})
        .group_by(["u", "wk"])
        .aggregate([("wk", "count")])
        .select(["u", "wk"])
        .sort_by([("u", "ascending"), ("wk", "ascending")])
    )
    u = pairs.column("u").to_numpy(zero_copy_only=False)
    w = pairs.column("wk").to_numpy(zero_copy_only=False)
    n = len(u)
    bound = np.zeros(n, dtype=bool)
    if n:
        bound[0] = True
        bound[1:] = u[1:] != u[:-1]
    # sorted by (u, wk): each user's first row IS its cohort week
    seg = np.cumsum(bound) - 1
    starts = np.flatnonzero(bound)
    cohort_per_row = w[starts][seg] if n else w
    agg = (
        pa.table(
            {
                "cohort_week": pa.array(cohort_per_row),
                "week_offset": pa.array(w - cohort_per_row),
            }
        )
        .group_by(["cohort_week", "week_offset"])
        .aggregate([("week_offset", "count")])
    )
    return agg.rename_columns(["cohort_week", "week_offset", "n_users"])


def cohort_retention(
    ds,
    user_col: str,
    ts_col: str,
    week_us: int = 7 * 86400 * 10**6,
    num_buckets: int | None = None,
):
    """Distributed cohort-retention matrix: users cohorted by first-event
    week; one row per (cohort_week, week_offset) with the count of distinct
    users from that cohort active that week.

    One exchange on the user id -> ``cohort_partials`` per bucket (tiny
    output) -> one small sum-combine on the matrix cell key.
    """

    def bucket_fn(t: pa.Table) -> pa.Table:
        return cohort_partials(t, user_col, ts_col, week_us)

    partials = bucketed_groupby_apply(ds, [user_col], bucket_fn, num_buckets)
    return bucketed_sum_combine(
        partials, ["cohort_week", "week_offset"], ["n_users"], num_buckets=8
    )
