"""Gaps-and-islands: merged-interval coverage per key.

The classic interval-union aggregation (how long was each user actually
"active", counting overlapping activity windows once): sort each key's
intervals by start, an interval starts a new ISLAND iff its start exceeds
the running max of all previous ends, and coverage = Σ (island max-end −
island min-start).

Distributed shape: one hash exchange on the key (every key's intervals
together), then a single vectorized pass per bucket — Arrow sort, one
``np.maximum.accumulate`` per-segment running max (reset at key
boundaries by offsetting each key's ends into a disjoint range), island
ids by cumsum, per-island extents by ``reduceat``.  No per-key Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply


def coverage_table(
    t: pa.Table, key_col: str, start_col: str, end_col: str
) -> pa.Table:
    """Per-key merged-interval coverage (int64 units) — key fully contained."""
    t = t.sort_by(
        [(key_col, "ascending"), (start_col, "ascending"), (end_col, "ascending")]
    )
    n = t.num_rows
    if n == 0:
        return pa.table(
            {key_col: pa.array([], pa.int64()),
             "covered": pa.array([], pa.int64())}
        )
    k = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
    s = t.column(start_col).combine_chunks().to_numpy(zero_copy_only=False)
    e = t.column(end_col).combine_chunks().to_numpy(zero_copy_only=False)
    bound = np.zeros(n, dtype=bool)
    bound[0] = True
    bound[1:] = k[1:] != k[:-1]

    # running max of ends per key WITHOUT a loop: shift each key's values
    # into a disjoint numeric band (segment index × span), one global
    # maximum.accumulate, shift back
    seg = np.cumsum(bound) - 1
    span = int(max(int(e.max() - s.min()) + 1, 1))
    base = np.int64(s.min())
    n_segs = int(seg[-1]) + 1
    if n_segs * span < 2**62:  # lift stays inside int64
        lifted = (e - base) + seg * np.int64(span)
        run_max = np.maximum.accumulate(lifted)
        # prev_max relative to the CURRENT row's segment; a segment's first
        # row sees the previous segment's band -> always "new island"
        prev = np.empty(n, np.int64)
        prev[0] = -1
        prev[1:] = run_max[:-1]
        new_island = bound | (((s - base) + seg * np.int64(span)) > prev)
    else:
        # overflow guard (many keys × a huge time span in ONE bucket): the
        # exact per-segment reset, one numpy pass per segment run — hit only
        # on extreme buckets, never changes results
        new_island = bound.copy()
        for lo, hi in zip(
            np.flatnonzero(bound),
            np.append(np.flatnonzero(bound)[1:], n),
        ):
            if hi - lo > 1:
                run = np.maximum.accumulate(e[lo : hi - 1])
                new_island[lo + 1 : hi] = s[lo + 1 : hi] > run

    isl = np.cumsum(new_island) - 1
    starts = np.flatnonzero(new_island)
    isl_start = s[starts]
    isl_end = np.maximum.reduceat(e, starts)
    isl_key = k[starts]
    lens = isl_end - isl_start
    out = (
        pa.table({key_col: pa.array(isl_key), "covered": pa.array(lens)})
        .group_by([key_col])
        .aggregate([("covered", "sum")])
    )
    return out.rename_columns([key_col, "covered"])


def interval_coverage(
    ds, key_col: str, start_col: str, end_col: str, num_buckets=None
):
    """Distributed merged-interval coverage: one key exchange, one
    vectorized islands pass per bucket."""

    def bucket_fn(t: pa.Table) -> pa.Table:
        return coverage_table(t, key_col, start_col, end_col)

    return bucketed_groupby_apply(ds, [key_col], bucket_fn, num_buckets)
