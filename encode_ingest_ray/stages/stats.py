"""Statistical-analytics kernels: window-frame moving aggregates, OHLC
downsampling, broadcast-stats outlier filtering, and column profiling.

The reference's aggregation surface is fold-style only (SURVEY.md §2.5);
these are the next operators a warehouse/telemetry consumer of the same
tables reaches for.  All four are exact (integer-encoded values, integer
comparisons), so each registered query carries a bit-exact DuckDB oracle.

Distributed shapes, per operator:

* ``moving_sum`` — ``SUM(x) OVER (PARTITION BY k ORDER BY o ROWS BETWEEN p
  PRECEDING AND CURRENT ROW)``: one hash exchange on the partition key,
  then ONE vectorized pass per bucket (Arrow sort + cumulative-sum
  difference with per-partition clamping) — no per-partition Python calls,
  same scaling contract as stages/ranking.window_rank.

* ``ohlc`` — per-key first/open, max/high, min/low, last/close telemetry
  downsampling with MERGEABLE partials: every block folds to one row per
  (block, key) carrying (open_ts, open_id, open_v, close_ts, close_id,
  close_v, min_v, max_v, n); only those partials cross the one exchange,
  and the merge re-applies the same argmin/argmax fold.  Raw rows never
  shuffle — the classic OHLC/downsample combiner.

* ``grouped_outlier`` — two-pass anomaly detection: pass 1 reduces per-key
  integer moment partials (n, Σx, Σx²); pass 2 broadcasts them (``ray.put``
  once, ``ray.get`` once per actor) and flags rows by the INTEGER
  inequality (n·x − S1)² > k²·(n·S2 − S1²) ⟺ |z| > k — no float sqrt, so
  the boundary is exact.  The fact table streams; only group stats move.

* ``profile_dataset`` — ANALYZE-style column statistics in one pass:
  per-block partials (count, null count, min, max per column, reduced in
  the column's NATIVE type) merge to one row, reshaped to a tall
  (col, n_rows, n_null, min_val, max_val) table.  The reduce ships one
  tiny row per block.

Overflow contracts are documented per entry point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import (
    bucketed_groupby_apply,
    partial_groupby_sum,
)
from encode_ingest_ray.stages.ranking import _as_np, _boundaries


def _i64(col: pa.ChunkedArray) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)


# ---------------------------------------------------------------- moving sum


def moving_sum_table(
    t: pa.Table,
    partition_keys: list[str],
    order_cols: list[str],
    value_col: str,
    preceding: int,
    out_col: str,
) -> pa.Table:
    """Single-node kernel: append ``SUM(value) OVER (PARTITION BY keys ORDER
    BY order_cols ROWS BETWEEN preceding PRECEDING AND CURRENT ROW)``.

    Every partition in ``t`` must be complete, ``value_col`` integer and
    non-null, and ``order_cols`` a total order within each partition (ANSI
    ROWS frames are only deterministic under a total order).  One Arrow
    sort + O(n) numpy: cumulative sum, window start clamped to the
    partition start, frame sum = cs[i] − cs[start−1].
    """
    n = t.num_rows
    t = t.sort_by([(k, "ascending") for k in partition_keys + order_cols])
    if n == 0:
        return t.append_column(out_col, pa.array([], pa.int64()))
    part = _boundaries([_as_np(t.column(k)) for k in partition_keys], n)
    x = _i64(t.column(value_col))
    cs = np.cumsum(x)
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(part, idx, 0))
    win_start = np.maximum(idx - preceding, seg_start)
    prev = np.where(win_start > 0, cs[np.maximum(win_start - 1, 0)], 0)
    return t.append_column(out_col, pa.array(cs - prev))


def moving_sum(
    ds,
    partition_keys: list[str],
    order_cols: list[str],
    value_col: str,
    preceding: int,
    out_col: str = "moving_sum",
    num_buckets: int | None = None,
):
    """Distributed ROWS-frame moving sum: one exchange on the partition
    key, one vectorized ``moving_sum_table`` per bucket.  Sum overflow
    bound: the running cumulative sum per bucket must stay under 2^63 —
    at cent encoding that is ~9×10^16 dollars per bucket."""

    def bucket_fn(t: pa.Table) -> pa.Table:
        return moving_sum_table(
            t, partition_keys, order_cols, value_col, preceding, out_col
        )

    return bucketed_groupby_apply(ds, partition_keys, bucket_fn, num_buckets)


# --------------------------------------------------------------------- OHLC

_OHLC_FIELDS = (
    "open_ts", "open_id", "open_v", "close_ts", "close_id", "close_v",
    "min_v", "max_v", "n",
)


def _empty_ohlc(t: pa.Table, keys: list[str]) -> pa.Table:
    cols = {k: t.column(k) for k in keys}
    for f in _OHLC_FIELDS:
        cols[f] = pa.array([], pa.int64())
    return pa.table(cols)


def ohlc_partial(
    t: pa.Table, keys: list[str], ts_col: str, id_col: str, value_col: str
) -> pa.Table:
    """Raw rows -> one OHLC partial row per key present in this block.
    open/close pick the row with the min/max (ts, id) — the id tie-break
    makes duplicated timestamps deterministic."""
    n = t.num_rows
    t = t.sort_by(
        [(k, "ascending") for k in keys]
        + [(ts_col, "ascending"), (id_col, "ascending")]
    )
    if n == 0:
        return _empty_ohlc(t, keys)
    part = _boundaries([_as_np(t.column(k)) for k in keys], n)
    starts = np.flatnonzero(part)
    ends = np.append(starts[1:], n) - 1
    ts = _i64(t.column(ts_col))
    ids = _i64(t.column(id_col))
    v = _i64(t.column(value_col))
    cols = {k: t.column(k).take(pa.array(starts)) for k in keys}
    cols.update(
        open_ts=pa.array(ts[starts]), open_id=pa.array(ids[starts]),
        open_v=pa.array(v[starts]), close_ts=pa.array(ts[ends]),
        close_id=pa.array(ids[ends]), close_v=pa.array(v[ends]),
        min_v=pa.array(np.minimum.reduceat(v, starts)),
        max_v=pa.array(np.maximum.reduceat(v, starts)),
        n=pa.array(np.diff(np.append(starts, n)).astype(np.int64)),
    )
    return pa.table(cols)


def ohlc_merge(t: pa.Table, keys: list[str]) -> pa.Table:
    """Merge OHLC partials (all partials of a key co-located): two sorts —
    ascending (keys, open_ts, open_id) picks each key's earliest open at
    the segment start; ascending (keys, close_ts, close_id) picks the
    latest close at the segment end.  Both sorts see the keys in the same
    ascending order, so the two per-key frames align positionally."""
    n = t.num_rows
    if n == 0:
        return _empty_ohlc(t, keys)
    ta = t.sort_by(
        [(k, "ascending") for k in keys]
        + [("open_ts", "ascending"), ("open_id", "ascending")]
    )
    part = _boundaries([_as_np(ta.column(k)) for k in keys], n)
    starts = np.flatnonzero(part)
    cols = {k: ta.column(k).take(pa.array(starts)) for k in keys}
    for f in ("open_ts", "open_id", "open_v"):
        cols[f] = ta.column(f).take(pa.array(starts))
    cols["min_v"] = pa.array(np.minimum.reduceat(_i64(ta.column("min_v")), starts))
    cols["max_v"] = pa.array(np.maximum.reduceat(_i64(ta.column("max_v")), starts))
    cols["n"] = pa.array(np.add.reduceat(_i64(ta.column("n")), starts))

    tb = t.sort_by(
        [(k, "ascending") for k in keys]
        + [("close_ts", "ascending"), ("close_id", "ascending")]
    )
    part_b = _boundaries([_as_np(tb.column(k)) for k in keys], n)
    ends_b = np.append(np.flatnonzero(part_b)[1:], n) - 1
    for f in ("close_ts", "close_id", "close_v"):
        cols[f] = tb.column(f).take(pa.array(ends_b))
    return pa.table({k: cols[k] for k in keys + list(_OHLC_FIELDS)})


def ohlc(
    ds,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    num_buckets: int | None = None,
):
    """Distributed OHLC downsample: per-block ``ohlc_partial`` combiner,
    ONE exchange of the per-(block, key) partials, ``ohlc_merge`` per
    bucket.  ``ts_col``/``id_col``/``value_col`` must be integer-encoded
    and non-null (epoch-µs timestamps, milli/cent values)."""

    local = ds.map_batches(
        lambda t: ohlc_partial(t, keys, ts_col, id_col, value_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return bucketed_groupby_apply(
        local, keys, lambda t: ohlc_merge(t, keys), num_buckets
    )


# ----------------------------------------------------------------- outliers


class _OutlierFlagger:
    """Per-batch probe against broadcast (key -> n, Σx, Σx²) arrays.

    Flags rows where (n·x − S1)² > k²·(n·S2 − S1²), i.e. |x − μ| > k·σ with
    both sides kept in exact integer arithmetic (population σ).  The stats
    handle is resolved ONCE per actor (state-loaded-once rule)."""

    def __init__(self, stats_ref, key: str, value_col: str, k: int, min_n: int):
        import ray

        self.keys, self.n, self.s1, self.s2 = (
            ray.get(stats_ref) if not isinstance(stats_ref, tuple) else stats_ref
        )
        self.key = key
        self.value_col = value_col
        self.k = k
        self.min_n = min_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        kv = _i64(batch.column(self.key))
        x = _i64(batch.column(self.value_col))
        pos = np.searchsorted(self.keys, kv)
        pos = np.minimum(pos, max(len(self.keys) - 1, 0))
        hit = self.keys[pos] == kv if len(self.keys) else np.zeros(len(kv), bool)
        n = np.where(hit, self.n[pos], 0)
        s1 = np.where(hit, self.s1[pos], 0)
        s2 = np.where(hit, self.s2[pos], 0)
        lhs = n * x - s1
        flag = hit & (n >= self.min_n) & (lhs * lhs > self.k * self.k * (n * s2 - s1 * s1))
        return batch.filter(pa.array(flag))


def grouped_outlier(
    fact_ds,
    stats_ds,
    key: str,
    value_col: str,
    k: int = 2,
    min_n: int = 2,
):
    """Two-pass z-score outlier filter.  ``stats_ds``/``fact_ds`` are two
    reads of the same table projected to (key, value) — pass 1 reduces the
    integer moment partials via ``partial_groupby_sum``, pass 2 broadcasts
    the (sorted-key) stat arrays and streams the fact table through the
    integer inequality.

    Scale contracts: (a) the broadcast is one row per GROUP — beyond
    broadcast RAM (~10^8 groups) route pass 2 through ``cohash_join``
    instead; (b) int64 exactness needs n·max|x| < 2^31.5·√1 — at milli
    encoding with |x| ≤ 10^6, groups up to ~10^3.5 rows; re-encode to centi
    (10^4) for ~10^5.5-row groups.  Both bounds hold for the registered
    query's per-user groups (≤ ~10^2 rows)."""
    import ray

    def prep_sq(t: pa.Table) -> pa.Table:
        x = t.column(value_col)
        return pa.table(
            {key: t.column(key), value_col: x, "sq": pc.multiply_checked(x, x)}
        )

    stats = partial_groupby_sum(
        stats_ds.map_batches(
            prep_sq, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        [key],
        {"s1": value_col, "s2": "sq"},
        count_alias="n",
    )
    rows = stats.take_all()  # one row per group (size-guarded by contract)
    order = np.argsort(np.array([r[key] for r in rows], dtype=np.int64), kind="stable")
    keys = np.array([rows[i][key] for i in order], dtype=np.int64)
    n = np.array([rows[i]["n"] for i in order], dtype=np.int64)
    s1 = np.array([rows[i]["s1"] for i in order], dtype=np.int64)
    s2 = np.array([rows[i]["s2"] for i in order], dtype=np.int64)
    ref = ray.put((keys, n, s1, s2))
    return fact_ds.map_batches(
        _OutlierFlagger,
        fn_constructor_args=(ref, key, value_col, k, min_n),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        concurrency=(1, 8),
    )


# ------------------------------------------------------------------ skyline


def skyline_table(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Single-node 2-D Pareto skyline (minimize both columns, STRICT
    dominance: a point is dropped iff another point is ≤ in both and < in
    at least one; duplicated points all survive).

    One sort by (x asc, y asc) + O(n) numpy: within an x-group only the
    min-y rows survive, and a row is dominated by an earlier group iff
    that group's min y is ≤ its y — an exclusive running minimum."""
    n = t.num_rows
    if n == 0:
        return t
    t = t.sort_by([(x_col, "ascending"), (y_col, "ascending")])
    x = _i64(t.column(x_col))
    y = _i64(t.column(y_col))
    newx = np.zeros(n, dtype=bool)
    newx[0] = True
    newx[1:] = x[1:] != x[:-1]
    idx = np.arange(n, dtype=np.int64)
    first_y = y[np.maximum.accumulate(np.where(newx, idx, 0))]
    starts = np.flatnonzero(newx)
    gmin = y[starts]
    excl = np.empty(len(starts), dtype=np.int64)
    excl[0] = np.iinfo(np.int64).max
    if len(starts) > 1:
        excl[1:] = np.minimum.accumulate(gmin)[:-1]
    sizes = np.diff(np.append(starts, n))
    excl_row = np.repeat(excl, sizes)
    keep = (y == first_y) & (excl_row > y)
    return t.filter(pa.array(keep))


def skyline(ds, x_col: str, y_col: str):
    """Distributed Pareto skyline: per-block local skyline (any globally
    non-dominated point is locally non-dominated, so the local pass never
    loses a survivor), then one merge pass re-applying the same kernel over
    the concatenated local skylines.

    The merge is repartition(1) — correct because 2-D skylines are tiny in
    practice (≤ #distinct x values that improve y).  For adversarially
    anti-correlated data where local skylines stay large, insert a
    bucketed-by-x-range intermediate merge; the kernel composes unchanged."""
    local = ds.map_batches(
        lambda t: skyline_table(t, x_col, y_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return local.repartition(1).map_batches(
        lambda t: skyline_table(t.combine_chunks(), x_col, y_col),
        batch_format="pyarrow",
        batch_size=None,
    )


# --------------------------------------------------------------- robust MAD


def grouped_mad_table(
    t: pa.Table, key_col: str, val_col: str, out_med: str, out_mad: str
) -> pa.Table:
    """Per-key (lower median, median absolute deviation) of an integer
    column — the robust location/scale pair (the outlier primitive that,
    unlike grouped_outlier's z-score, a few extreme rows cannot drag).

    Both are DISCRETE rank selections (element at (n-1)//2 of the sorted
    group), so the result is integer-exact and tie-invariant.  One
    vectorized pass: lexsort by (key, val) → segment medians → absolute
    deviations → a second lexsort of the deviations within the SAME
    key segments → segment medians again.  No per-group Python calls.
    """
    n = t.num_rows
    if n == 0:
        return pa.table(
            {
                key_col: pa.array([], t.schema.field(key_col).type),
                out_med: pa.array([], pa.int64()),
                out_mad: pa.array([], pa.int64()),
            }
        )
    keys = _as_np(t.column(key_col))
    vals = _i64(t.column(val_col))
    order = np.lexsort((vals, keys))
    k, v = keys[order], vals[order]
    newgrp = np.zeros(n, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(newgrp)
    ends = np.append(starts[1:], n)
    med = v[starts + (ends - starts - 1) // 2]
    ad = np.abs(v - np.repeat(med, ends - starts))
    # keys are already grouped contiguously; a stable sort of (group ordinal,
    # deviation) re-sorts each segment by deviation without another key pass
    gid = np.cumsum(newgrp) - 1
    order2 = np.lexsort((ad, gid))
    mad = ad[order2][starts + (ends - starts - 1) // 2]
    return pa.table(
        {
            key_col: pa.array(k[starts]),
            out_med: pa.array(med, pa.int64()),
            out_mad: pa.array(mad, pa.int64()),
        }
    )


def grouped_mad(ds, key_col: str, val_col: str, out_med: str, out_mad: str):
    """Distributed grouped median + MAD: ONE hash exchange on the key
    (every key's rows co-located in a bucket), then the two chained
    rank selections run entirely in-bucket — the per-group median never
    needs a broadcast because co-hashing already aligned pass 1 and
    pass 2.  Group count is unbounded; a single group's rows must fit a
    worker (same contract as every rank-selection kernel here)."""
    return bucketed_groupby_apply(
        ds,
        [key_col],
        lambda t: grouped_mad_table(t, key_col, val_col, out_med, out_mad),
    )


# ---------------------------------------------------------------- profiling


def profile_dataset(ds, cols: list[str]):
    """ANALYZE-style statistics for ``cols``: one streaming pass emitting a
    per-block partial row (count, per-column null count / native-typed
    min / max), one tiny repartition(1) reduce, reshaped to a tall
    ``(col, n_rows, n_null, min_val, max_val)`` table with VARCHAR-cast
    extrema (bit-equal to SQL ``CAST(MIN(c) AS VARCHAR)``)."""

    def partial(t: pa.Table) -> pa.Table:
        data: dict[str, pa.Array] = {
            "n_rows": pa.array([t.num_rows], pa.int64())
        }
        for c in cols:
            col = t.column(c)
            data[f"{c}__nulls"] = pa.array([col.null_count], pa.int64())
            if t.num_rows - col.null_count > 0:
                mm = pc.min_max(col)
                mn, mx = mm["min"], mm["max"]
            else:
                mn = mx = pa.scalar(None, col.type)
            data[f"{c}__min"] = pa.array([mn.as_py()], col.type)
            data[f"{c}__max"] = pa.array([mx.as_py()], col.type)
        return pa.table(data)

    def final(t: pa.Table) -> pa.Table:
        names, n_rows, n_null, mn_s, mx_s = [], [], [], [], []
        total = pc.sum(t.column("n_rows")).as_py() or 0
        for c in cols:
            names.append(c)
            n_rows.append(total)
            n_null.append(pc.sum(t.column(f"{c}__nulls")).as_py() or 0)
            mn = pc.min(t.column(f"{c}__min"))
            mx = pc.max(t.column(f"{c}__max"))
            mn_s.append(None if not mn.is_valid else pc.cast(mn, pa.string()).as_py())
            mx_s.append(None if not mx.is_valid else pc.cast(mx, pa.string()).as_py())
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n_rows": pa.array(n_rows, pa.int64()),
                "n_null": pa.array(n_null, pa.int64()),
                "min_val": pa.array(mn_s, pa.string()),
                "max_val": pa.array(mx_s, pa.string()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


# ------------------------------------------------------------- CUSUM monitor


def cusum_table(
    t: pa.Table,
    partition_keys: list[str],
    order_cols: list[str],
    value_col: str,
    drift: int,
    out_col: str,
    keep_cols: list[str],
) -> pa.Table:
    """Single-node CUSUM kernel: the one-sided cumulative-sum control
    statistic s_i = max(0, s_{i-1} + (x_i - drift)) per partition, in the
    (order_cols) total order.

    The recursive definition has a loop-free closed form: with prefix sums
    P_i = sum_{j<=i}(x_j - drift) and P_0 = 0,

        s_i = P_i - min(0, min_{j<=i} P_j)

    so the whole bucket is ONE Arrow sort + a cumulative sum + a segmented
    running minimum (pandas ``groupby(...).cummin()`` — C code, no Python
    per-partition calls).  Integer-exact: ``value_col`` must be int64
    (milli-encoded); the per-partition prefix sum must stay inside int64
    (~9e15 milli-units per key — far above any real key).
    """
    n = t.num_rows
    t = t.sort_by([(k, "ascending") for k in partition_keys + order_cols])
    if n == 0:
        return t.select(keep_cols).append_column(out_col, pa.array([], pa.int64()))
    part = _boundaries([_as_np(t.column(k)) for k in partition_keys], n)
    x = _i64(t.column(value_col)) - drift
    cs = np.cumsum(x)
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(part, idx, 0))
    prev = np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0)
    pre = cs - prev
    import pandas as pd

    seg_id = np.cumsum(part) - 1
    runmin = pd.Series(pre).groupby(seg_id).cummin().to_numpy()
    cusum = pre - np.minimum(runmin, 0)
    return t.select(keep_cols).append_column(out_col, pa.array(cusum, pa.int64()))


def cusum(
    ds,
    partition_keys: list[str],
    order_cols: list[str],
    value_col: str,
    drift: int,
    out_col: str = "cusum",
    keep_cols: list[str] | None = None,
    num_buckets: int | None = None,
):
    """Distributed CUSUM change-point monitor: one exchange on the
    partition key, one vectorized ``cusum_table`` per bucket.  The shape a
    lag/session window cannot express (the max(0, ...) clamp makes the
    state recursive); the prefix-sum/running-min closed form restores the
    one-pass vectorized contract of the other window kernels here."""
    keep = keep_cols if keep_cols is not None else partition_keys + order_cols

    def bucket_fn(t: pa.Table) -> pa.Table:
        return cusum_table(
            t, partition_keys, order_cols, value_col, drift, out_col, keep
        )

    return bucketed_groupby_apply(ds, partition_keys, bucket_fn, num_buckets)


# -------------------------------------------------------- Shannon entropy


def grouped_entropy_table(t: pa.Table, key: str, type_col: str, n_col: str) -> pa.Table:
    """Per-bucket Shannon-entropy fold over pre-combined (key, type, n)
    count partials.  Each term is rounded to an int64 micro-nat BEFORE the
    per-key sum — term_micro = FLOOR(c * ln(N/c) / N * 1e6 + 0.5) — so the
    sum is order-independent and bit-equal to the DuckDB oracle (both sides
    evaluate the identical libm double expression; Python ``math.log`` and
    DuckDB ``ln`` are the same libm call, the precedent stages/sketch.py's
    HLL estimate established).  ln is evaluated once per DISTINCT (c, N)
    pair (np.unique on the packed pair), not per row.
    """
    import math

    g = t.group_by([key, type_col]).aggregate([(n_col, "sum")])
    g = g.sort_by([(key, "ascending")])
    n = g.num_rows
    if n == 0:
        return pa.table(
            {
                key: pa.array([], t.column(key).type),
                "n_events": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "entropy_micro": pa.array([], pa.int64()),
            }
        )
    keys_np = _as_np(g.column(key))
    c = _i64(g.column(f"{n_col}_sum"))
    part = _boundaries([keys_np], n)
    starts = np.flatnonzero(part)
    totals = np.add.reduceat(c, starts)
    seg_len = np.diff(np.append(starts, n))
    big_n = np.repeat(totals, seg_len)
    # one libm ln per distinct (c, N) pair
    packed = (c << np.int64(32)) | big_n.astype(np.int64)
    uniq, inv = np.unique(packed, return_inverse=True)
    uc = (uniq >> np.int64(32)).tolist()
    un = (uniq & np.int64(0xFFFFFFFF)).tolist()
    uterm = np.fromiter(
        (
            math.floor(cc * math.log(nn / cc) / nn * 1000000 + 0.5)
            for cc, nn in zip(uc, un)
        ),
        dtype=np.int64,
        count=len(uc),
    )
    ent = np.add.reduceat(uterm[inv], starts)
    return pa.table(
        {
            key: g.take(pa.array(starts, pa.int64())).column(key),
            "n_events": pa.array(totals, pa.int64()),
            "n_types": pa.array(seg_len.astype(np.int64), pa.int64()),
            "entropy_micro": pa.array(ent, pa.int64()),
        }
    )


# ------------------------------------------------------------ Gini coefficient


def gini_from_counts(t: pa.Table, group_col: str, value_col: str, count_col: str) -> pa.Table:
    """Gini coefficient per group from collapsed (group, value, count)
    partials — the count-collapse is the scale story: raw rows never reach
    this task, only one row per distinct (group, value) pair (bounded by
    the value DOMAIN, not the row count).

    For ascending values x_(1..n), G = (2*Σ i·x_i − (n+1)·Σx) / (n·Σx);
    with a value v of multiplicity c entering after m prior rows,
    Σ i·v over its run = v·(c·m + c(c+1)/2) — so the rank sum needs only
    the sorted distinct values and cumulative counts.  Tie order never
    changes Σ i·x (equal values swap ranks freely).  The fold runs in
    PYTHON INTS: the rank-weighted sum overflows int64 past ~10^6 rows at
    cent encoding, and arbitrary precision over the collapsed table is
    free.  Output gini_micro is round-half-up micro units, matching the
    HUGEINT oracle's (2e6·num + den) // (2·den).
    """
    t = t.sort_by([(group_col, "ascending"), (value_col, "ascending")])
    nrows = t.num_rows
    out_g, out_n, out_sum, out_gini = [], [], [], []
    if nrows:
        gvals = _as_np(t.column(group_col))
        part = _boundaries([gvals], nrows)
        starts = np.flatnonzero(part)
        ends = np.append(starts[1:], nrows)
        v_all = _i64(t.column(value_col)).tolist()
        c_all = _i64(t.column(count_col)).tolist()
        keys = t.take(pa.array(starts, pa.int64())).column(group_col).to_pylist()
        for gk, s, e in zip(keys, starts.tolist(), ends.tolist()):
            n = 0
            sx = 0
            six = 0
            for v, c in zip(v_all[s:e], c_all[s:e]):
                six += v * (c * n + c * (c + 1) // 2)
                n += c
                sx += v * c
            num = 2 * six - (n + 1) * sx
            den = n * sx
            out_g.append(gk)
            out_n.append(n)
            out_sum.append(sx)
            out_gini.append((2000000 * num + den) // (2 * den))
    return pa.table(
        {
            group_col: pa.array(out_g, t.column(group_col).type),
            "n_orders": pa.array(out_n, pa.int64()),
            "sum_cents": pa.array(out_sum, pa.int64()),
            "gini_micro": pa.array(out_gini, pa.int64()),
        }
    )
