"""Two-sample nonparametric tests: Kolmogorov-Smirnov and Mann-Whitney U.

Both statistics are functionals of the two groups' empirical CDFs over a
shared value axis, so one distributed sorted-prefix scan serves both:

1. per-block partial counts per distinct value — ``(v, ca, cb)`` where
   ``ca``/``cb`` count group-A/group-B rows at value ``v`` (blocks shrink
   from row count to distinct-value count before anything moves);
2. range-partition the partials by ``v`` with DISTINCT sampled split
   points (same guarantee as stages/ranking.global_rank: a run of equal
   values can never straddle a partition boundary);
3. pass 1 — per-partition count totals (tiny: one row per partition) give
   the driver exclusive prefix offsets for A-counts, B-counts and the
   combined count, plus the grand totals ``n_a``/``n_b``;
4. pass 2 — each partition sorts its values, collapses equal-``v`` runs
   (``np.add.reduceat``), adds its offsets to the local cumulative sums and
   emits ONE row: the partition's max KS deviation and its Mann-Whitney
   rank-sum contribution.  A final ≤``num_partitions``-row reduce runs in
   Python ints.

Exactness: values are integer-encoded (cents) by the caller, so CDF steps
land on exact integers.  The KS statistic is reported as the integer
numerator ``d_num = max_v |cumA(v)*n_b - cumB(v)*n_a|`` over the common
denominator ``n_a*n_b`` (never materialized as a float).  Mann-Whitney uses
midranks for ties; ``u2_a = 2*U_A`` stays integral because every midrank
doubles to ``2*cum_excl + c + 1``.

Domain guard: per-partition arithmetic runs in int64, so the products
``cum*n`` and rank terms require ``n_a + n_b < 2**31`` (checked).  Beyond
that, shard the value axis and run the final combine in Python ints, or
pre-bin values — the statistic over binned data bounds the unbinned one.

Reference analog: the repo's chi2 crosstab (pipelines/stats_queries.py) is
the parametric sibling; the reference itself has no test statistics — its
closest shape is the audit-summary fold
(/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
encode/transformation/CommonTransformations.scala:50-70), cited for the
"aggregate a whole table to one tiny summary" pattern only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["two_sample_scan"]


def _np(col) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False)


def two_sample_scan(
    ds,
    value_col: str = "v",
    a_col: str = "ca",
    b_col: str = "cb",
    num_partitions: int = 32,
    sample_per_block: int = 64,
) -> pa.Table:
    """Distributed two-sample CDF scan over per-block partial counts.

    ``ds`` holds rows ``(value_col, a_col, b_col)`` — per-block partial
    counts (the same value MAY repeat across blocks; runs are collapsed
    after the range exchange).  Returns a ONE-row table:
    ``n_a, n_b, d_num, u2_a``.
    """
    import pyarrow.compute as pc

    # the per-block partial pipeline feeds BOTH the split sampling and the
    # range assignment — checkpoint it once instead of re-scanning the
    # source table twice
    ds = ds.materialize()

    # --- sample DISTINCT split points on the value axis -------------------
    def sample(t: pa.Table) -> pa.Table:
        v = t.column(value_col).combine_chunks()
        stride = max(1, t.num_rows // sample_per_block)
        return pa.table({value_col: v.take(np.arange(0, t.num_rows, stride))})

    samp = ds.map_batches(
        sample, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    svals = np.unique(np.array([r[value_col] for r in samp], dtype=np.int64))
    if len(svals) > 1:
        idx = (
            np.linspace(1, len(svals) - 1, num=min(num_partitions - 1, len(svals) - 1))
            .round()
            .astype(int)
        )
        splits = np.unique(svals[idx])
    else:
        splits = np.array([], dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        v = _np(t.column(value_col)).astype(np.int64)
        pid = np.searchsorted(splits, v, side="left").astype(np.int32)
        return t.append_column("__rpart", pa.array(pid))

    parted = ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()  # consumed twice (totals + scan); checkpoint once

    # --- pass 1: per-partition totals → exclusive prefix offsets ----------
    def totals(t: pa.Table) -> pa.Table:
        g = t.group_by(["__rpart"]).aggregate([(a_col, "sum"), (b_col, "sum")])
        return g.rename_columns(["__rpart", "ta", "tb"])

    tot_rows = (
        parted.map_batches(
            totals, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby("__rpart")
        .sum(["ta", "tb"])
        .take_all()
    )  # ≤ num_partitions rows
    per_pid = {r["__rpart"]: (r["sum(ta)"], r["sum(tb)"]) for r in tot_rows}
    n_a = sum(v[0] for v in per_pid.values())
    n_b = sum(v[1] for v in per_pid.values())
    if n_a + n_b >= 1 << 31:
        raise ValueError(
            f"two_sample_scan int64 domain guard: n_a+n_b={n_a + n_b} >= 2^31; "
            "pre-bin the value axis or shard the scan"
        )
    off_a: dict[int, int] = {}
    off_b: dict[int, int] = {}
    acc_a = acc_b = 0
    for pid in sorted(per_pid):
        off_a[pid], off_b[pid] = acc_a, acc_b
        acc_a += per_pid[pid][0]
        acc_b += per_pid[pid][1]

    # --- pass 2: per-partition sorted scan → one summary row each ---------
    def scan_partition(t: pa.Table) -> pa.Table:
        pid = t.column("__rpart")[0].as_py()
        t = t.sort_by([(value_col, "ascending")])
        v = _np(t.column(value_col)).astype(np.int64)
        ca = _np(t.column(a_col)).astype(np.int64)
        cb = _np(t.column(b_col)).astype(np.int64)
        # collapse equal-value runs (partials may repeat a value)
        starts = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        ca = np.add.reduceat(ca, starts)
        cb = np.add.reduceat(cb, starts)
        cum_a = np.cumsum(ca) + off_a[pid]
        cum_b = np.cumsum(cb) + off_b[pid]
        d_local = (
            int(np.max(np.abs(cum_a * n_b - cum_b * n_a))) if len(cum_a) else 0
        )
        c = ca + cb
        cum_excl = (np.cumsum(c) - c) + (off_a[pid] + off_b[pid])
        r2_local = int(np.sum(ca * (2 * cum_excl + c + 1)))
        return pa.table(
            {
                "d_local": pa.array([d_local], pa.int64()),
                "r2_local": pa.array([r2_local], pa.int64()),
            }
        )

    parts = parted.groupby("__rpart").map_groups(
        scan_partition, batch_format="pyarrow"
    ).take_all()  # ≤ num_partitions rows
    d_num = max((r["d_local"] for r in parts), default=0)
    u2_a = sum(r["r2_local"] for r in parts) - n_a * (n_a + 1)
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
            "u2_a": pa.array([u2_a], pa.int64()),
        }
    )
