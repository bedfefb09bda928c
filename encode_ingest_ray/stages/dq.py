"""Data-quality expectation suite — "unit tests for data" in one pass.

The deequ / Great-Expectations shape (Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018 — public): a declarative
set of constraints over a table is compiled into ONE streaming scan that
emits per-block metric partials, plus (only when a uniqueness constraint is
present) one distinct-key exchange; the verdict table is a handful of
``(check, metric, passed)`` rows.  At 100 TB the scan-side checks cost one
pass with ~1 row of partials per block, and the uniqueness leg is the same
shuffle-light shape as a distinct-count (per-block combiner first, so only
(key, partial_count) rows cross the exchange).

Reference analog: the cardinality/validation folds the ingest pipeline runs
before committing a table (validateFileSet / cardinality checks,
/root/reference/transformation — see pipelines/analogs.py cardinality_check);
this generalizes them into the composable constraint suite a production
ingest would gate commits on.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

#: constraint spec forms accepted by :func:`dq_suite`:
#:   ("not_null", col)                     metric = null count
#:   ("accepted", col, allowed_values)     metric = rows outside the set
#:                                          (NULL counts as a violation)
#:   ("bounds", col, lo, hi, encode)       metric = rows with encode(col)
#:                                          outside [lo, hi] (NULL violates)
#:   ("unique", col)                       metric = keys with count > 1
#: every check passes iff metric == 0; a synthetic ("row_count",) check is
#: always emitted first with metric = N and passed = N > 0.


def _scan_partials(checks):
    """Build the per-block partial fn for all single-pass checks."""

    def partial(t: pa.Table) -> pa.Table:
        data = {"__n": pa.array([t.num_rows], pa.int64())}
        for i, chk in enumerate(checks):
            kind = chk[0]
            if kind == "not_null":
                viol = t.column(chk[1]).null_count
            elif kind == "accepted":
                col = t.column(chk[1])
                ok = pc.is_in(col, value_set=pa.array(chk[2]))
                viol = t.num_rows - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
            elif kind == "bounds":
                _, name, lo, hi, encode = chk
                v = encode(t.column(name))
                inside = pc.and_(
                    pc.greater_equal(v, lo), pc.less_equal(v, hi)
                )
                viol = t.num_rows - (
                    pc.sum(pc.cast(pc.fill_null(inside, False), pa.int64())).as_py()
                    or 0
                )
            else:  # pragma: no cover - unique handled on its own leg
                continue
            data[f"__c{i}"] = pa.array([int(viol)], pa.int64())
        return pa.table(data)

    return partial


def dq_suite(ds, checks: list[tuple]):
    """Run the constraint suite; returns a Dataset of
    ``(check, metric, passed)`` rows (one per constraint + ``row_count``).

    Single-pass checks ride one scan; each ``unique`` constraint adds one
    distinct-key exchange whose per-block combiner keeps raw rows off the
    wire.  The verdict legs are single-row datasets unioned at the end —
    tiny by construction, so the union is free.
    """
    scan_checks = [c for c in checks if c[0] != "unique"]
    uniq_checks = [c for c in checks if c[0] == "unique"]

    labels = {
        "not_null": lambda c: f"not_null:{c[1]}",
        "accepted": lambda c: f"accepted:{c[1]}",
        "bounds": lambda c: f"bounds:{c[1]}",
    }

    def finalize(t: pa.Table) -> pa.Table:
        names = ["row_count"]
        n = pc.sum(t.column("__n")).as_py() or 0
        metrics = [n]
        passed = [1 if n > 0 else 0]
        for i, chk in enumerate(checks):
            if chk[0] == "unique":
                continue
            m = pc.sum(t.column(f"__c{i}")).as_py() or 0
            names.append(labels[chk[0]](chk))
            metrics.append(m)
            passed.append(1 if m == 0 else 0)
        return pa.table(
            {
                "check": pa.array(names, pa.string()),
                "metric": pa.array(metrics, pa.int64()),
                "passed": pa.array(passed, pa.int64()),
            }
        )

    partials = ds.map_batches(
        _scan_partials(scan_checks),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    out = partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )

    for chk in uniq_checks:
        key = chk[1]

        def pre_count(t: pa.Table, _key=key) -> pa.Table:
            g = t.group_by([_key]).aggregate([([], "count_all")])
            return g.rename_columns([_key, "n"])

        counted = bucketed_sum_combine(
            ds.select_columns([key]).map_batches(
                pre_count,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            ),
            [key],
            ["n"],
        )

        def dup_partial(t: pa.Table) -> pa.Table:
            d = pc.sum(
                pc.cast(pc.greater(t.column("n"), 1), pa.int64())
            ).as_py() or 0
            return pa.table({"__d": pa.array([int(d)], pa.int64())})

        def dup_final(t: pa.Table, _key=key) -> pa.Table:
            d = pc.sum(t.column("__d")).as_py() or 0
            return pa.table(
                {
                    "check": pa.array([f"unique:{_key}"], pa.string()),
                    "metric": pa.array([d], pa.int64()),
                    "passed": pa.array([1 if d == 0 else 0], pa.int64()),
                }
            )

        leg = (
            counted.map_batches(
                dup_partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
            .repartition(1)
            .map_batches(dup_final, batch_format="pyarrow", batch_size=None)
        )
        out = out.union(leg)
    return out
