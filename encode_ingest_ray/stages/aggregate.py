"""Partial (combiner) aggregation — pre-aggregate inside map_batches, then a
tiny global groupby.

Reference analog: the reference's per-record fold-aggregates run inside the
worker before any shuffle (SURVEY.md §2.5 A3); at scale a bare
``groupby().aggregate()`` shuffles every row, while the combiner form ships
one row per (key, block).  For sums/counts this is exact (integer-encoded
columns; see analogs.py `_cents`).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum


def partial_groupby_sum(
    ds,
    keys: list[str],
    sum_columns: dict[str, str],
    count_alias: str | None = None,
):
    """``SELECT keys, SUM(col) AS out..., COUNT(*) AS count_alias GROUP BY keys``
    with per-block pre-aggregation.

    ``sum_columns`` maps output name -> input column.  All sum columns should
    be integer-encoded so partial/total sums are order-independent.
    """
    aggs = [(col, "sum") for col in sum_columns.values()]
    out_by_pa_name = {f"{col}_sum": out for out, col in sum_columns.items()}
    if count_alias:
        probe = keys[0]
        aggs.append((probe, "count"))
        out_by_pa_name[f"{probe}_count"] = count_alias

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(aggs)
        names = [out_by_pa_name.get(n, n) for n in g.column_names]
        return g.rename_columns(names)

    local = ds.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    final_aggs = [Sum(out, alias_name=out) for out in sum_columns]
    if count_alias:
        final_aggs.append(Sum(count_alias, alias_name=count_alias))
    return local.groupby(keys).aggregate(*final_aggs)


def dynamic_num_buckets(
    ds,
    bytes_per_bucket: int = 32 << 20,
    lo: int = 16,
    hi: int = 1024,
    default: int = 64,
) -> int:
    """Derive a bucket count from the dataset's source-file footprint so no
    bucket materializes more than ~``bytes_per_bucket`` of (decoded) data.

    Uses ``input_files()`` sizes — available from read metadata without
    executing the plan; Parquet→Arrow decode expands ~3x, folded in.  Falls
    back to ``default`` for in-memory datasets with no file lineage.  The
    bucket count never changes RESULTS (buckets are unioned), only the
    per-task memory bound and skew headroom.
    """
    import os

    try:
        files = ds.input_files()
    except Exception:
        files = []
    total = 0
    for f in files:
        try:
            total += os.path.getsize(f)
        except OSError:
            pass
    if total <= 0:
        return default
    return int(min(hi, max(lo, (total * 3) // bytes_per_bucket + 1)))


def bucketed_sum_combine(ds, keys: list[str], sum_columns: list[str], num_buckets=None):
    """Exact high-cardinality ``SELECT keys, SUM(c)... GROUP BY keys`` where
    ``ds`` already holds per-block PARTIAL rows (each block pre-combined):
    one hash-bucket exchange of the partials, then a single vectorized C++
    ``pa.Table.group_by`` sum per bucket.  The native ``Dataset.groupby``
    Aggregate is sort-based and collapses past ~10k string groups (measured
    on the 20k-vocab corpus: a 40k-group sum took 6.8 s through the native
    path vs ~0.3 s through this shape)."""
    rename = {f"{c}_sum": c for c in sum_columns}

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "sum") for c in sum_columns])
        g = g.rename_columns([rename.get(n, n) for n in g.column_names])
        return g.select(keys + sum_columns)

    return bucketed_groupby_apply(ds, keys, combine, num_buckets)


def bucketed_groupby_apply(
    ds,
    key_columns: list[str],
    bucket_fn,
    num_buckets: int | None = None,
):
    """High-cardinality grouped aggregation: exchange once on
    ``hash(keys) % num_buckets``, then run ONE *vectorized* function per
    bucket (``pa.Table.group_by`` inside), instead of one Python
    ``map_groups`` call per key — at 150k+ groups the per-group call
    overhead dominates the actual aggregation by 10x+.

    ``bucket_fn(table)`` sees all rows of its bucket (every key fully
    contained) and returns an aggregated table.  ``num_buckets=None`` (the
    default) sizes the bucket count from the input's file footprint via
    ``dynamic_num_buckets`` — pass an int only when the caller knows better.
    """
    import zlib

    import numpy as np

    if num_buckets is None:
        num_buckets = dynamic_num_buckets(ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, np.uint64)
        for k in key_columns:
            col = t.column(k).combine_chunks()
            if pa.types.is_integer(col.type):
                if col.null_count:
                    col = col.fill_null(0)  # nulls co-bucket deterministically
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                d = col.dictionary_encode()
                uniq = d.dictionary.to_pylist()
                # one extra slot hashes the NULL code (null indices would
                # otherwise surface as NaN and break the fancy index)
                uh = np.fromiter(
                    (zlib.crc32(str(u).encode()) for u in uniq),
                    dtype=np.uint64,
                    count=len(uniq),
                )
                uh = np.append(uh, np.uint64(zlib.crc32(b"\x00__null__")))
                import pyarrow.compute as _pc

                codes = _pc.fill_null(d.indices, len(uniq)).to_numpy(
                    zero_copy_only=False
                )
                v = uh[codes.astype(np.int64)]
            h = (h * np.uint64(0x9E3779B97F4A7C15)) ^ v
        h ^= h >> np.uint64(29)
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def run_bucket(group: pa.Table) -> pa.Table:
        return bucket_fn(group.drop_columns(["__bucket"]))

    return bucketed.groupby("__bucket").map_groups(run_bucket, batch_format="pyarrow")


def pivot_count_columns(
    ds,
    key: str,
    pivot_col: str,
    categories: list[str],
    prefix: str = "n_",
    total_alias: str | None = "n_total",
    num_buckets: int | None = None,
):
    """PIVOT: long ``(key, pivot_col)`` rows -> one wide row per key with a
    count column per category (``SELECT key, COUNT(*) FILTER (WHERE
    pivot_col = c) AS prefix+c ... GROUP BY key``).

    The category list is fixed up front (the distributed pivot contract: an
    unbounded category domain would make the output schema data-dependent);
    rows whose ``pivot_col`` is outside ``categories`` count only toward
    ``total_alias``.  Shape: per-block boolean masks cast to int64 partials
    (wide from the start — the exchange carries one row per (block, key),
    never per (block, key, category)), then the standard single hash-bucket
    exchange + C++ sum per bucket.  NULL pivot values match no category but
    do count toward the COUNT(*) total, mirroring FILTER semantics.
    """
    import pyarrow.compute as pc
    import numpy as np

    cols = [f"{prefix}{c}" for c in categories]
    sum_cols = cols + ([total_alias] if total_alias else [])

    def partial(t: pa.Table) -> pa.Table:
        pv = t.column(pivot_col)
        arrs = {key: t.column(key)}
        for c, out in zip(categories, cols):
            arrs[out] = pc.cast(
                pc.fill_null(pc.equal(pv, c), False), pa.int64()
            )
        if total_alias:
            arrs[total_alias] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        t2 = pa.table(arrs)
        g = t2.group_by([key]).aggregate([(o, "sum") for o in sum_cols])
        g = g.rename_columns(
            [n[: -len("_sum")] if n.endswith("_sum") else n for n in g.column_names]
        )
        return g.select([key] + sum_cols)

    local = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_sum_combine(local, [key], sum_cols, num_buckets)


def rollup_sums(
    ds,
    keys: list[str],
    sum_cols: list[str],
    key_types: dict[str, pa.DataType] | None = None,
    num_buckets: int | None = None,
    grouping_sets: list[list[str]] | None = None,
):
    """GROUP BY GROUPING SETS over ``keys``: default is ROLLUP (every prefix
    level down to the grand total); pass ``grouping_sets`` explicitly for
    CUBE or arbitrary lattices.  Rolled-up key positions are NULL-filled
    (ANSI output).  The set containing all of ``keys`` is always computed
    (it is the base every other level reduces from) and included only when
    requested (it always is for ROLLUP/CUBE).

    Two-phase: the FINEST level pays the one real exchange (per-block
    partials -> hash buckets -> C++ sum); every super-aggregate level then
    re-aggregates the finest RESULT — never the input — so a 10^10-row scan
    funds the whole lattice once.  ``sum_cols`` must be integer-encoded
    (order-independent exact sums, cf. analogs._cents).  Key columns are
    NULL-filled with their original Arrow types (``key_types`` overrides;
    default string).
    """
    key_types = key_types or {}
    if grouping_sets is None:  # ROLLUP: prefixes, finest -> grand
        grouping_sets = [keys[:i] for i in range(len(keys), -1, -1)]

    rename = {f"{c}_sum": c for c in sum_cols}

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
        g = g.rename_columns([rename.get(n, n) for n in g.column_names])
        return g.select(keys + sum_cols)

    local = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    finest = bucketed_sum_combine(local, keys, sum_cols, num_buckets)
    if len(grouping_sets) > 1:
        # every super-aggregate level consumes `finest`, and a lazy Dataset
        # re-executes its lineage (the FULL input scan) once per consumer —
        # checkpoint the already-aggregated finest result instead
        finest = finest.materialize()

    def _null_fill(level_keys: list[str]):
        """Finalize one level: emit the canonical keys+sums layout with the
        rolled-up key columns NULL of the right type."""

        def fin(t: pa.Table) -> pa.Table:
            arrs = {}
            for k in keys:
                if k in level_keys:
                    arrs[k] = t.column(k)
                else:
                    arrs[k] = pa.nulls(t.num_rows, key_types.get(k, pa.string()))
            for c in sum_cols:
                arrs[c] = t.column(c)
            return pa.table(arrs)

        return fin

    # grand total: constant-key reduce over the finest partials, key dropped
    def add_const(t: pa.Table) -> pa.Table:
        return pa.table(
            {"__all": pa.array([0] * t.num_rows, pa.int32()),
             **{c: t.column(c) for c in sum_cols}}
        )

    levels = []
    for gset in grouping_sets:
        if list(gset) == keys:
            lvl = finest
        elif gset:
            lvl = bucketed_sum_combine(finest, list(gset), sum_cols, num_buckets=16)
        else:
            lvl = bucketed_sum_combine(
                finest.map_batches(
                    add_const, batch_format="pyarrow", batch_size=None
                ),
                ["__all"],
                sum_cols,
                num_buckets=1,
            )
        levels.append(
            lvl.map_batches(
                _null_fill(list(gset)), batch_format="pyarrow", batch_size=None
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
