"""Exact deduplication operators.

Reference: ``distinctBy(_.read[String]("@id"))`` applied to every extracted
entity stream (ExtractionPipelineBuilder.scala:90-91) and
``distinctBy[String](_._1)`` (TransformationPipelineBuilder.scala:461).

Scale design: dedup is a single hash exchange on the key. For "keep an
arbitrary/first element" the reference relies on unordered streams; here the
winner is made *deterministic* (min/max of an ordering column) so replays and
different parallelism levels produce identical output — the same philosophy as
the reference's sorted-list normalizations
(ExperimentActivityTransformations.scala:51-53).

At 100 TB: a per-batch local dedup (combiner) runs inside ``map_batches``
before the exchange, so the shuffle only moves one candidate row per key per
block, not every row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _winner_per_key(
    table: pa.Table, key_columns: list[str], order_column, keep_max: bool
) -> pa.Table:
    """One deterministic winner row per key: the row with min/max ordering
    columns (``order_column`` may be one name or a list; pass a combination
    unique per key so the winner is total-order deterministic)."""
    if table.num_rows <= 1:
        return table
    direction = "descending" if keep_max else "ascending"
    order_columns = [order_column] if isinstance(order_column, str) else list(order_column)
    keys = [(k, "ascending") for k in key_columns] + [
        (o, direction) for o in order_columns
    ]
    idx = pc.sort_indices(table, sort_keys=keys)
    t = table.take(idx)
    import numpy as np

    n = t.num_rows
    mask = np.empty(n, dtype=bool)
    mask[0] = True
    prev_cols = [
        t.column(k).combine_chunks().dictionary_encode().indices.to_numpy(zero_copy_only=False)
        if pa.types.is_string(t.schema.field(k).type)
        else t.column(k).combine_chunks().to_numpy(zero_copy_only=False)
        for k in key_columns
    ]
    acc = np.zeros(n - 1, dtype=bool)
    for c in prev_cols:
        acc |= c[1:] != c[:-1]
    mask[1:] = acc
    return t.filter(pa.array(mask))


def dedup_exact(
    ds,
    key_columns: list[str],
    order_column: str,
    keep_max: bool = False,
):
    """Distributed exact dedup: local combiner → hash exchange → final winner.

    ``groupby(key).map_groups`` would also work but ships every duplicate row
    through the shuffle; the pre-combine inside ``map_batches`` cuts exchange
    volume to ≤ one row per key per block.
    """
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    local = ds.map_batches(
        lambda t: _winner_per_key(t, key_columns, order_column, keep_max),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    # final winners per hash bucket — _winner_per_key is vectorized over the
    # whole bucket (sort + boundary scan), so one call per bucket, not per key
    return bucketed_groupby_apply(
        local,
        key_columns,
        lambda t: _winner_per_key(t, key_columns, order_column, keep_max),
    )


def distinct_values(ds, column: str):
    """Distinct values of one column (reference: keyed distinct streams).
    Local per-block distinct first, then ONE bucketed exchange with a
    per-bucket unique — per-VALUE map_groups tasks would dominate ~10x past
    ~10k distinct values (CLAUDE.md measured rule)."""
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    local = ds.map_batches(
        lambda t: pa.table({column: pc.unique(t.column(column).combine_chunks())}),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    return bucketed_groupby_apply(
        local,
        [column],
        lambda t: pa.table({column: pc.unique(t.column(column).combine_chunks())}),
    )
