"""List-unnest / stream-split operators.

Reference: the FK-unnest flatMaps — explode list-FK fields into (fk → record)
pairs (TransformationPipelineBuilder.scala:233-242, 278-285, 448-451) and
``partition(isFunctionalCharacterizationReplicate)``
(ExtractionPipelineBuilder.scala:302-306).  Vectorized with
``pyarrow.compute.list_parent_indices`` — no Python loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_list(
    batch: pa.Table,
    list_column: str,
    value_out: str,
    index_out: str | None = None,
    keep_columns: list[str] | None = None,
) -> pa.Table:
    """Explode one list column; parent columns are repeated per element.

    Rows with null/empty lists are dropped (flatMap semantics).  With
    ``index_out`` the 0-based position inside the list is emitted too.
    """
    col = batch.column(list_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        batch = batch.combine_chunks()
    parents = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    keep = keep_columns if keep_columns is not None else [
        c for c in batch.column_names if c != list_column
    ]
    out = batch.select(keep).take(parents)
    out = out.append_column(value_out, flat)
    if index_out is not None:
        import numpy as np

        p = parents.to_numpy(zero_copy_only=False)
        pos = np.arange(len(p), dtype=np.int64)
        if len(p):
            # subtract the start index of each parent's run (parents ascend)
            change = np.flatnonzero(np.diff(p)) + 1
            run_id = np.zeros(len(p), dtype=np.int64)
            run_id[change] = 1
            run_id = np.cumsum(run_id)
            run_starts = np.concatenate(([0], change))
            pos = pos - run_starts[run_id]
        out = out.append_column(index_out, pa.array(pos, type=pa.int64()))
    return out


def split_by_predicate(
    ds, predicate_fn
) -> tuple:
    """Two filtered datasets from one (Ray Data has no multi-output split).
    Reference: partition() at ExtractionPipelineBuilder.scala:302-306."""
    return (
        ds.map_batches(
            lambda t: t.filter(predicate_fn(t)), batch_format="pyarrow", batch_size=None),
        ds.map_batches(
            lambda t: t.filter(pc.invert(predicate_fn(t))), batch_format="pyarrow", batch_size=None),
    )


def melt_table(
    t: pa.Table,
    id_cols: list[str],
    value_cols: dict[str, str],
    var_name: str,
    value_name: str,
) -> pa.Table:
    """UNPIVOT/melt: wide columns back to (id…, var, value) long form.

    ``value_cols`` maps source column -> emitted category label.  Pure
    column slicing + one concat per value column (zero-copy id columns, a
    constant dictionary-ish label array per slice) — no exchange; melt is
    embarrassingly block-local, the inverse of the pivot whose exchange
    already happened.
    """
    pieces = []
    for col, label in value_cols.items():
        pieces.append(
            pa.table(
                {c: t.column(c) for c in id_cols}
                | {
                    var_name: pa.array([label] * t.num_rows, pa.string()),
                    value_name: pc.cast(t.column(col), pa.int64()),
                }
            )
        )
    return pa.concat_tables(pieces)
