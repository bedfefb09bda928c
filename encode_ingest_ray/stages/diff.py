"""Snapshot diff: the change stream between two keyed table states.

The reference's per-table sync IS a diff: stage the new extract, then
conditionally soft-delete rows that vanished and append rows that changed
(/root/reference/orchestration/templates/ingest-processed-data.yaml —
diff → soft-delete → append, idempotent).  Here that primitive is a
first-class distributed operator over any two unique-keyed Datasets (in
the engine's case, two time-travel snapshots of committed epochs): emit one
row per key whose state changed, tagged ``insert`` / ``update`` /
``delete``.

Shape: tag both snapshots, union, ONE hash exchange on the key prefix, then
a fully vectorized per-bucket merge — sort by (keys, side), detect key runs
with numpy, pair-compare the run's old/new rows with null-safe Arrow
kernels.  No pyarrow join (whose full-outer key coalescing is
version-sensitive), no Python rows, and each bucket ships only changed
rows.  Assumes each input holds at most one row per key (snapshot / LWW
invariant) — violations raise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import dynamic_num_buckets
from encode_ingest_ray.stages.joins import _hash_bucket_column


def _is_distinct(a: pa.Array, b: pa.Array) -> pa.Array:
    """SQL ``IS DISTINCT FROM``: null-safe inequality."""
    an, bn = pc.is_null(a), pc.is_null(b)
    neq = pc.fill_null(pc.not_equal(a, b), False)  # both-null or value-vs-null
    return pc.or_(pc.xor(an, bn), neq)


def snapshot_diff(
    old,
    new,
    key_cols: list[str],
    compare_cols: list[str],
    carry_cols: list[str] | None = None,
    num_buckets: int | None = None,
):
    """Changed keys between two unique-keyed snapshots.

    Output: ``key_cols + [change_type] + carry_cols`` where ``change_type``
    ∈ {insert, update, delete}; carry columns are taken from the NEW side
    (null for deletes).  Unchanged keys (all ``compare_cols`` pairwise
    not-distinct) are dropped inside the bucket task.
    """
    if carry_cols is None:
        carry_cols = []
    if num_buckets is None:
        num_buckets = max(dynamic_num_buckets(old), dynamic_num_buckets(new))

    schema = old.schema().base_schema
    keep = list(dict.fromkeys(key_cols + compare_cols + carry_cols))
    out_schema = pa.schema(
        [schema.field(k) for k in key_cols]
        + [pa.field("change_type", pa.string())]
        + [schema.field(c) for c in carry_cols]
    )

    def _prep(batch: pa.Table, side: int) -> pa.Table:
        batch = batch.select(keep)
        batch = batch.append_column(
            "__side", pa.array(np.full(batch.num_rows, side, np.int8))
        )
        return _hash_bucket_column(batch, key_cols[0], num_buckets)

    ot = old.map_batches(
        lambda t: _prep(t, 0), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    nt = new.map_batches(
        lambda t: _prep(t, 1), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def _diff_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [(k, "ascending") for k in key_cols] + [("__side", "ascending")]
        )
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        # adjacent-row key equality (numpy over dictionary codes / ints)
        same = np.ones(n - 1, bool)
        for k in key_cols:
            col = t.column(k).combine_chunks()
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False)
            else:
                v = col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            same &= v[1:] == v[:-1]
        starts = np.flatnonzero(np.r_[True, ~same])
        lens = np.diff(np.r_[starts, n])
        if lens.max(initial=0) > 2:
            raise ValueError("snapshot_diff inputs must be unique per key")
        side = t.column("__side").combine_chunks().to_numpy(zero_copy_only=False)

        # paired runs (old row at s, new row at s+1): update iff any compare
        # column IS DISTINCT
        p = starts[lens == 2]
        if len(p) and not ((side[p] == 0) & (side[p + 1] == 1)).all():
            raise ValueError("snapshot_diff inputs must be unique per key")
        upd_keep = np.zeros(len(p), bool)
        if len(p):
            oi, ni = pa.array(p), pa.array(p + 1)
            changed = None
            for c in compare_cols:
                col = t.column(c).combine_chunks()
                d = _is_distinct(col.take(oi), col.take(ni))
                changed = d if changed is None else pc.or_(changed, d)
            upd_keep = changed.to_numpy(zero_copy_only=False)
        upd_idx = (p + 1)[upd_keep]  # take values from the NEW side

        singles = starts[lens == 1]
        ins_idx = singles[side[singles] == 1]
        del_idx = singles[side[singles] == 0]

        def _emit(idx: np.ndarray, label: str, carry_from_row: bool) -> pa.Table:
            ia = pa.array(idx)
            cols = [t.column(k).take(ia) for k in key_cols]
            cols.append(pa.array([label] * len(idx), pa.string()))
            for c in carry_cols:
                if carry_from_row:
                    cols.append(t.column(c).take(ia))
                else:
                    cols.append(pa.nulls(len(idx), out_schema.field(c).type))
            return pa.Table.from_arrays(cols, schema=out_schema)

        return pa.concat_tables(
            [
                _emit(ins_idx, "insert", True),
                _emit(upd_idx, "update", True),
                _emit(del_idx, "delete", False),
            ]
        )

    both = ot.union(nt)
    return both.groupby("__bucket").map_groups(_diff_bucket, batch_format="pyarrow")
