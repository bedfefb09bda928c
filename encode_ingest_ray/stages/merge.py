"""Distributed MERGE INTO — conditional matched/not-matched actions.

The warehouse MERGE statement (SQL:2003): apply a change set onto a target
table with WHEN MATCHED AND action='update' THEN UPDATE, WHEN MATCHED AND
action='delete' THEN DELETE, WHEN NOT MATCHED AND action='insert' THEN
INSERT — in one pass.  This generalizes the CDC engine's fixed LWW upsert
(state/lww.py) to caller-supplied conditional actions over arbitrary
tables.

Shape: tag target (src=0) and changes (src=1) into one unified-schema
stream, pay ONE key exchange (stages/aggregate.bucketed_groupby_apply), and
resolve each bucket with vectorized Arrow C++ joins — a matched-side left
join for update/delete and an anti join for the inserts.  No per-key Python
calls; raw target payloads cross the exchange once (unavoidable: MERGE
rewrites the table), changes are the small side.  At 100 TB the target
would already be key-partitioned on disk (the CDC engine's layout), making
the exchange a per-partition local merge — same kernel, zero shuffle.

MERGE requires the change set to have AT MOST ONE action per key
(SQL raises on multiple matches; here the per-bucket join would duplicate
target rows — callers must dedupe upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

_UPDATE, _DELETE, _INSERT = 1, 2, 3  # integer action codes on the wire


def merge_into(
    target_ds,
    source_ds,
    *,
    key: str,
    payload_cols: list[str],
    set_col: str,
    new_val_col: str,
    action_col: str = "action",
):
    """MERGE ``source_ds`` into ``target_ds`` on ``key``.

    ``target_ds``: columns ``[key] + payload_cols`` (``set_col`` among them).
    ``source_ds``: columns ``[key, action_col, new_val_col]`` with actions
    'update' | 'delete' | 'insert' and at most one row per key.
    Returns the merged table as a Dataset with the target's schema; inserted
    rows carry NULL in every payload column except ``set_col``.
    """
    other_cols = [c for c in payload_cols if c != set_col]

    def tag_target(t: pa.Table) -> pa.Table:
        data = {
            key: t.column(key),
            "__src": pa.array(np.zeros(t.num_rows, np.int8)),
            "__action": pa.nulls(t.num_rows, pa.int8()),
            "__new_val": pa.nulls(t.num_rows, pa.int64()),
        }
        for c in payload_cols:
            data[c] = t.column(c)
        return pa.table(data)

    def tag_source(t: pa.Table) -> pa.Table:
        act = t.column(action_col)
        code = pc.case_when(
            pc.make_struct(
                pc.equal(act, "update"),
                pc.equal(act, "delete"),
                pc.equal(act, "insert"),
            ),
            _UPDATE,
            _DELETE,
            _INSERT,
        )
        data = {
            key: t.column(key),
            "__src": pa.array(np.ones(t.num_rows, np.int8)),
            "__action": pc.cast(code, pa.int8()),
            "__new_val": pc.cast(t.column(new_val_col), pa.int64()),
        }
        sch = tgt_schema
        for c in payload_cols:
            data[c] = pa.nulls(t.num_rows, sch.field(c).type)
        return pa.table(data)

    tgt_schema = target_ds.schema().base_schema

    tagged = target_ds.map_batches(
        tag_target, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        source_ds.map_batches(
            tag_source, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    out_fields = [(key, tgt_schema.field(key).type)] + [
        (c, tgt_schema.field(c).type) for c in payload_cols
    ]

    def resolve(t: pa.Table) -> pa.Table:
        src = t.column("__src").combine_chunks().to_numpy(zero_copy_only=False)
        tgt = t.filter(pa.array(src == 0)).select([key] + payload_cols)
        chg = t.filter(pa.array(src == 1)).select([key, "__action", "__new_val"])
        if tgt.num_rows == 0 and chg.num_rows == 0:
            return pa.table(
                {n: pa.array([], ty) for n, ty in out_fields}
            )
        joined = tgt.join(chg, keys=[key], join_type="left outer")
        act = joined.column("__action")
        keep = pc.fill_null(pc.not_equal(act, _DELETE), True)
        joined = joined.filter(keep)
        act = joined.column("__action")
        is_upd = pc.fill_null(pc.equal(act, _UPDATE), False)
        merged_val = pc.if_else(
            is_upd,
            pc.cast(joined.column("__new_val"), tgt.schema.field(set_col).type),
            joined.column(set_col),
        )
        out = {key: joined.column(key)}
        for c in payload_cols:
            out[c] = merged_val if c == set_col else joined.column(c)
        result = pa.table(out)
        # not-matched inserts: anti join change-side inserts against target keys
        ins = chg.filter(pc.equal(chg.column("__action"), _INSERT))
        if ins.num_rows:
            ins = ins.join(tgt.select([key]), keys=[key], join_type="left anti")
        if ins.num_rows:
            row = {key: ins.column(key)}
            for c in payload_cols:
                if c == set_col:
                    row[c] = pc.cast(
                        ins.column("__new_val"), tgt.schema.field(set_col).type
                    )
                else:
                    row[c] = pa.nulls(ins.num_rows, tgt.schema.field(c).type)
            result = pa.concat_tables([result, pa.table(row)])
        return result

    return bucketed_groupby_apply(tagged, [key], resolve)
