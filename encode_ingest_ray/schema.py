"""Schema registry for the transcript table and its CDC event envelope.

The reference declares output schemas as JSON table specs with primary keys and
repeated columns (``/root/reference/schema/src/main/jade-tables/*.table.json``,
e.g. ``file.table.json:2-7``) and codegens row classes from them
(``build.sbt:43-50``); schema evolution there is additive spec edits plus
``ignore_unknown_values`` at ingest. Here the registry is a ``pyarrow.Schema``
with an explicit *additive evolution* rule: new nullable columns may appear in
later events; old state rows are null-filled (``align_to_schema``), and the
unified schema is the column-union in first-seen order (``unify_schemas``).
"""

from __future__ import annotations

import pyarrow as pa

#: primary key of the transcript table (reference analog: Jade primaryKey,
#: e.g. /root/reference/schema/src/main/jade-tables/file.table.json:3-7)
KEY_COLUMNS = ["conv_id", "turn_idx"]

#: LWW ordering columns — winner per key is max (ts, lsn)
ORDER_COLUMNS = ["ts", "lsn"]

#: columns of the base transcript table (BASELINE.json input_hint)
BASE_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

#: CDC envelope = base columns + (op, lsn). ``op`` ∈ {insert, update, delete};
#: ``lsn`` is a globally monotonic int64 sequence number.
EVENT_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [pa.field("op", pa.string()), pa.field("lsn", pa.int64())]
)

#: columns the engine adds/keeps beyond the base table: merge metadata that the
#: durable state snapshots retain (tombstones keep their op/ts/lsn so that
#: late-arriving older events cannot resurrect deleted rows).
META_COLUMNS = ["op", "lsn"]

OPS = ("insert", "update", "delete")


#: lossless widening lattices — the only in-place type changes evolution
#: accepts (the Avro/Iceberg promotion rule): a reader casts old rows up,
#: nothing is ever truncated
_INT_WIDTH = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_WIDTH = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_FLOAT_WIDTH = {pa.float32(): 0, pa.float64(): 1}


def _widened(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """The wider of two types when they sit on one widening lattice, else
    None (incompatible)."""
    if a == b:
        return a
    for order in (_INT_WIDTH, _UINT_WIDTH, _FLOAT_WIDTH):
        if a in order and b in order:
            return a if order[a] >= order[b] else b
    return None


def unify_schemas(a: pa.Schema, b: pa.Schema) -> pa.Schema:
    """Column-union of two schemas in first-seen order (additive evolution),
    with LOSSLESS TYPE WIDENING for shared columns (int8→…→int64,
    uint8→…→uint64, float32→float64 — the Iceberg/Avro promotion rule).
    New columns must be nullable (null-filled on rows that predate them);
    ``align_to_schema`` casts narrower historical rows up on read.
    Incompatible type changes (string→int, cross-lattice) still raise.
    """
    fields = list(a)
    names = {f.name: i for i, f in enumerate(fields)}
    for f in b:
        if f.name in names:
            i = names[f.name]
            existing = fields[i]
            if existing.type != f.type:
                wide = _widened(existing.type, f.type)
                if wide is None:
                    raise TypeError(
                        f"schema evolution supports additive columns and "
                        f"lossless widening only: column {f.name!r} changed "
                        f"type {existing.type} -> {f.type}"
                    )
                fields[i] = existing.with_type(wide)
        else:
            fields.append(f)
            names[f.name] = len(fields) - 1
    return pa.schema(fields)


def align_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``schema``: reorder columns, null-fill missing.

    The Arrow analog of TDR's ``ignore_unknown_values`` additive ingest
    (/root/reference/hack/README.md): rows written before a column existed
    read as null for it.
    """
    if table.schema == schema:
        return table
    cols = []
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(table.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=schema)
