"""Declarative table-spec registry (SURVEY.md §2.10).

The reference declares every output table as a JSON spec with primary keys,
required and ``repeated`` columns
(/root/reference/schema/src/main/jade-tables/*.table.json, e.g.
``file.table.json:2-7,95-164``) and codegens row classes from them
(``build.sbt:43-50``).  Here a spec compiles to a ``pyarrow.Schema`` —
``repeated`` becomes ``list<...>`` — and tables are validated/aligned
against it (additive evolution: unknown columns rejected or tolerated per
``ignore_unknown_values``, the TDR ingest flag from hack/README.md).

Spec shape::

    {"name": "transcript",
     "primaryKey": ["conv_id", "turn_idx"],
     "columns": [
        {"name": "conv_id", "datatype": "string", "required": true},
        {"name": "turn_idx", "datatype": "integer", "required": true},
        {"name": "labels",  "datatype": "string", "array_of": true},
        {"name": "ts",      "datatype": "timestamp"}]}
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

_DATATYPES = {
    "string": pa.string(),
    "integer": pa.int64(),
    "int32": pa.int32(),
    "float": pa.float64(),
    "boolean": pa.bool_(),
    "timestamp": pa.timestamp("us"),
    "fileref": pa.string(),
    "binary": pa.binary(),
}


class TableSpec:
    """Accepts BOTH spec dialects:

    * the engine's own shape (``primaryKey`` list + per-column ``required`` /
      ``array_of`` booleans), and
    * the reference's jade-tables shape, where each column carries
      ``type: primary_key | required | repeated``
      (/root/reference/schema/src/main/jade-tables/file.table.json:2-7).
    """

    def __init__(self, spec: dict):
        self.name: str = spec["name"]
        self.primary_key: list[str] = list(spec.get("primaryKey", []))
        self.required: set[str] = set()
        fields = []
        for col in spec["columns"]:
            dt = _DATATYPES[col["datatype"]]
            jade_type = col.get("type")
            repeated = bool(col.get("array_of")) or jade_type == "repeated"
            required = bool(col.get("required")) or jade_type in (
                "required",
                "primary_key",
            )
            if jade_type == "primary_key" and col["name"] not in self.primary_key:
                self.primary_key.append(col["name"])
            if repeated:
                dt = pa.list_(dt)
            if required:
                self.required.add(col["name"])
            fields.append(pa.field(col["name"], dt, nullable=not required))
        self.schema = pa.schema(fields)
        for pk in self.primary_key:
            if pk not in self.schema.names:
                raise ValueError(f"primaryKey column {pk!r} not in columns")

    def validate(self, table: pa.Table, ignore_unknown_values: bool = True) -> pa.Table:
        """Project ``table`` onto the spec schema: cast/reorder, null-fill
        optional missing columns, fail on missing required columns; unknown
        columns are dropped (``ignore_unknown_values``) or rejected."""
        from encode_ingest_ray.schema import align_to_schema

        unknown = set(table.column_names) - set(self.schema.names)
        if unknown and not ignore_unknown_values:
            raise ValueError(f"unknown columns {sorted(unknown)} for table {self.name}")
        missing_required = self.required - set(table.column_names)
        if missing_required:
            raise ValueError(
                f"missing required columns {sorted(missing_required)} for {self.name}"
            )
        out = align_to_schema(table.select([c for c in table.column_names if c in self.schema.names]), self.schema)
        for col in self.required:
            if out.column(col).null_count:
                raise ValueError(f"required column {col!r} has nulls")
        return out


class SchemaRegistry:
    """Directory of ``*.table.json`` specs (the reference's jade-tables dir)."""

    def __init__(self, spec_dir: str | None = None):
        self.specs: dict[str, TableSpec] = {}
        if spec_dir:
            for name in sorted(os.listdir(spec_dir)):
                if name.endswith(".table.json"):
                    with open(os.path.join(spec_dir, name)) as f:
                        self.register(json.load(f))

    def register(self, spec: dict) -> TableSpec:
        ts = TableSpec(spec)
        self.specs[ts.name] = ts
        return ts

    def __getitem__(self, name: str) -> TableSpec:
        return self.specs[name]


#: the engine's own table spec (BASELINE.json input_hint shape)
TRANSCRIPT_SPEC = {
    "name": "transcript",
    "primaryKey": ["conv_id", "turn_idx"],
    "columns": [
        {"name": "conv_id", "datatype": "string", "required": True},
        {"name": "turn_idx", "datatype": "int32", "required": True},
        {"name": "role", "datatype": "string"},
        {"name": "text", "datatype": "string"},
        {"name": "tool", "datatype": "string"},
        {"name": "ts", "datatype": "timestamp"},
    ],
}
