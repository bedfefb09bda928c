"""Metadata-only column rename / drop: the epoch-stamped schema log.

The engine's additive evolution (new columns appear in late epochs, early
files are null-filled at read — schema.py unify/align) covers column ADDS.
This module adds the other two lakehouse schema operations as PURE METADATA
commits — no data file is rewritten:

* ``rename``: a payload column changes its logical name;
* ``drop``: a payload column is removed from the logical schema.

Both are recorded as entries in the manifest's ``schema_log`` — a
chronological list carried forward by every commit (like ``restore_gen``)::

    {"epoch": E, "op": "rename", "from": "text", "to": "body"}
    {"epoch": E, "op": "drop",   "column": "tool"}

**The epoch-stamp rule** (the whole contract): an entry recorded at epoch
``E`` applies to every data file whose *file epoch* is ``<= E`` — i.e. to
files written before (or at) the commit the entry re-stamped.  Files
written later already carry the post-op logical names (ingest after a
rename uses the new name; a flush always maps the chain it folds, so
compacted bases and migrated files are logical-named at their own epoch).
File epochs are parsed from the chain naming scheme
(``{base,delta,pre,dlbase,dldelta}-EEEEEE[-mig].parquet``, state/merger.py).

Consequences the rule buys for free:

* **chained renames** (a→b at E1, b→c at E2): a file at e<=E1 applies both
  in order; a file in (E1, E2] applies only the second.
* **drop + re-add**: a column dropped at E and re-introduced by later
  ingest is a NEW column — old files' values stay logically invisible
  (their file epoch <= E), new files' values are live.
* **idempotence**: mapping a file that already carries logical names is a
  no-op (a rename fires only when the OLD name is present).
* **time travel**: reads at a historical epoch use that manifest record's
  own ``schema_log``, so a snapshot taken before a rename still shows the
  old name (and ``restore`` re-commits the historical log).

Reference analog: the reference handles schema change by editing Jade
``*.table.json`` column lists and re-ingesting
(/root/reference/schema/README.md); this is the Iceberg/Delta-style
metadata-only evolution the mirror pipeline lacks.
"""

from __future__ import annotations

import re

import pyarrow as pa

#: chain file naming scheme (state/merger.py flush + migrate staging)
_FILE_EPOCH_RE = re.compile(
    r"(?:base|delta|pre|dlbase|dldelta)-(\d+)(?:-mig)?\.parquet$"
)


def file_epoch(path: str) -> int:
    """Epoch a chain file was written at, parsed from its name."""
    m = _FILE_EPOCH_RE.search(path)
    if m is None:
        raise ValueError(f"not an engine chain file: {path!r}")
    return int(m.group(1))


def applicable(log: list[dict], fe: int) -> list[dict]:
    """Entries that apply to a file written at epoch ``fe`` (chronological)."""
    return [e for e in log if fe <= int(e["epoch"])]


def map_table(t: pa.Table, fe: int, log: list[dict]) -> pa.Table:
    """Apply the schema log to a table read from a file of epoch ``fe``."""
    for e in applicable(log, fe):
        if e["op"] == "rename":
            old, new = e["from"], e["to"]
            names = t.column_names
            if old in names:
                t = t.rename_columns([new if n == old else n for n in names])
        elif e["op"] == "drop":
            col = e["column"]
            if col in t.column_names:
                t = t.drop_columns([col])
    return t


def map_schema(s: pa.Schema, fe: int, log: list[dict]) -> pa.Schema:
    """Schema-level twin of ``map_table`` (for footer-only reads)."""
    for e in applicable(log, fe):
        if e["op"] == "rename":
            old, new = e["from"], e["to"]
            names = s.names
            if old in names:
                i = names.index(old)
                s = s.set(i, s.field(i).with_name(new))
        elif e["op"] == "drop":
            col = e["column"]
            if col in s.names:
                s = s.remove(s.names.index(col))
    return s


def physical_name(name: str, fe: int, log: list[dict]) -> str | None:
    """The physical column name a LOGICAL column has inside a file of epoch
    ``fe`` — for projection pushdown through renames.  Returns ``None``
    when the logical column cannot exist in that file (it traces back to a
    column dropped at or after ``fe``: the file's bytes under that name
    belong to the dropped column, not to any later re-add)."""
    cur = name
    for e in reversed(applicable(log, fe)):
        if e["op"] == "rename" and e["to"] == cur:
            cur = e["from"]
        elif e["op"] == "drop" and e["column"] == cur:
            return None
    return cur
