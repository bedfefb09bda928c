"""Semi-structured (JSON string column) projection.

The events table carries a ``props`` JSON payload (TESTDATA.md) — the
semi-structured column every telemetry/clickstream pipeline projects before
it aggregates.  Parsing JSON row-by-row in Python is the classic hot-path
mistake; this stage stays vectorized by delegating to polars' Rust JSON
path kernel (``str.json_path_match``) inside ``map_batches`` — Arrow in,
Arrow out, no Python per-row work.  polars is a baked-in dependency (same
footing as the sort backend Ray itself borrows from it).

Contract: ``$.field`` top-level path extraction with a strict integer cast
(malformed numerics raise, like SQL ``CAST``; absent fields / null payloads
yield null, like ``json_extract``).  Nested paths work as far as
json_path_match does; exotic JSON (arrays-of-objects fan-out) belongs in a
dedicated explode stage instead.
"""

from __future__ import annotations

import pyarrow as pa


def json_extract_int64(
    t: pa.Table, col: str, field: str, out: str
) -> pa.Table:
    """Append ``out:int64`` = ``CAST(json_extract(col, '$.field') AS BIGINT)``."""
    import polars as pl

    s = (
        pl.from_arrow(t.select([col]))
        .get_column(col)
        .str.json_path_match(f"$.{field}")
        .cast(pl.Int64, strict=True)
    )
    arr = s.to_arrow()
    if arr.type != pa.int64():
        arr = arr.cast(pa.int64())
    return t.append_column(out, arr)
