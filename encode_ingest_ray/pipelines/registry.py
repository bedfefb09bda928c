"""Query registry backing ``__ray_entry__.queries()`` / ``oracle_sql()``.

Every entry is one operator/pipeline from SURVEY.md §2 (or a training-data
addition) expressed Ray-Data-first, with — where SQL-expressible — an exact
DuckDB oracle over the same parquet tables.  Column names and integer-exact
aggregate encodings (cents / milli-units) are chosen so the driver's
order-insensitive value-hash matches bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from encode_ingest_ray.pipelines import (  # noqa: F401
        aggregates_extra,
        analogs,
        cdc_queries,
        dq_queries,
        entity_queries,
        events_analytics,
        graph,
        llmprep,
        mining,
        ranking,
        relational,
        setops_queries,
        spatial_queries,
        stats_queries,
        temporal,
        training,
    )
