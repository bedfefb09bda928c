"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (full engine: salted partition
exchange → actor-pool LWW upsert → two-phase manifest commit → committed
live table) on /root/testdata/sf0.001.  ``queries()`` exposes every
implemented operator/pipeline from SURVEY.md §2 plus the training-data
additions; ``oracle_sql()`` gives the exact DuckDB equivalent where the
operator is SQL-expressible (integer-exact encodings for aggregates).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from encode_ingest_ray.pipelines import registry

registry.load_all()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return registry.QUERIES["cdc_upsert_engine"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query (same column
    names; non-SQL-expressible sketch/ANN/LSH ops are omitted → rows-only)."""
    return dict(registry.ORACLE)
