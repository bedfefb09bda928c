"""Partial (combiner) aggregation — pre-aggregate inside map_batches, then a
tiny global groupby.

Reference analog: the reference's per-record fold-aggregates run inside the
worker before any shuffle (SURVEY.md §2.5 A3); at scale a bare
``groupby().aggregate()`` shuffles every row, while the combiner form ships
one row per (key, block).  For sums/counts this is exact (integer-encoded
columns; see analogs.py `_cents`).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum


def partial_groupby_sum(
    ds,
    keys: list[str],
    sum_columns: dict[str, str],
    count_alias: str | None = None,
):
    """``SELECT keys, SUM(col) AS out..., COUNT(*) AS count_alias GROUP BY keys``
    with per-block pre-aggregation.

    ``sum_columns`` maps output name -> input column.  All sum columns should
    be integer-encoded so partial/total sums are order-independent.
    """
    aggs = [(col, "sum") for col in sum_columns.values()]
    out_by_pa_name = {f"{col}_sum": out for out, col in sum_columns.items()}
    if count_alias:
        probe = keys[0]
        aggs.append((probe, "count"))
        out_by_pa_name[f"{probe}_count"] = count_alias

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(aggs)
        names = [out_by_pa_name.get(n, n) for n in g.column_names]
        return g.rename_columns(names)

    local = ds.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    final_aggs = [Sum(out, alias_name=out) for out in sum_columns]
    if count_alias:
        final_aggs.append(Sum(count_alias, alias_name=count_alias))
    return local.groupby(keys).aggregate(*final_aggs)
