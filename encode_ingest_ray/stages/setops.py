"""Multiset membership — the distributed kernel behind INTERSECT / EXCEPT.

Shape: the caller projects each row to ``(key, flag_0..flag_{k-1})`` where
flag_i is 0/1 ("this row witnesses side i").  Per-block combiner reduces to
one row per (block, key) with per-side presence flags (``max`` == boolean OR
on 0/1), one hash-bucket exchange of those partials, one C++ ``max`` per
bucket — then INTERSECT is ``all flags``, EXCEPT is ``flag_0 and not
flag_1``, and any other boolean over sides is a free filter.  The exchange
carries one row per (block, distinct key): nothing proportional to the raw
row count ever shuffles.
"""

from __future__ import annotations

import pyarrow as pa

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply


def presence_flags(ds, keys: list[str], flag_cols: list[str], num_buckets=None):
    """Reduce ``(keys, 0/1 flags)`` rows to one row per key with the OR of
    every flag column (exact distributed set membership)."""
    rename = {f"{c}_max": c for c in flag_cols}

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "max") for c in flag_cols])
        g = g.rename_columns([rename.get(n, n) for n in g.column_names])
        return g.select(keys + flag_cols)

    local = ds.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_groupby_apply(local, keys, combine, num_buckets)
