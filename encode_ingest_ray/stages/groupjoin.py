"""Tagged-union grouped join — N streams, ONE shuffle.

Reference: the assayActivity tree joins experiments ⟕ files ⟕ replicates ⟕
libraries all keyed by experiment id (TransformationPipelineBuilder.scala:
589-623).  Instead of three chained joins (three shuffles), tag each stream,
union them, and do a single ``groupby(key)`` whose group task sees every
stream's rows for that key — "one shuffle instead of three" (SURVEY.md J9).

The union needs one schema: each side's payload columns are prefixed with
its tag and null-filled on the others.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def multi_stream_group_join(
    streams: dict[str, tuple],
    assemble,
    *,
    key_out: str = "key",
):
    """``streams``: tag -> (Dataset, key_column).  ``assemble(key, tables)``
    receives the group key and a dict tag -> pa.Table of that stream's rows
    for the key (possibly empty), and returns a one-or-more-row pa.Table.
    """
    tags = list(streams)
    # unified schema: key + __tag + every stream's payload columns prefixed
    payload_fields: dict[str, list[pa.Field]] = {}
    key_type = None
    for tag, (ds, key_col) in streams.items():
        schema = ds.schema().base_schema
        kt = schema.field(key_col).type
        key_type = kt if key_type is None else key_type
        payload_fields[tag] = [
            pa.field(f"{tag}__{f.name}", f.type) for f in schema if f.name != key_col
        ]
    unified = pa.schema(
        [pa.field(key_out, key_type), pa.field("__tag", pa.int8())]
        + [f for tag in tags for f in payload_fields[tag]]
    )

    def make_prep(tag_idx: int, tag: str, key_col: str):
        def prep(batch: pa.Table) -> pa.Table:
            cols = []
            for f in unified:
                if f.name == key_out:
                    cols.append(batch.column(key_col).cast(f.type))
                elif f.name == "__tag":
                    cols.append(pa.array(np.full(batch.num_rows, tag_idx, np.int8)))
                elif f.name.startswith(f"{tag}__"):
                    src = f.name[len(tag) + 2 :]
                    cols.append(batch.column(src).cast(f.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, f.type))
            return pa.Table.from_arrays(cols, schema=unified)

        return prep

    union = None
    for i, (tag, (ds, key_col)) in enumerate(streams.items()):
        prepped = ds.map_batches(
            make_prep(i, tag, key_col), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        union = prepped if union is None else union.union(prepped)

    def bucket_fn(bucket: pa.Table) -> pa.Table:
        # ONE task per hash bucket, not per key (at >10k keys the per-group
        # map_groups call overhead dominates ~10x — CLAUDE.md measured rule):
        # sort the bucket by key, walk key runs, call assemble per key
        import numpy as np

        idx = pc.sort_indices(bucket, sort_keys=[(key_out, "ascending")])
        b = bucket.take(idx)
        keys_col = b.column(key_out).combine_chunks()
        codes = keys_col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        bounds = np.r_[starts, b.num_rows]
        tag_np = b.column("__tag").to_numpy(zero_copy_only=False)
        outs = []
        for i in range(len(starts)):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            group = b.slice(lo, hi - lo)
            gtags = tag_np[lo:hi]
            per_tag = {}
            for ti, tag in enumerate(tags):
                rows = group.filter(pa.array(gtags == ti))
                cols = {
                    f.name[len(tag) + 2 :]: rows.column(f.name)
                    for f in payload_fields[tag]
                }
                per_tag[tag] = pa.table(cols) if cols else rows.select([])
            outs.append(assemble(keys_col[lo].as_py(), per_tag))
        return pa.concat_tables(outs, promote_options="default")

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    return bucketed_groupby_apply(union, [key_out], bucket_fn)
