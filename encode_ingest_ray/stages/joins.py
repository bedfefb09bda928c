"""Join strategies (SURVEY.md §2.4).

The reference's joins are hash equi-joins on string keys, mostly with one
small side; its one explicit broadcast is the libraries ``asListSideInput``
scanned per file (TransformationPipelineBuilder.scala:131,382-425).  Ray-Data
mappings:

* ``broadcast_join`` — small dimension side materialized once into the object
  store (``ray.put``), every map task reads it zero-copy; NO shuffle of the
  big side.  (reference J1/J4/J8/J12)
* ``cohash_join`` — both sides large: add ``bucket = hash(key) % B`` to both,
  tag, union, one ``groupby(bucket)`` exchange, join pairwise inside
  ``map_groups``.  One shuffle instead of two (the J9 pattern: "one shuffle
  instead of three").
* ``semi_join_filter`` — broadcast the key set, filter with ``pc.is_in``
  (reference: the in-record ``intersect`` semi-join filter,
  FileTransformations.scala:66-85).
"""

from __future__ import annotations

import zlib
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


# ---------------------------------------------------------------------------
# broadcast join
# ---------------------------------------------------------------------------
def broadcast_join(
    ds,
    dim_table: pa.Table,
    key: str,
    dim_key: str,
    dim_columns: list[str] | None = None,
    how: str = "left",
):
    """Left/inner join a Dataset against a small in-memory dimension table.

    ``dim_table`` is ``ray.put`` once; each map task gets it zero-copy from
    the object store (idiomatic Ray broadcast — never re-shipped per batch).
    """
    if dim_columns is not None:
        dim_table = dim_table.select([dim_key] + dim_columns)
    ref = ray.put(dim_table)

    def _join(batch: pa.Table, *, ref, key, dim_key, how) -> pa.Table:
        dim: pa.Table = ray.get(ref)
        dkeys = dim.column(dim_key).combine_chunks()
        idx = pc.index_in(batch.column(key), dkeys)
        for name in dim.column_names:
            if name == dim_key:
                continue
            taken = pc.take(dim.column(name).combine_chunks(), idx)
            batch = batch.append_column(name, taken)
        if how == "inner":
            batch = batch.filter(pc.is_valid(idx))
        return batch

    return ds.map_batches(
        partial(_join, ref=ref, key=key, dim_key=dim_key, how=how),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


def semi_join_filter(ds, keys: pa.Array | list, column: str, anti: bool = False):
    """Keep rows whose ``column`` is (not) in the broadcast key set."""
    key_arr = pa.array(keys) if not isinstance(keys, (pa.Array, pa.ChunkedArray)) else keys
    ref = ray.put(key_arr)

    def _filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(batch.column(column), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# co-hash (partitioned) join for two large sides
# ---------------------------------------------------------------------------
def _hash_bucket_column(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    col = batch.column(key).combine_chunks()
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (vals + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        mixed ^= mixed >> np.uint64(31)
        bucket = (mixed % np.uint64(num_buckets)).astype(np.int32)
    else:
        d = col.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        uh = np.fromiter(
            (zlib.crc32(str(u).encode()) for u in uniq), dtype=np.uint64, count=len(uniq)
        )
        bucket = (uh[d.indices.to_numpy(zero_copy_only=False)] % np.uint64(num_buckets)).astype(np.int32)
    return batch.append_column("__bucket", pa.array(bucket, type=pa.int32()))


def _tag(batch: pa.Table, side: int) -> pa.Table:
    return batch.append_column("__side", pa.array(np.full(batch.num_rows, side, np.int8)))


def cohash_join(
    left,
    right,
    left_key: str,
    right_key: str,
    num_buckets: int | None = None,
    how: str = "inner",
    map_joined=None,
):
    """Partitioned hash join of two Datasets: tag → union → one
    ``groupby(bucket)`` exchange → pandas merge per bucket.

    ``map_joined(table)``, when given, runs on each bucket's joined table
    INSIDE the join task — push per-bucket aggregation here so partials
    (not the full-width join result) are what leaves the task.

    Skew note: a hot join key lands in one bucket; raise ``num_buckets`` or
    pre-salt the hot keys (split the left side's hot key into k sub-keys and
    replicate the matching right rows k×) when a bucket exceeds worker RAM.
    ``num_buckets=None`` (default) sizes the count from both inputs' file
    footprints so a bucket stays under ~32 MB decoded.
    """
    if num_buckets is None:
        from encode_ingest_ray.stages.aggregate import dynamic_num_buckets

        num_buckets = max(dynamic_num_buckets(left), dynamic_num_buckets(right))
    left_schema = left.schema().base_schema
    right_schema = right.schema().base_schema
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    # tagged-union needs ONE schema: left cols + right cols prefixed "__r_",
    # each side null-filling the other's columns
    unified = pa.schema(
        list(left_schema)
        + [pa.field(f"__r_{f.name}", f.type) for f in right_schema]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def _prep(batch: pa.Table, side: int, key: str) -> pa.Table:
        batch = _tag(_hash_bucket_column(batch, key, num_buckets), side)
        if side == 1:
            batch = batch.rename_columns(
                [f"__r_{c}" if c in right_cols else c for c in batch.column_names]
            )
        cols = []
        for f in unified:
            if f.name in batch.column_names:
                cols.append(batch.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=unified)

    lt = left.map_batches(
        lambda t: _prep(t, 0, left_key), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    rt = right.map_batches(
        lambda t: _prep(t, 1, right_key), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    _PA_JOIN = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }

    def _join_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("__side"), 0)
        l = group.filter(mask).select(left_cols)
        r = group.filter(pc.invert(mask)).select(
            [f"__r_{c}" for c in right_cols]
        ).rename_columns(right_cols)
        # pyarrow's C++ hash join; NB the right join key column is not
        # duplicated in the output (its values equal the left key on inner)
        out = l.join(r, keys=[left_key], right_keys=[right_key], join_type=_PA_JOIN[how])
        return map_joined(out) if map_joined is not None else out

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(_join_bucket, batch_format="pyarrow")
