"""Training-set assembly operators: deterministic train/val split and
global-scan sequence packing.

Beyond the reference's operator set (its dedup/distinct is the closest
analog, ExtractionPipelineBuilder.scala:90-91) — these are the assembly
steps an LLM training-data pipeline runs after cleaning/dedup:

* :func:`hash_split` — deterministic hash-based dataset split (the md5
  value hash is the SQL-reproducible one used across this repo), so any
  worker on any cluster assigns the same document to the same split with
  no coordination and no shuffle;
* :func:`pack_sequences` — sample packing: order documents by a
  deterministic key, concatenate token counts, and cut fixed token-budget
  bins at stream offsets.  A document belongs to the bin where it STARTS
  (``bin = tokens_before // budget``) — the streaming concat-then-chunk
  layout trainers use.

Scale shape of the pack: one global sort on the key (the only exchange),
then a two-phase distributed prefix scan — per-block token sums cross the
driver as ONE int each (no rows), the tiny exclusive prefix is computed
driver-side, and each block labels its rows independently with its offset.
This is the canonical "Dataset API can't express a scan" case, so the
per-block pass uses raw block refs (documented partitioning assumption:
``to_arrow_refs`` yields blocks in sorted dataset order, which Ray Data
guarantees for a materialized sorted Dataset).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def split_column(
    ids: pa.ChunkedArray | pa.Array, val_permille: int = 100
) -> pa.Array:
    """'val' where md5-hash(id) mod 1000 < val_permille, else 'train'."""
    from encode_ingest_ray.stages.sketch import _hash64

    h = _hash64(ids) % np.uint64(1000)
    return pa.array(
        np.where(h < val_permille, "val", "train"), pa.string()
    )


def hash_split(ds, id_column: str, val_permille: int = 100):
    """Deterministic split assignment — pure map, no exchange."""

    def per_block(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: t.column(id_column),
                "split": split_column(t.column(id_column), val_permille),
            }
        )

    return ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


@ray.remote
def _block_token_sum(block: pa.Table, count_column: str) -> int:
    return int(pc.sum(block.column(count_column)).as_py() or 0)


@ray.remote
def _label_block(
    block: pa.Table, offset: int, budget: int, id_column: str, count_column: str
) -> pa.Table:
    n = block.column(count_column).to_numpy(zero_copy_only=False).astype(np.int64)
    before = offset + np.cumsum(n) - n  # tokens in the stream before each doc
    return pa.table(
        {
            id_column: block.column(id_column),
            count_column: pa.array(n, pa.int64()),
            "bin_id": pa.array(before // budget, pa.int64()),
        }
    )


def pack_sequences(
    ds,
    id_column: str,
    count_column: str,
    budget: int,
):
    """Global-order sequence packing: sort by ``id_column``, then the
    two-phase prefix scan described in the module docstring.  Input must
    already carry ``count_column`` (token counts)."""
    s = ds.sort(id_column).materialize()
    refs = s.to_arrow_refs()  # blocks in sorted order
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    count_column: pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                }
            )
        )
    sums = ray.get([_block_token_sum.remote(r, count_column) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums[:-1], dtype=np.int64)))
    out = [
        _label_block.remote(r, int(off), budget, id_column, count_column)
        for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out)


#: per-source keep rates (permille) for the mixture reweighting query —
#: upweight scarce languages relative to the en-heavy corpus
MIXTURE_WEIGHTS_PERMILLE = {"en": 300, "de": 1000, "es": 1000, "fr": 1000, "zh": 500}


def mixture_subsample(
    ds, id_column: str, source_column: str, weights_permille: dict[str, int]
):
    """Source-weighted deterministic subsampling (mixture reweighting):
    keep a row iff md5-hash(id) mod 1000 < weight_permille[source] — the
    standard way to hit target mixture proportions with no shuffle, no
    coordination, and replayable membership."""
    from encode_ingest_ray.stages.sketch import _hash64

    def per_block(t: pa.Table) -> pa.Table:
        h = _hash64(t.column(id_column)) % np.uint64(1000)
        src = t.column(source_column).to_numpy(zero_copy_only=False)
        limits = np.array(
            [weights_permille.get(s, 0) for s in src], np.uint64
        )
        return t.filter(pa.array(h < limits, pa.bool_()))

    return ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


@ray.remote
def _block_num_rows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _rank_block(block: pa.Table, offset: int) -> pa.Table:
    return block.append_column(
        "rank", pa.array(offset + np.arange(block.num_rows, dtype=np.int64))
    )


def global_rank(ds, key, descending=False):
    """Global 0-based rank under a total order — the same two-phase scan as
    :func:`pack_sequences` with row counts instead of token sums (per-block
    counts cross the driver as one int each; blocks never leave the object
    store)."""
    s = ds.sort(key, descending=descending).materialize()
    refs = s.to_arrow_refs()
    if not refs:
        return s
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts[:-1], dtype=np.int64)))
    out = [_rank_block.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
