"""Bloom-filtered semi-join — the beyond-broadcast-RAM semi-join path.

``join_semi`` (stages/joins.py J12) broadcasts the small side's EXACT key
set; at 10^9+ keys that broadcast outgrows worker heaps.  The classic
remedy: build a Bloom filter of the keys (100x smaller at 1% FP), broadcast
THAT, and prune the big side at the scan — then erase the false positives
with an exact co-hashed verify over only the survivors.  The expensive
exchange sees (true matches + FP-rate × non-matches) instead of the whole
big side.

Build is distributed: every block of the keys side builds a partial filter
with identical (n_bits, k) parameters, and the driver ORs the ~num_blocks
bit arrays (a Bloom filter's bits are a pure union — merge is associative).
Nothing but the kilobyte-scale bit arrays and the pruned candidates ever
move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
from encode_ingest_ray.state.bloom import BloomFilter


def build_bloom(keys_ds, key_col: str, capacity: int, fp_rate: float = 0.01):
    """Distributed Bloom build: per-block partial filters (same geometry),
    bit-array union on the driver.  Returns the merged BloomFilter."""
    proto = BloomFilter(capacity, fp_rate)
    n_bits, k = proto.n_bits, proto.k

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter.__new__(BloomFilter)
        bf.n_bits, bf.k = n_bits, k
        bf.bits = np.zeros((n_bits + 63) // 64, np.uint64)
        col = t.column(key_col).combine_chunks()
        bf.add_many(col.unique().to_pylist())
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    merged = np.zeros((n_bits + 63) // 64, np.uint64)
    for row in keys_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all():  # one ~n_bits/8-byte row per block
        merged |= np.frombuffer(row["bits"], np.uint64)
    out = BloomFilter.__new__(BloomFilter)
    out.n_bits, out.k, out.bits = n_bits, k, merged
    return out


def bloom_semi_join(
    big,
    big_key: str,
    keys_ds,
    key_col: str,
    capacity: int,
    fp_rate: float = 0.01,
    num_buckets: int | None = None,
):
    """Exact semi-join of ``big`` against the key set of ``keys_ds``:
    Bloom-prune at the scan (no false negatives — no lost rows), then one
    co-hashed exchange of ONLY the surviving candidates + the key set to
    erase false positives.  Result rows carry ``big``'s columns."""
    import ray

    bloom_state = ray.put(build_bloom(keys_ds, key_col, capacity, fp_rate).state())

    def prune(t: pa.Table) -> pa.Table:
        bf = BloomFilter.from_state(ray.get(bloom_state))
        col = t.column(big_key).combine_chunks()
        d = col.dictionary_encode()
        hit_uniq = bf.contains_many(d.dictionary.to_pylist())
        codes = d.indices.to_numpy(zero_copy_only=False)
        return t.filter(pa.array(hit_uniq[codes]))

    candidates = big.map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    sch = big.schema()
    payload_types = {
        n: t for n, t in zip(sch.names, sch.types) if n != big_key
    }
    payload_cols = list(payload_types)

    def tag_cand(t: pa.Table) -> pa.Table:
        t = t.select([big_key] + payload_cols)  # align order with tag_keys
        return t.append_column(
            "__is_key", pa.array(np.zeros(t.num_rows, np.int8))
        )

    def tag_keys(t: pa.Table) -> pa.Table:
        cols = {big_key: t.column(key_col).combine_chunks().unique()}
        n = len(cols[big_key])
        for c in payload_cols:
            cols[c] = pa.nulls(n, payload_types[c])
        cols["__is_key"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    unioned = candidates.map_batches(
        tag_cand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        keys_ds.map_batches(
            tag_keys, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )

    def verify(t: pa.Table) -> pa.Table:
        is_key = t.column("__is_key").to_numpy(zero_copy_only=False) == 1
        keys = t.column(big_key).to_numpy(zero_copy_only=False)
        real = np.unique(keys[is_key])
        keep = ~is_key & np.isin(keys, real)
        return t.filter(pa.array(keep)).drop_columns(["__is_key"])

    return bucketed_groupby_apply(unioned, [big_key], verify, num_buckets)
