"""Deterministic salted hash partitioner.

The reference acknowledges skew but does not handle it ("If the number of
entities in a type grows significantly ... the pipeline might crash",
/root/reference/ARCHITECTURE.md:27-33).  Here skew handling is built into the
partition function itself: the partition of an event is

    part = mix(crc32(conv_id), turn_idx // turn_block) % num_partitions

i.e. a *salted sub-key* — every conversation's turns are spread over up to
``ceil(max_turn / turn_block)`` partitions, so one hot conversation cannot pin
a single partition/actor.  Crucially the salt is a pure function of the key
``(conv_id, turn_idx)``: the same key always routes to the same partition
across epochs, restarts, and cluster sizes, which is what keeps per-key LWW
state consistent without any runtime hot-key detection.  Per-conversation
ordering is recovered by the final per-conv_id sort by turn_idx at read time
(SURVEY.md §2.6 — the reference likewise recovers determinism by sorting,
ExperimentActivityTransformations.scala:51-53).

crc32 (zlib) is stable across processes, Python versions and platforms —
unlike ``hash()`` — so partition assignment is durable.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

#: 2^32 * golden ratio — Fibonacci-hash mixing constant (public domain folklore)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

DEFAULT_TURN_BLOCK = 64


def conv_hashes(conv_ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 crc32 hash per row, computed once per *unique* conv_id.

    Dictionary-encodes the column so the Python crc32 loop touches only the
    (small) set of distinct conversations in the batch, then broadcasts via
    the code indices — vectorized for the per-row part.
    """
    if isinstance(conv_ids, pa.ChunkedArray):
        conv_ids = conv_ids.combine_chunks()
    dict_arr = conv_ids.dictionary_encode()
    uniques = dict_arr.dictionary.to_pylist()
    uhash = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) for u in uniques),
        dtype=np.uint64,
        count=len(uniques),
    )
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    return uhash[codes]


def mix_partition(
    conv_hash: np.ndarray,
    turns: np.ndarray,
    num_partitions: int,
    turn_block: int = DEFAULT_TURN_BLOCK,
    seed: int = 0,
) -> np.ndarray:
    """The salted mix on raw numpy inputs: uint64 conv hashes + turn indices
    → int32 partition ids.  Shared by the engine partitioner and the
    key-sharded generator/source splitter so 'which shard owns key K' is ONE
    function everywhere.

    ``seed`` decorrelates INDEPENDENT partitionings of the same keys: the
    source key-sharding (generator) uses seed=1 while the engine partitioner
    keeps seed=0 — with one mix, a tailer owning source shards ``s ≡ k (mod
    K)`` would see its keys collapse onto ``num_partitions / K`` engine
    partitions (measured: 4 of 16 touched), strangling flush parallelism."""
    salt = turns.astype(np.uint64) // np.uint64(turn_block)
    h = conv_hash
    if seed:
        h = (h ^ (np.uint64(seed) * np.uint64(0xC2B2AE3D27D4EB4F))) * _GOLDEN
        h ^= h >> np.uint64(31)
    mixed = (h + np.uint64(1) + salt) * _GOLDEN
    mixed ^= mixed >> np.uint64(29)
    return (mixed % np.uint64(num_partitions)).astype(np.int32)


def partition_ids(
    conv_ids: pa.ChunkedArray | pa.Array,
    turn_idx: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    turn_block: int = DEFAULT_TURN_BLOCK,
) -> np.ndarray:
    """Vectorized partition id per row (int32)."""
    h = conv_hashes(conv_ids)
    if isinstance(turn_idx, pa.ChunkedArray):
        turn_idx = turn_idx.combine_chunks()
    turns = turn_idx.to_numpy(zero_copy_only=False)
    return mix_partition(h, turns, num_partitions, turn_block)


def assign_partition_column(
    batch: pa.Table, num_partitions: int, turn_block: int = DEFAULT_TURN_BLOCK
) -> pa.Table:
    """``map_batches`` body: append a ``part`` int32 column."""
    ids = partition_ids(
        batch.column("conv_id"), batch.column("turn_idx"), num_partitions, turn_block
    )
    return batch.append_column("part", pa.array(ids, type=pa.int32()))
