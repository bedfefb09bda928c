"""Seeded, fully deterministic synthetic transcript-CDC generator.

Produces the input the north rule specifies (BASELINE.json ``input_hint``):
Parquet change-events over a conversation-transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` wrapped in ``(op, lsn)``.

Knobs (FIXTURES.md §2): zipf-skewed turns-per-conversation (hot conversations
exercise the salted partitioner), update/delete ratios, duplicated-LSN
replays (exactly-once dedup), bounded out-of-order timestamps, and an
optional additive ``model`` column appearing from a given LSN onward
(schema evolution).

Generation is vectorized numpy/pyarrow; events land in one Parquet file per
epoch (``events-epoch=NNNNNN.parquet``), shuffled within the epoch to model
unordered delivery, so the engine can prune at the read by epoch file.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["", "search", "python", "browser"])


def _int_str(prefix: str, values: np.ndarray) -> pa.Array:
    """Vectorized '<prefix><int>' string column."""
    s = pc.cast(pa.array(values), pa.string())
    return pc.binary_join_element_wise(pa.array([prefix] * len(values)), s, "")


def generate_cdc_events(
    out_dir: str,
    *,
    n_events: int = 100_000,
    n_convs: int = 1_000,
    epochs: int = 4,
    seed: int = 42,
    zipf_a: float = 1.4,
    max_turns_hot: int = 4096,
    update_ratio: float = 0.25,
    delete_ratio: float = 0.05,
    dup_ratio: float = 0.05,
    ooo_window_us: int = 60_000_000,
    evolve_at_lsn: int | None = None,
    text_bytes: int = 400,
    rows_per_file: int = 131_072,
    shards_per_epoch: int | None = None,
    key_shards: int | None = None,
    turn_block: int | None = None,
    lsn_offset: int = 0,
    conv_offset: int = 0,
    epoch_offset: int = 0,
) -> dict:
    """Write ``epochs`` Parquet event files under ``out_dir``; return metadata.

    LSNs 0..n_events-1 are unique; an extra ``dup_ratio`` fraction of events
    is re-emitted verbatim (same LSN, same payload) to model at-least-once
    delivery. Epoch *e* holds (original) LSNs in ``[e*B, (e+1)*B)`` plus any
    replayed duplicates of earlier LSNs.

    ``lsn_offset`` / ``conv_offset`` / ``epoch_offset`` make the call a
    SEGMENT of a larger corpus: LSNs become ``[lsn_offset, lsn_offset +
    n_events)``, conversation ids ``c{conv_offset}..c{conv_offset +
    n_convs - 1}`` and epoch files ``events-epoch-{epoch_offset + e}``.
    Generating K segments with disjoint LSN ranges, dense consecutive
    epoch ranges and (optionally overlapping) conv ranges composes one
    corpus too large to draw in a single process — the 10^9-event soak
    (tools/soak.py --events 1e9) builds its input this way, with each
    segment drawn by an independent subprocess.  Timestamps derive from
    the absolute LSN, so cross-segment event time stays monotonic (plus
    the out-of-order jitter) and ``evolve_at_lsn`` is an absolute bound.

    ``key_shards=K`` makes the source KEY-PARTITIONED, the shape a real
    binlog/Kafka source has: epoch file ``-SSSS`` holds exactly the events
    whose salted key ``mix(conv_id, turn_idx // turn_block)`` lands in source
    shard SSSS (all K files are written, empty ones included).  Disjoint
    engine shards can then each tail ``SSSS % shard_count == shard_index``
    with zero overlap and no wasted decode.  The salt spreads a zipf-hot
    conversation (which alone carries ~30% of events at the default
    ``zipf_a``) over many source shards — bare conv_id sharding would pin it
    to one "node" and cap cluster scaling at ~2x.  Mutually exclusive with
    ``shards_per_epoch`` (which splits positionally).
    """
    if key_shards is not None and shards_per_epoch is not None:
        raise ValueError("key_shards and shards_per_epoch are mutually exclusive")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- conversation popularity: zipf ranks → conv ids; hot convs get many turns
    ranks = rng.zipf(zipf_a, size=n_events).astype(np.int64)
    conv_nums = (ranks - 1) % n_convs
    # turns-per-conv grows with popularity: hot convs (low conv_num) are long
    max_turn_per_conv = np.minimum(
        max_turns_hot, (max_turns_hot // (1 + np.arange(n_convs))) + 8
    )
    turn_idx = (
        rng.integers(0, 1 << 30, size=n_events) % max_turn_per_conv[conv_nums]
    ).astype(np.int32)

    lsn = np.arange(n_events, dtype=np.int64) + np.int64(lsn_offset)
    op_draw = rng.random(n_events)
    op = np.full(n_events, "insert", dtype=object)
    op[op_draw < update_ratio + delete_ratio] = "update"
    op[op_draw < delete_ratio] = "delete"

    t0 = np.int64(1_700_000_000_000_000)  # fixed base, microseconds
    step = np.int64(1_000_000)
    jitter = rng.integers(-ooo_window_us, ooo_window_us, size=n_events)
    ts_us = t0 + lsn * step + jitter

    role = ROLES[turn_idx % 3]
    tool_codes = rng.integers(0, 4, size=n_events)
    tool = TOOLS[tool_codes].astype(object)
    tool[tool_codes == 0] = None

    # realistic transcript-sized payload (~text_bytes); unique per (key, lsn)
    # so the per-turn text-equality invariant detects any mis-merge
    filler = (
        " lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
        " tempor incididunt ut labore et dolore magna aliqua ut enim ad minim"
    )
    filler = (filler * (text_bytes // len(filler) + 1))[:text_bytes]

    def make_table(idx: np.ndarray) -> pa.Table:
        """Materialize event rows for global indices ``idx`` — a pure function
        of the pre-drawn numpy columns, so a replayed index reproduces its row
        verbatim.  Building per-epoch keeps every string column far below the
        2 GiB int32-offset limit of ``pa.string()``."""
        o = op[idx]
        text = pc.binary_join_element_wise(
            _int_str("conv ", conv_nums[idx] + conv_offset),
            _int_str(" turn ", turn_idx[idx]),
            _int_str(" rev ", lsn[idx]),
            pa.array(np.where(o == "delete", " (tombstone)", filler), type=pa.string()),
            "",
        )
        cols: dict[str, pa.Array] = {
            "conv_id": _int_str("c", conv_nums[idx] + conv_offset),
            "turn_idx": pa.array(turn_idx[idx], type=pa.int32()),
            "role": pa.array(role[idx], type=pa.string()),
            "text": text,
            "tool": pa.array(tool[idx], type=pa.string()),
            "ts": pa.array(ts_us[idx], type=pa.timestamp("us")),
            "op": pa.array(o, type=pa.string()),
            "lsn": pa.array(lsn[idx], type=pa.int64()),
        }
        if evolve_at_lsn is not None:
            cols["model"] = pc.if_else(
                pa.array(lsn[idx] >= evolve_at_lsn),
                _int_str("model-v", (lsn[idx] % 3)),
                pa.nulls(len(idx), pa.string()),
            )
        return pa.table(cols)

    # --- key-sharded source: salted shard id per event, same mix as the
    # engine partitioner (state/partition.py mix_partition)
    shard_of = None
    if key_shards is not None:
        import zlib

        from encode_ingest_ray.state.partition import (
            DEFAULT_TURN_BLOCK,
            mix_partition,
        )

        tb = turn_block or DEFAULT_TURN_BLOCK
        conv_hash_by_num = np.fromiter(
            (zlib.crc32(f"c{i + conv_offset}".encode()) for i in range(n_convs)),
            dtype=np.uint64,
            count=n_convs,
        )
        # seed=1: the SOURCE sharding must be independent of the engine's
        # partition mix (seed=0) — a correlated mix collapses each tailer's
        # keys onto num_partitions/shard_count engine partitions
        shard_of = mix_partition(
            conv_hash_by_num[conv_nums], turn_idx, key_shards, tb, seed=1
        )

    # --- duplicated-LSN replays: verbatim re-emissions of random earlier rows
    n_dup = int(n_events * dup_ratio)
    dup_idx = rng.integers(0, n_events, size=n_dup) if n_dup else np.empty(0, np.int64)

    epoch_size = (n_events + epochs - 1) // epochs
    files = []
    dup_epoch = (dup_idx // epoch_size) if n_dup else np.empty(0, np.int64)
    schema_names = None
    for e in range(epochs):
        idx = np.arange(e * epoch_size, min((e + 1) * epoch_size, n_events), dtype=np.int64)
        if n_dup:
            # replays of this epoch's rows, delivered in this epoch or later
            replay_here = dup_idx[dup_epoch <= e]
            replay_here = replay_here[
                (replay_here // epoch_size == e)
                | ((rng.random(len(replay_here)) < 0.5) & (replay_here // epoch_size < e))
            ]
            if len(replay_here):
                idx = np.concatenate([idx, replay_here])
        # unordered delivery inside the epoch
        idx = idx[rng.permutation(len(idx))]
        # one epoch = a directory-of-files shard set (the shape a real log
        # tail delivers): many moderate files give the reader natural block
        # parallelism and let Ray fuse read->route into one task, so no row
        # transits the object store twice.  No '=' in names: hive-partition
        # inference (DuckDB, Arrow datasets) would invent phantom columns.
        # shards_per_epoch overrides rows_per_file: an even shard count
        # (a multiple of the worker count) removes the ragged last routing
        # wave at full cluster width
        if shard_of is not None:
            # key-partitioned: file SSSS = the epoch's events in source shard
            # SSSS; ALL key_shards files exist (0-row included) so a shard
            # tailer always sees its file and empty shard-epochs still commit
            ep_shards = shard_of[idx]
            for shard_no in range(key_shards):
                part = make_table(idx[ep_shards == shard_no])
                schema_names = [f.name for f in part.schema]
                path = os.path.join(
                    out_dir, f"events-epoch-{e + epoch_offset:06d}-{shard_no:04d}.parquet"
                )
                pq.write_table(part, path, row_group_size=131_072,
                               compression="zstd", compression_level=3)
                files.append(path)
        else:
            rpf = rows_per_file if shards_per_epoch is None else -(-len(idx) // shards_per_epoch)
            for shard_no, lo in enumerate(range(0, len(idx), rpf)):
                part = make_table(idx[lo : lo + rpf])
                schema_names = [f.name for f in part.schema]
                path = os.path.join(
                    out_dir, f"events-epoch-{e + epoch_offset:06d}-{shard_no:04d}.parquet"
                )
                pq.write_table(part, path, row_group_size=131_072, compression="zstd", compression_level=3)
                files.append(path)
        # completeness marker (tail protocol): shards first, marker last
        with open(os.path.join(out_dir, f"events-epoch-{e + epoch_offset:06d}.done"), "w") as fdone:
            fdone.write("")

    return {
        "files": files,
        "n_events": n_events,
        "n_convs": n_convs,
        "epochs": epochs,
        "epoch_size": epoch_size,
        "seed": seed,
        "evolve_at_lsn": evolve_at_lsn,
        "schema": schema_names,
        "key_shards": key_shards,
        "lsn_offset": lsn_offset,
        "conv_offset": conv_offset,
        "epoch_offset": epoch_offset,
    }
