"""Partition-merger actor: the only mutable state in the engine.

Reference analog: the per-worker stateful singleton of
``ScalaAsyncLookupDoFn`` (/root/reference/extraction/src/main/scala/org/
broadinstitute/monster/encode/extraction/ExtractionPipelineBuilder.scala:31-42)
generalized to hold upsert state — SURVEY.md §2.3 ST2.

Each actor owns a fixed subset of partitions.  Per partition it holds:

* ``state``   — Arrow winners table (one row per (conv_id, turn_idx) incl.
  tombstones) — the per-key ``(ts, lsn)`` entries double as the sequence-
  number dedup table;
* ``watermark`` — the max LSN applied (monotonic); events at or below it are
  replays and are dropped before any mutation (exactly-once under retry);
* ``applied`` — the set of (epoch) ids already applied this flush-cycle, so a
  retried routing task is a no-op.

Durability: actors are caches.  The only durable state is the committed
snapshot Parquet referenced by the manifest; a (re)spawned actor lazily
reloads each partition from its manifest pointer.  Staged snapshot writes go
through temp-file + ``os.replace`` so a racing zombie writer can never leave
a torn file.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from encode_ingest_ray.state.lww import merge_state


def _snapshot_path(out_dir: str, part: int, epoch: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}", f"epoch={epoch:06d}.parquet")


@ray.remote(max_restarts=0)
class PartitionMerger:
    """One merger owns ``parts``; state survives across epochs in RAM and is
    checkpointed to Parquet at every epoch flush."""

    def __init__(self, out_dir: str, pointers: dict[int, dict]):
        self.out_dir = out_dir
        self.pointers = pointers  # part -> committed pointer (for lazy reload)
        self.state: dict[int, pa.Table | None] = {}
        self.watermark: dict[int, int] = {
            p: ptr["lsn_hi"] for p, ptr in pointers.items()
        }
        self.applied: set[tuple[int, int]] = set()
        self.dirty: set[int] = set()

    def _load(self, part: int) -> pa.Table | None:
        if part not in self.state:
            ptr = self.pointers.get(part)
            self.state[part] = pq.read_table(ptr["path"]) if ptr else None
        return self.state[part]

    def apply(self, epoch: int, part: int, events: pa.Table) -> dict:
        """Merge one partition's epoch slice; idempotent per (epoch, part)."""
        t0 = time.perf_counter()
        if (epoch, part) in self.applied:
            return {"part": part, "events_in": events.num_rows, "replayed_call": 1,
                    "dup_lsn_dropped": 0, "applied": 0, "apply_s": 0.0}
        if "part" in events.column_names:
            events = events.drop_columns(["part"])

        wm = self.watermark.get(part, -1)
        n_in = events.num_rows
        fresh = events.filter(pc.greater(events.column("lsn"), pa.scalar(wm)))
        dup_cross = n_in - fresh.num_rows
        # in-epoch replays: same LSN delivered twice inside this epoch
        dup_in = fresh.num_rows - pc.count_distinct(fresh.column("lsn")).as_py() if fresh.num_rows else 0

        state = self._load(part)
        if fresh.num_rows:
            self.state[part] = merge_state(state, fresh)
            self.watermark[part] = max(wm, pc.max(fresh.column("lsn")).as_py())
            self.dirty.add(part)
        self.applied.add((epoch, part))
        return {
            "part": part,
            "events_in": n_in,
            "replayed_call": 0,
            "dup_lsn_dropped": dup_cross + dup_in,
            "applied": fresh.num_rows,
            "apply_s": time.perf_counter() - t0,
        }

    def flush(self, epoch: int) -> dict[int, dict]:
        """Stage snapshots for dirty partitions; return their new pointers."""
        out: dict[int, dict] = {}
        for part in sorted(self.dirty):
            state = self.state[part]
            path = _snapshot_path(self.out_dir, part, epoch)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(state, tmp)
            os.replace(tmp, path)
            live = pc.sum(
                pc.not_equal(state.column("op"), pa.scalar("delete"))
            ).as_py() or 0
            ptr = {
                "path": path,
                "epoch": epoch,
                "rows_state": state.num_rows,
                "rows_live": int(live),
                "lsn_hi": self.watermark[part],
            }
            out[part] = ptr
            self.pointers[part] = ptr
        self.dirty.clear()
        self.applied.clear()
        return out

    def ping(self) -> bool:
        return True
