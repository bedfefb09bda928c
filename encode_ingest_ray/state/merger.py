"""Partition-merger actor: the stateful stage of the engine.

Reference analog: the per-worker stateful singleton of
``ScalaAsyncLookupDoFn`` (/root/reference/extraction/src/main/scala/org/
broadinstitute/monster/encode/extraction/ExtractionPipelineBuilder.scala:31-42)
generalized to own upsert partitions — SURVEY.md §2.3 ST2.

Each actor owns a fixed subset of partitions.  Per partition it holds the
**monotonic LSN watermark** (the sequence-number dedup high-water mark) and
an epoch delta buffer; durable state lives in Parquet (base + deltas), so
actor RAM stays O(watermarks + one epoch delta) — at 10^10-event scale the
table itself can never be required to fit in actor memory.

Commit layout (write amplification matters at 10^10 events): each epoch
stages a *delta* file per dirty partition
(``part=PPPPP/delta-EEEEEE.parquet``: the LWW-collapsed epoch delta) and,
every ``compact_every`` deltas, a compacted *base* snapshot
(``base-EEEEEE.parquet``).  A partition's state = base merged with newer
deltas (merge-on-read via the LWW kernel).  All staged paths are
deterministic per (partition, epoch): a replayed crash re-stages identical
bytes, and writes go through temp + ``os.replace`` so a racing zombie writer
cannot leave a torn file.  Files are zstd-compressed — at lake scale you buy
scalable CPU and save non-scalable IO/network bytes.

Exactly-once under retries: a retried routing task re-pushes identical
sub-tables; LWW winner selection is idempotent under duplicates, cross-epoch
replays are cut by the committed watermark, in-epoch duplicate LSNs collapse
in the delta reduce.  (Reference analog: "will not re-ingest or re-delete
rows if the state already matches", ingest-processed-data.yaml:7-12.)
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from encode_ingest_ray.state.lww import lww_reduce
from encode_ingest_ray.schema import align_to_schema, unify_schemas

PARQUET_OPTS = dict(compression="zstd", compression_level=3, row_group_size=131_072)


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def _concat_unified(tables: list[pa.Table]) -> pa.Table:
    """Concat tables whose schemas may differ additively (schema evolution
    mid-stream): align every table to the unified column set."""
    if len(tables) == 1:
        return tables[0]
    schema = tables[0].schema
    for t in tables[1:]:
        schema = unify_schemas(schema, t.schema)
    return pa.concat_tables([align_to_schema(t, schema) for t in tables])


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, **PARQUET_OPTS)
    os.replace(tmp, path)


def load_partition_state(ptr: dict) -> pa.Table | None:
    """Reconstruct a partition's durable state from its manifest pointer:
    base snapshot merged with subsequent deltas in epoch order (merge-on-read)."""
    tables = []
    if ptr.get("base"):
        tables.append(pq.read_table(ptr["base"]))
    for d in ptr.get("deltas", []):
        tables.append(pq.read_table(d))
    if not tables:
        return None
    if len(tables) == 1:
        return tables[0]
    return lww_reduce(_concat_unified(tables))


@ray.remote(max_restarts=0)
class PartitionMerger:
    """One merger owns a fixed set of partitions: their LSN watermarks, the
    current epoch's delta buffers, and the staging of delta/base files."""

    def __init__(self, out_dir: str, pointers: dict[int, dict], compact_every: int = 8):
        self.out_dir = out_dir
        self.pointers = pointers  # part -> committed pointer
        self.compact_every = compact_every
        self.watermark: dict[int, int] = {
            p: ptr["lsn_hi"] for p, ptr in pointers.items()
        }
        # buffers are keyed by (epoch, part): the driver overlaps epoch e's
        # flush with epoch e+1's exchange, so pushes for two epochs can be
        # in flight at once.  Actor task ordering guarantees flush(e) runs
        # before flush(e+1), so watermark updates stay epoch-ordered.
        self.buffers: dict[tuple[int, int], list[pa.Table]] = {}
        self.events_in: dict[tuple[int, int], int] = {}

    def apply_block(
        self, epoch: int, parts: list[int], lens: list[int], table: pa.Table
    ) -> int:
        """Buffer one routed block: ``table`` is ordered so that the rows of
        ``parts[i]`` occupy the next ``lens[i]`` rows.  One actor call per
        (routing task, actor) — slicing here is zero-copy metadata work, no
        Arrow kernels (per-push compute on plasma-backed views costs ~10ms a
        call and would dominate the epoch at call volume)."""
        off = 0
        for part, n in zip(parts, lens):
            if n:
                key = (epoch, part)
                self.buffers.setdefault(key, []).append(table.slice(off, n))
                self.events_in[key] = self.events_in.get(key, 0) + n
            off += n
        return table.num_rows

    def flush(self, epoch: int) -> dict[int, dict]:
        """Per dirty partition: wm-filter + LWW-collapse the buffered delta,
        stage it as this epoch's delta file; every ``compact_every`` epochs
        fold base+deltas into a new base (amortized O(state))."""
        out: dict[int, dict] = {}
        mine = sorted(k for k in self.buffers if k[0] == epoch)
        for key in mine:
            part = key[1]
            t0 = time.perf_counter()
            raw = _concat_unified(self.buffers.pop(key))
            wm = self.watermark.get(part, -1)
            fresh = raw
            if wm >= 0 and raw.num_rows:
                fresh = raw.filter(pc.greater(raw.column("lsn"), pa.scalar(wm)))
            metrics = {
                "events_in": self.events_in.pop(key, raw.num_rows),
                "dup_lsn_dropped": raw.num_rows - fresh.num_rows,
                "applied": fresh.num_rows,
            }
            if fresh.num_rows == 0:
                continue
            delta = lww_reduce(fresh)
            wm = max(wm, pc.max(delta.column("lsn")).as_py())
            self.watermark[part] = wm

            prev = self.pointers.get(part, {})
            deltas = list(prev.get("deltas", []))
            base = prev.get("base")
            rows_state = None
            rows_live = None
            if len(deltas) + 1 >= self.compact_every:
                # amortized compaction: fold base+deltas+this delta into a base
                state = load_partition_state({"base": base, "deltas": deltas})
                state = (
                    delta
                    if state is None
                    else lww_reduce(_concat_unified([state, delta]))
                )
                base = os.path.join(
                    _part_dir(self.out_dir, part), f"base-{epoch:06d}.parquet"
                )
                _atomic_write(state, base)
                deltas = []
                rows_state = state.num_rows
                rows_live = int(
                    pc.sum(
                        pc.not_equal(state.column("op"), pa.scalar("delete"))
                    ).as_py()
                    or 0
                )
            else:
                dpath = os.path.join(
                    _part_dir(self.out_dir, part), f"delta-{epoch:06d}.parquet"
                )
                _atomic_write(delta, dpath)
                deltas.append(dpath)

            metrics["rows_delta"] = delta.num_rows
            metrics["merge_flush_s"] = round(time.perf_counter() - t0, 4)
            ptr = {
                "base": base,
                "deltas": deltas,
                "epoch": epoch,
                "rows_delta": delta.num_rows,
                "rows_state": rows_state,
                "rows_live": rows_live,
                "lsn_hi": wm,
                "metrics": metrics,
            }
            out[part] = ptr
            self.pointers[part] = {k: v for k, v in ptr.items() if k != "metrics"}
        return out

    def ping(self) -> bool:
        return True
