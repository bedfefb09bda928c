"""CdcEngine — the epoch loop: tail → partition exchange → actor merge →
two-phase commit.

Ray-Data-first layout (SURVEY.md §7.4): per epoch there is exactly ONE wide
operation — the hash exchange ``groupby("part")`` that co-locates each salted
partition's events — feeding the stateful actor pool.  Everything upstream is
streaming ``map_batches`` over zero-copy Arrow blocks.

Reference analogs, per stage:
* epoch discovery / skip-if-committed — the idempotent weekly sync
  (/root/reference/orchestration/templates/ingest-processed-data.yaml:7-12)
  and ``concurrencyPolicy: Forbid`` cron (cron-workflow.yaml:7-9);
* diff→soft-delete→append — the LWW merge inside ``PartitionMerger``;
* staged GCS prefix + BQ commit — staged snapshots + atomic manifest
  (state/manifest.py).

Failure model: the epoch is the atomic unit.  Actor or task loss inside an
epoch fails the epoch; the driver respawns the pool (actors reload committed
state) and replays it.  LSN watermarks + deterministic staged paths make the
replay exactly-once.
"""

from __future__ import annotations

import glob
import os
import re
import time
from functools import partial

import pyarrow as pa
import ray
import ray.data

from encode_ingest_ray.state.manifest import Manifest
from encode_ingest_ray.state.merger import PartitionMerger
from encode_ingest_ray.state.partition import DEFAULT_TURN_BLOCK, assign_partition_column


def discover_epoch_files(events_dir: str) -> list[list[str]]:
    """events-epoch-NNNNNN.parquet files grouped by epoch id, ascending."""
    out: dict[int, list[str]] = {}
    for path in glob.glob(os.path.join(events_dir, "events-epoch-*.parquet")):
        m = re.search(r"events-epoch-(\d+)\.parquet$", path)
        if m:
            out.setdefault(int(m.group(1)), []).append(path)
    return [sorted(out[e]) for e in sorted(out)]


def _route_group(group: pa.Table, *, actors, num_actors: int, epoch: int) -> pa.Table:
    """map_groups body: ship one partition's epoch slice to its owning actor.

    Runs as a Ray Data task after the exchange; the (epoch, part) idempotency
    set inside the actor makes task retries no-ops.
    """
    part = group.column("part")[0].as_py()
    handle = actors[part % num_actors]
    m = ray.get(handle.apply.remote(epoch, part, group))
    return pa.table({k: [v] for k, v in m.items()})


class CdcEngine:
    def __init__(
        self,
        out_dir: str,
        *,
        num_partitions: int = 64,
        num_actors: int = 8,
        turn_block: int = DEFAULT_TURN_BLOCK,
        actor_num_cpus: float = 0.5,
    ):
        # NOTE actors reserve actor_num_cpus each; keep num_actors * actor_num_cpus
        # well below the cluster CPU count or the Dataset tasks that feed the
        # actors cannot schedule (resource deadlock).
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.num_actors = num_actors
        self.turn_block = turn_block
        self.actor_num_cpus = actor_num_cpus
        os.makedirs(out_dir, exist_ok=True)
        self.manifest = Manifest(out_dir)
        self._actors: list | None = None

    # -- actor pool ------------------------------------------------------
    def _spawn_actors(self) -> list:
        pointers = {int(p): ptr for p, ptr in self.manifest.pointers().items()}
        actors = []
        for i in range(self.num_actors):
            mine = {p: ptr for p, ptr in pointers.items() if p % self.num_actors == i}
            actors.append(
                PartitionMerger.options(num_cpus=self.actor_num_cpus).remote(
                    self.out_dir, mine
                )
            )
        ray.get([a.ping.remote() for a in actors])
        return actors

    def _kill_actors(self) -> None:
        for a in self._actors or []:
            ray.kill(a)
        self._actors = None

    # -- public API ------------------------------------------------------
    def run(
        self,
        events_dir: str | None = None,
        epoch_files: list[list[str]] | None = None,
        retries_per_epoch: int = 1,
        keep_actors: bool = False,
    ) -> dict:
        """Apply all not-yet-committed epochs; resume-safe. Returns summary.

        The actor pool is torn down on exit unless ``keep_actors`` — actors
        are caches over committed Parquet, and leaked pools would pin CPU
        reservations that starve subsequent Dataset stages.
        """
        if epoch_files is None:
            assert events_dir is not None
            epoch_files = discover_epoch_files(events_dir)
        committed = set(self.manifest.committed_epochs())
        summary = {"epochs_run": 0, "epochs_skipped": 0, "events_applied": 0,
                   "dup_lsn_dropped": 0, "wall_s": 0.0}
        t0 = time.perf_counter()
        try:
            for epoch, files in enumerate(epoch_files):
                if epoch in committed:
                    summary["epochs_skipped"] += 1
                    continue
                attempt = 0
                while True:
                    try:
                        if self._actors is None:
                            self._actors = self._spawn_actors()
                        m = self._run_epoch(epoch, files)
                        break
                    except ray.exceptions.RayError:
                        self._kill_actors()
                        attempt += 1
                        if attempt > retries_per_epoch:
                            raise
                summary["epochs_run"] += 1
                summary["events_applied"] += m["applied"]
                summary["dup_lsn_dropped"] += m["dup_lsn_dropped"]
        finally:
            if not keep_actors:
                self._kill_actors()
        summary["wall_s"] = time.perf_counter() - t0
        return summary

    def _run_epoch(self, epoch: int, files: list[str]) -> dict:
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(files)
        ds = ds.map_batches(
            partial(
                assign_partition_column,
                num_partitions=self.num_partitions,
                turn_block=self.turn_block,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        metrics_rows = (
            ds.groupby("part")
            .map_groups(
                partial(
                    _route_group,
                    actors=self._actors,
                    num_actors=self.num_actors,
                    epoch=epoch,
                ),
                batch_format="pyarrow",
            )
            .take_all()
        )
        apply_s = time.perf_counter() - t0

        t1 = time.perf_counter()
        staged_maps = ray.get([a.flush.remote(epoch) for a in self._actors])
        pointers = self.manifest.pointers()
        per_part_metrics = {}
        totals = {"events_in": 0, "dup_lsn_dropped": 0, "applied": 0}
        for row in metrics_rows:
            p = row["part"]
            per_part_metrics[str(p)] = {
                k: row[k] for k in ("events_in", "dup_lsn_dropped", "applied", "apply_s")
            }
            for k in totals:
                totals[k] += row[k]
        for staged in staged_maps:
            for p, ptr in staged.items():
                pointers[str(p)] = ptr
        commit_s = time.perf_counter() - t1
        metrics = {
            **totals,
            "partitions_touched": len(per_part_metrics),
            "exchange_apply_s": apply_s,
            "commit_latency_s": commit_s,
            "per_partition": per_part_metrics,
        }
        self.manifest.commit(epoch, pointers, metrics)
        return metrics

    # -- read side -------------------------------------------------------
    def snapshot_files(self) -> list[str]:
        return sorted(ptr["path"] for ptr in self.manifest.pointers().values())

    def final_dataset(self) -> "ray.data.Dataset":
        """Streaming live view of the committed table (unordered; apply
        ``sort(['conv_id','turn_idx'])`` when a total order is needed).

        Snapshot files written before/after an additive schema evolution can
        differ; every batch is aligned to the unified schema (null-filling
        old rows) before the live projection.
        """
        import pyarrow.parquet as pq

        from encode_ingest_ray.schema import align_to_schema, unify_schemas
        from encode_ingest_ray.state.lww import live_view

        files = self.snapshot_files()
        if not files:
            return ray.data.from_items([])
        unified = None
        for f in files:  # footer reads only — cheap, driver-side
            s = pq.read_schema(f)
            unified = s if unified is None else unify_schemas(unified, s)
        ds = ray.data.read_parquet(files, schema=unified)
        return ds.map_batches(
            lambda t: live_view(align_to_schema(t, unified)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def final_table(self) -> pa.Table:
        """Small-scale convenience: fully ordered live table (per-conv_id sort
        by turn_idx — the north-rule output invariant)."""
        import pyarrow.compute as pc

        tables = [t for t in ray.get(self.final_dataset().to_arrow_refs()) if t.num_rows]
        if not tables:
            return pa.table({})
        t = pa.concat_tables(tables).combine_chunks()
        idx = pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        return t.take(idx)
