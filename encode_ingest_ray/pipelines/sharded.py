"""Sharded deployment: K independent engine processes = K "nodes".

The north rule's deployment unit is a multi-node Ray cluster where every
node brings its OWN object store, raylet and actor-IPC path.  Local mode
shares one of each across all cpus, and round-2 controls measured exactly
that path as the scaling ceiling (BASELINE.md: one 32-cpu cluster 2.1M
events/s; two independent 16-cpu clusters on the same silicon 2.9-3.4M).
This module productizes the control: the one logical table is served by
``shard_count`` engine processes, each a separate OS process with its own
``ray.init`` (own plasma store — the per-node resource), each owning a
DISJOINT salted-key range of the source.

Layout and ownership:

* the source is key-partitioned by the generator (``key_shards=K_src``
  files per epoch, file SSSS = salted key range SSSS); engine shard k tails
  the files with ``SSSS % shard_count == shard_index``.  Ownership is by
  the SALTED key ``mix(conv_id, turn_idx // turn_block)`` — a zipf-hot
  conversation spreads over all shards instead of pinning one node;
* each shard commits to ``out_root/shard-KK-of-NN/`` — its own manifest,
  partition state, run lock and lineage.  Exactly-once, resume, schema
  evolution and metrics are all per-shard (per-node) properties, exactly as
  on a real cluster where each node owns its partition range's commits;
* every key lives in exactly one shard, so the logical table is the plain
  UNION of the shard tables (``sharded_final_dataset``), and the replayed
  per-key LWW state is identical to a single-engine run over the same
  events (tests/test_sharded.py asserts row-for-row equality).

Reference analog: the reference syncs its tables one-at-a-time under a
global lock (parallelism: 1, ingest-processed-data.yaml:18-19); here the
commit domain is per key-range shard, so "nodes" never contend.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

_SHARD_RE = re.compile(r"events-epoch-(\d+)-(\d+)\.parquet$")


def shard_epoch_files(
    events_dir: str, shard_index: int, shard_count: int
) -> list[list[str]]:
    """This shard's epoch file lists: source-shard SSSS % shard_count ==
    shard_index.  Epoch completeness markers are honored by the underlying
    discovery; an epoch where this shard owns only empty files still commits
    (the generator writes all key-shard files, 0-row included)."""
    from encode_ingest_ray.pipelines.cdc import discover_epoch_files

    epochs = discover_epoch_files(events_dir)
    if shard_count == 1:
        return epochs
    out = []
    for files in epochs:
        mine = []
        for f in files:
            m = _SHARD_RE.search(f)
            if m is None:
                raise ValueError(
                    f"sharded run needs key-sharded event files "
                    f"(events-epoch-NNNNNN-SSSS.parquet); got {f!r}"
                )
            if int(m.group(2)) % shard_count == shard_index:
                mine.append(f)
        out.append(mine)
    return out


def shard_dir(out_root: str, shard_index: int, shard_count: int) -> str:
    return os.path.join(out_root, f"shard-{shard_index:02d}-of-{shard_count:02d}")


def run_shard(
    events_dir: str,
    out_root: str,
    shard_index: int,
    shard_count: int,
    *,
    num_partitions: int | None = None,
    num_actors: int | None = None,
) -> dict:
    """Run ONE shard's engine in the CURRENT process/Ray session (the caller
    owns ``ray.init``).  Resume-safe per shard."""
    from encode_ingest_ray.pipelines.cdc import CdcEngine

    files = shard_epoch_files(events_dir, shard_index, shard_count)
    eng = CdcEngine(
        shard_dir(out_root, shard_index, shard_count),
        num_partitions=num_partitions,
        num_actors=num_actors,
    )
    summary = eng.run(epoch_files=files)
    summary["shard_index"] = shard_index
    summary["shard_count"] = shard_count
    return summary


def spawn_shards(
    events_dir: str,
    out_root: str,
    shard_count: int,
    *,
    cpus_per_shard: int = 4,
    num_partitions: int | None = None,
    object_store_gb: float | None = 4.0,
    env_extra: dict | None = None,
    pin_cores: bool = True,
    extra_args: list[str] | None = None,
) -> dict:
    """Launch ``shard_count`` INDEPENDENT engine processes (each its own Ray
    cluster — the multi-node analog) over disjoint key ranges of one table;
    wait; aggregate.  The parent holds no Ray session.

    ``pin_cores`` (default) binds shard k to physical cores
    ``[k*cpus_per_shard, (k+1)*cpus_per_shard)`` via CPU affinity.  This
    makes a "node" a REAL core budget: the engine's ``num_cpus=0`` merger
    actors and flush tasks otherwise burst past Ray's logical cpu limit
    into whatever cores are idle — which inflates a lone small cluster
    (free silicon) and contends when several run, distorting any N-vs-4N
    comparison in both directions.  A real node cannot borrow a neighbor's
    cores; neither should a simulated one.

    Aggregate throughput = total events / max(per-shard engine wall): the
    cluster is done when its slowest node is, but each node's wall excludes
    its process/Ray startup (same accounting as the single-cluster bench,
    which also times only the engine)."""
    n_host_cores = os.cpu_count() or 1
    procs = []
    for k in range(shard_count):
        cmd = [
            sys.executable, "-m", "encode_ingest_ray",
            "--num-cpus", str(cpus_per_shard),
            "run",
            "--events", events_dir,
            "--out", shard_dir(out_root, k, shard_count),
            "--shard-index", str(k),
            "--shard-count", str(shard_count),
            "--warmup",
        ]
        if num_partitions:
            cmd += ["--partitions", str(num_partitions)]
        if object_store_gb:
            cmd += ["--object-store-gb", str(object_store_gb)]
        if extra_args:
            cmd += list(extra_args)
        env = dict(os.environ)
        env.pop("RAY_ADDRESS", None)  # each child starts its own local cluster
        if env_extra:
            env.update(env_extra)
        preexec = None
        lo, hi = k * cpus_per_shard, (k + 1) * cpus_per_shard
        if pin_cores and hi <= n_host_cores and hasattr(os, "sched_setaffinity"):
            cores = set(range(lo, hi))
            preexec = lambda c=cores: os.sched_setaffinity(0, c)  # noqa: E731
        procs.append(
            subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
                preexec_fn=preexec,
            )
        )
    t0 = time.perf_counter()
    summaries, errs = [], []
    for k, p in enumerate(procs):
        out, err = p.communicate()
        if p.returncode != 0:
            errs.append(f"shard {k} rc={p.returncode}: {err[-2000:]}")
            continue
        summaries.append(json.loads(out.strip().splitlines()[-1]))
    wall_parent = time.perf_counter() - t0
    if errs:
        raise RuntimeError("; ".join(errs))
    events = sum(s["events_raw"] for s in summaries)
    max_wall = max(s["wall_s"] for s in summaries)
    return {
        "shard_count": shard_count,
        "cpus_per_shard": cpus_per_shard,
        "events_raw": events,
        "events_applied": sum(s["events_applied"] for s in summaries),
        "dup_lsn_dropped": sum(s["dup_lsn_dropped"] for s in summaries),
        "epochs_run": sum(s["epochs_run"] for s in summaries),
        "wall_s": max_wall,
        "wall_parent_s": wall_parent,
        "events_per_sec": events / max_wall if max_wall else 0.0,
        "per_shard_wall_s": [s["wall_s"] for s in summaries],
    }


def owner_filter(shard_index: int, shard_count: int, turn_block: int | None = None):
    """Key-ownership predicate of the sharded deployment, as a vectorized
    batch filter (for ``CdcEngine.replicate_from(key_filter=...)``).

    Ownership is the same salted mix the key-sharded SOURCE uses
    (state/partition.mix_partition, seed=1): a key belongs to shard
    ``mix(conv_id, turn_idx // turn_block) % shard_count``.  This agrees
    with the file-tailing rule (shard k tails source files SSSS %
    shard_count == k) whenever ``shard_count`` divides the source's
    ``key_shards`` — (m % K_src) % N == m % N iff N | K_src — which is the
    deployment contract: pick ``key_shards`` = the maximum planned node
    count (a power of two), exactly the Kafka partitions-vs-consumers
    rule.  Pure function of the key columns, so a key's whole history
    (tombstones included) is kept or dropped as a unit."""
    from encode_ingest_ray.state.partition import (
        DEFAULT_TURN_BLOCK,
        conv_hashes,
        mix_partition,
    )

    tb = turn_block or DEFAULT_TURN_BLOCK

    def keep(t):
        import numpy as np
        import pyarrow as pa

        if t.num_rows == 0:
            return t
        h = conv_hashes(t.column("conv_id"))
        turns = (
            t.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
        )
        sid = mix_partition(h, turns, shard_count, tb, seed=1)
        return t.filter(pa.array(sid == np.int32(shard_index)))

    # replication identity: replicate_from pins this in the replica cursor
    # so a later sync with a different (or no) filter is a hard error
    keep.replication_filter_id = f"owner:{shard_index}:{shard_count}:{tb}"
    return keep


def reshard(
    old_root: str,
    new_root: str,
    new_count: int,
    *,
    num_partitions: int | None = None,
    num_actors: int | None = None,
    turn_block: int | None = None,
) -> dict:
    """One catch-up pass of an elastic K -> new_count re-shard: every new
    shard replicates ITS key subset from the old shard that currently owns
    it.  Incremental and resume-safe (replication checkpoints are the
    replicas' committed-epoch sets), so the grow flow is zero-downtime:

    1. the old K-shard deployment keeps serving reads and ingesting;
    2. call ``reshard`` repeatedly — each pass drains the old shards'
       changefeeds into the new shards (cost O(changes) per pass);
    3. cutover: pause writers, run one final ``reshard`` pass (the last
       delta), point readers at ``new_root`` (``sharded_final_dataset``)
       and resume writers as ``new_count`` tailers over the same source
       (``run_shard(..., shard_count=new_count)`` — replica epochs mirror
       the source 1:1, so the dense-prefix resume rule skips everything
       already replicated and new epochs apply on top).

    Requires new_count % K == 0 (each new shard's key range then lives
    inside exactly ONE old shard — new shard k' draws from old shard
    k' % K) and, per the deployment contract, new_count | key_shards of
    the source.  SCALE.md documents the flow end-to-end."""
    from encode_ingest_ray.pipelines.cdc import CdcEngine

    old_dirs = shard_dirs(old_root)
    k_old = len(old_dirs)
    if k_old == 0:
        raise FileNotFoundError(f"no shard dirs under {old_root!r}")
    if new_count % k_old:
        raise ValueError(
            f"new_count={new_count} must be a multiple of the current "
            f"shard count {k_old} (each new shard must draw from exactly "
            "one old shard)"
        )
    out = {"shards": [], "events_applied": 0, "epochs_run": 0}
    for kp in range(new_count):
        src = CdcEngine(old_dirs[kp % k_old])
        rep = CdcEngine(
            shard_dir(new_root, kp, new_count),
            num_partitions=num_partitions,
            num_actors=num_actors,
        )
        s = rep.replicate_from(
            src, key_filter=owner_filter(kp, new_count, turn_block)
        )
        out["shards"].append(
            {"shard": kp, "from": old_dirs[kp % k_old],
             "epochs_run": s["epochs_run"],
             "events_applied": s["events_applied"]}
        )
        out["events_applied"] += s["events_applied"]
        out["epochs_run"] += s["epochs_run"]
    return out


def shard_dirs(out_root: str) -> list[str]:
    return sorted(
        os.path.join(out_root, d)
        for d in os.listdir(out_root)
        if re.fullmatch(r"shard-\d+-of-\d+", d)
    )


def sharded_final_dataset(out_root: str):
    """Streaming live view of the LOGICAL table: union of all shard tables
    (keys are disjoint across shards by construction)."""
    from encode_ingest_ray.pipelines.cdc import CdcEngine

    dirs = shard_dirs(out_root)
    if not dirs:
        raise FileNotFoundError(f"no shard-NN-of-NN directories under {out_root!r}")
    ds = CdcEngine(dirs[0]).final_dataset()
    for d in dirs[1:]:
        ds = ds.union(CdcEngine(d).final_dataset())
    return ds


def sharded_final_table(out_root: str):
    """Small-scale convenience: fully ordered logical table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    tables = [
        t for t in ray.get(sharded_final_dataset(out_root).to_arrow_refs())
        if t.num_rows
    ]
    if not tables:
        return pa.table({})
    from encode_ingest_ray.schema import align_to_schema, unify_schemas

    unified = tables[0].schema
    for t in tables[1:]:
        unified = unify_schemas(unified, t.schema)
    t = pa.concat_tables([align_to_schema(x, unified) for x in tables]).combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(idx)
