"""CdcEngine — the epoch loop: tail → partition exchange → actor merge →
two-phase commit.

Ray-Data-first layout (SURVEY.md §7.4): per epoch there is exactly ONE wide
operation — a *push exchange* expressed as a fused ``read_parquet →
map_batches(_route_batch)`` stage that LWW-pre-collapses each block
(combiner) and ships per-partition slices straight into the stateful
actor pool.  A sort-based ``groupby`` shuffle and Ray's hash-shuffle
strategy were both measured 4-15x slower at this shape: every row would
transit the object store twice and the aggregator machinery adds fixed
cost per partition.  Routing tasks block on the actor acks (releasing
their CPU while waiting), so the dataset completing implies every push
has been applied — the flush/commit barrier needs no extra protocol.

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
import json
import os
import re
import tempfile
import time
from functools import partial

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from encode_ingest_ray.state.manifest import Manifest
from encode_ingest_ray.state.merger import PartitionMerger
from encode_ingest_ray.state.partition import DEFAULT_TURN_BLOCK
from encode_ingest_ray.state.wire import pack_table


class ChangefeedHorizonError(RuntimeError):
    """A requested changefeed epoch's files are unavailable (pre-feature
    manifest, or aged out by vacuum retention).  The consumer must re-sync
    from a snapshot (``final_dataset``) and restart the feed — the Delta
    CDF / Kafka log-retention contract."""


def discover_epoch_files(events_dir: str) -> list[list[str]]:
    """events-epoch-NNNNNN[-SSSS].parquet files grouped by epoch id, ascending.

    Completeness protocol for live tailing: if any ``events-epoch-N.done``
    marker exists in the directory, only epochs WITH markers are eligible
    (a producer writes shards first, marker last, so a half-written epoch is
    never picked up).  With no markers at all, every file is assumed
    complete (static batch directories).
    """
    out: dict[int, list[str]] = {}
    for path in glob.glob(os.path.join(events_dir, "events-epoch-*.parquet")):
        m = re.search(r"events-epoch-(\d+)(?:-\d+)?\.parquet$", path)
        if m:
            out.setdefault(int(m.group(1)), []).append(path)
    markers = {
        int(m.group(1))
        for p in glob.glob(os.path.join(events_dir, "events-epoch-*.done"))
        if (m := re.search(r"events-epoch-(\d+)\.done$", p))
    }
    if markers:
        out = {e: files for e, files in out.items() if e in markers}
    # epochs must form a dense prefix for positional epoch ids
    result = []
    for e in sorted(out):
        if e != len(result):
            break
        result.append(sorted(out[e]))
    return result


def _route_batch(
    batch: pa.Table,
    *,
    actors,
    num_actors: int,
    num_partitions: int,
    turn_block: int,
    epoch: int,
    transform=None,
) -> pa.Table:
    """map_batches body: the push exchange (combiner + route in one pass).

    All ordering work happens in numpy over integer key columns (dictionary
    codes for conv_id) — one ``lexsort`` by (actor, part, conv, turn, ts,
    lsn) — so the only full-width Arrow copy is the single ``take`` of the
    winner rows:

    1. block-level LWW combiner: keep only each key's winner (associative,
       exactness-preserving — like partial pre-aggregation before a shuffle);
       on update-heavy CDC streams this cuts exchanged bytes substantially;
    2. ship each actor ONE contiguous slice plus (part, len) run boundaries.
       Actor pushes are memcpy-bound: message count and bytes — not kernels —
       set the exchange cost.

    Task retries re-push identical rows; that is safe (see merger.py).
    """
    import numpy as np

    from encode_ingest_ray.state.partition import partition_ids

    n_raw = batch.num_rows
    if n_raw == 0:
        return pa.table(
            {"rows_raw": pa.array([0], pa.int64()), "rows_routed": pa.array([0], pa.int64())}
        )
    if transform is not None:
        # ingest-time map: runs inside the fused read→route task, so the
        # transformed rows never hit the object store untransformed.  The
        # callable must preserve the key/merge columns (conv_id, turn_idx,
        # ts, lsn, op) and be DETERMINISTIC — a replayed epoch re-applies it
        # and must stage identical bytes.
        batch = transform(batch)
        if batch.num_rows == 0:
            return pa.table(
                {"rows_raw": pa.array([n_raw], pa.int64()),
                 "rows_routed": pa.array([0], pa.int64())}
            )
    n = batch.num_rows  # post-transform row count (n_raw reports the input)
    conv = batch.column("conv_id").combine_chunks().dictionary_encode()
    conv_codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turns = batch.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts").combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
    lsn = batch.column("lsn").combine_chunks().to_numpy(zero_copy_only=False)
    parts_np = partition_ids(
        batch.column("conv_id"), batch.column("turn_idx"), num_partitions, turn_block
    ).astype(np.int64)
    actor_np = parts_np % num_actors

    # lexsort: last key is primary → (actor, part, conv, turn, ts, lsn)
    order = np.lexsort((lsn, ts, turns, conv_codes, parts_np, actor_np))
    oc, ot = conv_codes[order], turns[order]
    winner = np.empty(n, dtype=bool)
    winner[-1] = True
    np.not_equal(oc[1:], oc[:-1], out=winner[:-1])
    winner[:-1] |= ot[1:] != ot[:-1]
    final_idx = order[winner]
    routed = batch.take(pa.array(final_idx))  # the one full-width copy
    rparts = parts_np[final_idx]
    ractors = actor_np[final_idx]

    m = len(final_idx)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(rparts)) + 1, [m]))
    futures = []
    i = 0
    while i < len(starts) - 1:
        a = int(ractors[starts[i]])
        seg_start = int(starts[i])
        parts_list: list[int] = []
        lens: list[int] = []
        while i < len(starts) - 1 and int(ractors[starts[i]]) == a:
            lo, hi = int(starts[i]), int(starts[i + 1])
            parts_list.append(int(rparts[lo]))
            lens.append(hi - lo)
            i += 1
        seg = routed.slice(seg_start, sum(lens))
        # zstd-IPC pack: compression is routing-task CPU (scales with the
        # cluster); the bytes crossing plasma / the network shrink ~3-6x
        payload = pack_table(seg)
        futures.append(actors[a].apply_block.remote(epoch, parts_list, lens, payload))
    ray.get(futures)
    return pa.table(
        {
            "rows_raw": pa.array([n_raw], pa.int64()),
            "rows_routed": pa.array([m], pa.int64()),
        }
    )


def expect_not_null(col: str):
    """Canned ingest expectation: the payload column must be non-null."""
    def pred(t: pa.Table) -> pa.Array:
        return pc.is_valid(t.column(col))
    return pred


def expect_nonempty(col: str):
    """Canned ingest expectation: non-null and not the empty string."""
    def pred(t: pa.Table) -> pa.Array:
        c = t.column(col)
        return pc.and_(
            pc.is_valid(c), pc.not_equal(pc.cast(c, pa.string()), pa.scalar(""))
        )
    return pred


class CdcEngine:
    def __init__(
        self,
        out_dir: str,
        *,
        num_partitions: int | None = None,
        num_actors: int | None = None,
        turn_block: int | None = None,
        actor_num_cpus: float = 0,
        compact_every: int = 8,
        compact_min_bytes_ratio: float | None = None,
        flush_fanout: int | None = None,
        vacuum_retain: int | None = 2,
        index_columns: list[str] | None = None,
        lateness_us: int | None = None,
        ingest_transform=None,
        postings_column: str | None = None,
        expectations: dict | None = None,
        changefeed_preimages: bool | None = None,
        stats_columns: list[str] | None = None,
        fail_expectations: dict | None = None,
    ):
        # Mergers run with num_cpus=0 by default: they are mostly idle during
        # the exchange (pure buffering) and burst at flush, so a CPU
        # reservation both starves the routing tasks of scheduler slots and
        # risks pool-vs-task resource deadlock; measured ~20% faster at both
        # 8 and 32 cpus with no reservation (OS-level scheduling suffices).
        self.out_dir = out_dir
        # heal any multi-table commit interrupted between the transaction
        # record and the last manifest promotion BEFORE any manifest read
        # (cheap no-op when the txn log is empty or absent)
        os.makedirs(out_dir, exist_ok=True)
        from encode_ingest_ray.state.txn import TxnLog

        self.txn = TxnLog(out_dir)
        self.txn.recover()
        if num_actors is None:
            # ~1 merger per 4 cores, the density that scales with the cluster
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            num_actors = max(2, cpus // 4)
        # an existing committed table carries its own partitioning identity;
        # unspecified params ADOPT it (so `final`/`status`/resume need no
        # flags) — only an explicit conflicting value trips the guard below
        committed = (Manifest(out_dir).latest() or {}).get("partitioning")
        if num_partitions is None:
            num_partitions = committed["num_partitions"] if committed else 8 * num_actors
        if turn_block is None:
            turn_block = committed["turn_block"] if committed else DEFAULT_TURN_BLOCK
        # the covering index (like the partitioning) is durable table
        # identity: a committed indexed table ADOPTS its index config on
        # resume (else the mirrored chains would silently diverge)
        committed_index = committed.get("index_columns") if committed else None
        if index_columns is None:
            index_columns = committed_index
        elif committed is not None and committed_index != index_columns:
            raise ValueError(
                f"output dir {out_dir!r} was committed with "
                f"index_columns={committed_index}; resuming with "
                f"{index_columns} would diverge the mirrored index chain. "
                "Rebuild the table to change the index."
            )
        self.index_columns = index_columns
        self.index_root = os.path.join(out_dir, "index") if index_columns is not None else None
        # the postings index (like the covering index) is durable identity
        committed_postings = committed.get("postings_column") if committed else None
        if postings_column is None:
            postings_column = committed_postings
        elif committed is not None and committed_postings != postings_column:
            raise ValueError(
                f"output dir {out_dir!r} was committed with "
                f"postings_column={committed_postings!r}; resuming with "
                f"{postings_column!r} would diverge the postings chain."
            )
        self.postings_column = postings_column
        self.postings_root = (
            os.path.join(out_dir, "postings") if postings_column is not None else None
        )
        # allowed lateness is a POLICY knob, not identity: adopt the
        # committed value when unset so a resumed run keeps quarantining,
        # but an explicit new value simply applies going forward
        if lateness_us is None and committed is not None:
            lateness_us = committed.get("lateness_us")
        # changefeed preimages are the same kind of policy knob: adopt the
        # committed value so a resume keeps the feed retraction-capable
        # (Delta-CDF "full" mode); an explicit value applies going forward
        if changefeed_preimages is None:
            changefeed_preimages = bool(
                committed.get("changefeed_preimages")
            ) if committed else False
        self.changefeed_preimages = bool(changefeed_preimages)
        # zone-map statistics are a POLICY knob like lateness: adopt the
        # committed column list on resume; an explicit new list applies
        # going forward (bounds appear as partitions get dirtied; partitions
        # without bounds are simply never pruned — the safe default)
        if stats_columns is None and committed is not None:
            stats_columns = committed.get("stats_columns")
        self.stats_columns = list(stats_columns) if stats_columns else None
        self.lateness_us = lateness_us
        self.late_root = (
            os.path.join(out_dir, "late") if lateness_us is not None else None
        )
        #: optional ingest-time map (pa.Table -> pa.Table), applied inside
        #: the fused read→route task; must keep key/merge columns and be
        #: deterministic (replays re-apply it).  NOT persisted — a resuming
        #: engine must be constructed with the same callable.
        self.ingest_transform = ingest_transform
        #: ingest expectations (Delta-Live-Tables analog): ordered
        #: {rule_name: predicate(pa.Table) -> BooleanArray of PASS}.  Each
        #: rule gates a key's EPOCH-WINNING version at flush (post-LWW —
        #: deterministic under any blocking; tombstones bypass); failing
        #: winners divert to the append-only expect/ audit chain with a
        #: ``reason`` column and the key keeps its previous state.  Like
        #: ingest_transform, callables are NOT persisted — a resuming
        #: engine must be constructed with the same dict; predicates must
        #: be deterministic (a replayed epoch re-stages identical files).
        self.expectations = expectations
        #: expect_or_fail rules (DLT analog): like ``expectations`` but ANY
        #: failing epoch-winning version ABORTS the epoch before commit
        #: (ExpectationFailedError; nothing published, replay-safe).  Not
        #: persisted — a resuming engine re-supplies the callables.
        self.fail_expectations = fail_expectations
        self.expect_root = (
            os.path.join(out_dir, "expect") if expectations is not None else None
        )
        self.num_partitions = num_partitions
        self.num_actors = num_actors
        self.turn_block = turn_block
        self.actor_num_cpus = actor_num_cpus
        self.compact_every = compact_every
        # size-aware compaction deferral (None = chain-length-only trigger):
        # a partition compacts when its chain reaches compact_every AND its
        # delta bytes reach ratio x base bytes, with a 4x-chain hard cap —
        # cold/huge partitions stop paying full rewrites for tiny churn
        self.compact_min_bytes_ratio = compact_min_bytes_ratio
        self.flush_fanout = flush_fanout
        # GC superseded base/delta files this many commits after they drop
        # out of the pointer map (None disables); see Manifest.vacuum
        self.vacuum_retain = vacuum_retain
        self.manifest = Manifest(out_dir)
        self.index_manifest = (
            Manifest(self.index_root) if self.index_root is not None else None
        )
        self.late_manifest = (
            Manifest(self.late_root) if self.late_root is not None else None
        )
        self.postings_manifest = (
            Manifest(self.postings_root) if self.postings_root is not None else None
        )
        # the expect chain stays readable on a resume that did not re-supply
        # the (non-persistable) predicate callables
        if self.expect_root is None:
            prior = os.path.join(out_dir, "expect")
            if os.path.isdir(os.path.join(prior, "_manifest")):
                self.expect_root = prior
        self.expect_manifest = (
            Manifest(self.expect_root) if self.expect_root is not None else None
        )
        #: replication-only: a schema log to commit with the next run()'s
        #: epochs instead of carrying the (empty) local one — a replica
        #: mirrors the source's rename/drop history so its identically
        #: epoch-numbered files map identically (see replicate_from)
        self._schema_log_override: list | None = None
        self._actors: list | None = None
        # partitioning is part of the table's durable identity: state files
        # are keyed by hash(conv_id, turn_idx//turn_block) % num_partitions,
        # so resuming with different parameters would re-key live keys into
        # other partitions and duplicate them at merge-on-read. Refuse.
        latest = self.manifest.latest()
        prev = (latest or {}).get("partitioning")
        if prev and (
            prev["num_partitions"] != self.num_partitions
            or prev["turn_block"] != self.turn_block
        ):
            raise ValueError(
                f"output dir {out_dir!r} was committed with partitioning "
                f"{prev}; this engine was configured with "
                f"num_partitions={self.num_partitions}, turn_block={self.turn_block}. "
                "Resume with the original parameters."
            )

    # -- schema evolution (metadata-only rename / drop) -------------------
    def schema_log(self, epoch: int | None = None) -> list:
        """The committed schema-evolution log (state/schemalog.py) — of the
        latest commit, or of a historical epoch's record (time travel)."""
        rec = (
            self.manifest.latest()
            if epoch is None
            else self.manifest.read_epoch(epoch)
        )
        return list((rec or {}).get("schema_log") or [])

    def _effective_schema_log(self) -> list:
        return (
            self._schema_log_override
            if self._schema_log_override is not None
            else self.schema_log()
        )

    def _logical_columns(self, pointers: dict, log: list) -> set[str]:
        """Current logical column set: union of every pointer file's footer
        schema mapped through the log.  Footer-only reads, driver-side —
        acceptable for a rare admin operation (one IO per chain file)."""
        import pyarrow.parquet as pq

        from encode_ingest_ray.state.schemalog import file_epoch, map_schema

        cols: set[str] = set()
        for ptr in pointers.values():
            for f in ([ptr["base"]] if ptr.get("base") else []) + list(
                ptr.get("deltas", [])
            ):
                s = pq.read_schema(f)
                cols.update(map_schema(s, file_epoch(f), log).names)
        return cols

    def rename_column(self, old: str, new: str) -> dict:
        """Metadata-only column RENAME: one manifest re-commit, zero data
        movement (Iceberg/Delta column-mapping analog).  The entry is
        epoch-stamped: files committed up to now keep their physical name
        and are mapped at read; ingest from here on must use the NEW name
        (an old-named column in later events is a fresh additive column).
        Forbidden for LWW key/merge metadata and for configured
        ``index_columns`` / ``postings_column`` (the mirrored chains key on
        them).  The lateness/expectation audit chains keep raw physical
        rows (they record what the source SENT); ``consume`` also stays
        physical (its replay contract is byte-equality) — ``changes()`` /
        ``changes_cdf()`` / all table reads are logical."""
        return self._schema_op({"op": "rename", "from": old, "to": new})

    def drop_column(self, column: str) -> dict:
        """Metadata-only column DROP: the column leaves the logical schema
        everywhere up to this commit; later ingest may re-introduce the
        name as a NEW column (old files' values stay invisible — the
        epoch-stamp rule in state/schemalog.py)."""
        return self._schema_op({"op": "drop", "column": column})

    def _schema_op(self, entry: dict) -> dict:
        from encode_ingest_ray.state.merger import LWW_META_COLUMNS

        self.manifest.acquire_run_lock()
        try:
            latest = self.manifest.latest()
            if latest is None:
                raise ValueError("nothing committed yet — no schema to evolve")
            epoch = int(latest["epoch"])
            log = list(latest.get("schema_log") or [])
            protected = set(LWW_META_COLUMNS)
            protected.update(self.index_columns or [])
            protected.update(self.stats_columns or [])
            if self.postings_column:
                protected.add(self.postings_column)
            target = entry["from"] if entry["op"] == "rename" else entry["column"]
            if target in protected:
                raise ValueError(
                    f"column {target!r} is protected (LWW key/merge metadata, "
                    "covering-index or postings column) — it cannot be "
                    "renamed or dropped"
                )
            logical = self._logical_columns(latest["partitions"], log)
            if target not in logical:
                raise ValueError(
                    f"column {target!r} is not in the table's logical schema "
                    f"({sorted(logical)})"
                )
            if entry["op"] == "rename":
                new = entry["to"]
                if new == entry["from"]:
                    raise ValueError("rename to the same name is a no-op")
                if new in protected:
                    raise ValueError(
                        f"cannot rename onto protected name {new!r}"
                    )
                if new in logical:
                    raise ValueError(
                        f"column {new!r} already exists in the logical schema"
                    )
            stamped = {"epoch": epoch, **entry}
            new_log = log + [stamped]
            metrics = dict(latest.get("metrics", {}))
            metrics["schema_op"] = stamped
            # same-epoch manifest re-commit (the migrate/restore pattern):
            # pointers, partitioning, changefeed records all carry verbatim;
            # only the schema log grows.  Sibling chains don't carry the log
            # (index/postings columns are rename-protected), so the single
            # live-manifest commit is atomic on its own.
            self.manifest.commit(
                epoch,
                dict(latest["partitions"]),
                metrics,
                latest.get("partitioning"),
                changes=latest.get("changes"),
                preimages=latest.get("preimages"),
                schema_log=new_log,
            )
            return {"epoch": epoch, "schema_log": new_log}
        finally:
            self.manifest.release_run_lock()

    # -- branches (write-audit-publish) -----------------------------------
    @staticmethod
    def _record_fingerprint(rec: dict) -> str:
        """Content fingerprint of a manifest record's REWRITABLE substance:
        pointer map, partitioning identity, schema log and history
        generation (metrics/timestamps excluded — they change on every
        replayed commit without changing content)."""
        import hashlib

        body = json.dumps(
            {
                "partitions": rec.get("partitions"),
                "partitioning": rec.get("partitioning"),
                "schema_log": rec.get("schema_log") or [],
                "restore_gen": int(rec.get("restore_gen", 0) or 0),
            },
            sort_keys=True,
        )
        return hashlib.sha1(body.encode()).hexdigest()

    @staticmethod
    def _abs_ptr_paths(ptr: dict) -> dict:
        out = dict(ptr)
        if out.get("base"):
            out["base"] = os.path.abspath(out["base"])
        out["deltas"] = [os.path.abspath(d) for d in out.get("deltas", [])]
        if out.get("dl_base"):
            out["dl_base"] = os.path.abspath(out["dl_base"])
        if out.get("dl_deltas"):
            out["dl_deltas"] = [os.path.abspath(d) for d in out["dl_deltas"]]
        return out

    def _branch_root(self, name: str) -> str:
        if not self._CONSUMER_RE.match(name or ""):
            raise ValueError(f"invalid branch name {name!r}")
        return os.path.abspath(os.path.join(self.out_dir, "_branches", name))

    def branches(self) -> list[str]:
        d = os.path.join(self.out_dir, "_branches")
        if not os.path.isdir(d):
            return []
        return sorted(
            n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n, "_manifest"))
        )

    def create_branch(self, name: str) -> dict:
        """Zero-copy BRANCH at the current commit (Iceberg-branch / WAP
        analog): one manifest re-commit under ``_branches/<name>`` whose
        pointer map references the main table's files — no data moves at
        any table size.  A ``CdcEngine`` opened on the branch root (see
        ``branch_engine``) then ingests NEW epochs normally: its deltas and
        compacted bases land under the branch's own part dirs while
        unchanged state stays shared.  The write-audit-publish flow: ingest
        on the branch, audit it (queries, expectations, dq checks), then
        ``publish_branch`` fast-forwards main.  Main's vacuum protects every
        file a live branch references (``_branch_referenced``).

        Mirrored sibling chains (covering index, postings+doclens) and the
        append-only audit chains (lateness, expectations) branch WITH the
        table: their manifests are seeded under the branch root with the
        same absolute-path re-commit, so the branch engine adopts the index
        config and accumulates audit deltas seamlessly; ``publish_branch``
        replays every sibling's records in the same per-epoch TxnLog
        transaction."""
        root = self._branch_root(name)
        self.manifest.acquire_run_lock()
        try:
            latest = self.manifest.latest()
            if latest is None:
                raise ValueError("nothing committed yet — nothing to branch")
            bman = Manifest(root)
            if bman.latest() is not None:
                raise ValueError(f"branch {name!r} already exists")
            epoch = int(latest["epoch"])
            gen = int(latest.get("restore_gen", 0) or 0)
            bman.commit(
                epoch,
                {p: self._abs_ptr_paths(ptr) for p, ptr in latest["partitions"].items()},
                {"branched_from": os.path.abspath(self.out_dir),
                 "branch_base_epoch": epoch},
                latest.get("partitioning"),
                restore_gen=gen,
                schema_log=list(latest.get("schema_log") or []),
            )
            # seed the sibling chains: the branch engine re-derives their
            # roots from its own out_dir, so each mirror seeds under
            # branch_root/<sub> with main's current pointer map (absolute
            # paths).  Audit chains seed from pointers() (cumulative map);
            # their history stays shared until the branch appends.
            for sub, man in (("index", self.index_manifest),
                             ("postings", self.postings_manifest),
                             ("late", self.late_manifest),
                             ("expect", self.expect_manifest)):
                if man is None:
                    continue
                sub_rec = man.latest()
                Manifest(os.path.join(root, sub)).commit(
                    epoch,
                    {p: self._abs_ptr_paths(ptr) for p, ptr in ((sub_rec or {}).get("partitions") or {}).items()},
                    {"mirror_of": root, "branch_base_epoch": epoch},
                    latest.get("partitioning"),
                    restore_gen=gen,
                )
            # pin the base epoch + history generation + a CONTENT
            # fingerprint of the base record for publish-time fast-forward
            # checks: epoch number and restore_gen alone miss same-epoch
            # rewrite commits on main (rename/drop/migrate re-commit the
            # SAME epoch), which a branch publish would silently clobber
            info = {"source": os.path.abspath(self.out_dir),
                    "base_epoch": epoch, "restore_gen": gen,
                    "base_fingerprint": self._record_fingerprint(latest)}
            fd, tmp = tempfile.mkstemp(dir=root, prefix=".tmp-branch-")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump(info, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, os.path.join(root, "branch.json"))
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            return {"branch": name, "root": root, **info}
        finally:
            self.manifest.release_run_lock()

    def branch_engine(self, name: str, **engine_kwargs) -> "CdcEngine":
        """An engine over the branch root — partitioning, schema log and
        policy knobs adopt from the branched record like any resume."""
        root = self._branch_root(name)
        if not os.path.isdir(os.path.join(root, "_manifest")):
            raise ValueError(f"no branch {name!r} under {self.out_dir!r}")
        return CdcEngine(root, **engine_kwargs)

    def publish_branch(self, name: str) -> dict:
        """FAST-FORWARD publish: replay the branch's committed records onto
        main, ascending — each copy is one atomic manifest write, so a crash
        mid-publish leaves main at a dense, consistent prefix and a rerun
        resumes idempotently (epochs already on main are skipped).  Requires
        main to still sit at the branch's base epoch with an unchanged
        restore generation, and the branch itself not to have rewritten
        history below the base (non-fast-forward states raise: re-branch
        from current main instead).  After publish main's pointer map
        references files under the branch dir; ``migrate(force=True)``
        (OPTIMIZE) rewrites them into main's own part dirs, after which
        ``drop_branch`` succeeds."""
        root = self._branch_root(name)
        with open(os.path.join(root, "branch.json")) as f:
            info = json.load(f)
        self.manifest.acquire_run_lock()
        try:
            # heal any branch-side txn, then read its committed records
            from encode_ingest_ray.state.txn import TxnLog

            TxnLog(root).recover()
            bman = Manifest(root)
            base = int(info["base_epoch"])
            latest = self.manifest.latest()
            # fast-forward states: main still at the branch base, OR main's
            # tip is itself a record THIS branch published (a replay after a
            # crashed/finished publish resumes idempotently)
            resuming = (
                latest is not None
                and latest.get("metrics", {}).get("published_from_branch")
                == name
            )
            if latest is None or (int(latest["epoch"]) != base and not resuming):
                raise ValueError(
                    f"main is at epoch {latest and latest['epoch']}, branch "
                    f"{name!r} was taken at {base} — not a fast-forward; "
                    "re-branch from the current commit"
                )
            if int(latest.get("restore_gen", 0) or 0) != int(info["restore_gen"]):
                raise ValueError(
                    "main history was rewritten (restore) since the branch "
                    "was taken — re-branch from the current commit"
                )
            want_fp = info.get("base_fingerprint")
            if not resuming and want_fp is not None and (
                self._record_fingerprint(self.manifest.read_epoch(base))
                != want_fp
            ):
                raise ValueError(
                    f"main's record at the branch base epoch {base} was "
                    "REWRITTEN since the branch was taken (rename/drop/"
                    "migrate re-commit the same epoch) — publishing would "
                    "clobber it; re-branch from the current commit"
                )
            br_latest = bman.latest()
            if int(br_latest.get("restore_gen", 0) or 0) != int(info["restore_gen"]):
                raise ValueError(
                    f"branch {name!r} rewrote its own history (restore) — "
                    "publishing it would silently roll main back; re-branch"
                )
            to_publish = [e for e in bman.committed_epochs() if e > base]
            main_committed = set(self.manifest.committed_epochs())
            published = 0
            siblings = [
                (sub, man, Manifest(os.path.join(root, sub)))
                for sub, man in (("index", self.index_manifest),
                                 ("postings", self.postings_manifest),
                                 ("late", self.late_manifest),
                                 ("expect", self.expect_manifest))
                if man is not None
                and os.path.isdir(os.path.join(root, sub, "_manifest"))
            ]
            sibling_epochs = {
                sub: set(bsub.committed_epochs())
                for sub, _, bsub in siblings
            }
            for e in to_publish:
                if e in main_committed:
                    continue  # idempotent replay after a crashed publish
                rec = bman.read_epoch(e)
                live_rec = {
                    "partitions": rec["partitions"],
                    "metrics": {**rec.get("metrics", {}),
                                "published_from_branch": name},
                    "partitioning": rec.get("partitioning"),
                    "changes": rec.get("changes"),
                    "preimages": rec.get("preimages"),
                    "restore_gen": int(info["restore_gen"]),
                    "schema_log": list(rec.get("schema_log") or []),
                }
                if not siblings:
                    self.manifest.commit(e, **live_rec)
                else:
                    # every sibling's branch record replays in the SAME
                    # per-epoch transaction — main's chains never diverge,
                    # and a crash heals forward at the next engine init
                    manifests = {"live": self.manifest}
                    records = {"live": live_rec}
                    for sub, man, bsub in siblings:
                        if e not in sibling_epochs[sub]:
                            # e.g. the expect chain only commits on epochs
                            # the branch ran with expectation callables;
                            # its readers use latest(), gaps are fine
                            continue
                        srec = bsub.read_epoch(e)
                        manifests[sub] = man
                        records[sub] = {
                            "partitions": srec["partitions"],
                            "metrics": {**srec.get("metrics", {}),
                                        "published_from_branch": name},
                            "partitioning": srec.get("partitioning"),
                            "restore_gen": int(info["restore_gen"]),
                        }
                    self.txn.commit(e, manifests, records)
                published += 1
            # a schema op performed ON the branch re-stamps its BASE record
            # (same-epoch re-commit), which the epoch replay above never
            # touches — sync it with a same-epoch re-commit on main so a
            # rename/drop-only branch still publishes its metadata
            br_log = list((br_latest or {}).get("schema_log") or [])
            main_latest = self.manifest.latest()
            if br_log != list((main_latest or {}).get("schema_log") or []):
                self.manifest.commit(
                    int(main_latest["epoch"]),
                    main_latest["partitions"],
                    {**main_latest.get("metrics", {}),
                     "published_from_branch": name},
                    main_latest.get("partitioning"),
                    changes=main_latest.get("changes"),
                    preimages=main_latest.get("preimages"),
                    restore_gen=int(info["restore_gen"]),
                    schema_log=br_log,
                )
                published += 1
            if published:
                self._vacuum_chains()
            return {
                "branch": name,
                "published_epochs": published,
                "epoch": int(self.manifest.latest()["epoch"]),
            }
        finally:
            self.manifest.release_run_lock()

    def drop_branch(self, name: str) -> dict:
        """Delete a branch — refused while main's retained manifests still
        reference files under the branch dir.  A publish moves STATE
        pointers there (``migrate(force=True)`` rewrites them into the main
        tree) and the published epochs' CHANGEFEED files also live there
        until vacuum retention ages those records out of the newest-retain
        window — so the drop succeeds after OPTIMIZE once the table has
        advanced ``vacuum_retain`` epochs past the publish."""
        import shutil

        root = self._branch_root(name)
        if not os.path.isdir(root):
            return {"branch": name, "dropped": False, "missing": True}
        self.manifest.acquire_run_lock()
        try:
            prefix = root + os.sep
            # vacuum_retain=None means retention is DISABLED: nothing ever
            # GCs, so every committed record stays valid for time travel /
            # restore — the whole history is live and must be walked, not
            # just the newest record per chain (an older main record can
            # reference branch-dir files the newest one no longer does).
            retain = (None if self.vacuum_retain is None
                      else max(1, self.vacuum_retain))
            refs: set[str] = set()
            # every chain of main, and of every OTHER branch (a branch taken
            # after a publish shares the published files too)
            roots = [os.path.abspath(self.out_dir)] + [
                self._branch_root(other)
                for other in self.branches()
                if other != name
            ]
            for r in roots:
                for sub in ("", "index", "postings", "late", "expect"):
                    mdir = os.path.join(r, sub) if sub else r
                    if os.path.isdir(os.path.join(mdir, "_manifest")):
                        refs |= self._manifest_referenced(
                            Manifest(mdir), retain=retain
                        )
            held = [f for f in refs if f.startswith(prefix)]
            if held:
                raise ValueError(
                    f"main still references {len(held)} file(s) under branch "
                    f"{name!r} (e.g. {held[0]!r}); run migrate(force=True) "
                    "to rewrite them into the main tree first"
                )
            shutil.rmtree(root)
            return {"branch": name, "dropped": True}
        finally:
            self.manifest.release_run_lock()

    @staticmethod
    def _manifest_referenced(man: Manifest, retain: int | None = 2) -> set[str]:
        """Every data file the newest ``retain`` records of a manifest
        reference (same field walk as Manifest.vacuum).  ``retain=None``
        walks EVERY committed epoch (retention disabled → all restorable)."""
        refs: set[str] = set()
        epochs = man.committed_epochs()
        if retain is not None:
            epochs = epochs[-max(1, retain):]
        for e in epochs:
            rec = man.read_epoch(e)
            for ptr in rec["partitions"].values():
                if ptr.get("base"):
                    refs.add(os.path.abspath(ptr["base"]))
                for d in ptr.get("deltas", []):
                    refs.add(os.path.abspath(d))
                if ptr.get("dl_base"):
                    refs.add(os.path.abspath(ptr["dl_base"]))
                for d in ptr.get("dl_deltas", []):
                    refs.add(os.path.abspath(d))
            for c in rec.get("changes") or []:
                refs.add(os.path.abspath(c))
            for c in rec.get("preimages") or []:
                refs.add(os.path.abspath(c))
        return refs

    def _branch_referenced(self, sub: str | None = None) -> set[str]:
        """Union of every live branch's retained references for one chain
        (None = live table, or a mirrored sibling: "index"/"postings") —
        the owning chain's vacuum must not GC shared files a branch
        snapshot still reads."""
        refs: set[str] = set()
        for name in self.branches():
            root = self._branch_root(name)
            if sub is not None:
                root = os.path.join(root, sub)
            if not os.path.isdir(os.path.join(root, "_manifest")):
                continue
            refs |= self._manifest_referenced(
                Manifest(root), retain=max(1, self.vacuum_retain or 1)
            )
        return refs

    def _parent_root(self) -> str | None:
        """If this engine IS a branch, the parent table's root."""
        d = os.path.abspath(self.out_dir)
        if os.path.basename(os.path.dirname(d)) == "_branches":
            return os.path.dirname(os.path.dirname(d))
        return None

    def _parent_referenced(self) -> set[str]:
        """Files the PARENT table (and its chains) still references — after
        a publish, main's manifests point INTO this branch's part dirs, so
        a branch that keeps running must not vacuum them away."""
        parent = self._parent_root()
        if parent is None:
            return set()
        refs: set[str] = set()
        retain = max(1, self.vacuum_retain or 1)
        for sub in ("", "index", "postings", "late", "expect"):
            mdir = os.path.join(parent, sub) if sub else parent
            if os.path.isdir(os.path.join(mdir, "_manifest")):
                refs |= self._manifest_referenced(Manifest(mdir), retain=retain)
        return refs

    def _vacuum_chains(self) -> None:
        """Vacuum the live chain and the mirrored siblings, each protected
        by the union of live branches' references to THAT chain — and, when
        this engine is itself a branch, by the parent's references into the
        branch dir (publish moves main's pointers here)."""
        if self.vacuum_retain is None:
            return
        parent_refs = self._parent_referenced()
        self.manifest.vacuum(
            self.vacuum_retain,
            extra_referenced=self._branch_referenced() | parent_refs,
        )
        if self.index_manifest is not None:
            self.index_manifest.vacuum(
                self.vacuum_retain,
                extra_referenced=self._branch_referenced("index") | parent_refs,
            )
        if self.postings_manifest is not None:
            self.postings_manifest.vacuum(
                self.vacuum_retain,
                extra_referenced=self._branch_referenced("postings")
                | parent_refs,
            )

    # -- actor pool ------------------------------------------------------
    def _spawn_actors(self) -> list:
        pointers = {int(p): ptr for p, ptr in self.manifest.pointers().items()}
        # flush fan-out per actor: enough stateless flush tasks to cover the
        # cluster's cpus (the flush leg scales with the cluster, not the pool)
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        fanout = self.flush_fanout or max(1, round(cpus / self.num_actors))
        actors = []
        for i in range(self.num_actors):
            mine = {p: ptr for p, ptr in pointers.items() if p % self.num_actors == i}
            actors.append(
                PartitionMerger.options(num_cpus=self.actor_num_cpus).remote(
                    self.out_dir, mine, self.compact_every, fanout,
                    self.index_root, self.index_columns,
                    self.late_root, self.lateness_us,
                    self.postings_root, self.postings_column,
                    self.expect_root if self.expectations is not None else None,
                    self.expectations,
                    self.changefeed_preimages,
                    self._effective_schema_log(),
                    self.stats_columns,
                    self.fail_expectations,
                    compact_min_bytes_ratio=self.compact_min_bytes_ratio,
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

        Epochs run to completion IN ORDER (exchange -> fan-out flush ->
        commit); the flush's cluster-wide task fan-out supplies the
        parallelism, and per-epoch payload buffers keep concurrent pushes
        separable if a caller ever interleaves epochs.  Commits stay
        strictly ordered, so a crash leaves only uncommitted epochs, which
        simply replay.  On any Ray failure the pool is respawned (actors
        reload committed state) and the uncommitted suffix re-runs.

        The actor pool is torn down on exit unless ``keep_actors`` — leaked
        pools pin CPU reservations that starve later Dataset stages.
        """
        if epoch_files is None:
            assert events_dir is not None
            epoch_files = discover_epoch_files(events_dir)
        summary = {"epochs_run": 0, "epochs_skipped": 0, "events_raw": 0,
                   "events_applied": 0, "dup_lsn_dropped": 0,
                   "quarantined_late": 0, "expect_failed": 0, "wall_s": 0.0}
        t0 = time.perf_counter()
        # no overlapping runs against one output (reference: cron
        # concurrencyPolicy: Forbid); a crashed holder's lock self-releases
        self.manifest.acquire_run_lock()
        # dense-prefix resume rule: everything at or below the latest commit
        # is settled.  Committed epochs are a dense prefix for ordinary
        # tables (membership == <= latest); a BRANCH starts from one
        # re-committed record at its base epoch, and the rule makes its
        # history settled without materializing base-many filler records.
        def _hi() -> int:
            eps = self.manifest.committed_epochs()
            return eps[-1] if eps else -1

        hi0 = _hi()
        summary["epochs_skipped"] = sum(
            1 for e in range(len(epoch_files)) if e <= hi0
        )
        attempt = 0
        try:
            while True:
                hi = _hi()
                pending = [
                    (e, files)
                    for e, files in enumerate(epoch_files)
                    if e > hi
                ]
                if not pending:
                    break
                try:
                    if self._actors is None:
                        self._actors = self._spawn_actors()
                    self._run_pipelined(pending, summary)
                    break
                except ray.exceptions.RayError as err:
                    self._kill_actors()
                    # an expect_or_fail abort is deterministic — retrying
                    # replays the identical epoch into the identical error
                    if "ExpectationFailedError" in str(err):
                        raise
                    attempt += 1
                    if attempt > retries_per_epoch:
                        raise
        finally:
            self.manifest.release_run_lock()
            if not keep_actors:
                self._kill_actors()
        summary["wall_s"] = time.perf_counter() - t0
        return summary

    def _run_pipelined(self, pending: list[tuple[int, list[str]]], summary: dict) -> None:
        """Epoch loop.  Since the flush became a cluster-wide task fan-out
        (merger.flush launches, flush_result collects), flushing an 8M-row
        epoch costs well under a second of wall — so overlapping it with the
        NEXT epoch's exchange no longer pays: measured at the 16M shape the
        overlap contention inflated the exchange 2x (4.3s vs 2.07s) to hide
        ~0.5s of flush, a net loss.  Epochs therefore run to completion in
        order; the fan-out itself is the parallelism."""
        for epoch, files in pending:
            stats = self._exchange(epoch, files)
            flush_futures = [a.flush.remote(epoch) for a in self._actors]
            self._commit(epoch, flush_futures, stats, summary)

    def _exchange(self, epoch: int, files: list[str]) -> dict:
        t0 = time.perf_counter()
        if not files:
            # a pending epoch with no input files (e.g. a replicated source
            # epoch whose change set was empty) still commits — the resume
            # index stays dense — but exchanges nothing
            return {"rows_raw": 0, "rows_routed": 0, "exchange_s": 0.0}
        # routing parallelism == input shard count (epochs are directories of
        # moderate files).  Pin one block per shard: Ray's min-parallelism
        # heuristic otherwise re-splits blocks ~7x (SplitBlocks), which both
        # breaks read->route operator fusion and multiplies actor-push count
        # (and its per-message overhead) by the same factor.
        prev_min = ray.data.DataContext.get_current().read_op_min_num_blocks
        # the override must stay set through EXECUTION (take_all below), not
        # just dataset creation: Ray applies the SplitBlocks(~7x) min-
        # parallelism heuristic when the plan runs, which would break
        # read->route fusion and multiply actor pushes ~7x (measured: 231
        # blobs/actor instead of 33 at the 8M-event shape)
        ray.data.DataContext.get_current().read_op_min_num_blocks = 1
        try:
            # one block per shard file: full read->route fusion (no raw row
            # ever crosses the object store; SplitBlocks would split reads
            # into separate blocks and break the fusion)
            # partitioning=None: epochs are explicit FILE lists, never hive
            # layouts — inference would inject a spurious `part` column when
            # replication bootstrap feeds source chain files that live under
            # `part=NNNNN/` state directories
            ds = ray.data.read_parquet(
                files, override_num_blocks=len(files), partitioning=None
            )
            route_rows = ds.map_batches(
                partial(
                    _route_batch,
                    actors=self._actors,
                    num_actors=self.num_actors,
                    num_partitions=self.num_partitions,
                    turn_block=self.turn_block,
                    epoch=epoch,
                    transform=self.ingest_transform,
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
                # under full fusion the parquet reader feeds ~10k-row record
                # batches; batch_size=None would route each one (7000 tiny
                # actor pushes at the 8M shape).  An explicit shard-sized
                # batch coalesces back to ~one push set per shard while
                # keeping the read->route fusion.
                batch_size=131_072,
            ).take_all()
        finally:
            ray.data.DataContext.get_current().read_op_min_num_blocks = prev_min
        return {
            "rows_raw": sum(r["rows_raw"] for r in route_rows),
            "rows_routed": sum(r["rows_routed"] for r in route_rows),
            "exchange_s": time.perf_counter() - t0,
        }

    def _commit(self, epoch: int, flush_futures, stats: dict, summary: dict) -> dict:
        t1 = time.perf_counter()
        # phase 1 acks (launch confirmations), then phase 2 collects the
        # fan-out tasks' results
        ray.get(flush_futures)
        staged_maps = ray.get([a.flush_result.remote(epoch) for a in self._actors])
        pointers = self.manifest.pointers()
        per_part_metrics: dict[str, dict] = {}
        totals = {"events_in": 0, "dup_lsn_dropped": 0, "applied": 0,
                  "quarantined_late": 0, "expect_failed": 0}
        # record-level changefeed: this epoch's per-partition change files
        # (the ``cdf`` field is transient flush output, like late_delta —
        # it must NOT persist in the cumulative pointer map, where it would
        # outlive its epoch)
        changes: list[str] = []
        preimages: list[str] = []
        for staged in staged_maps:
            for p, ptr in staged.items():
                m = ptr.pop("metrics", {})
                cdf = ptr.pop("cdf", None)
                if cdf:
                    changes.append(cdf)
                pre = ptr.pop("pre", None)
                if pre:
                    preimages.append(pre)
                per_part_metrics[str(p)] = m
                for k in totals:
                    totals[k] += m.get(k, 0)
                pointers[str(p)] = ptr
        changes.sort()
        preimages.sort()
        commit_s = time.perf_counter() - t1
        metrics = {
            **totals,
            "rows_raw": stats["rows_raw"],
            "rows_routed": stats["rows_routed"],
            "partitions_touched": len(per_part_metrics),
            "exchange_apply_s": stats["exchange_s"],
            "commit_latency_s": commit_s,
            "per_partition": per_part_metrics,
        }
        partitioning = {
            "num_partitions": self.num_partitions,
            "turn_block": self.turn_block,
            "index_columns": self.index_columns,
            "lateness_us": self.lateness_us,
            "postings_column": self.postings_column,
            "changefeed_preimages": self.changefeed_preimages,
            "stats_columns": self.stats_columns,
        }
        # late-quarantine chain: accumulate this epoch's per-partition late
        # deltas (riding the flush pointers) onto the committed late map —
        # append-only audit table, never compacted or vacuumed
        late_pointers = None
        if self.late_manifest is not None:
            late_pointers = self.late_manifest.pointers()
            for p, ptr in pointers.items():
                lp = ptr.pop("late_delta", None)
                if lp:
                    entry = late_pointers.setdefault(p, {"deltas": []})
                    if lp not in entry["deltas"]:
                        entry["deltas"].append(lp)
        else:
            for ptr in pointers.values():
                ptr.pop("late_delta", None)
        # expectation-quarantine chain: same append-only accumulation shape
        # as the lateness audit chain
        expect_pointers = None
        if self.expectations is not None and self.expect_manifest is not None:
            expect_pointers = self.expect_manifest.pointers()
            for p, ptr in pointers.items():
                ep = ptr.pop("expect_delta", None)
                if ep:
                    entry = expect_pointers.setdefault(p, {"deltas": []})
                    if ep not in entry["deltas"]:
                        entry["deltas"].append(ep)
        else:
            for ptr in pointers.values():
                ptr.pop("expect_delta", None)
        manifests: dict[str, "Manifest"] = {"live": self.manifest}
        records: dict[str, dict] = {
            "live": {"partitions": pointers, "metrics": metrics,
                     "partitioning": partitioning, "changes": changes}
        }
        if self._schema_log_override is not None:
            # replication: commit the source's schema history with every
            # mirrored epoch (None = carry the local log forward as usual)
            records["live"]["schema_log"] = self._schema_log_override
        if self.changefeed_preimages:
            records["live"]["preimages"] = preimages
        if self.index_manifest is not None:
            # covering index: the mirrored file chains publish in the same
            # transaction — a crash can never expose tables at different
            # epochs (state/txn.py write-ahead protocol)
            manifests["index"] = self.index_manifest
            records["index"] = {
                "partitions": {p: self._index_ptr(ptr) for p, ptr in pointers.items()},
                "metrics": {"mirror_of": self.out_dir},
                "partitioning": partitioning,
            }
        if self.late_manifest is not None:
            manifests["late"] = self.late_manifest
            records["late"] = {
                "partitions": late_pointers,
                "metrics": {"quarantined_late": metrics.get("quarantined_late", 0)},
                "partitioning": partitioning,
            }
        if self.postings_manifest is not None:
            # mirrored chain like the covering index: pure path transform
            manifests["postings"] = self.postings_manifest
            records["postings"] = {
                "partitions": {
                    p: self._reroot_ptr(ptr, self.postings_root)
                    for p, ptr in pointers.items()
                },
                "metrics": {"mirror_of": self.out_dir},
                "partitioning": partitioning,
            }
        if expect_pointers is not None:
            manifests["expect"] = self.expect_manifest
            records["expect"] = {
                "partitions": expect_pointers,
                "metrics": {"expect_failed": metrics.get("expect_failed", 0)},
                "partitioning": partitioning,
            }
        if len(manifests) == 1:
            self.manifest.commit(
                epoch, pointers, metrics, partitioning, changes=changes,
                preimages=preimages if self.changefeed_preimages else None,
                schema_log=self._schema_log_override,
            )
        else:
            self.txn.commit(epoch, manifests, records)
        if self.vacuum_retain is not None:
            # after the commit: anything the newest vacuum_retain manifests
            # don't reference is unreachable (resume reads only the latest)
            self._vacuum_chains()
        summary["epochs_run"] += 1
        summary["events_raw"] += stats["rows_raw"]
        summary["events_applied"] += totals["applied"]
        summary["dup_lsn_dropped"] += totals["dup_lsn_dropped"]
        summary["quarantined_late"] += totals["quarantined_late"]
        summary["expect_failed"] += totals["expect_failed"]
        return metrics

    def tail(
        self,
        events_dir: str,
        poll_s: float = 2.0,
        max_idle_polls: int = 3,
        max_epochs: int | None = None,
    ) -> dict:
        """Follow mode — the binlog/WAL *tail* of the north rule: poll
        ``events_dir`` for newly-landed complete epochs and apply them as
        they appear, reusing one warm actor pool across polls.  Stops after
        ``max_idle_polls`` consecutive empty polls (or ``max_epochs``).
        Producers signal epoch completeness with ``events-epoch-N.done``
        markers (see discover_epoch_files)."""
        totals = {"epochs_run": 0, "epochs_skipped": 0, "events_raw": 0,
                  "events_applied": 0, "dup_lsn_dropped": 0,
                  "quarantined_late": 0, "polls": 0, "wall_s": 0.0}
        t0 = time.perf_counter()
        idle = 0
        # hold the run lock across the whole tail (Forbid semantics for the
        # full follow session, not just each poll); run() re-enters it
        self.manifest.acquire_run_lock()
        try:
            while idle < max_idle_polls:
                s = self.run(events_dir, keep_actors=True)
                totals["polls"] += 1
                for k in ("epochs_run", "events_raw", "events_applied",
                          "dup_lsn_dropped", "quarantined_late"):
                    totals[k] += s[k]
                if max_epochs is not None and totals["epochs_run"] >= max_epochs:
                    break
                if s["epochs_run"] == 0:
                    idle += 1
                    time.sleep(poll_s)
                else:
                    idle = 0
        finally:
            self.manifest.release_run_lock()
            self._kill_actors()
        totals["wall_s"] = time.perf_counter() - t0
        return totals

    # -- read side -------------------------------------------------------
    def _reroot_ptr(self, ptr: dict, root: str) -> dict:
        """Sibling-table pointer = path transform of the live pointer: the
        flush writes each projected file under the SAME relative path below
        the sibling root, so no second pointer bookkeeping exists to drift.

        The transform is LOCAL to each file — the sibling dir slots between
        whatever table root owns the file and its ``part=`` dir — so a
        BRANCH pointer that still references the parent table's shared
        files maps to the parent's own sibling twin (which is where the
        projected file physically exists)."""
        sub = os.path.basename(os.path.normpath(root))

        def reroot(p):
            if not p:
                return p
            d, fname = os.path.split(p)
            table_root, partseg = os.path.split(d)
            return os.path.join(table_root, sub, partseg, fname)

        out = dict(ptr)
        out["base"] = reroot(ptr.get("base"))
        out["deltas"] = [reroot(d) for d in ptr.get("deltas", [])]
        return out

    def _index_ptr(self, ptr: dict) -> dict:
        return self._reroot_ptr(ptr, self.index_root)

    def partition_files(self, epoch: int | None = None) -> dict[int, dict]:
        """part -> {base, deltas} from the latest manifest, or — time
        travel — from the manifest of a specific committed ``epoch``: each
        manifest carries the CUMULATIVE pointer map, so one historical JSON
        read reconstructs the table exactly as of that commit (valid while
        vacuum retention covers the epoch; ``Manifest.vacuum`` retains the
        newest ``retain_epochs`` manifests' files)."""
        rec = (
            self.manifest.latest()
            if epoch is None
            else self.manifest.read_epoch(epoch)
        )
        pointers = dict(rec["partitions"]) if rec else {}
        return {
            int(p): {"base": ptr.get("base"), "deltas": list(ptr.get("deltas", []))}
            for p, ptr in pointers.items()
        }

    def index_dataset(
        self, epoch: int | None = None, columns: list[str] | None = None
    ) -> "ray.data.Dataset":
        """Streaming live view of the COVERING INDEX table: the same
        merge-on-read path as ``final_dataset`` over the mirrored projected
        chain — stats/lookup queries over the key + configured payload subset
        read a table ~the projection's fraction of the live table's bytes
        and never touch the wide payload columns."""
        if self.index_manifest is None:
            raise ValueError("engine has no covering index (index_columns unset)")
        rec = (
            self.index_manifest.latest()
            if epoch is None
            else self.index_manifest.read_epoch(epoch)
        )
        pointers = dict(rec["partitions"]) if rec else {}
        parts = {
            int(p): {"base": ptr.get("base"), "deltas": list(ptr.get("deltas", []))}
            for p, ptr in pointers.items()
        }
        return self._merge_on_read(parts, columns)

    def lookup(
        self,
        conv_ids: list[str],
        columns: list[str] | None = None,
        max_turn: int | None = None,
        epoch: int | None = None,
    ) -> "ray.data.Dataset":
        """Point lookup with PARTITION PRUNING: the partition id is a pure
        function of ``(conv_id, turn_idx // turn_block)``, so a
        conversation's rows can only live in the ≤ ``max_turn//turn_block+1``
        partitions its salted sub-keys map to — at 64 Ki partitions a
        single-conversation read touches ~64 of them, not the table.

        The turn bound derives from COMMITTED metadata: every flush tracks
        the partition's ``turn_hi`` high-water mark, so the default probes
        exactly the turn range the table can contain — no silent truncation
        for long conversations.  An explicit ``max_turn`` narrows the probe
        (a deliberate prefix read) and warns if the table holds higher
        turns; chains committed before turn_hi existed fall back to 4096
        with a warning.  Returns the live rows of the requested
        conversations only (merge-on-read + exact conv filter), with
        optional ``columns`` projection pushdown."""
        import warnings
        import zlib

        import numpy as np

        from encode_ingest_ray.state.partition import mix_partition

        rec = (
            self.manifest.latest()
            if epoch is None
            else self.manifest.read_epoch(epoch)
        )
        pointers = dict(rec["partitions"]) if rec else {}
        his = [
            int(p["turn_hi"])
            for p in pointers.values()
            if p.get("turn_hi") is not None
        ]
        committed_hi = max(his) if his else None
        if max_turn is None:
            if committed_hi is None:
                if pointers:
                    warnings.warn(
                        "table predates turn_hi pointer metadata; probing "
                        "turns 0..4096 — pass max_turn explicitly for "
                        "longer conversations"
                    )
                max_turn = 4096
            else:
                max_turn = committed_hi
        elif committed_hi is not None and committed_hi > max_turn:
            warnings.warn(
                f"lookup bounded at max_turn={max_turn} but the table holds "
                f"turns up to {committed_hi}; higher turns are not probed"
            )
        tbs = np.arange(0, max_turn // self.turn_block + 1, dtype=np.uint64)
        turns = (tbs * np.uint64(self.turn_block)).astype(np.int64)
        cand: set[int] = set()
        for c in conv_ids:
            h = np.full(len(turns), zlib.crc32(c.encode("utf-8")), np.uint64)
            cand.update(
                mix_partition(h, turns, self.num_partitions, self.turn_block)
                .astype(int)
                .tolist()
            )
        parts = {
            int(p): {"base": ptr.get("base"), "deltas": list(ptr.get("deltas", []))}
            for p, ptr in pointers.items()
            if int(p) in cand
        }
        ds = self._merge_on_read(
            parts, columns, schema_log=list((rec or {}).get("schema_log") or [])
        )
        want = pa.array(sorted(set(conv_ids)), pa.string())

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("conv_id"), value_set=want))

        return ds.map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    def search(
        self,
        tokens: list[str],
        epoch: int | None = None,
        require_all: bool = False,
    ) -> "ray.data.Dataset":
        """Full-text search over the LIVE table via the engine-maintained
        postings index: returns ``(token, conv_id, turn_idx, ts)`` for every
        live row whose indexed column contains a query token —
        ``require_all=True`` keeps only rows containing EVERY query token
        (a key's postings live in one partition, so the AND-intersection is
        in-task).

        Entirely PARTITION-LOCAL (no exchange): the postings chain mirrors
        the key chain's partitioning, so each task reads one partition's
        postings (parquet predicate on the SORTED token column — row-group
        stats prune) plus that partition's key chain (covering index when
        configured, else the main chain with a key/meta projection), and
        validity-joins on (conv_id, turn_idx, lsn) — a posting whose version
        was superseded or tombstoned never matches, so the log-structured
        index needs no retraction records."""
        if self.postings_manifest is None:
            raise ValueError("engine has no postings index (postings_column unset)")
        toks = sorted({t.lower() for t in tokens})
        rec = (
            self.postings_manifest.latest()
            if epoch is None
            else self.postings_manifest.read_epoch(epoch)
        )
        post = {int(p): ptr for p, ptr in (rec["partitions"] if rec else {}).items()}
        key_manifest = self.index_manifest or self.manifest
        krec = (
            key_manifest.latest() if epoch is None else key_manifest.read_epoch(epoch)
        )
        keys = {int(p): ptr for p, ptr in (krec["partitions"] if krec else {}).items()}
        items = [
            {
                "post_base": ptr.get("base") or "",
                "post_deltas": list(ptr.get("deltas", [])),
                "key_base": keys[p].get("base") or "",
                "key_deltas": list(keys[p].get("deltas", [])),
            }
            for p, ptr in sorted(post.items())
            if p in keys
        ]
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
        if not items:
            return ray.data.from_items([]).map_batches(lambda t: empty)

        def probe(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            from encode_ingest_ray.state.merger import load_partition_state

            out = []
            for row in batch.to_pylist():
                files = ([row["post_base"]] if row["post_base"] else []) + row[
                    "post_deltas"
                ]
                cands = [
                    pq.read_table(f, filters=[("token", "in", toks)])
                    for f in files
                ]
                cands = [c for c in cands if c.num_rows]
                if not cands:
                    continue
                cand = pa.concat_tables(cands)
                state = load_partition_state(
                    {"base": row["key_base"] or None,
                     "deltas": list(row["key_deltas"])},
                    columns=[],  # key + merge metadata only
                )
                if state is None or state.num_rows == 0:
                    continue
                live = state.filter(
                    pc.not_equal(state.column("op"), pa.scalar("delete"))
                ).select(["conv_id", "turn_idx", "lsn", "ts"])
                hit = cand.join(
                    live, keys=["conv_id", "turn_idx", "lsn"], join_type="inner"
                )
                if hit.num_rows and require_all and len(toks) > 1:
                    per_key = hit.group_by(["conv_id", "turn_idx"]).aggregate(
                        [("token", "count_distinct")]
                    )
                    full = per_key.filter(
                        pc.equal(per_key.column("token_count_distinct"),
                                 pa.scalar(len(toks)))
                    ).select(["conv_id", "turn_idx"])
                    hit = hit.join(
                        full, keys=["conv_id", "turn_idx"], join_type="inner"
                    )
                if hit.num_rows:
                    out.append(hit.select(["token", "conv_id", "turn_idx", "ts"]))
            if not out:
                return empty
            return pa.concat_tables(out)

        return ray.data.from_items(items).map_batches(
            probe, batch_size=1, batch_format="pyarrow"
        )

    def search_ranked(
        self, tokens: list[str], epoch: int | None = None
    ) -> "ray.data.Dataset":
        """BM25-ranked retrieval over the postings index, EXACT in
        round-half-up micro units: every per-token contribution
        ``idf · tf·(k1+1) / (tf + k1·(1−b + b·dl·N/Σdl))`` (k1=1.2, b=0.75)
        is FLOOR-rounded before the per-document sum, with one scalar libm
        log per distinct df — the same order-independent integer encoding
        as the entropy/PSI oracles, so a SQL brute-force scan reproduces
        the ranking bit-for-bit.

        Plan: (1) corpus stats (N, Σdl) read straight off the manifest
        pointers — the flush maintains them exactly per partition by
        LWW-folding the narrow doclens sidecar chain (state/merger.py
        project_doclens/doc_stats_of), so no pre-scan runs (pre-sidecar
        chains fall back to the exact validity-joined scan); (2) the
        partition-local validity probe (as ``search``) returning hits with
        (tf, dl); (3) tiny df reduce per query token; (4) a vectorized
        scoring pass + one (conv, turn) combine exchange of score partials.
        """
        import math

        import numpy as np

        from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

        if self.postings_manifest is None:
            raise ValueError("engine has no postings index (postings_column unset)")
        toks = sorted({t.lower() for t in tokens})
        rec = (
            self.postings_manifest.latest()
            if epoch is None
            else self.postings_manifest.read_epoch(epoch)
        )
        post = {int(p): ptr for p, ptr in (rec["partitions"] if rec else {}).items()}
        key_manifest = self.index_manifest or self.manifest
        krec = (
            key_manifest.latest() if epoch is None else key_manifest.read_epoch(epoch)
        )
        keys = {int(p): ptr for p, ptr in (krec["partitions"] if krec else {}).items()}
        items = [
            {
                "post_base": ptr.get("base") or "",
                "post_deltas": list(ptr.get("deltas", [])),
                "key_base": keys[p].get("base") or "",
                "key_deltas": list(keys[p].get("deltas", [])),
            }
            for p, ptr in sorted(post.items())
            if p in keys
        ]
        hits_empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        out_empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "score_micro": pa.array([], pa.int64()),
            }
        )
        if not items:
            return ray.data.from_items([]).map_batches(lambda t: out_empty)

        def _valid(row, columns, filters=None):
            import pyarrow.parquet as pq

            from encode_ingest_ray.state.merger import load_partition_state

            files = ([row["post_base"]] if row["post_base"] else []) + row[
                "post_deltas"
            ]
            parts = []
            for f in files:
                have = set(pq.read_schema(f).names)
                missing = [c for c in columns if c not in have]
                if missing:
                    raise ValueError(
                        f"postings file {f!r} lacks {missing} — the chain "
                        "predates the ranking signals; rebuild it with "
                        "migrate(force=True)"
                    )
                t = pq.read_table(f, columns=columns, filters=filters)
                if t.num_rows:
                    parts.append(t)
            if not parts:
                return None
            cand = pa.concat_tables(parts)
            state = load_partition_state(
                {"base": row["key_base"] or None, "deltas": list(row["key_deltas"])},
                columns=[],
            )
            if state is None or state.num_rows == 0:
                return None
            live = state.filter(
                pc.not_equal(state.column("op"), pa.scalar("delete"))
            ).select(["conv_id", "turn_idx", "lsn"])
            hit = cand.join(live, keys=["conv_id", "turn_idx", "lsn"], join_type="inner")
            return hit if hit.num_rows else None

        # corpus stats (N, Σdl) come off the MANIFEST POINTERS: the flush
        # maintains exact per-partition doc_stats by LWW-folding the narrow
        # doclens sidecar chain, so a ranked search issues no corpus
        # pre-scan at all.  Chains committed before the sidecar existed
        # (any pointer missing doc_stats) fall back to the exact
        # validity-joined scan — same numbers, paid at read time.
        ptr_stats = [
            ptr.get("doc_stats")
            for _, ptr in sorted(post.items())
        ]
        if ptr_stats and all(s is not None for s in ptr_stats):
            n_docs = sum(s["n"] for s in ptr_stats)
            sum_dl = sum(s["s"] for s in ptr_stats)
        else:

            def stats(batch: pa.Table) -> pa.Table:
                n = s = 0
                for row in batch.to_pylist():
                    hit = _valid(row, ["conv_id", "turn_idx", "lsn", "dl"])
                    if hit is None:
                        continue
                    d = hit.group_by(["conv_id", "turn_idx", "lsn", "dl"]).aggregate([])
                    n += d.num_rows
                    s += int(pc.sum(d.column("dl")).as_py() or 0)
                return pa.table({"n": pa.array([n], pa.int64()),
                                 "s": pa.array([s], pa.int64())})

            stat_rows = (
                ray.data.from_items(items)
                .map_batches(stats, batch_size=1, batch_format="pyarrow")
                .take_all()
            )
            n_docs = sum(r["n"] for r in stat_rows)
            sum_dl = sum(r["s"] for r in stat_rows)
        if n_docs == 0:
            return ray.data.from_items([]).map_batches(lambda t: out_empty)

        def probe(batch: pa.Table) -> pa.Table:
            out = []
            for row in batch.to_pylist():
                hit = _valid(
                    row,
                    ["token", "conv_id", "turn_idx", "lsn", "tf", "dl"],
                    filters=[("token", "in", toks)],
                )
                if hit is not None:
                    out.append(
                        hit.select(["conv_id", "turn_idx", "token", "tf", "dl"])
                    )
            return pa.concat_tables(out) if out else hits_empty

        hits = (
            ray.data.from_items(items)
            .map_batches(probe, batch_size=1, batch_format="pyarrow")
            .materialize()  # consumed twice: df reduce + scoring
        )
        df_parts = hits.map_batches(
            lambda t: t.group_by(["token"]).aggregate([([], "count_all")])
            .rename_columns(["token", "df"]),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        ).take_all()
        df_of: dict[str, int] = {}
        for r in df_parts:
            df_of[r["token"]] = df_of.get(r["token"], 0) + r["df"]
        # one libm log per distinct df — mirror the oracle's expression order
        idf_of = {
            t: math.log((n_docs - d + 0.5) / (d + 0.5)) for t, d in df_of.items()
        }
        idf_ref = ray.put((np.array(sorted(idf_of), dtype=object),
                           np.array([idf_of[t] for t in sorted(idf_of)], np.float64)))

        def score(t: pa.Table) -> pa.Table:
            ts_, iv = ray.get(idf_ref)
            tok_np = np.array(t.column("token").to_pylist(), dtype=object)
            idf = iv[np.searchsorted(ts_, tok_np)]
            tf = t.column("tf").combine_chunks().to_numpy(zero_copy_only=False)
            dl = t.column("dl").combine_chunks().to_numpy(zero_copy_only=False)
            term = np.floor(
                idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n_docs / sum_dl))
                * 1000000 + 0.5
            ).astype(np.int64)
            pre = pa.table(
                {
                    "conv_id": t.column("conv_id"),
                    "turn_idx": t.column("turn_idx"),
                    "score_micro": pa.array(term),
                }
            )
            g = pre.group_by(["conv_id", "turn_idx"]).aggregate(
                [("score_micro", "sum")]
            )
            return g.rename_columns(["conv_id", "turn_idx", "score_micro"])

        def combine(t: pa.Table) -> pa.Table:
            g = t.group_by(["conv_id", "turn_idx"]).aggregate(
                [("score_micro", "sum")]
            )
            return g.rename_columns(["conv_id", "turn_idx", "score_micro"])

        scored = hits.map_batches(
            score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        return bucketed_groupby_apply(scored, ["conv_id", "turn_idx"], combine, 16)

    def delete_where(self, predicate, columns: list[str] | None = None) -> dict:
        """Retention / right-to-be-forgotten delete THROUGH the exactly-once
        path: scan the live table, emit one LWW tombstone per matching key
        as a synthetic change epoch, and apply it with the normal
        ``run()`` machinery (watermarks, atomic manifest, resume, index and
        quarantine siblings all behave as for any other epoch).

        ``predicate(table) -> BooleanArray`` sees live rows (pass
        ``columns`` to bound what payload the scan decodes — key/merge
        columns ride along regardless).  Each tombstone carries
        ``ts = row.ts + 1µs`` (beats its own key's live version in the LWW
        order, independent of other keys) and ``lsn = global lsn_hi + 1``
        (clears every partition's watermark).  Deterministic: a crashed
        job re-scans the unchanged committed state and re-stages identical
        tombstones; in-epoch duplicates collapse in the LWW reduce.

        Returns the run summary plus ``tombstones``.  Reference analog: the
        conditional soft-delete leg of the per-table sync
        (/root/reference/orchestration/templates/ingest-processed-data.yaml
        :117-145), generalized to an arbitrary predicate."""
        import shutil

        committed = self.manifest.committed_epochs()
        if not committed:
            return {"tombstones": 0, "epochs_run": 0}
        pointers = self.manifest.pointers().values()
        lsn_hi = max(int(p.get("lsn_hi", -1)) for p in pointers)
        # lift tombstone event time to the global applied high-water mark:
        # per-key the LWW still resolves to the tombstone (ts >= the key's
        # live ts, and lsn_hi+1 beats any tie), and under an allowed-lateness
        # bound the tombstones can never be quarantined as late
        ts_floor = max((int(p.get("ts_hi") or 0) for p in pointers), default=0)
        scan_cols = None
        if columns is not None:
            scan_cols = list(dict.fromkeys(["conv_id", "turn_idx", "ts"] + columns))

        def mark(t: pa.Table) -> pa.Table:
            sel = t.filter(predicate(t))
            n = sel.num_rows
            ts = pc.max_element_wise(
                pc.add(pc.cast(sel.column("ts"), pa.int64()), 1),
                pa.scalar(ts_floor, pa.int64()),
            )
            return pa.table(
                {
                    "conv_id": sel.column("conv_id"),
                    "turn_idx": sel.column("turn_idx"),
                    "ts": pc.cast(ts, pa.timestamp("us")),
                    "op": pa.array(["delete"] * n, pa.string()),
                    "lsn": pa.array([lsn_hi + 1] * n, pa.int64()),
                }
            )

        tomb = self.final_dataset(columns=scan_cols).map_batches(
            mark, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()
        n_tomb = tomb.count()
        if n_tomb == 0:
            return {"tombstones": 0, "epochs_run": 0}
        epoch = len(committed)
        tomb_dir = os.path.join(self.out_dir, "_retention", f"epoch-{epoch:06d}")
        shutil.rmtree(tomb_dir, ignore_errors=True)
        tomb.write_parquet(tomb_dir)
        files = sorted(glob.glob(os.path.join(tomb_dir, "*.parquet")))
        # tombstones are ENGINE-authored, not source events: the ingest
        # transform (which may touch payload columns the tombstones lack)
        # must not see them
        saved_transform = self.ingest_transform
        self.ingest_transform = None
        try:
            summary = self.run(epoch_files=[[] for _ in committed] + [files])
        finally:
            self.ingest_transform = saved_transform
        summary["tombstones"] = n_tomb
        return summary

    def late_dataset(self) -> "ray.data.Dataset":
        """The append-only quarantine audit table: RAW change events (op +
        lsn kept, no LWW collapse) whose event time fell more than
        ``lateness_us`` behind their partition's applied high-water mark.
        Downstream consumers triage or re-drive them explicitly — replaying
        them through a fresh engine WITHOUT a lateness bound merges them
        back (LWW(live-deltas ∪ late) == LWW(all), the invariant
        tests/test_lateness.py pins)."""
        from encode_ingest_ray.schema import align_to_schema, unify_schemas

        if self.late_manifest is None:
            raise ValueError("engine has no lateness bound (lateness_us unset)")
        files = [
            d
            for ptr in self.late_manifest.pointers().values()
            for d in ptr.get("deltas", [])
        ]
        if not files:
            return ray.data.from_items([])
        unified = None
        for f in files:
            import pyarrow.parquet as pq

            s = pq.read_schema(f)
            unified = s if unified is None else unify_schemas(unified, s)

        def read_file(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            tabs = [
                align_to_schema(pq.read_table(row["path"]), unified)
                for row in batch.to_pylist()
            ]
            return pa.concat_tables(tabs) if tabs else unified.empty_table()

        return ray.data.from_items([{"path": f} for f in files]).map_batches(
            read_file, batch_size=1, batch_format="pyarrow"
        )

    def expect_dataset(self) -> "ray.data.Dataset":
        """The expectation-quarantine audit table: each key's epoch-winning
        version that FAILED an ingest expectation (op + lsn kept), tagged
        with the first-failing rule name in ``reason``.  Append-only, like
        the lateness audit chain; triage, fix and re-drive the rows through
        a later epoch to apply them (their lsns already advanced the
        watermark, so re-driving needs fresh lsns — the same contract as
        any corrected upstream event)."""
        from encode_ingest_ray.schema import align_to_schema, unify_schemas

        if self.expect_manifest is None:
            raise ValueError(
                "engine has no expectations (and no committed expect chain)"
            )
        files = [
            d
            for ptr in self.expect_manifest.pointers().values()
            for d in ptr.get("deltas", [])
        ]
        if not files:
            return ray.data.from_items([])
        import pyarrow.parquet as pq

        unified = None
        for f in files:
            s = pq.read_schema(f)
            unified = s if unified is None else unify_schemas(unified, s)

        def read_file(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            tabs = [
                align_to_schema(pq.read_table(row["path"]), unified)
                for row in batch.to_pylist()
            ]
            return pa.concat_tables(tabs) if tabs else unified.empty_table()

        return ray.data.from_items([{"path": f} for f in files]).map_batches(
            read_file, batch_size=1, batch_format="pyarrow"
        )

    # -- changefeed (consumable CDC stream) ------------------------------
    def changes(
        self, since_epoch: int = -1, to_epoch: int | None = None
    ) -> "ray.data.Dataset":
        """The change stream for epochs in ``(since_epoch, to_epoch]`` —
        the per-epoch LWW-folded rows each commit applied (tombstones
        included, ``op='delete'``), tagged with an ``epoch`` column.  This
        is the Delta-Lake-CDF / Debezium-topic analog: downstream systems
        sync incrementally in O(changes), never O(table).

        Every manifest records its epoch's change files in a record-level
        ``changes`` list (state/manifest.py); on non-compaction epochs the
        file IS the pointer-chain delta (zero extra writes), compaction
        epochs pay one extra small file so the feed stays gap-free.  The
        horizon is vacuum retention: epochs whose files were vacuumed raise
        ``ChangefeedHorizonError`` — a lagging consumer re-syncs from a
        snapshot (``final_dataset``), exactly the Delta CDF rule.

        Driver cost: one manifest JSON + one parquet footer per change file
        in the window (incremental windows are a handful of epochs); file
        reads and schema alignment run as Ray tasks.
        """
        from encode_ingest_ray.schema import align_to_schema, unify_schemas
        from encode_ingest_ray.state.schemalog import map_schema, map_table

        items = self._change_items(since_epoch, to_epoch)
        if not items:
            return ray.data.from_items([])
        import pyarrow.parquet as pq

        # the stream is LOGICAL: pre-rename epochs' files map to current
        # names (a change file of epoch e maps with file-epoch e)
        log = self.schema_log()
        unified = None
        for it in items:
            s = map_schema(pq.read_schema(it["path"]), it["epoch"], log)
            unified = s if unified is None else unify_schemas(unified, s)

        def read_change_file(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            tabs = []
            for row in batch.to_pylist():
                t = map_table(pq.read_table(row["path"]), row["epoch"], log)
                t = align_to_schema(t, unified)
                tabs.append(t.add_column(
                    0, pa.field("epoch", pa.int64()),
                    pa.array([row["epoch"]] * t.num_rows, pa.int64()),
                ))
            return pa.concat_tables(tabs)

        return ray.data.from_items(items).map_batches(
            read_change_file, batch_size=1, batch_format="pyarrow"
        )

    def changes_cdf(
        self, since_epoch: int = -1, to_epoch: int | None = None
    ) -> "ray.data.Dataset":
        """The retraction-capable change stream (Delta-CDF "full" analog):
        every change row tagged ``_change_type`` ∈ {insert,
        update_preimage, update_postimage, delete} plus ``epoch``.
        Requires the table to have run with ``changefeed_preimages=True``
        for the whole window (each commit then stores an update-preimage
        sidecar next to its change file); epochs without preimage records
        raise ``ChangefeedHorizonError`` — tagging updates as inserts
        would silently corrupt a downstream incremental MV.

        Semantics per epoch and key (one winner per epoch, post-LWW):
        new key → postimage tagged ``insert``; existing live key updated →
        OLD row tagged ``update_preimage`` + new row ``update_postimage``;
        existing live key tombstoned → OLD row tagged ``delete``; a
        tombstone on an absent key is a no-op and emits nothing.  The
        telescoping invariant downstream MVs rely on:
        Σ(post-rows) − Σ(pre-rows) per key over any prefix of epochs ==
        the live table — signed aggregation of the stream maintains any
        sum/count-shaped view in O(changes) with no table rescans.
        """
        from encode_ingest_ray.schema import align_to_schema, unify_schemas
        from encode_ingest_ray.state.schemalog import map_schema, map_table

        log = self.schema_log()
        epochs = self.manifest.committed_epochs()
        want = [
            e for e in epochs
            if e > since_epoch and (to_epoch is None or e <= to_epoch)
        ]
        items: list[dict] = []
        paths_for_schema: list[tuple[str, int]] = []
        for e in want:
            rec = self.manifest.read_epoch(e)
            ch = rec.get("changes")
            pre = rec.get("preimages")
            if ch is None or pre is None:
                raise ChangefeedHorizonError(
                    f"epoch {e} has no CDF preimage record (committed "
                    "without changefeed_preimages=True, or rewritten); "
                    "re-sync downstream views from a snapshot"
                )
            missing = [f for f in list(ch) + list(pre) if not os.path.exists(f)]
            if missing:
                raise ChangefeedHorizonError(
                    f"CDF file {missing[0]!r} for epoch {e} was vacuumed "
                    f"(retain_epochs={self.vacuum_retain}); re-sync from a "
                    "snapshot"
                )
            pre_by_part = {
                int(re.search(r"part=(\d+)", f).group(1)): f for f in pre
            }
            for f in ch:
                part = int(re.search(r"part=(\d+)", f).group(1))
                # "" not None: from_items infers one schema across items
                items.append({"epoch": e, "delta": f,
                              "pre": pre_by_part.get(part, "")})
            paths_for_schema += [(f, e) for f in list(ch) + list(pre)]
        if not items:
            return ray.data.from_items([])
        import pyarrow.parquet as pq

        unified = None
        for f, e in paths_for_schema:
            s = map_schema(pq.read_schema(f), e, log)
            unified = s if unified is None else unify_schemas(unified, s)
        keys = ["conv_id", "turn_idx"]

        def tag(t: pa.Table, label: str, epoch: int) -> pa.Table:
            t = align_to_schema(t, unified)
            t = t.add_column(
                0, pa.field("epoch", pa.int64()),
                pa.array([epoch] * t.num_rows, pa.int64()),
            )
            return t.append_column(
                "_change_type", pa.array([label] * t.num_rows, pa.string())
            )

        def read_pair(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            out = []
            for row in batch.to_pylist():
                e = row["epoch"]
                d = map_table(pq.read_table(row["delta"]), e, log)
                live = d.filter(
                    pc.not_equal(d.column("op"), pa.scalar("delete"))
                )
                if not row["pre"]:
                    # no key this epoch touched previously existed live:
                    # everything applied is an insert; tombstones on absent
                    # keys are no-ops
                    if live.num_rows:
                        out.append(tag(live, "insert", e))
                    continue
                p = map_table(pq.read_table(row["pre"]), e, log)
                del_keys = d.filter(
                    pc.equal(d.column("op"), pa.scalar("delete"))
                ).select(keys)
                out.append(tag(
                    p.join(del_keys, keys=keys, join_type="left semi"),
                    "delete", e,
                ))
                out.append(tag(
                    p.join(del_keys, keys=keys, join_type="left anti"),
                    "update_preimage", e,
                ))
                prev_keys = p.select(keys)
                out.append(tag(
                    live.join(prev_keys, keys=keys, join_type="left semi"),
                    "update_postimage", e,
                ))
                out.append(tag(
                    live.join(prev_keys, keys=keys, join_type="left anti"),
                    "insert", e,
                ))
            out = [t for t in out if t.num_rows]
            if not out:
                sch = unified.insert(0, pa.field("epoch", pa.int64()))
                sch = sch.append(pa.field("_change_type", pa.string()))
                return sch.empty_table()
            return pa.concat_tables(out)

        return ray.data.from_items(items).map_batches(
            read_pair, batch_size=1, batch_format="pyarrow"
        )

    def _change_items(
        self, since_epoch: int, to_epoch: int | None
    ) -> list[dict]:
        """(epoch, path) list for the window ``(since_epoch, to_epoch]`` —
        raises ChangefeedHorizonError when any requested epoch's files are
        gone (pre-feature manifest or vacuumed)."""
        epochs = self.manifest.committed_epochs()
        want = [
            e for e in epochs
            if e > since_epoch and (to_epoch is None or e <= to_epoch)
        ]
        items: list[dict] = []
        for e in want:
            rec = self.manifest.read_epoch(e)
            ch = rec.get("changes")
            if ch is None:
                raise ChangefeedHorizonError(
                    f"epoch {e} carries no changefeed record (committed "
                    "before the feed existed, or rewritten); re-sync the "
                    "consumer from a snapshot (final_dataset) and restart "
                    f"the feed past epoch {e}"
                )
            for f in ch:
                if not os.path.exists(f):
                    raise ChangefeedHorizonError(
                        f"changefeed file {f!r} for epoch {e} was vacuumed "
                        f"(retain_epochs={self.vacuum_retain}); the consumer "
                        "lags past the feed horizon — re-sync from a snapshot"
                    )
                items.append({"epoch": e, "path": f})
        return items

    _CONSUMER_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")

    def _consumer_path(self, name: str) -> str:
        if not self._CONSUMER_RE.match(name):
            raise ValueError(
                f"consumer name {name!r} must match {self._CONSUMER_RE.pattern}"
            )
        return os.path.join(self.out_dir, "_consumers", f"{name}.json")

    def consumer_epoch(self, name: str) -> int:
        """Last epoch this consumer group acknowledged (-1 = new consumer,
        next consume delivers from the first committed epoch = the initial
        snapshot load, all inserts)."""
        return self._consumer_state(name)[0]

    def _consumer_state(self, name: str) -> tuple[int, int | None]:
        """(last acked epoch, pinned restore_gen).  gen is None for a
        pre-fencing checkpoint (written before restore_gen pinning existed)
        or a brand-new consumer."""
        path = self._consumer_path(name)
        if not os.path.exists(path):
            return -1, None
        with open(path) as f:
            st = json.load(f)
        gen = st.get("restore_gen")
        return int(st["epoch"]), (None if gen is None else int(gen))

    def ack(self, name: str, epoch: int, *, gen: int | None = None) -> None:
        """Advance a consumer checkpoint (atomic tmp+rename — a torn write
        can never half-advance).  ``consume`` calls this after delivery;
        custom consumers over ``changes()`` call it themselves once their
        downstream effect is durable.

        The checkpoint pins the table's CURRENT ``restore_gen`` (the same
        fencing token ``replicate_from`` pins in _replication/cursor.json):
        a later ``restore()`` bumps the generation, and a fully-caught-up
        consumer — whose next window would otherwise never cross the
        restore commit's missing ``changes`` record — is refused by
        ``consume`` instead of silently diverging (its downstream still
        holds rows from the discarded epochs, with no retraction).

        ``gen`` pins the generation the delivered window was READ under;
        ``consume`` passes its own top-of-call read so a restore landing
        between delivery and ack cannot launder the fence (re-reading here
        would pin the POST-restore generation over pre-restore rows).
        Custom consumers calling ack directly should pass the generation
        they read their window under; omitting it keeps the old read-now
        behavior."""
        path = self._consumer_path(name)
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        if gen is None:
            gen = int((self.manifest.latest() or {}).get("restore_gen", 0) or 0)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-ack-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"epoch": int(epoch), "restore_gen": gen,
                           "updated_unix": time.time()}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def consume(
        self, name: str, dest: str, max_epochs: int | None = None
    ) -> dict:
        """Consumer-group delivery: write every change file past the
        checkpoint into ``dest`` (one parquet per source file at a
        DETERMINISTIC path keyed by epoch+partition), then advance the
        checkpoint.  A crash anywhere before the ack makes the rerun
        overwrite the same bytes — at-least-once work, exactly-once end
        state, no coordination.  ``max_epochs`` bounds one call's window
        (pagination for a consumer far behind)."""
        since, pinned = self._consumer_state(name)
        cur_gen = int(
            (self.manifest.latest() or {}).get("restore_gen", 0) or 0
        )
        if pinned is not None and pinned != cur_gen:
            # restore() rewrote history since this consumer's last ack.  A
            # lagging consumer would hit the restore commit's missing
            # ``changes`` record and raise, but a CAUGHT-UP one would
            # silently resume on top of rows its downstream holds from the
            # now-discarded epochs — fence it here (same restore_gen token
            # replicate_from pins), directing a snapshot re-sync.
            raise ChangefeedHorizonError(
                f"consumer {name!r} acked under restore_gen {pinned} but "
                f"the table was restored since (restore_gen {cur_gen}); "
                "its delivered rows may include discarded epochs with no "
                "retraction — re-sync the consumer from a snapshot "
                "(final_dataset), then delete its checkpoint under "
                "_consumers/ to restart the feed"
            )
        avail = [e for e in self.manifest.committed_epochs() if e > since]
        if max_epochs is not None:
            avail = avail[:max_epochs]
        if not avail:
            return {"consumer": name, "from_epoch": since, "to_epoch": since,
                    "epochs": 0, "rows": 0, "files": 0}
        to = avail[-1]
        items = self._change_items(since, to)
        os.makedirs(dest, exist_ok=True)

        def deliver(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            rows = 0
            for row in batch.to_pylist():
                t = _pq.read_table(row["path"])
                t = t.add_column(
                    0, pa.field("epoch", pa.int64()),
                    pa.array([row["epoch"]] * t.num_rows, pa.int64()),
                )
                m = re.search(r"part=(\d+)", row["path"])
                part = int(m.group(1)) if m else 0
                # deterministic dest path keyed by (epoch, partition):
                # a replayed delivery overwrites the same file byte-for-byte
                tmp_suffix = f"changes-{row['epoch']:06d}-{part:04d}.parquet"
                tmp = os.path.join(dest, f".tmp-{tmp_suffix}")
                _pq.write_table(t, tmp)
                os.replace(tmp, os.path.join(dest, tmp_suffix))
                rows += t.num_rows
            return pa.table({"rows": pa.array([rows], pa.int64()),
                             "files": pa.array([batch.num_rows], pa.int64())})

        stats = (
            ray.data.from_items(items)
            .map_batches(deliver, batch_size=1, batch_format="pyarrow")
            .take_all()
        )
        self.ack(name, to, gen=cur_gen)
        return {
            "consumer": name, "from_epoch": since, "to_epoch": to,
            "epochs": len(avail),
            "rows": int(sum(r["rows"] for r in stats)),
            "files": int(sum(r["files"] for r in stats)),
        }

    def restore(self, to_epoch: int) -> dict:
        """Roll the table back to a committed epoch's state (Delta-Lake
        RESTORE analog): atomically RE-commit the LATEST epoch's manifest
        with the historical epoch's cumulative pointer map + partitioning
        identity.  Zero data movement — manifests are pointer maps, so a
        restore is one JSON swap no matter the table size.

        Semantics, all consequences of the pointer re-commit:

        - Source epochs in ``(to_epoch, latest]`` stay *committed* (the
          resume index is dense), so replaying their event files is a
          no-op — their effects are discarded, which is the restore
          contract.  NEW source epochs apply on top of the restored state.
        - Valid while vacuum retention still covers ``to_epoch``'s files
          (checked up front; a vacuumed target raises with the retention
          bound — the same horizon rule as time travel and the changefeed).
        - Sibling chains (covering index, postings+doclens) re-commit their
          own historical records in the same TxnLog transaction; the
          allowed-lateness audit chain is append-only history and is NOT
          rolled back (it re-commits at its latest, like ``migrate``).
        - The restore commit carries NO ``changes`` record *by design*:
          its logical change set is the inverse of every discarded epoch,
          which nothing stores.  A changefeed window crossing it raises
          ``ChangefeedHorizonError`` — lagging consumers re-sync from a
          snapshot, exactly the Delta CDF rule for RESTORE/rewrite commits.
        """
        self.manifest.acquire_run_lock()
        try:
            latest = self.manifest.latest()
            if latest is None:
                raise ValueError("nothing committed yet — nothing to restore")
            epoch = latest["epoch"]
            if to_epoch == epoch:
                return {"epoch": epoch, "restored_to": to_epoch, "noop": True}
            if to_epoch not in self.manifest.committed_epochs():
                raise ValueError(
                    f"epoch {to_epoch} was never committed "
                    f"(committed: {self.manifest.committed_epochs()})"
                )
            rec = self.manifest.read_epoch(to_epoch)
            pointers = dict(rec["partitions"])
            missing = [
                f
                for ptr in pointers.values()
                for f in ([ptr["base"]] if ptr.get("base") else [])
                + list(ptr.get("deltas", []))
                if not os.path.exists(f)
            ]
            if missing:
                raise ValueError(
                    f"epoch {to_epoch} is past the restore horizon: "
                    f"{len(missing)} of its state files were vacuumed "
                    f"(retain_epochs={self.vacuum_retain}), e.g. "
                    f"{missing[0]!r}"
                )
            identity = rec.get("partitioning") or latest.get("partitioning")
            metrics = {"restored_from": epoch, "restored_to": to_epoch}
            # restore is a history REWRITE at an existing epoch number: bump
            # the restore generation so changefeed replicas that already
            # synced past to_epoch detect the rollback instead of silently
            # diverging (see replicate_from's cursor check)
            gen = self.manifest._carried_restore_gen() + 1
            manifests: dict[str, Manifest] = {"live": self.manifest}
            records: dict[str, dict] = {
                "live": {"partitions": pointers, "metrics": metrics,
                         "partitioning": identity, "restore_gen": gen,
                         # schema log rewinds WITH the data: the restored
                         # table must equal the time-travel snapshot at
                         # to_epoch, which reads with the historical log
                         # ([] = explicitly empty, not carry-forward)
                         "schema_log": list(rec.get("schema_log") or [])}
            }
            if self.index_manifest is not None:
                idx_rec = self.index_manifest.read_epoch(to_epoch)
                manifests["index"] = self.index_manifest
                records["index"] = {
                    "partitions": idx_rec["partitions"],
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": identity,
                }
            if self.postings_manifest is not None:
                post_rec = self.postings_manifest.read_epoch(to_epoch)
                manifests["postings"] = self.postings_manifest
                records["postings"] = {
                    "partitions": post_rec["partitions"],
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": identity,
                }
            if self.late_manifest is not None:
                manifests["late"] = self.late_manifest
                records["late"] = {
                    "partitions": self.late_manifest.pointers(),
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": identity,
                }
            if self.expect_manifest is not None:
                # append-only audit history, not rolled back (like late)
                manifests["expect"] = self.expect_manifest
                records["expect"] = {
                    "partitions": self.expect_manifest.pointers(),
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": identity,
                }
            if len(manifests) == 1:
                self.manifest.commit(
                    epoch, pointers, metrics, identity, restore_gen=gen,
                    schema_log=list(rec.get("schema_log") or []),
                )
            else:
                self.txn.commit(epoch, manifests, records)
            # restored pointers are now the latest manifest's references, so
            # vacuum keeps them; newer-epoch files age out per retention
            if self.vacuum_retain is not None:
                self._vacuum_chains()
            if identity:
                self.num_partitions = identity.get(
                    "num_partitions", self.num_partitions)
                self.turn_block = identity.get("turn_block", self.turn_block)
            return {"epoch": epoch, "restored_to": to_epoch,
                    "partitions": len(pointers)}
        finally:
            self.manifest.release_run_lock()

    # -- changefeed-driven replication ----------------------------------
    def replicate_from(
        self,
        source: "CdcEngine",
        *,
        max_epochs: int | None = None,
        bootstrap: bool | str = "auto",
        key_filter=None,
    ) -> dict:
        """Maintain this table as a REPLICA of ``source`` by consuming its
        changefeed: every source epoch past the replica's last commit is
        applied as the SAME-numbered replica epoch, reading the source's
        change files directly as event inputs (change rows are plain
        event-schema LWW winners, tombstones included, so they stream
        through the normal ``run()`` path — exchange, watermarks, two-phase
        commit, index/postings/lateness siblings all intact).

        The replica's own committed-epoch set IS the replication
        checkpoint: a crash anywhere re-runs only uncommitted epochs
        (exactly-once end state with zero extra bookkeeping).  Cost is
        O(changes) per call, never O(table); change files cross as
        zero-copy parquet reads of source storage (nothing is copied or
        materialized on the driver).  The replica may keep its OWN
        partitioning, covering index, postings and lateness policy — so
        replication doubles as online re-partitioning / re-indexing.

        **Bootstrap** (``"auto"``/``True``/``False``): when the feed
        horizon has passed (epochs vacuumed, a pre-feed commit, or a
        source RESTORE — ``ChangefeedHorizonError``), ``"auto"`` falls
        back to a state-snapshot catch-up: commit empty epochs up to the
        source's latest and apply the source's ENTIRE pointer-chain file
        set (base + deltas) as that epoch.  LWW is associative and
        durable state retains tombstones (state/lww.py), so folding the
        chain converges the replica to the source state exactly — for a
        fresh replica AND for a lagged one (every replica key exists in
        source state with an lsn at least as high).  ``True`` forces the
        snapshot path; ``False`` propagates the horizon error.

        Contract (the log-segmentation the engine itself assumes): a
        source epoch's change rows carry lsns greater than every lsn the
        replica already applied to the partitions they land in.  This
        holds automatically when source epochs segment a global lsn log
        (the normal CDC shape, and the fixture generator's), or when the
        replica keeps the source's partitioning identity.

        **Rollback fence**: a source RESTORE rewrites content at an
        existing epoch number, which a checkpoint alone cannot see.  The
        replica pins the source's ``restore_gen`` (bumped by every
        restore, carried forward by ordinary commits); on mismatch this
        raises instead of diverging — rebuild the replica from a fresh
        directory (one bootstrap call).  A fresh replica whose first sync
        merely CROSSES an old restore epoch hits the changefeed horizon
        and auto-bootstraps, which is safe (it holds no discarded rows).

        **Key-subset replicas** (``key_filter``): an optional DETERMINISTIC
        pure row filter (``pa.Table -> pa.Table``, rows dropped, values
        never rewritten) applied to the source's change rows — and to the
        bootstrap chain rows — before they enter the replica.  It must be
        a pure function of the KEY columns so a key's whole history (its
        tombstones included) is kept or dropped as a unit; with that, the
        LWW fold of the filtered stream equals the filter of the LWW fold.
        This is the elastic re-shard primitive: a growing deployment
        replicates each new shard as the key subset it will own
        (pipelines/sharded.py ``owner_filter``/``reshard``).

        Reference analog: the reference's per-table diff→soft-delete→
        append sync pushes each table to ONE downstream store
        (/root/reference/orchestration/templates/ingest-processed-data
        .yaml:85-172); this generalizes it to engine→engine sync with a
        durable cursor, the Delta-Lake "deep clone + CDF catch-up" shape.
        """
        if os.path.realpath(source.out_dir) == os.path.realpath(self.out_dir):
            raise ValueError("replica and source are the same table")
        # rollback fence: a source RESTORE rewrites content at an existing
        # epoch number, so a caught-up replica would otherwise diverge with
        # no signal (no new epoch ever crosses its checkpoint).  The replica
        # pins the restore generation it synced under; a mismatch means
        # epochs it already applied may have been discarded upstream — LWW
        # cannot roll back higher-lsn rows, so incremental sync (and even a
        # snapshot bootstrap) can no longer converge.  Rebuild the replica
        # (fresh directory + bootstrap) to recover.
        src_gen = int((source.manifest.latest() or {}).get("restore_gen", 0) or 0)
        cursor_path = os.path.join(self.out_dir, "_replication", "cursor.json")
        # the key filter is replication IDENTITY (like partitioning params):
        # a replica built as a key subset must never ingest under a
        # different — or no — filter, or ownership silently mixes.  The
        # cursor pins the filter id (owner_filter stamps one; anonymous
        # callables pin the marker "custom", which still catches the
        # filtered<->unfiltered mistake).
        filter_id = (
            None if key_filter is None
            else getattr(key_filter, "replication_filter_id", "custom")
        )
        if os.path.exists(cursor_path):
            with open(cursor_path) as f:
                cur = json.load(f)
            pinned = int(cur.get("gen", 0))
            if pinned != src_gen:
                raise ValueError(
                    f"source {source.out_dir!r} history was rewritten "
                    f"(restore_gen {pinned} -> {src_gen}) since this replica "
                    "last synced; epochs the replica already applied may be "
                    "rolled back upstream — rebuild the replica from a fresh "
                    "directory (bootstrap replays the current source state)"
                )
            if "filter_id" in cur and cur["filter_id"] != filter_id:
                raise ValueError(
                    f"replica {self.out_dir!r} was built with key filter "
                    f"{cur['filter_id']!r} but this call passes "
                    f"{filter_id!r} — the key filter is replication "
                    "identity; pass the same filter (or rebuild the replica)"
                )
        committed = self.manifest.committed_epochs()
        since = committed[-1] if committed else -1
        src_committed = source.manifest.committed_epochs()
        src_latest = src_committed[-1] if src_committed else -1
        if since > src_latest:
            raise ValueError(
                f"replica {self.out_dir!r} is at epoch {since}, AHEAD of "
                f"source {source.out_dir!r} at {src_latest} — not a replica "
                "of this source (or the source was rebuilt); start a fresh "
                "replica directory"
            )
        avail = [e for e in src_committed if e > since]
        if max_epochs is not None:
            avail = avail[:max_epochs]
        summary_base = {"from_epoch": since, "to_epoch": since,
                        "bootstrapped": False}
        if not avail:
            return {**summary_base, "epochs_run": 0, "epochs_skipped": 0,
                    "events_raw": 0, "events_applied": 0,
                    "dup_lsn_dropped": 0, "quarantined_late": 0,
                    "wall_s": 0.0}
        to = avail[-1]
        if avail != list(range(since + 1, to + 1)):
            raise ValueError(
                f"source committed epochs have gaps in ({since}, {to}]: "
                f"{avail} — replica epoch numbering mirrors the source 1:1"
            )
        # crashed-bootstrap fence: a snapshot catch-up commits EMPTY filler
        # epochs first and the full-chain fold at the LAST epoch — so a
        # kill between the fillers and the snapshot commit leaves a replica
        # whose committed-epoch checkpoint overstates what it holds.  An
        # incremental resume from that checkpoint would apply only the tail
        # change files over nothing and silently diverge.  Detect it
        # structurally: the replica's latest record carries NO partition
        # state while the source's record at the same epoch does — no
        # faithful replica (filtered or not, fillers or not) can look like
        # that, so the only converging action is to re-bootstrap (LWW makes
        # the refold idempotent).  Unreadable source records count as
        # stale, conservatively.
        stale_fillers = False
        # (a) durable marker: every bootstrap writes _replication/
        # bootstrap_pending.json BEFORE its run and unlinks it after the
        # snapshot epoch commits — its survival past `committed` epochs <
        # target IS the crash, for fresh AND lagged replicas, filtered or
        # not (lagged fillers carry the previous cumulative pointer map
        # forward, so no structural check can see them).
        pending_path = os.path.join(
            self.out_dir, "_replication", "bootstrap_pending.json"
        )
        if os.path.exists(pending_path):
            with open(pending_path) as f:
                pending = json.load(f)
            if since < int(pending.get("target_epoch", -1)):
                stale_fillers = True
            else:
                os.unlink(pending_path)  # snapshot landed; crash was post-run
        # (b) structural check for UNFILTERED replicas (covers histories
        # predating the marker): a faithful full replica can never hold an
        # empty pointer map at an epoch where the source holds state.  A
        # key-subset replica legitimately can (filter matched no keys yet),
        # so key_filter replicas rely on the marker alone.
        if not stale_fillers and committed and key_filter is None:
            try:
                rep_parts = self.manifest.read_epoch(since).get("partitions")
                src_parts = source.manifest.read_epoch(since).get("partitions")
            except Exception:
                stale_fillers = True
            else:
                stale_fillers = not rep_parts and bool(src_parts)
        if stale_fillers and bootstrap is False:
            raise ChangefeedHorizonError(
                f"replica {self.out_dir!r} holds empty filler epochs up to "
                f"{since} from an interrupted snapshot bootstrap — only a "
                "re-bootstrap can converge it (bootstrap='auto' or True)"
            )
        epoch_files: list[list[str]] | None = None
        if bootstrap is not True and not stale_fillers:
            try:
                items = source._change_items(since, to)
            except ChangefeedHorizonError:
                if bootstrap != "auto":
                    raise
            else:
                by_epoch: dict[int, list[str]] = {}
                for it in items:
                    by_epoch.setdefault(it["epoch"], []).append(it["path"])
                epoch_files = [[] for _ in range(since + 1)] + [
                    sorted(by_epoch.get(e, ())) for e in range(since + 1, to + 1)
                ]
        src_log = source.schema_log()
        if epoch_files is None:
            # snapshot catch-up: the source's full current chain applies as
            # the latest epoch (empty fillers keep the resume index dense).
            # The snapshot is the state AS OF src_latest, so it must commit
            # AS src_latest — max_epochs pagination does not apply here
            to = src_latest
            chain = [
                f
                for ptr in source.manifest.pointers().values()
                for f in ([ptr["base"]] if ptr.get("base") else [])
                + list(ptr.get("deltas", []))
            ]
            missing = [f for f in chain if not os.path.exists(f)]
            if missing:
                raise ValueError(
                    f"source state file {missing[0]!r} is gone — cannot "
                    "bootstrap from a partially vacuumed source"
                )
            if src_log:
                # the bootstrap folds MIXED-epoch chain files into ONE
                # replica epoch, which breaks the per-epoch mapping rule for
                # any file the schema log still applies to.  Refuse loudly
                # unless every chain file already carries logical names
                # (footer check — a migrate(force=True) rewrite, or files
                # that postdate the last schema op, both pass).
                import pyarrow.parquet as _pq

                from encode_ingest_ray.state.schemalog import (
                    file_epoch,
                    map_schema,
                )

                hi = max(int(e["epoch"]) for e in src_log)
                stale = [
                    f
                    for f in chain
                    if file_epoch(f) <= hi
                    and map_schema(
                        _pq.read_schema(f), file_epoch(f), src_log
                    ).names
                    != _pq.read_schema(f).names
                ]
                if stale:
                    raise ValueError(
                        f"source {source.out_dir!r} has schema-log entries "
                        f"(rename/drop) that still apply to {len(stale)} of "
                        "its chain files — a snapshot bootstrap would fold "
                        "pre-rename physical names into one replica epoch. "
                        "Run source.migrate(force=True) first (OPTIMIZE "
                        "rewrites the chain to current logical names), then "
                        "bootstrap."
                    )
            epoch_files = [[] for _ in range(to)] + [sorted(chain)]
            summary_base["bootstrapped"] = True
            # durable crash fence: written BEFORE the bootstrap run, removed
            # only after its snapshot epoch commits — see stale_fillers above
            os.makedirs(os.path.dirname(pending_path), exist_ok=True)
            fd, tmp_pending = tempfile.mkstemp(
                dir=os.path.dirname(pending_path), prefix=".tmp-bs-"
            )
            with os.fdopen(fd, "w") as f:
                json.dump({"target_epoch": to, "gen": src_gen}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp_pending, pending_path)
        # change rows are already source-transformed: the replica's
        # ingest_transform must not see them (same rule as delete_where's
        # engine-authored tombstones).  A key_filter, by contrast, is a
        # REPLICATION-time row filter (ownership selection, not a payload
        # transform) and rides the same fused read->route hook — it sees
        # change rows AND bootstrap chain rows, both of which carry the
        # key columns it reads.  The replica also mirrors the
        # source's schema log: its epochs (and so its file epochs) number
        # 1:1 with the source's, so the same epoch-stamped entries map its
        # own pre-rename files identically — committing the FULL current
        # log with every mirrored epoch is safe even mid-catchup (a file at
        # epoch e <= entry.epoch holds pre-rename change rows by
        # construction, which is exactly when the entry applies).
        saved_transform = self.ingest_transform
        self.ingest_transform = key_filter
        if src_log:
            self._schema_log_override = src_log
        try:
            summary = self.run(epoch_files=epoch_files)
        finally:
            self.ingest_transform = saved_transform
            self._schema_log_override = None
        if summary_base["bootstrapped"] and os.path.exists(pending_path):
            # the snapshot epoch is committed — retire the crash fence
            os.unlink(pending_path)
        # pin the source generation we synced under (atomic tmp+rename; a
        # crash before this line re-runs the gen check against an unchanged
        # source next call — safe).  Single-writer source assumed during one
        # sync call, the same assumption run()'s lock makes for the table.
        os.makedirs(os.path.dirname(cursor_path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(cursor_path), prefix=".tmp-cursor-"
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {"gen": src_gen, "epoch": int(to), "filter_id": filter_id},
                    f,
                )
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cursor_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        summary.update(summary_base)
        summary["to_epoch"] = to
        return summary

    # -- binary payload (file) ingest ----------------------------------
    def ingest_payloads(
        self,
        ds: "ray.data.Dataset",
        id_col: str = "file_id",
        payload_col: str = "payload",
        batch_size: int | None = 1024,
    ) -> dict:
        """Bulk binary-payload ingest — the reference's file-submission path
        (hack/bulk-ingest-explorer-files.py TDR bulk-load jobs;
        FileBackfillGenerator.scala:16-74 deterministic target-path
        contract) re-expressed for the lake.

        Payload bytes stage CONTENT-ADDRESSED under
        ``files/cas/<md5[:2]>/<md5>.bin`` — write-if-absent gives md5 dedup
        AND idempotent replay (a re-run re-derives the same paths and skips
        existing blobs).  The ``(file_id, md5, nbytes, relpath)`` reference
        rows land as a registry epoch under ``files/refs/epoch-KKKKKK/``
        (the whole directory is re-staged on replay, so nondeterministic
        block boundaries cannot duplicate rows), and the registry manifest
        publishes in the SAME TxnLog transaction as the live table's
        manifest — a crash can never expose blobs with half a registry
        epoch, or sibling manifests at diverging states.  The registry is
        append-only (like the late-quarantine audit chain): epochs
        accumulate; blobs are immortal until an explicit GC.

        Stats note: ``blobs_written`` can over-count under concurrent
        same-blob races (both tasks see absent, both write identical
        bytes); the registry and CAS contents stay exact.
        """
        import shutil

        files_root = os.path.join(self.out_dir, "files")
        reg = Manifest(files_root)
        latest = reg.latest()
        k = (int(latest["epoch"]) + 1) if latest else 0
        refs_rel = os.path.join("refs", f"epoch-{k:06d}")
        refs_dir = os.path.join(files_root, refs_rel)
        if os.path.isdir(refs_dir):
            # crashed previous attempt at this epoch: re-stage from scratch
            shutil.rmtree(refs_dir)
        os.makedirs(refs_dir, exist_ok=True)
        cas_root = os.path.join(files_root, "cas")

        def stage(t: pa.Table) -> pa.Table:
            import hashlib

            import pyarrow.parquet as pq

            pays = t.column(payload_col).to_pylist()
            md5s, sizes, rels = [], [], []
            new_blobs = new_bytes = 0
            for b in pays:
                b = b if isinstance(b, (bytes, bytearray)) else bytes(b)
                h = hashlib.md5(b).hexdigest()
                rel = f"cas/{h[:2]}/{h}.bin"
                path = os.path.join(files_root, rel)
                if not os.path.exists(path):
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    tmp = f"{path}.tmp-{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(b)
                    os.replace(tmp, path)
                    new_blobs += 1
                    new_bytes += len(b)
                md5s.append(h)
                sizes.append(len(b))
                rels.append(rel)
            refs = pa.table(
                {
                    "file_id": t.column(id_col),
                    "md5": pa.array(md5s, pa.string()),
                    "nbytes": pa.array(sizes, pa.int64()),
                    "relpath": pa.array(rels, pa.string()),
                }
            )
            # block-content-derived name: unique across disjoint blocks,
            # stable enough for debugging; exactly-once comes from the
            # directory re-stage + manifest commit, not the file names
            tag = hashlib.md5(
                "\x00".join(str(i) for i in refs.column("file_id").to_pylist()).encode()
            ).hexdigest()[:16]
            pq.write_table(refs, os.path.join(refs_dir, f"refs-{tag}.parquet"))
            return pa.table(
                {
                    "n": pa.array([len(pays)], pa.int64()),
                    "new_blobs": pa.array([new_blobs], pa.int64()),
                    "new_bytes": pa.array([new_bytes], pa.int64()),
                }
            )

        stats = ds.map_batches(
            stage, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size,
        ).take_all()
        totals = {
            "files": sum(r["n"] for r in stats),
            "blobs_written": sum(r["new_blobs"] for r in stats),
            "bytes_written": sum(r["new_bytes"] for r in stats),
        }
        reg_pointers = dict((latest or {}).get("partitions") or {})
        dirs = list((reg_pointers.get("refs") or {}).get("dirs", []))
        dirs.append(refs_rel)
        reg_pointers["refs"] = {"dirs": dirs}
        reg_record = {
            "partitions": reg_pointers,
            "metrics": totals,
            "partitioning": None,
        }
        live_latest = self.manifest.latest()
        if live_latest is None:
            reg.commit(k, **reg_record)
        else:
            self.txn.commit(
                int(live_latest["epoch"]),
                {"live": self.manifest, "files": reg},
                {
                    "live": {
                        "partitions": live_latest["partitions"],
                        "metrics": live_latest["metrics"],
                        "partitioning": live_latest.get("partitioning"),
                        "changes": live_latest.get("changes"),
                    },
                    "files": reg_record,
                },
                epochs={"files": k},
            )
        return {"epoch": k, **totals}

    def epoch_asof(self, wallclock_us: int) -> int:
        """TIMESTAMP-AS-OF resolution: the largest committed epoch whose
        record was committed at or before the given wall-clock (µs since
        the Unix epoch).  Every commit stamps ``committed_at_us``; rewrite
        commits (migrate/restore/schema ops re-commit an existing epoch)
        REFRESH their epoch's stamp, so resolution is against each record's
        last commit time.  Raises when no commit is that old (or the table
        predates the stamp)."""
        best = None
        for e in self.manifest.committed_epochs():
            rec = self.manifest.read_epoch(e)
            at = rec.get("committed_at_us")
            if at is not None and int(at) <= wallclock_us:
                best = e
        if best is None:
            raise ValueError(
                f"no commit at or before t={wallclock_us}µs (first commit "
                "is newer, or the table predates commit timestamps)"
            )
        return best

    # -- metadata tables (Iceberg $history / $files analog) ---------------
    def history(self) -> pa.Table:
        """The commit history as a TABLE — one row per committed epoch with
        its headline metrics, history generation, schema-op and rewrite
        markers.  Driver-side O(epochs) JSON reads (manifests are a few KB
        each); this is the introspection surface, not a data path."""
        rows = []
        for e in self.manifest.committed_epochs():
            rec = self.manifest.read_epoch(e)
            m = rec.get("metrics", {}) or {}
            rows.append(
                {
                    "epoch": int(e),
                    "committed_at_us": rec.get("committed_at_us"),
                    "partitions": len(rec.get("partitions") or {}),
                    "events_in": int(m.get("events_in") or 0),
                    "applied": int(m.get("applied") or 0),
                    "dup_lsn_dropped": int(m.get("dup_lsn_dropped") or 0),
                    "quarantined_late": int(m.get("quarantined_late") or 0),
                    "expect_failed": int(m.get("expect_failed") or 0),
                    "change_files": len(rec.get("changes") or []),
                    "restore_gen": int(rec.get("restore_gen", 0) or 0),
                    "schema_ops": len(rec.get("schema_log") or []),
                    "restored_to": m.get("restored_to"),
                    "migrated": "migrated_from" in m,
                    "published_from_branch": m.get("published_from_branch"),
                }
            )
        schema = pa.schema(
            [
                ("epoch", pa.int64()),
                ("committed_at_us", pa.int64()),
                ("partitions", pa.int64()),
                ("events_in", pa.int64()),
                ("applied", pa.int64()),
                ("dup_lsn_dropped", pa.int64()),
                ("quarantined_late", pa.int64()),
                ("expect_failed", pa.int64()),
                ("change_files", pa.int64()),
                ("restore_gen", pa.int64()),
                ("schema_ops", pa.int64()),
                ("restored_to", pa.int64()),
                ("migrated", pa.bool_()),
                ("published_from_branch", pa.string()),
            ]
        )
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pylist(rows, schema=schema)

    def file_inventory(self, epoch: int | None = None) -> pa.Table:
        """The committed chain as a TABLE — one row per referenced data file
        (live chain + mirrored siblings) with its role, partition, file
        epoch and on-disk size.  Small-file pressure, compaction debt and
        branch sharing become queryable (Iceberg ``$files`` analog)."""
        from encode_ingest_ray.state.schemalog import file_epoch as _fe

        rec = (
            self.manifest.latest()
            if epoch is None
            else self.manifest.read_epoch(epoch)
        )
        rows = []

        def add(part: str, role: str, chain: str, path: str | None):
            if not path:
                return
            try:
                size = os.path.getsize(path)
            except OSError:
                size = None
            try:
                fe = _fe(path)
            except ValueError:
                fe = None
            rows.append(
                {
                    "partition": int(part),
                    "chain": chain,
                    "role": role,
                    "path": os.path.abspath(path),
                    "file_epoch": fe,
                    "bytes": size,
                    "shared": not os.path.abspath(path).startswith(
                        os.path.abspath(self.out_dir) + os.sep
                    ),
                }
            )

        for p, ptr in ((rec or {}).get("partitions") or {}).items():
            add(p, "base", "live", ptr.get("base"))
            for d in ptr.get("deltas", []):
                add(p, "delta", "live", d)
            if self.index_root is not None:
                iptr = self._index_ptr(ptr)
                add(p, "base", "index", iptr.get("base"))
                for d in iptr.get("deltas", []):
                    add(p, "delta", "index", d)
            if self.postings_root is not None:
                pptr = self._reroot_ptr(ptr, self.postings_root)
                add(p, "base", "postings", pptr.get("base"))
                for d in pptr.get("deltas", []):
                    add(p, "delta", "postings", d)
                add(p, "dl_base", "postings", ptr.get("dl_base"))
                for d in ptr.get("dl_deltas", []):
                    add(p, "dl_delta", "postings", d)
        schema = pa.schema(
            [
                ("partition", pa.int64()),
                ("chain", pa.string()),
                ("role", pa.string()),
                ("path", pa.string()),
                ("file_epoch", pa.int64()),
                ("bytes", pa.int64()),
                ("shared", pa.bool_()),
            ]
        )
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pylist(rows, schema=schema)

    def payload_registry(self) -> "ray.data.Dataset":
        """Streaming view of the committed payload registry: one
        ``(file_id, md5, nbytes, relpath)`` row per ingested reference,
        across all registry epochs."""
        files_root = os.path.join(self.out_dir, "files")
        rec = Manifest(files_root).latest()
        if rec is None:
            raise ValueError("no payloads ingested (ingest_payloads never ran)")
        dirs = rec["partitions"]["refs"]["dirs"]
        paths = sorted(
            f
            for d in dirs
            for f in glob.glob(os.path.join(files_root, d, "*.parquet"))
        )
        return ray.data.read_parquet(paths)

    def payload_path(self, md5: str) -> str:
        """Absolute CAS path of a payload by content hash."""
        return os.path.join(self.out_dir, "files", "cas", md5[:2], f"{md5}.bin")

    def file_submission(
        self, bucket: str = "gs://ingest-staging"
    ) -> "ray.data.Dataset":
        """Bulk-file-load control rows over the committed payload registry —
        the reference's file-submission manifest emitters re-expressed
        (hack/create_file_submission_from_manifest.sh:17-37: one JSON line
        {sourcePath, targetPath, description} per file, with the target
        path's directory tree FLATTENED to keep the repo's object count
        down; hack/create_DRS_upload_from_fileids.sh:13-24: one
        {file_id, file_ref} row per file).

        One streaming projection over the registry, no payload reads:

        - ``sourcePath``  — where the staged blob lives (``bucket`` +
          CAS relpath; the reference's s3→gs scheme swap is the caller
          picking the bucket scheme).
        - ``targetPath``  — the flattened load destination (every ``/`` in
          the relative path becomes ``_``, mirroring the manifest
          emitter's directory-reduction rule).
        - ``description`` — the logical file id (the reference parses it
          back out of the filename; the registry carries it first-class).
        - ``file_ref``    — the content address (md5).  The reference has
          to join datarepo_load_history by target path to recover a load's
          file ref; content addressing makes the ref a pure function of
          the bytes.
        """
        reg = self.payload_registry()
        pre = f"{bucket.rstrip('/')}/"

        def to_rows(t: pa.Table) -> pa.Table:
            rel = t.column("relpath")
            return pa.table({
                "sourcePath": pc.binary_join_element_wise(
                    pa.scalar(pre), rel, pa.scalar("")
                ),
                "targetPath": pc.binary_join_element_wise(
                    pa.scalar("/"),
                    pc.replace_substring(rel, "/", "_"),
                    pa.scalar(""),
                ),
                "description": t.column("file_id"),
                "file_ref": t.column("md5"),
            })

        return reg.map_batches(
            to_rows, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )

    def final_dataset(
        self, epoch: int | None = None, columns: list[str] | None = None
    ) -> "ray.data.Dataset":
        """Streaming live view of the committed table: one merge-on-read task
        per partition (base snapshot + epoch deltas resolved by the LWW
        kernel), unordered; apply ``sort(['conv_id','turn_idx'])`` when a
        total order is needed.  ``epoch`` selects a historical commit
        (snapshot-as-of / time travel) via that epoch's cumulative manifest.

        Schema evolution: partitions last written before an additive column
        appeared lack it; every partition is aligned to the union schema
        (null-filled).  Footer reads run as one Ray task PER PARTITION (the
        driver unifies only tiny serialized schemas — no per-file driver IO
        at large partition counts).

        ``columns`` (must include any key columns the caller needs) pushes a
        projection down to the per-file parquet reads — merge metadata is
        still read for the LWW resolve, but unrequested payload (the wide
        transcript text) is never decoded or moved.

        Metadata-only renames/drops (state/schemalog.py) are applied with
        the record's OWN schema log, so a time-travel read shows the
        logical schema as of that commit.
        """
        return self._merge_on_read(
            self.partition_files(epoch), columns,
            schema_log=self.schema_log(epoch),
        )

    def prune_partitions(
        self, bounds: dict[str, tuple], epoch: int | None = None
    ) -> tuple[dict[int, dict], int]:
        """Zone-map pruning decision: partitions whose committed per-column
        [min, max] stats (``stats_columns``) are DISJOINT from the requested
        bounds are skipped.  Returns (surviving part->files map, pruned
        count).  Conservative by construction: bounds cover every stored
        version (supersets of the live values), partitions without stats
        are never pruned, and pruning is whole-partition only — merge-on-
        read's LWW resolve inside each surviving partition is untouched
        (file-level skipping would resurrect superseded versions).
        Timestamp bounds are integer microseconds (the stored encoding)."""
        rec = (
            self.manifest.latest()
            if epoch is None
            else self.manifest.read_epoch(epoch)
        )
        pointers = dict(rec["partitions"]) if rec else {}
        parts: dict[int, dict] = {}
        pruned = 0
        for p, ptr in pointers.items():
            st = ptr.get("stats") or {}
            skip = False
            for col, (lo, hi) in bounds.items():
                b = st.get(col)
                if b is None:
                    continue
                if (hi is not None and b[0] > hi) or (
                    lo is not None and b[1] < lo
                ):
                    skip = True
                    break
            if skip:
                pruned += 1
                continue
            parts[int(p)] = {
                "base": ptr.get("base"),
                "deltas": list(ptr.get("deltas", [])),
            }
        return parts, pruned

    def scan(
        self,
        bounds: dict[str, tuple],
        columns: list[str] | None = None,
        epoch: int | None = None,
    ) -> "ray.data.Dataset":
        """Range scan with zone-map partition pruning + the exact residual
        filter: live rows whose ``bounds`` columns fall inside [lo, hi]
        (None = unbounded side; timestamps compare as integer µs).  At 64 Ki
        partitions a narrow time-range read touches only the partitions
        whose committed stats intersect the range — the data-skipping path
        a full `final_dataset().filter()` scan lacks."""
        parts, _ = self.prune_partitions(bounds, epoch=epoch)
        ds = self._merge_on_read(
            parts, columns, schema_log=self.schema_log(epoch)
        )

        def residual(t: pa.Table) -> pa.Table:
            for col, (lo, hi) in bounds.items():
                if col not in t.column_names:
                    continue
                arr = t.column(col)
                # mirror column_bounds' temporal handling exactly: date32/
                # time32 must go through their raw int32 width first (a
                # direct date32→int64 compare raises ArrowNotImplementedError)
                if pa.types.is_timestamp(arr.type) or \
                        pa.types.is_date(arr.type) or \
                        pa.types.is_time(arr.type):
                    width32 = getattr(arr.type, "bit_width", 64) == 32
                    arr = pc.cast(
                        pc.cast(arr, pa.int32() if width32 else pa.int64()),
                        pa.int64(),
                    )
                mask = None
                if lo is not None:
                    mask = pc.greater_equal(arr, pa.scalar(lo))
                if hi is not None:
                    m2 = pc.less_equal(arr, pa.scalar(hi))
                    mask = m2 if mask is None else pc.and_(mask, m2)
                if mask is not None:
                    t = t.filter(pc.fill_null(mask, False))
            return t

        return ds.map_batches(
            residual, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )

    def _merge_on_read(
        self,
        parts: dict[int, dict],
        columns: list[str] | None = None,
        schema_log: list | None = None,
    ) -> "ray.data.Dataset":
        from encode_ingest_ray.schema import align_to_schema, unify_schemas
        from encode_ingest_ray.state.lww import live_view
        from encode_ingest_ray.state.merger import load_partition_state

        if not parts:
            return ray.data.from_items([])
        log = list(schema_log or [])

        @ray.remote(num_cpus=0)
        def _partition_schema(files: list[str]) -> bytes:
            import pyarrow.parquet as pq

            from encode_ingest_ray.state.schemalog import file_epoch, map_schema

            u = None
            for f in files:
                s = pq.read_schema(f)
                if log:
                    s = map_schema(s, file_epoch(f), log)
                u = s if u is None else unify_schemas(u, s)
            return u.serialize().to_pybytes()

        schema_futures = [
            _partition_schema.remote(
                ([info["base"]] if info["base"] else []) + info["deltas"]
            )
            for info in parts.values()
        ]
        unified = None
        for blob in ray.get(schema_futures):
            s = pa.ipc.read_schema(pa.BufferReader(blob))
            unified = s if unified is None else unify_schemas(unified, s)
        if columns is not None:
            from encode_ingest_ray.state.merger import LWW_META_COLUMNS

            keep = set(LWW_META_COLUMNS) | set(columns)
            unified = pa.schema([f for f in unified if f.name in keep])

        items = [
            {"base": info["base"] or "", "deltas": info["deltas"]}
            for _, info in sorted(parts.items())
        ]

        def read_part(batch: pa.Table) -> pa.Table:
            tables = []
            for row in batch.to_pylist():
                state = load_partition_state(
                    {"base": row["base"] or None, "deltas": list(row["deltas"])},
                    columns=columns,
                    schema_log=log,
                )
                if state is not None and state.num_rows:
                    tables.append(
                        live_view(align_to_schema(state, unified), columns=columns)
                    )
            if not tables:
                return live_view(
                    align_to_schema(unified.empty_table(), unified), columns=columns
                )
            return pa.concat_tables(tables)

        ds = ray.data.from_items(items)
        return ds.map_batches(read_part, batch_size=1, batch_format="pyarrow")

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

    def migrate(
        self,
        new_num_partitions: int | None = None,
        new_turn_block: int | None = None,
        force: bool = False,
    ) -> dict:
        """Partition evolution: rewrite the committed table under a new
        partitioning identity in one distributed pass.

        Partitioning params are durable table identity (resume with changed
        params is a hard error by design) — this is the sanctioned way to
        CHANGE them, the Iceberg partition-spec-evolution analog: read every
        partition's durable STATE (merge-on-read, tombstones and LSNs kept),
        re-key with the new ``(num_partitions, turn_block)`` mix, stage one
        ``base-EEEEEE-mig.parquet`` per new partition at deterministic
        paths, then atomically RE-commit the SAME epoch's manifest with the
        new pointer map + partitioning record.  Logical content is
        unchanged, epoch numbering is not consumed (source epochs map 1:1
        to manifests, so a migration must not shift the resume index), and
        a crash before the manifest swap leaves only unreferenced staged
        files — re-running the migration overwrites them byte-identically.

        Every new partition adopts the GLOBAL max LSN watermark: committed
        epochs are a dense prefix, so every LSN <= the global max was
        applied somewhere and must stay dedup-filtered no matter which new
        partition its key now routes to.  Historical manifests (< epoch)
        keep referencing the old layout's files until vacuum retention ages
        them out, so time travel across the migration boundary still works.

        Returns {epoch, old, new, rows, partitions_written}.
        """
        from encode_ingest_ray.schema import align_to_schema, unify_schemas
        from encode_ingest_ray.state.merger import (
            _atomic_write,
            _part_dir,
            doc_stats_of,
            load_partition_state,
            project_doclens,
            project_index,
            project_postings,
        )
        from encode_ingest_ray.state.partition import assign_partition_column
        from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

        latest = self.manifest.latest()
        if latest is None:
            raise ValueError("nothing committed yet — nothing to migrate")
        old = latest["partitioning"] or {
            "num_partitions": self.num_partitions,
            "turn_block": self.turn_block,
        }
        new_p = new_num_partitions or old["num_partitions"]
        new_tb = new_turn_block or old["turn_block"]
        if (not force and new_p == old["num_partitions"]
                and new_tb == old["turn_block"]):
            return {"epoch": latest["epoch"], "old": old, "new": old,
                    "rows": 0, "partitions_written": 0, "noop": True}
        # force + unchanged identity == OPTIMIZE: one distributed pass folds
        # every partition's base+delta chain into a fresh compacted base
        # (merge-on-read then reads ONE file per partition until new deltas
        # land); vacuum ages the superseded chain out as usual
        epoch = latest["epoch"]
        self.manifest.acquire_run_lock()
        try:
            parts = self.partition_files()
            wm_hi = max(
                (int(p.get("lsn_hi", -1)) for p in latest["partitions"].values()),
                default=-1,
            )
            # event-time high-water mark: every new partition adopts the
            # GLOBAL max (conservative — the lateness bound can only flag
            # MORE events as late, never silently disable the quarantine)
            ts_vals = [int(p["ts_hi"]) for p in latest["partitions"].values()
                       if p.get("ts_hi") is not None]
            ts_hi_global = max(ts_vals) if ts_vals else None

            # unified state schema across old partitions (schema evolution);
            # the schema log maps old files to LOGICAL names — the rewritten
            # mig files then carry logical names at their own epoch, which
            # is exactly what the epoch-stamp read rule expects
            mig_log = self.schema_log()

            @ray.remote(num_cpus=0)
            def _part_schema(files: list[str]) -> bytes:
                import pyarrow.parquet as pq

                from encode_ingest_ray.state.schemalog import (
                    file_epoch,
                    map_schema,
                )

                u = None
                for f in files:
                    s = pq.read_schema(f)
                    if mig_log:
                        s = map_schema(s, file_epoch(f), mig_log)
                    u = s if u is None else unify_schemas(u, s)
                return u.serialize().to_pybytes()

            futs = [
                _part_schema.remote(
                    ([i["base"]] if i["base"] else []) + i["deltas"]
                )
                for i in parts.values()
                if i["base"] or i["deltas"]
            ]
            unified = None
            for blob in ray.get(futs):
                s = pa.ipc.read_schema(pa.BufferReader(blob))
                unified = s if unified is None else unify_schemas(unified, s)
            if unified is None:
                raise ValueError("committed table holds no state files")

            items = [
                {"base": i["base"] or "", "deltas": i["deltas"]}
                for _, i in sorted(parts.items())
            ]

            def read_state(batch: pa.Table) -> pa.Table:
                tabs = []
                for row in batch.to_pylist():
                    st = load_partition_state(
                        {"base": row["base"] or None, "deltas": list(row["deltas"])},
                        schema_log=mig_log,
                    )
                    if st is not None and st.num_rows:
                        tabs.append(align_to_schema(st, unified))
                if not tabs:
                    return unified.empty_table()
                return pa.concat_tables(tabs)

            def rekey(t: pa.Table) -> pa.Table:
                return assign_partition_column(t, new_p, new_tb)

            out_dir = self.out_dir
            index_root = self.index_root
            index_columns = self.index_columns
            postings_root = self.postings_root
            postings_column = self.postings_column
            stats_columns = self.stats_columns

            def write_parts(t: pa.Table) -> pa.Table:
                import numpy as np

                pcol = t.column("part").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                body = t.drop_columns(["part"])
                rows = []
                for p in np.unique(pcol):
                    sub = body.filter(pa.array(pcol == p))
                    path = os.path.join(
                        _part_dir(out_dir, int(p)), f"base-{epoch:06d}-mig.parquet"
                    )
                    _atomic_write(sub, path)
                    if index_root is not None:
                        # the mirrored index chain migrates in the same pass
                        _atomic_write(
                            project_index(sub, index_columns or []),
                            os.path.join(
                                _part_dir(index_root, int(p)),
                                f"base-{epoch:06d}-mig.parquet",
                            ),
                        )
                    dl_base = ""
                    dsn = dss = 0
                    if postings_root is not None:
                        _atomic_write(
                            project_postings(sub, postings_column or "text"),
                            os.path.join(
                                _part_dir(postings_root, int(p)),
                                f"base-{epoch:06d}-mig.parquet",
                            ),
                        )
                        # doclens sidecar + exact corpus stats migrate with
                        # the chain (sub is LWW-reduced: old-partition states
                        # are reduced and their keys disjoint)
                        dltab = project_doclens(sub, postings_column or "text")
                        dl_base = os.path.join(
                            _part_dir(postings_root, int(p)),
                            f"dlbase-{epoch:06d}-mig.parquet",
                        )
                        _atomic_write(dltab, dl_base)
                        st = doc_stats_of(dltab)
                        dsn, dss = st["n"], st["s"]
                    live = int(
                        pc.sum(
                            pc.not_equal(sub.column("op"), pa.scalar("delete"))
                        ).as_py()
                        or 0
                    )
                    st_json = "{}"
                    if stats_columns:
                        from encode_ingest_ray.state.merger import column_bounds

                        st_json = json.dumps(
                            column_bounds(sub, list(stats_columns))
                        )
                    rows.append(
                        {
                            "part": int(p),
                            "base": path,
                            "rows_state": sub.num_rows,
                            "rows_live": live,
                            "turn_hi": int(pc.max(sub.column("turn_idx")).as_py()),
                            "dl_base": dl_base,
                            "doc_n": dsn,
                            "doc_s": dss,
                            "stats_json": st_json,
                        }
                    )
                if not rows:
                    return pa.table(
                        {
                            "part": pa.array([], pa.int64()),
                            "base": pa.array([], pa.string()),
                            "rows_state": pa.array([], pa.int64()),
                            "rows_live": pa.array([], pa.int64()),
                            "turn_hi": pa.array([], pa.int64()),
                            "dl_base": pa.array([], pa.string()),
                            "doc_n": pa.array([], pa.int64()),
                            "doc_s": pa.array([], pa.int64()),
                            "stats_json": pa.array([], pa.string()),
                        }
                    )
                return pa.Table.from_pylist(rows)

            staged = bucketed_groupby_apply(
                ray.data.from_items(items)
                .map_batches(read_state, batch_size=1, batch_format="pyarrow")
                .map_batches(
                    rekey,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=None,
                ),
                ["part"],
                write_parts,
                num_buckets=min(new_p, 512),
            ).take_all()

            pointers = {
                str(p): {
                    "base": None,
                    "deltas": [],
                    "epoch": epoch,
                    "rows_delta": 0,
                    "rows_state": 0,
                    "rows_live": 0,
                    "lsn_hi": wm_hi,
                    "ts_hi": ts_hi_global,
                    "turn_hi": None,
                    **(
                        {"dl_base": None, "dl_deltas": [],
                         "doc_stats": {"n": 0, "s": 0}}
                        if postings_root is not None
                        else {}
                    ),
                }
                for p in range(new_p)
            }
            total = 0
            for r in staged:
                total += r["rows_state"]
                pointers[str(r["part"])].update(
                    base=r["base"],
                    rows_state=r["rows_state"],
                    rows_live=r["rows_live"],
                    turn_hi=r["turn_hi"],
                )
                if self.stats_columns:
                    pointers[str(r["part"])]["stats"] = json.loads(
                        r.get("stats_json") or "{}"
                    )
                if postings_root is not None:
                    pointers[str(r["part"])].update(
                        dl_base=r["dl_base"] or None,
                        dl_deltas=[],
                        doc_stats={"n": r["doc_n"], "s": r["doc_s"]},
                    )
            new_identity = {"num_partitions": new_p, "turn_block": new_tb,
                            "index_columns": self.index_columns,
                            "lateness_us": self.lateness_us,
                            "postings_column": self.postings_column,
                            "changefeed_preimages": self.changefeed_preimages,
                            "stats_columns": self.stats_columns}
            metrics = dict(latest.get("metrics", {}))
            metrics["migrated_from"] = old
            mig_manifests: dict[str, Manifest] = {"live": self.manifest}
            # a migration re-commits the SAME epoch with no new changes:
            # the epoch's changefeed files carry forward verbatim (they sit
            # under the OLD layout's part dirs, which is fine — the feed is
            # rows, not partitioning; vacuum retention still bounds them)
            mig_records: dict[str, dict] = {
                "live": {"partitions": pointers, "metrics": metrics,
                         "partitioning": new_identity,
                         "changes": latest.get("changes"),
                         "preimages": latest.get("preimages")}
            }
            if self.index_manifest is not None:
                mig_manifests["index"] = self.index_manifest
                mig_records["index"] = {
                    "partitions": {p: self._index_ptr(ptr)
                                   for p, ptr in pointers.items()},
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": new_identity,
                }
            if self.postings_manifest is not None:
                mig_manifests["postings"] = self.postings_manifest
                mig_records["postings"] = {
                    "partitions": {p: self._reroot_ptr(ptr, self.postings_root)
                                   for p, ptr in pointers.items()},
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": new_identity,
                }
            if self.late_manifest is not None:
                # the audit chain is NOT rekeyed (historical layout), but
                # its manifest re-commits in the same transaction so the
                # sibling epochs never diverge
                mig_manifests["late"] = self.late_manifest
                mig_records["late"] = {
                    "partitions": self.late_manifest.pointers(),
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": new_identity,
                }
            if self.expect_manifest is not None:
                # expectation-quarantine audit: same not-rekeyed rule
                mig_manifests["expect"] = self.expect_manifest
                mig_records["expect"] = {
                    "partitions": self.expect_manifest.pointers(),
                    "metrics": {"mirror_of": self.out_dir},
                    "partitioning": new_identity,
                }
            if len(mig_manifests) == 1:
                self.manifest.commit(epoch, pointers, metrics, new_identity,
                                     changes=latest.get("changes"),
                                     preimages=latest.get("preimages"))
            else:
                self.txn.commit(epoch, mig_manifests, mig_records)
            if self.vacuum_retain is not None:
                self._vacuum_chains()
            self.num_partitions = new_p
            self.turn_block = new_tb
            return {
                "epoch": epoch,
                "old": old,
                "new": new_identity,
                "rows": total,
                "partitions_written": len(staged),
            }
        finally:
            self.manifest.release_run_lock()

    def write_final(
        self, final_dir: str, overwrite: bool = False,
        num_output_partitions: int | None = None, epoch: int | None = None,
    ) -> dict:
        """Materialize the live table as per-conversation Parquet — the
        north-rule output step: engine partitions are SALTED (one
        conversation's turn-blocks spread over many partitions for skew),
        so the sink re-exchanges by bare conv_id and sorts each output
        partition by (conv_id, turn_idx).  Every conversation lands whole
        and turn-ordered in exactly one file.  Resumable: existing output
        files are skipped unless ``overwrite``.  ``epoch`` exports a
        historical commit (time-travel materialization, valid within
        vacuum retention)."""
        import zlib

        import numpy as np
        import pyarrow.parquet as pq

        os.makedirs(final_dir, exist_ok=True)
        P = num_output_partitions or self.num_partitions
        ds = self.final_dataset(epoch=epoch)

        def add_bucket(t: pa.Table) -> pa.Table:
            conv = t.column("conv_id").combine_chunks().dictionary_encode()
            uniq = conv.dictionary.to_pylist()
            uh = np.fromiter(
                (zlib.crc32(u.encode()) for u in uniq), dtype=np.uint64, count=len(uniq)
            )
            b = (uh[conv.indices.to_numpy(zero_copy_only=False)] % np.uint64(P)).astype(
                np.int32
            )
            return t.append_column("__fbucket", pa.array(b))

        bucketed = ds.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

        def write_bucket(group: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            part = group.column("__fbucket")[0].as_py()
            path = os.path.join(final_dir, f"final-part-{part:05d}.parquet")
            if os.path.exists(path) and not overwrite:
                return pa.table(
                    {"part": pa.array([part], pa.int32()),
                     "rows": pa.array([0], pa.int64()),
                     "skipped": pa.array([True])}
                )
            t = group.drop_columns(["__fbucket"])
            idx = _pc.sort_indices(
                t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            t = t.take(idx)
            tmp = path + ".tmp"
            pq.write_table(t, tmp, compression="zstd", compression_level=3)
            os.replace(tmp, path)
            return pa.table(
                {"part": pa.array([part], pa.int32()),
                 "rows": pa.array([t.num_rows], pa.int64()),
                 "skipped": pa.array([False])}
            )

        stats = bucketed.groupby("__fbucket").map_groups(
            write_bucket, batch_format="pyarrow"
        ).take_all()
        return {
            "files_written": sum(1 for r in stats if not r["skipped"]),
            "files_skipped": sum(1 for r in stats if r["skipped"]),
            "rows": sum(r["rows"] for r in stats),
        }
