"""Two-phase exactly-once commit log.

Reference semantics being reproduced: the per-table sync is "Idempotent; will
not re-ingest or re-delete rows if the state already matches"
(/root/reference/orchestration/templates/ingest-processed-data.yaml:7-12) and
runs as diff → conditional soft-delete → conditional append.  Here the unit of
atomicity is the *epoch*: partition snapshot files are first staged under
deterministic paths (``part=PPPP/epoch=EEEEEE.parquet`` — a replayed crash
re-stages the same bytes at the same path), then a single small JSON manifest
``_manifest/epoch=EEEEEE.json`` is written via temp-file + atomic
``os.replace``.  A run that dies before the manifest rename leaves only
unreferenced staged files; re-running the epoch overwrites them and commits —
exactly-once without any global lock (contrast the reference's
``parallelism: 1`` table loop, ingest-processed-data.yaml:18-19).

Each manifest carries the *cumulative* per-partition pointer map
(partition → latest snapshot file, row counts, lsn watermark, per-epoch
metrics), so the latest manifest alone describes current state and per-
partition lineage; a resumed driver needs one file read.  At 100 TB the
pointer map is one entry per partition (e.g. 64 Ki partitions ≈ a few MB of
JSON) — still a single atomic object.
"""

from __future__ import annotations

import fcntl
import glob
import json
import os
import re
import tempfile
import time as _time


class ConcurrentRunError(RuntimeError):
    """Another engine holds the run lock for this output directory."""


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        os.makedirs(self.dir, exist_ok=True)
        self._lock_fd: int | None = None
        self._lock_depth = 0

    # -- run lock (reference analog: concurrencyPolicy: Forbid — no
    # overlapping runs, orchestration/templates/cron-workflow.yaml:7-9) ----
    def acquire_run_lock(self) -> None:
        """Advisory exclusive lock; raises ConcurrentRunError if another
        live process holds it (a crashed holder's lock auto-releases).
        Re-entrant within one Manifest (tail() holds it across many runs);
        releases only when the outermost holder releases."""
        if self._lock_fd is not None:
            self._lock_depth += 1
            return
        fd = os.open(os.path.join(self.dir, ".run-lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            os.close(fd)
            raise ConcurrentRunError(
                f"another engine is running against {self.root!r}"
            ) from None
        self._lock_fd = fd
        self._lock_depth = 1

    def release_run_lock(self) -> None:
        if self._lock_fd is None:
            return
        self._lock_depth -= 1
        if self._lock_depth <= 0:
            fcntl.flock(self._lock_fd, fcntl.LOCK_UN)
            os.close(self._lock_fd)
            self._lock_fd = None
            self._lock_depth = 0

    # -- read side -------------------------------------------------------
    def committed_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("epoch=") and name.endswith(".json"):
                out.append(int(name[len("epoch=") : -len(".json")]))
        return sorted(out)

    def latest(self) -> dict | None:
        """The most recent commit record, or None if nothing committed."""
        epochs = self.committed_epochs()
        if not epochs:
            return None
        return self.read_epoch(epochs[-1])

    def read_epoch(self, epoch: int) -> dict:
        with open(os.path.join(self.dir, f"epoch={epoch:06d}.json")) as f:
            return json.load(f)

    def pointers(self) -> dict[str, dict]:
        """partition-id(str) → {path, rows_state, rows_live, lsn_hi, epoch}."""
        rec = self.latest()
        return dict(rec["partitions"]) if rec else {}

    # -- write side ------------------------------------------------------
    def _write_json_atomic(self, rec: dict, path: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=".tmp-commit-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(rec, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _carried_restore_gen(self) -> int:
        """History-rewrite generation carried forward from the latest commit.
        ``restore()`` bumps it (its pointer re-commit rewrites table CONTENT
        at an existing epoch number); every ordinary commit — run epochs,
        migrate, delete_where — inherits it.  Changefeed consumers and
        replicas pin the generation they synced under: a mismatch means the
        source history was rolled back underneath them and incremental sync
        can no longer converge (pipelines/cdc.py replicate_from)."""
        prev = self.latest()
        return int(prev.get("restore_gen", 0) or 0) if prev else 0

    def _carried_schema_log(self) -> list:
        """Schema-evolution log (state/schemalog.py) carried forward from
        the latest commit — every ordinary commit inherits it; only
        ``rename_column``/``drop_column`` append, and ``restore`` rewinds
        it to the restored epoch's log (pass an explicit list, [] to
        clear)."""
        prev = self.latest()
        return list(prev.get("schema_log") or []) if prev else []

    def commit(
        self,
        epoch: int,
        partitions: dict[str, dict],
        metrics: dict,
        partitioning: dict | None = None,
        changes: list[str] | None = None,
        restore_gen: int | None = None,
        preimages: list[str] | None = None,
        schema_log: list | None = None,
    ) -> dict:
        """Atomically publish the cumulative pointer map for ``epoch``.
        ``partitioning`` records the key->partition function parameters so a
        resume with different parameters can be rejected (a silent re-key
        would duplicate keys across partitions).  ``changes`` is the
        record-level changefeed file list: the per-epoch LWW-folded change
        rows THIS commit applied (one parquet file per dirty partition) —
        the consumable CDC stream.  It is record-level rather than a
        pointer field because the pointer map is cumulative (a partition's
        pointer outlives the epoch that wrote it) while a change set belongs
        to exactly one epoch."""
        rec = {"epoch": epoch, "partitions": partitions, "metrics": metrics,
               "partitioning": partitioning,
               "committed_at_us": int(_time.time() * 1_000_000),
               "restore_gen": (self._carried_restore_gen()
                               if restore_gen is None else int(restore_gen))}
        if changes is not None:
            rec["changes"] = changes
        if preimages is not None:
            rec["preimages"] = preimages
        log = self._carried_schema_log() if schema_log is None else list(schema_log)
        if log:
            rec["schema_log"] = log
        self._write_json_atomic(rec, os.path.join(self.dir, f"epoch={epoch:06d}.json"))
        return rec

    # -- multi-table transaction support (see state/txn.py) ---------------
    def staged_path(self, epoch: int) -> str:
        """Dot-prefixed staged manifest: invisible to ``committed_epochs``."""
        return os.path.join(self.dir, f".staged-epoch={epoch:06d}.json")

    def stage(
        self,
        epoch: int,
        partitions: dict[str, dict],
        metrics: dict,
        partitioning: dict | None = None,
        changes: list[str] | None = None,
        restore_gen: int | None = None,
        preimages: list[str] | None = None,
        schema_log: list | None = None,
    ) -> str:
        """Write the epoch's manifest record to a STAGED path (atomic, but
        not yet visible as a commit).  ``TxnLog.commit`` publishes staged
        manifests across several tables after one atomic transaction record
        — the cross-table commit point."""
        rec = {"epoch": epoch, "partitions": partitions, "metrics": metrics,
               "partitioning": partitioning,
               "committed_at_us": int(_time.time() * 1_000_000),
               "restore_gen": (self._carried_restore_gen()
                               if restore_gen is None else int(restore_gen))}
        if changes is not None:
            rec["changes"] = changes
        if preimages is not None:
            rec["preimages"] = preimages
        log = self._carried_schema_log() if schema_log is None else list(schema_log)
        if log:
            rec["schema_log"] = log
        path = self.staged_path(epoch)
        self._write_json_atomic(rec, path)
        return path

    def publish(self, epoch: int) -> None:
        """Promote a staged manifest to a visible commit (idempotent: a
        replayed publish after a crash is a no-op if the rename already
        happened)."""
        staged = self.staged_path(epoch)
        final = os.path.join(self.dir, f"epoch={epoch:06d}.json")
        if os.path.exists(staged):
            os.replace(staged, final)
        elif not os.path.exists(final):
            raise FileNotFoundError(
                f"no staged or committed manifest for epoch {epoch} in {self.dir!r}"
            )

    # -- vacuum ----------------------------------------------------------
    def vacuum(
        self, retain_epochs: int = 2, extra_referenced: set[str] | None = None
    ) -> dict:
        """Delete partition state files (base/delta parquet) superseded for
        ≥ ``retain_epochs`` commits.  Compaction rewrites a partition's base
        and drops its deltas from the pointer map but never unlinked the dead
        files, so disk grew without bound at 10^10 events (reference analog:
        the auto-expiring staging dataset, ingest-processed-data.yaml:22-41).

        Safety rules:
        * resume reads only the LATEST manifest, so keeping every file the
          newest ``retain_epochs`` manifests reference strictly over-retains;
        * files stamped with an epoch NEWER than the latest commit are
          in-flight staging for the next epoch — never touched;
        * manifest JSONs are all kept: ``committed_epochs()`` is the dense
          prefix that makes replayed epochs skip (deleting old manifests
          would re-run them).  They are O(partitions) JSON, not data.

        Returns {files_deleted, bytes_freed}.
        """
        epochs = self.committed_epochs()
        if not epochs:
            return {"files_deleted": 0, "bytes_freed": 0}
        latest_epoch = epochs[-1]
        # extra_referenced: files OTHER readers still need — e.g. a live
        # branch's pointer map references this table's files (the branch
        # snapshot shares them, Iceberg-style); the owning engine passes
        # the union of its branches' references
        referenced: set[str] = {
            os.path.abspath(f) for f in (extra_referenced or ())
        }
        for e in epochs[-max(1, retain_epochs):]:
            rec = self.read_epoch(e)
            for ptr in rec["partitions"].values():
                if ptr.get("base"):
                    referenced.add(os.path.abspath(ptr["base"]))
                for d in ptr.get("deltas", []):
                    referenced.add(os.path.abspath(d))
                # doclens sidecar chain (BM25 pointer stats) lives beside
                # the postings files and ages out by the same rule
                if ptr.get("dl_base"):
                    referenced.add(os.path.abspath(ptr["dl_base"]))
                for d in ptr.get("dl_deltas", []):
                    referenced.add(os.path.abspath(d))
            # changefeed files (and their CDF preimage sidecars) of retained
            # epochs stay readable — the retention window IS the feed's
            # horizon (a consumer lagging past it must re-sync from a
            # snapshot, the Delta-CDF rule)
            for c in rec.get("changes") or []:
                referenced.add(os.path.abspath(c))
            for c in rec.get("preimages") or []:
                referenced.add(os.path.abspath(c))
        deleted = 0
        freed = 0
        for f in glob.glob(os.path.join(self.root, "part=*", "*.parquet")):
            m = re.search(r"(?:base|delta|pre)-(\d+)(?:-mig)?\.parquet$", f)
            if m is None or int(m.group(1)) > latest_epoch:
                continue
            if os.path.abspath(f) in referenced:
                continue
            try:
                freed += os.path.getsize(f)
                os.unlink(f)
                deleted += 1
            except OSError:
                pass
        return {"files_deleted": deleted, "bytes_freed": freed}
