"""Engine-level out-of-order semantics across epochs: a late event (new LSN,
older ts) must lose to the stored winner — including tombstones — because
durable state retains (ts, lsn) merge metadata."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from encode_ingest_ray.pipelines.cdc import CdcEngine


def _write_epoch(d, epoch, rows):
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[4] for r in rows]),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "op": pa.array([r[5] for r in rows]),
            "lsn": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, f"events-epoch-{epoch:06d}.parquet"))


def test_late_older_update_loses_across_epochs(tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    # epoch 0: insert then delete (tombstone wins, ts 200)
    _write_epoch(
        str(events),
        0,
        [
            ("a", 0, 100, 1, "v1", "insert"),
            ("a", 0, 200, 2, "v2-deleted", "delete"),
            ("b", 7, 100, 3, "keep", "insert"),
        ],
    )
    # epoch 1: LATE arrivals with NEW lsns but OLDER ts:
    #  - a/0 resurrect attempt (ts 150 < 200) -> must stay deleted
    #  - b/7 stale update (ts 50 < 100)       -> text must remain "keep"
    #  - b/8 genuinely new turn               -> appears
    _write_epoch(
        str(events),
        1,
        [
            ("a", 0, 150, 10, "resurrect?", "insert"),
            ("b", 7, 50, 11, "stale", "update"),
            ("b", 8, 300, 12, "new", "insert"),
        ],
    )
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=4, num_actors=2)
    engine.run(str(events))
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in engine.final_table().to_pylist()}
    assert got == {("b", 7): "keep", ("b", 8): "new"}


def test_dup_only_epoch_commits_empty(tmp_path):
    """An epoch that contains ONLY replays of already-applied LSNs commits
    with zero partitions touched — the reference's 'counts gate the
    mutations / skip empty commit' behavior (ingest-processed-data.yaml:
    115-121, SURVEY.md A5)."""
    events = tmp_path / "events"
    events.mkdir()
    rows = [("a", 0, 100, 1, "v1", "insert"), ("b", 1, 120, 2, "v2", "insert")]
    _write_epoch(str(events), 0, rows)
    _write_epoch(str(events), 1, rows)  # pure replay: same LSNs re-delivered
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=4, num_actors=2)
    s = engine.run(str(events))
    assert s["epochs_run"] == 2
    rec1 = engine.manifest.read_epoch(1)
    assert rec1["metrics"]["partitions_touched"] == 0
    assert rec1["metrics"]["applied"] == 0
    # replay dropped by the watermark, not merged
    assert engine.final_table().num_rows == 2
    # and the epoch is still durably committed (a re-run skips it)
    s2 = CdcEngine(str(tmp_path / "out"), num_partitions=4, num_actors=2).run(str(events))
    assert s2["epochs_skipped"] == 2


def test_concurrent_runs_forbidden(tmp_path):
    """Two engines on one output dir cannot run concurrently (the
    reference's concurrencyPolicy: Forbid, cron-workflow.yaml:7-9); the
    lock is process-scoped and auto-releases on crash."""
    import pytest

    from encode_ingest_ray.state.manifest import ConcurrentRunError, Manifest

    out = str(tmp_path / "out")
    m1 = Manifest(out)
    m1.acquire_run_lock()
    # flock is per-fd/process: simulate the second DRIVER with a subprocess
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from encode_ingest_ray.state.manifest import Manifest, ConcurrentRunError;"
        f"m = Manifest({out!r});"
        "\ntry:\n    m.acquire_run_lock()\n    print('ACQUIRED')\n"
        "except ConcurrentRunError:\n    print('FORBIDDEN')"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r.stdout.strip() == "FORBIDDEN", r.stderr
    m1.release_run_lock()
    r2 = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r2.stdout.strip() == "ACQUIRED", r2.stderr


def test_run_lock_reentrant_for_tail():
    import tempfile

    from encode_ingest_ray.state.manifest import Manifest

    m = Manifest(tempfile.mkdtemp())
    m.acquire_run_lock()   # tail-level
    m.acquire_run_lock()   # inner run()
    m.release_run_lock()   # inner run() releases -> still held
    assert m._lock_fd is not None
    m.release_run_lock()
    assert m._lock_fd is None


def test_resume_with_different_partitioning_is_refused(tmp_path):
    import pytest

    events = tmp_path / "events"
    events.mkdir()
    _write_epoch(str(events), 0, [("a", 0, 100, 1, "v1", "insert")])
    CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2).run(str(events))
    with pytest.raises(ValueError, match="partitioning"):
        CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=2)
    # same parameters resume fine
    s = CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2).run(str(events))
    assert s["epochs_skipped"] == 1
