"""Resilience + lifecycle tests: compaction, actor loss mid-stream,
ordered final sink."""

import os

import pyarrow.parquet as pq
import pytest
import ray

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.functions.oracle import expected_final_state
from encode_ingest_ray.pipelines.cdc import CdcEngine


@pytest.fixture(scope="module")
def many_epochs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc-many")
    meta = generate_cdc_events(
        str(d), n_events=12_000, n_convs=100, epochs=10, seed=3, dup_ratio=0.05
    )
    return str(d), meta


def test_compaction_folds_deltas_into_base(many_epochs, tmp_path):
    events_dir, meta = many_epochs
    engine = CdcEngine(
        str(tmp_path / "out"), num_partitions=8, num_actors=2, compact_every=4
    )
    engine.run(events_dir)
    parts = engine.partition_files()
    # with 10 epochs and compact_every=4, every touched partition must have
    # a base snapshot and fewer than compact_every outstanding deltas
    assert parts
    assert all(info["base"] for info in parts.values())
    assert all(len(info["deltas"]) < 4 for info in parts.values())
    # merge-on-read over base+deltas still matches the oracle
    got = engine.final_table()
    want = expected_final_state(meta["files"])
    assert got.num_rows == want.num_rows
    assert got.to_pandas()["text"].tolist() == want.to_pandas()["text"].tolist()


def test_actor_loss_mid_stream_recovers(many_epochs, tmp_path):
    """Killing a merger actor fails the epoch; the driver respawns the pool
    (reloading committed state) and replays it exactly-once."""
    events_dir, meta = many_epochs
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2)
    engine._actors = engine._spawn_actors()
    ray.kill(engine._actors[0])  # simulated node/actor loss
    summary = engine.run(events_dir)
    assert summary["epochs_run"] == meta["epochs"]
    got = engine.final_table()
    want = expected_final_state(meta["files"])
    assert got.num_rows == want.num_rows
    assert got.to_pandas()["text"].tolist() == want.to_pandas()["text"].tolist()


def test_write_final_sorted_and_resumable(many_epochs, tmp_path):
    events_dir, meta = many_epochs
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2)
    engine.run(events_dir)
    final_dir = str(tmp_path / "final")
    r1 = engine.write_final(final_dir)
    assert r1["files_written"] > 0 and r1["rows"] > 0
    # resumable: second call skips every existing partition file
    r2 = engine.write_final(final_dir)
    assert r2["files_written"] == 0 and r2["files_skipped"] == r1["files_written"]
    # every file is sorted by (conv_id, turn_idx); each conversation lands
    # WHOLE in exactly one file (the salted engine partitions are re-merged
    # per conv_id at the sink — the north-rule ordering step); union matches
    # the oracle
    total = 0
    conv_homes: dict[str, str] = {}
    for name in sorted(os.listdir(final_dir)):
        t = pq.read_table(os.path.join(final_dir, name))
        df = t.to_pandas()
        assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
            df.reset_index(drop=True)
        )
        for conv in df["conv_id"].unique():
            assert conv_homes.setdefault(conv, name) == name
        total += t.num_rows
    want = expected_final_state(meta["files"])
    assert total == want.num_rows
    # the generator's hot conversations span many ENGINE partitions but one file
    assert "c0" in conv_homes


def test_tail_follow_mode_applies_epochs_as_they_land(tmp_path):
    """The binlog-tail surface: a producer lands epochs (shards first,
    .done marker last) while the engine follows; everything is applied
    exactly-once and matches the oracle."""
    import threading
    import time as _time

    from encode_ingest_ray.functions.generator import generate_cdc_events

    events_dir = str(tmp_path / "ev")
    meta_box = {}

    def produce():
        # all epochs generated up front into a staging dir, then moved over
        # one-by-one with marker-last ordering
        import shutil

        stage = str(tmp_path / "stage")
        meta_box["meta"] = generate_cdc_events(
            stage, n_events=9000, n_convs=80, epochs=3, seed=21, dup_ratio=0.05
        )
        os.makedirs(events_dir, exist_ok=True)
        for e in range(3):
            for f in sorted(os.listdir(stage)):
                if f.startswith(f"events-epoch-{e:06d}") and f.endswith(".parquet"):
                    shutil.copy(os.path.join(stage, f), os.path.join(events_dir, f))
            _time.sleep(0.4)
            open(os.path.join(events_dir, f"events-epoch-{e:06d}.done"), "w").close()

    t = threading.Thread(target=produce)
    t.start()
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2)
    summary = engine.tail(events_dir, poll_s=0.3, max_idle_polls=12)
    t.join()
    assert summary["epochs_run"] == 3
    got = engine.final_table()
    want = expected_final_state(meta_box["meta"]["files"])
    assert got.num_rows == want.num_rows
    assert got.to_pandas()["text"].tolist() == want.to_pandas()["text"].tolist()


def test_vacuum_gc_and_resume(many_epochs, tmp_path):
    """Superseded base/delta files are unlinked after commits (bounded disk
    at 10^10 events); everything the latest manifests reference survives,
    and a crash/resume over the vacuumed table is still exactly-once."""
    import glob

    events_dir, meta = many_epochs
    out = str(tmp_path / "o-vac")
    engine = CdcEngine(
        out, num_partitions=8, num_actors=2, compact_every=3, vacuum_retain=2
    )
    # simulated crash: apply only the first 6 epochs, drop the engine
    from encode_ingest_ray.pipelines.cdc import discover_epoch_files

    files = discover_epoch_files(events_dir)
    engine.run(epoch_files=files[:6])
    del engine

    # resume with a fresh engine over the vacuumed table; full stream
    resumed = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=3)
    s = resumed.run(events_dir)
    assert s["epochs_skipped"] == 6
    assert s["epochs_run"] == meta["epochs"] - 6

    # invariant: every file on disk is referenced by the newest 2 manifests
    man = resumed.manifest
    referenced = set()
    for e in man.committed_epochs()[-2:]:
        rec = man.read_epoch(e)
        for ptr in rec["partitions"].values():
            if ptr.get("base"):
                referenced.add(os.path.abspath(ptr["base"]))
            referenced.update(os.path.abspath(d) for d in ptr.get("deltas", []))
        # retained epochs keep their changefeed files (the feed horizon)
        referenced.update(os.path.abspath(c) for c in rec.get("changes") or [])
    on_disk = {
        os.path.abspath(f) for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))
    }
    assert on_disk <= referenced
    assert on_disk  # vacuum never deletes live state

    # the control without vacuum accumulates strictly more files
    out2 = str(tmp_path / "o-novac")
    control = CdcEngine(
        out2, num_partitions=8, num_actors=2, compact_every=3, vacuum_retain=None
    )
    control.run(events_dir)
    control_files = glob.glob(os.path.join(out2, "part=*", "*.parquet"))
    assert len(control_files) > len(on_disk)

    # replayed state row-for-row equals the single-process oracle
    got = resumed.final_table()
    want = expected_final_state(meta["files"])
    assert got.num_rows == want.num_rows
    assert got.to_pandas()["text"].tolist() == want.to_pandas()["text"].tolist()

    # idempotent re-run over the vacuumed table: everything skips
    again = CdcEngine(out).run(events_dir)
    assert again["epochs_run"] == 0


def test_kill9_process_resume_120_epochs(tmp_path):
    """The bigger soak shape, test-sized (tools/soak.py runs it at 10^8
    events): 120 epochs through a REAL process boundary — the engine child
    is SIGKILLed mid-run (no atexit, no cleanup), a fresh process resumes,
    a replay is a no-op, and the final state equals an uninterrupted
    single-shot run partition-for-partition plus the DuckDB-equivalent
    LWW oracle."""
    import signal
    import subprocess
    import sys
    import time

    events_dir = str(tmp_path / "ev")
    meta = generate_cdc_events(
        events_dir, n_events=120_000, n_convs=400, epochs=120, seed=17,
        dup_ratio=0.05, evolve_at_lsn=80_000,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}
    env.pop("RAY_ADDRESS", None)

    def cmd(out):
        return [sys.executable, "-m", "encode_ingest_ray", "--num-cpus", "4",
                "run", "--events", events_dir, "--out", out,
                "--partitions", "8"]

    out_k = str(tmp_path / "killed")
    p = subprocess.Popen(cmd(out_k), env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    # kill once a prefix of epochs has committed but well before the end
    from encode_ingest_ray.state.manifest import Manifest

    deadline = time.time() + 120
    while time.time() < deadline:
        n = len(Manifest(out_k).committed_epochs())
        if n >= 20:
            break
        if p.poll() is not None:
            break
        time.sleep(0.2)
    assert p.poll() is None, "engine finished before the kill window"
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    committed_at_kill = len(Manifest(out_k).committed_epochs())
    assert 0 < committed_at_kill < 120

    import json as _json

    r = subprocess.run(cmd(out_k), env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    resume = _json.loads(r.stdout.strip().splitlines()[-1])
    assert resume["epochs_skipped"] == committed_at_kill
    assert resume["epochs_run"] == 120 - committed_at_kill
    r2 = subprocess.run(cmd(out_k), env=env, capture_output=True, text=True)
    replay = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert replay["epochs_run"] == 0 and replay["epochs_skipped"] == 120

    # uninterrupted single-shot reference in ANOTHER fresh process
    out_s = str(tmp_path / "single")
    r3 = subprocess.run(cmd(out_s), env=env, capture_output=True, text=True)
    assert r3.returncode == 0, r3.stderr[-2000:]

    eng_k = CdcEngine(out_k, num_actors=2)
    eng_s = CdcEngine(out_s, num_actors=2)
    got = eng_k.final_table()
    ref = eng_s.final_table()
    cols = sorted(got.column_names)
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert got.select(cols).sort_by(key).equals(ref.select(cols).sort_by(key))
    want = expected_final_state(meta["files"])
    assert got.num_rows == want.num_rows
    assert got.sort_by(key).to_pandas()["text"].tolist() == \
        want.to_pandas()["text"].tolist()
    # 120 epochs with default compact_every=8: chains stayed bounded
    for info in eng_k.partition_files().values():
        assert len(info["deltas"]) < 8


def test_kill9_replication_resume(tmp_path):
    """Replication crash window through a REAL process boundary: the
    `replicate` CLI child is SIGKILLed mid-catch-up, a fresh process
    resumes from the replica's committed-epoch checkpoint, a further call
    is a no-op, and the replica equals the source exactly (on different
    partitioning)."""
    import json as _json
    import signal
    import subprocess
    import sys
    import time

    events_dir = str(tmp_path / "ev")
    generate_cdc_events(
        events_dir, n_events=60_000, n_convs=300, epochs=60, seed=29,
        dup_ratio=0.05,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}
    env.pop("RAY_ADDRESS", None)
    src_out = str(tmp_path / "src")
    r = subprocess.run(
        [sys.executable, "-m", "encode_ingest_ray", "--num-cpus", "4",
         "run", "--events", events_dir, "--out", src_out,
         "--partitions", "8"],
        env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    rep_out = str(tmp_path / "rep")
    repl_cmd = [sys.executable, "-m", "encode_ingest_ray", "--num-cpus", "4",
                "replicate", "--out", rep_out, "--source", src_out,
                "--partitions", "5"]
    p = subprocess.Popen(repl_cmd, env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    from encode_ingest_ray.state.manifest import Manifest

    deadline = time.time() + 120
    while time.time() < deadline:
        n = len(Manifest(rep_out).committed_epochs())
        if n >= 10:
            break
        if p.poll() is not None:
            break
        time.sleep(0.2)
    assert p.poll() is None, "replication finished before the kill window"
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    at_kill = len(Manifest(rep_out).committed_epochs())
    assert 0 < at_kill < 60

    r2 = subprocess.run(repl_cmd, env=env, capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr[-2000:]
    resume = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert resume["from_epoch"] == at_kill - 1
    assert resume["to_epoch"] == 59
    assert resume["epochs_run"] == 60 - at_kill
    r3 = subprocess.run(repl_cmd, env=env, capture_output=True, text=True)
    replay = _json.loads(r3.stdout.strip().splitlines()[-1])
    assert replay["epochs_run"] == 0

    src = CdcEngine(src_out, num_actors=2)
    rep = CdcEngine(rep_out, num_actors=2)
    got, ref = rep.final_table(), src.final_table()
    cols = sorted(got.column_names)
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert got.select(cols).sort_by(key).equals(ref.select(cols).sort_by(key))
