"""Changefeed-driven replication (CdcEngine.replicate_from): engine→engine
sync with an exactly-once checkpoint, snapshot bootstrap past the feed
horizon, and the restore-generation rollback fence.

The replica's committed-epoch set IS the checkpoint (crash anywhere re-runs
only uncommitted epochs); change files feed the normal run() path, so the
replica may keep its own partitioning / index — replication doubles as
online re-partitioning.
"""

import os

import pyarrow as pa
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import (
    CdcEngine,
    ChangefeedHorizonError,
    discover_epoch_files,
)


def _canon(t: pa.Table) -> pa.Table:
    return t.select(sorted(t.column_names)).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


@pytest.fixture(scope="module")
def repl_env(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("repl-events"))
    generate_cdc_events(
        d, n_events=9_000, n_convs=140, epochs=5, seed=23, dup_ratio=0.05
    )
    return d, discover_epoch_files(d)


def test_incremental_replication_repartitioned(repl_env, tmp_path):
    """Catch-up in two calls; the replica uses DIFFERENT partitioning (the
    fixture's epochs segment the lsn log, the documented contract)."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=files[:3])
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=5, num_actors=2)
    s1 = rep.replicate_from(src)
    assert (s1["from_epoch"], s1["to_epoch"], s1["epochs_run"]) == (-1, 2, 3)
    assert not s1["bootstrapped"]
    # mid-stream equality: replica state == source state at epoch 2
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))
    src.run(epoch_files=files)  # epochs 3, 4
    s2 = rep.replicate_from(src)
    assert (s2["from_epoch"], s2["to_epoch"], s2["epochs_run"]) == (2, 4, 2)
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))
    # caught-up: a further call is a no-op
    s3 = rep.replicate_from(src)
    assert s3["epochs_run"] == 0 and s3["to_epoch"] == 4
    # replica ahead of source (source rebuilt shorter) is an error
    short = CdcEngine(str(tmp_path / "short"), num_partitions=8, num_actors=2)
    short.run(epoch_files=files[:1])
    with pytest.raises(ValueError, match="AHEAD"):
        rep.replicate_from(short)


def test_max_epochs_pagination_and_crash_resume(repl_env, tmp_path):
    """A partial sync (pagination, or a crash that committed only a prefix)
    resumes exactly where it stopped: the committed-epoch set is the cursor."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=files)
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=8, num_actors=2)
    s1 = rep.replicate_from(src, max_epochs=2)
    assert (s1["epochs_run"], s1["to_epoch"]) == (2, 1)
    s2 = rep.replicate_from(src)
    assert (s2["from_epoch"], s2["to_epoch"], s2["epochs_run"]) == (1, 4, 3)
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))


def test_bootstrap_forced_and_continue(repl_env, tmp_path):
    """bootstrap=True folds the source's pointer chain as one epoch; later
    source epochs then replicate incrementally on top."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=files[:4])
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=3, num_actors=2)
    s1 = rep.replicate_from(src, bootstrap=True)
    assert s1["bootstrapped"] and s1["to_epoch"] == 3
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))
    src.run(epoch_files=files)  # epoch 4
    s2 = rep.replicate_from(src)
    assert not s2["bootstrapped"] and s2["epochs_run"] == 1
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))


def test_auto_bootstrap_past_vacuumed_horizon(repl_env, tmp_path):
    """A fresh replica whose first window crosses vacuumed change files
    auto-falls back to the snapshot bootstrap; bootstrap=False propagates
    the horizon error instead."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=1, compact_every=2)
    src.run(epoch_files=files)
    # retention 1 on 5 epochs: early epochs' change files are gone
    with pytest.raises(ChangefeedHorizonError):
        src._change_items(-1, None)
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=8, num_actors=2)
    with pytest.raises(ChangefeedHorizonError):
        rep.replicate_from(src, bootstrap=False)
    s = rep.replicate_from(src)  # auto
    assert s["bootstrapped"] and s["to_epoch"] == 4
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))


def test_restore_generation_fence(repl_env, tmp_path):
    """A source RESTORE after the replica synced rewrites history at epoch
    numbers the replica already passed — the pinned restore_gen turns the
    silent divergence into an error, for both a caught-up replica and one
    that would otherwise apply post-restore epochs on a discarded base."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=files[:3])
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=8, num_actors=2)
    rep.replicate_from(src)
    src.restore(to_epoch=1)  # discards epoch 2, which the replica applied
    with pytest.raises(ValueError, match="restore_gen"):
        rep.replicate_from(src)
    # ...even after the source moves on with new epochs
    src.run(epoch_files=files[:4])  # epoch 3 applies on the restored base
    with pytest.raises(ValueError, match="restore_gen"):
        rep.replicate_from(src)
    # recovery path: a FRESH replica bootstraps from the post-restore state
    fresh = CdcEngine(str(tmp_path / "fresh"), num_partitions=8, num_actors=2)
    s = fresh.replicate_from(src)  # window crosses the restore epoch -> boot
    assert s["bootstrapped"]
    assert _canon(fresh.final_table()).equals(_canon(src.final_table()))
    # and the fresh replica keeps syncing incrementally afterwards
    src.run(epoch_files=files)  # epoch 4
    s2 = fresh.replicate_from(src)
    assert not s2["bootstrapped"] and s2["epochs_run"] == 1
    assert _canon(fresh.final_table()).equals(_canon(src.final_table()))


def test_replica_builds_own_covering_index(repl_env, tmp_path):
    """The replica maintains its OWN sibling chains from the replicated
    rows: replication doubles as online re-indexing."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=files[:3])
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=4, num_actors=2,
                    index_columns=["role"])
    rep.replicate_from(src)
    live = _canon(rep.final_table())
    idx = rep.index_dataset().take_all()
    idx_t = pa.Table.from_pylist(idx).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert idx_t.num_rows == live.num_rows
    assert idx_t.column("role").to_pylist() == live.column("role").to_pylist()


def test_same_table_rejected(tmp_path):
    eng = CdcEngine(str(tmp_path / "t"), num_partitions=4, num_actors=2)
    with pytest.raises(ValueError, match="same table"):
        eng.replicate_from(eng)


def test_crashed_bootstrap_fillers_force_rebootstrap(repl_env, tmp_path):
    """The crashed-bootstrap fence: a snapshot catch-up commits empty
    filler epochs first and the chain fold LAST, so a kill between them
    leaves a replica whose checkpoint overstates its content.  A resume
    must detect the stale fillers (empty replica record vs non-empty
    source record at the same epoch) and RE-bootstrap — the incremental
    path would apply only the tail change files over nothing and silently
    diverge (the pytest-observed kill-9 flake, round 5)."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=1, compact_every=2)
    src.run(epoch_files=files)
    # fabricate the crash window deterministically: the replica holds ONLY
    # the bootstrap's empty filler epochs 0..3 (what a kill right before
    # the snapshot epoch leaves behind)
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=5, num_actors=2)
    rep.run(epoch_files=[[], [], [], []])
    assert rep.manifest.pointers() == {}
    assert len(rep.manifest.committed_epochs()) == 4
    # bootstrap=False: refuse loudly instead of diverging
    with pytest.raises(ChangefeedHorizonError, match="filler"):
        rep.replicate_from(src, bootstrap=False)
    # auto: re-bootstrap and converge exactly
    s = rep.replicate_from(src)
    assert s["bootstrapped"] and s["to_epoch"] == 4
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))
    # and the healed replica keeps syncing incrementally afterwards
    s2 = rep.replicate_from(src)
    assert s2["epochs_run"] == 0


def test_lagged_crashed_bootstrap_marker_forces_rebootstrap(repl_env, tmp_path):
    """The marker fence covers the case the structural check cannot: a
    LAGGED replica's interrupted bootstrap — its filler records carry the
    previous cumulative pointer map forward, so they look non-empty.  The
    durable bootstrap_pending marker (written before the bootstrap run,
    unlinked after the snapshot epoch commits) is the only crash signal."""
    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=1, compact_every=2)
    src.run(epoch_files=files[:2])
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=5, num_actors=2)
    rep.replicate_from(src)                    # incremental, synced to 1
    src.run(epoch_files=files)                 # epochs 2..4; old feed vacuumed

    # crash the bootstrap mid-run: fillers commit, the snapshot epoch not
    real_run = rep.run
    calls = {}

    def crashing_run(*, epoch_files=None, **kw):
        calls["layout"] = [len(e) for e in epoch_files]
        truncated = epoch_files[:-1]           # drop the snapshot epoch
        real_run(epoch_files=truncated, **kw)
        raise RuntimeError("simulated kill -9 before the snapshot epoch")

    rep.run = crashing_run
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated"):
        rep.replicate_from(src)
    rep.run = real_run
    # the lagged fillers carry the old pointer map — structurally invisible
    assert rep.manifest.pointers() != {}
    assert os.path.exists(
        os.path.join(rep.out_dir, "_replication", "bootstrap_pending.json")
    )
    # bootstrap=False refuses; auto re-bootstraps and converges exactly
    with _pytest.raises(ChangefeedHorizonError, match="filler"):
        rep.replicate_from(src, bootstrap=False)
    s = rep.replicate_from(src)
    assert s["bootstrapped"]
    assert _canon(rep.final_table()).equals(_canon(src.final_table()))
    assert not os.path.exists(
        os.path.join(rep.out_dir, "_replication", "bootstrap_pending.json")
    )
    # healed: next call is a clean incremental no-op
    assert rep.replicate_from(src)["epochs_run"] == 0


def test_key_filter_is_replication_identity(repl_env, tmp_path):
    """A replica built under a key filter refuses a later sync with a
    different — or no — filter (and vice versa): ownership would silently
    mix otherwise.  owner_filter stamps a deterministic id; anonymous
    callables pin the marker 'custom'."""
    from encode_ingest_ray.pipelines.sharded import owner_filter

    _, files = repl_env
    src = CdcEngine(str(tmp_path / "src"), num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=files[:2])
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=5, num_actors=2)
    rep.replicate_from(src, key_filter=owner_filter(0, 2))
    src.run(epoch_files=files)
    with pytest.raises(ValueError, match="replication identity"):
        rep.replicate_from(src)                         # filter dropped
    with pytest.raises(ValueError, match="replication identity"):
        rep.replicate_from(src, key_filter=owner_filter(1, 2))  # different
    s = rep.replicate_from(src, key_filter=owner_filter(0, 2))  # same: fine
    assert s["epochs_run"] == 3
    # unfiltered replica refuses a late filter too
    full = CdcEngine(str(tmp_path / "full"), num_partitions=5, num_actors=2)
    full.replicate_from(src)
    with pytest.raises(ValueError, match="replication identity"):
        full.replicate_from(src, key_filter=owner_filter(0, 2))
