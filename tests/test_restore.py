"""RESTORE tests: roll the table back to a committed epoch by atomically
re-committing the latest manifest with the historical pointer map (Delta-Lake
RESTORE analog).  Zero data movement; discarded source epochs stay committed
(replay = no-op) and new epochs apply on top of the restored state."""

import os

import pyarrow as pa
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import (
    CdcEngine,
    ChangefeedHorizonError,
    discover_epoch_files,
)


@pytest.fixture(scope="module")
def events(tmp_path_factory):
    d = tmp_path_factory.mktemp("restore-events")
    generate_cdc_events(
        str(d), n_events=8_000, n_convs=120, epochs=5, seed=21, dup_ratio=0.05
    )
    return str(d)


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _assert_tables_equal(got: pa.Table, want: pa.Table) -> None:
    got, want = _sorted(got), _sorted(want)
    assert got.num_rows == want.num_rows
    for c in ("conv_id", "turn_idx", "ts", "text", "role"):
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_restore_matches_time_travel_and_replay_is_noop(events, tmp_path):
    engine = CdcEngine(str(tmp_path / "t"), num_partitions=8, num_actors=2)
    engine.run(events)
    epochs = engine.manifest.committed_epochs()
    snapshot = pa.concat_tables(
        [t for t in _ds_tables(engine.final_dataset(epoch=2)) if t.num_rows]
    )
    r = engine.restore(to_epoch=2)
    assert r["restored_to"] == 2 and r["epoch"] == epochs[-1]
    _assert_tables_equal(engine.final_table(), snapshot)
    # discarded epochs stay committed: a full replay is a no-op
    s = engine.run(events)
    assert s["epochs_run"] == 0 and s["epochs_skipped"] == len(epochs)
    _assert_tables_equal(engine.final_table(), snapshot)
    # metrics record the rollback provenance
    m = engine.manifest.latest()["metrics"]
    assert m["restored_from"] == epochs[-1] and m["restored_to"] == 2


def _ds_tables(ds):
    import ray

    return ray.get(ds.to_arrow_refs())


def test_restore_then_new_epochs_apply_on_top(events, tmp_path):
    """restore(1) after epochs 0-2, then epochs 3-4 arrive: final state must
    equal an engine that only ever saw epochs {0,1,3,4}."""
    files = discover_epoch_files(events)
    eng = CdcEngine(str(tmp_path / "a"), num_partitions=8, num_actors=2)
    eng.run(epoch_files=files[:3])
    eng.restore(to_epoch=1)
    eng.run(epoch_files=files)  # 0-2 skipped, 3-4 apply

    control = CdcEngine(str(tmp_path / "b"), num_partitions=8, num_actors=2)
    control.run(epoch_files=[files[0], files[1], files[3], files[4]])
    _assert_tables_equal(eng.final_table(), control.final_table())


def test_restore_errors(events, tmp_path):
    engine = CdcEngine(str(tmp_path / "t"), num_partitions=4, num_actors=2)
    engine.run(events)
    last = engine.manifest.committed_epochs()[-1]
    assert engine.restore(last).get("noop") is True
    with pytest.raises(ValueError, match="never committed"):
        engine.restore(99)


def test_restore_past_vacuum_horizon_raises(events, tmp_path):
    engine = CdcEngine(
        str(tmp_path / "t"), num_partitions=4, num_actors=2,
        compact_every=2, vacuum_retain=2,
    )
    engine.run(events)
    first = engine.manifest.committed_epochs()[0]
    with pytest.raises(ValueError, match="restore horizon"):
        engine.restore(first)


def test_restore_breaks_changefeed_window_by_design(events, tmp_path):
    """A restore commit carries no change record: feeds crossing it raise
    (consumers re-sync from a snapshot), feeds past it keep working."""
    files = discover_epoch_files(events)
    engine = CdcEngine(str(tmp_path / "t"), num_partitions=8, num_actors=2)
    engine.run(epoch_files=files[:4])
    restore_epoch = engine.manifest.committed_epochs()[-1]
    engine.restore(to_epoch=1)
    engine.run(epoch_files=files)  # epoch 4 applies on top
    # the restore epoch's record has no changes list ("no changefeed
    # record"); depending on vacuum retention the discarded epochs' change
    # files may already be gone ("vacuumed") — either way the feed fails
    # LOUDLY and the consumer re-syncs from a snapshot
    with pytest.raises(ChangefeedHorizonError):
        engine.changes()
    tail = engine.changes(since_epoch=restore_epoch)
    assert tail.count() > 0
    epochs_in_tail = {r["epoch"] for r in tail.take_all()}
    assert epochs_in_tail == {restore_epoch + 1}


def test_restore_keeps_sibling_chains_in_lockstep(events, tmp_path):
    engine = CdcEngine(
        str(tmp_path / "t"), num_partitions=4, num_actors=2,
        index_columns=["role"], postings_column="text",
    )
    engine.run(events)
    live_at_2 = pa.concat_tables(
        [t for t in _ds_tables(engine.final_dataset(epoch=2)) if t.num_rows]
    )
    engine.restore(to_epoch=2)
    # all three manifests re-committed at the same (latest) epoch number
    last = engine.manifest.committed_epochs()[-1]
    assert engine.index_manifest.committed_epochs()[-1] == last
    assert engine.postings_manifest.committed_epochs()[-1] == last
    # the covering index equals the live projection of the RESTORED state
    idx = pa.concat_tables(
        [t for t in _ds_tables(engine.index_dataset()) if t.num_rows]
    )
    _sorted_idx = idx.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    want = _sorted(live_at_2)
    assert _sorted_idx.num_rows == want.num_rows
    assert (_sorted_idx.column("role").to_pylist()
            == want.column("role").to_pylist())
    # full-text search runs over the restored postings chain
    hits = engine.search(["lorem"])
    assert hits.count() >= 0


def test_restore_fences_caught_up_consumer(events, tmp_path):
    """A consumer fully caught up at the restore point never crosses the
    restore commit's missing `changes` record via the epoch-window check —
    its ack pins restore_gen (the replicate_from fencing token), and
    consume() after a restore refuses LOUDLY instead of silently delivering
    new epochs on top of discarded rows the downstream still holds."""
    files = discover_epoch_files(events)
    engine = CdcEngine(str(tmp_path / "t"), num_partitions=8, num_actors=2)
    engine.run(epoch_files=files[:4])
    dest = str(tmp_path / "sink")
    r = engine.consume("sink", dest)
    assert r["epochs"] > 0  # fully caught up now
    engine.restore(to_epoch=1)
    engine.run(epoch_files=files)  # a NEW epoch applies on top
    # caught-up consumer: the epoch window alone would deliver only the new
    # epoch and miss the rollback entirely — the gen fence must fire, even
    # for the zero-new-epochs call shape
    with pytest.raises(ChangefeedHorizonError, match="restore_gen"):
        engine.consume("sink", dest)
    # re-sync protocol: drop the checkpoint, re-consume from scratch — the
    # fresh ack pins the NEW generation and the feed works again, except
    # where the restore horizon itself blocks a full-history window
    os.unlink(os.path.join(str(tmp_path / "t"), "_consumers", "sink.json"))
    with pytest.raises(ChangefeedHorizonError):
        engine.consume("sink", dest)  # full window crosses the restore gap
    restore_epoch = 3
    engine.ack("sink", restore_epoch)  # snapshot re-sync sets the cursor
    r2 = engine.consume("sink", dest)
    assert r2["epochs"] == 1 and r2["rows"] > 0
    r3 = engine.consume("sink", dest)  # idempotent once re-pinned
    assert r3["epochs"] == 0
