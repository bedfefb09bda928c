"""Record-level changefeed tests: the consumable CDC stream (Delta-CDF /
Debezium-topic analog).  Every commit records its epoch's LWW-folded change
files in the manifest; `CdcEngine.changes()` reads them back epoch-tagged,
`consume()` delivers them to a sink with an exactly-once checkpoint, and
vacuum retention is the feed horizon."""

import hashlib
import os

import pyarrow as pa
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine, ChangefeedHorizonError
from encode_ingest_ray.state.lww import live_view, merge_state


@pytest.fixture(scope="module")
def feed_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdcfeed-events")
    meta = generate_cdc_events(
        str(d), n_events=8_000, n_convs=120, epochs=5, seed=11, dup_ratio=0.05
    )
    out = str(tmp_path_factory.mktemp("cdcfeed-out") / "table")
    engine = CdcEngine(out, num_partitions=8, num_actors=2)
    engine.run(str(d))
    return engine, meta


def _collect(ds) -> pa.Table:
    rows = ds.take_all()
    return pa.Table.from_pylist(rows) if rows else pa.table({})


def test_feed_replay_reconstructs_final_state(feed_env):
    """Folding the full change stream (all epochs, tombstones included) with
    the engine's own LWW reproduces the live table exactly — the contract a
    downstream sync relies on."""
    engine, meta = feed_env
    feed = _collect(engine.changes())
    epochs = sorted(set(feed.column("epoch").to_pylist()))
    assert epochs == engine.manifest.committed_epochs()
    state = merge_state(None, feed.drop_columns(["epoch"]))
    live = live_view(state)
    want = engine.final_table()
    got = live.select(want.column_names).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    want = want.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.num_rows == want.num_rows
    assert got.column("text").to_pylist() == want.column("text").to_pylist()
    assert got.column("ts").to_pylist() == want.column("ts").to_pylist()


def test_feed_window_semantics(feed_env):
    """(since, to] windows: incremental consumers read only new epochs."""
    engine, _ = feed_env
    all_epochs = engine.manifest.committed_epochs()
    tail = _collect(engine.changes(since_epoch=all_epochs[1]))
    assert sorted(set(tail.column("epoch").to_pylist())) == all_epochs[2:]
    mid = _collect(engine.changes(since_epoch=all_epochs[0], to_epoch=all_epochs[2]))
    assert sorted(set(mid.column("epoch").to_pylist())) == all_epochs[1:3]
    assert engine.changes(since_epoch=all_epochs[-1]).count() == 0


def test_consume_checkpoint_and_crash_replay(feed_env, tmp_path):
    """consume(): at-least-once work, exactly-once end state — a replayed
    delivery (crash before ack) overwrites the same deterministic paths with
    the same bytes, and an acked consumer gets nothing twice."""
    engine, _ = feed_env
    dest = str(tmp_path / "sink")
    r1 = engine.consume("sink", dest)
    last = engine.manifest.committed_epochs()[-1]
    assert r1["epochs"] > 0 and r1["rows"] > 0
    assert engine.consumer_epoch("sink") == last
    files1 = {
        f: hashlib.md5(open(os.path.join(dest, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(dest))
    }
    assert files1 and not any(f.startswith(".tmp") for f in files1)
    # acked: nothing to deliver
    r2 = engine.consume("sink", dest)
    assert r2["epochs"] == 0 and r2["rows"] == 0
    # crash-before-ack replay: reset the checkpoint, redeliver — byte-equal
    engine.ack("sink", -1)
    r3 = engine.consume("sink", dest)
    assert r3["rows"] == r1["rows"] and r3["epochs"] == r1["epochs"]
    files3 = {
        f: hashlib.md5(open(os.path.join(dest, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(dest))
    }
    assert files3 == files1


def test_consume_pagination(feed_env, tmp_path):
    """max_epochs pages a far-behind consumer through the feed."""
    engine, _ = feed_env
    dest = str(tmp_path / "paged")
    total = 0
    steps = 0
    while True:
        r = engine.consume("pager", dest, max_epochs=2)
        if r["epochs"] == 0:
            break
        total += r["rows"]
        steps += 1
    assert steps >= 2  # 5 epochs / 2 per page
    full = engine.changes().count()
    assert total == full


def test_consumer_name_validation(feed_env):
    engine, _ = feed_env
    with pytest.raises(ValueError):
        engine.ack("../evil", 0)
    with pytest.raises(ValueError):
        engine.consumer_epoch("a/b")


def test_pre_feature_manifest_raises(feed_env):
    """Epochs committed before the feed existed have no change record: the
    consumer must re-sync from a snapshot, never silently skip."""
    engine, _ = feed_env
    e0 = engine.manifest.committed_epochs()[0]
    rec = engine.manifest.read_epoch(e0)
    try:
        # rewrite epoch 0's record WITHOUT the changes field (pre-feature)
        engine.manifest.commit(
            e0, rec["partitions"], rec["metrics"], rec.get("partitioning")
        )
        with pytest.raises(ChangefeedHorizonError, match="no changefeed record"):
            engine.changes()
        # windows past the hole still work
        assert engine.changes(since_epoch=e0).count() > 0
    finally:
        engine.manifest.commit(
            e0, rec["partitions"], rec["metrics"], rec.get("partitioning"),
            changes=rec["changes"],
        )


def test_horizon_after_vacuum(tmp_path):
    """Aggressive compaction + vacuum ages out old change files; a consumer
    lagging past the horizon gets a loud ChangefeedHorizonError, and the
    retained window still reads clean."""
    d = tmp_path / "events"
    generate_cdc_events(str(d), n_events=6_000, n_convs=80, epochs=6, seed=13)
    engine = CdcEngine(
        str(tmp_path / "out"), num_partitions=4, num_actors=2,
        compact_every=2, vacuum_retain=2,
    )
    engine.run(str(d))
    epochs = engine.manifest.committed_epochs()
    with pytest.raises(ChangefeedHorizonError, match="vacuumed"):
        engine.changes()
    # the retained tail is intact and epoch-complete
    tail = _collect(engine.changes(since_epoch=epochs[-3]))
    assert sorted(set(tail.column("epoch").to_pylist())) == epochs[-2:]
