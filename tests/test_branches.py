"""Write-audit-publish branches: zero-copy snapshot branch, isolated branch
ingest, fast-forward publish, vacuum protection, guarded drop.

Reference analog: the reference's orchestration ingests into a staging
dataset then flips it live (orchestration/templates/ingest-processed-data
.yaml); branches generalize that to Iceberg-style WAP — audit ON the branch
with real queries, publish by manifest replay."""

import json
import os

import pyarrow.compute as pc
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine, discover_epoch_files
from encode_ingest_ray.state.manifest import Manifest


def _fixture(tmp_path, n_events=16_000, n_convs=200, epochs=4, seed=31):
    ev = str(tmp_path / "events")
    generate_cdc_events(ev, n_events=n_events, n_convs=n_convs,
                        epochs=epochs, seed=seed)
    return discover_epoch_files(ev)


def _sorted(t):
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(idx)


def test_branch_isolation_and_fast_forward_publish(ray_session, tmp_path):
    epochs = _fixture(tmp_path)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=2)
    eng.run(epoch_files=epochs[:2])
    main_before = eng.final_table()

    info = eng.create_branch("audit")
    assert info["base_epoch"] == 1
    br = eng.branch_engine("audit", num_actors=2)
    # dense-prefix resume: the single branched record settles epochs <= base
    s = br.run(epoch_files=epochs[:3])
    assert s["epochs_skipped"] == 2 and s["epochs_run"] == 1
    # audit ON the branch: rows grew, main untouched
    assert br.final_table().num_rows >= main_before.num_rows
    assert _sorted(eng.final_table()).equals(_sorted(main_before))

    res = eng.publish_branch("audit")
    assert res["published_epochs"] == 1 and res["epoch"] == 2
    ctl = CdcEngine(str(tmp_path / "ctl"), num_partitions=8, num_actors=2,
                    compact_every=2)
    ctl.run(epoch_files=epochs[:3])
    assert _sorted(eng.final_table()).equals(_sorted(ctl.final_table()))
    # the published epoch's changefeed stays readable on main (window
    # bounded by vacuum retention, like any other epoch's)
    feed_epochs = sorted(set(eng.changes(1).take_batch(10_000)["epoch"]))
    assert feed_epochs == [2]
    # replayed publish is a no-op
    assert eng.publish_branch("audit")["published_epochs"] == 0


def test_publish_requires_fast_forward_and_stable_history(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=4)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("b")
    br = eng.branch_engine("b", num_actors=2)
    br.run(epoch_files=epochs[:3])
    # main advances underneath the branch -> not a fast-forward
    eng.run(epoch_files=epochs[:3])
    with pytest.raises(ValueError, match="fast-forward"):
        eng.publish_branch("b")

    # a restore on main bumps the generation -> publish refuses even if the
    # epoch number happens to match again
    eng2 = CdcEngine(str(tmp_path / "out2"), num_partitions=8, num_actors=2,
                     vacuum_retain=None)
    eng2.run(epoch_files=epochs[:3])
    eng2.create_branch("b")
    br2 = eng2.branch_engine("b", num_actors=2)
    br2.run(epoch_files=epochs)
    eng2.restore(1)
    with pytest.raises(ValueError, match="fast-forward|rewritten"):
        eng2.publish_branch("b")


def test_vacuum_protects_live_branch_references(ray_session, tmp_path):
    epochs = _fixture(tmp_path)
    out = str(tmp_path / "out")
    # aggressive retention: without branch protection, main's advance would
    # GC the files the branch snapshot shares
    eng = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=2,
                    vacuum_retain=1)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("keep")
    branch_rows = CdcEngine(
        eng._branch_root("keep"), num_actors=2
    ).final_table().num_rows
    eng.run(epoch_files=epochs)  # advances + vacuums main twice
    br = eng.branch_engine("keep", num_actors=2)
    t = br.final_table()
    assert t.num_rows == branch_rows  # every shared file still readable


def test_drop_branch_guarded_until_unreferenced(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=5)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=2)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("wap")
    br = eng.branch_engine("wap", num_actors=2)
    br.run(epoch_files=epochs[:3])
    eng.publish_branch("wap")
    # published state pointers live under the branch dir
    with pytest.raises(ValueError, match="references"):
        eng.drop_branch("wap")
    eng.migrate(force=True)  # OPTIMIZE rewrites state into the main tree
    # the published epoch's CHANGE files still sit under the branch dir
    # until retention ages that record out of the newest-retain window
    with pytest.raises(ValueError, match="references"):
        eng.drop_branch("wap")
    eng.run(epoch_files=epochs)  # two more epochs
    assert eng.drop_branch("wap")["dropped"] is True
    ctl = CdcEngine(str(tmp_path / "ctl"), num_partitions=8, num_actors=2,
                    compact_every=2)
    ctl.run(epoch_files=epochs)
    assert _sorted(eng.final_table()).equals(_sorted(ctl.final_table()))


def test_crash_mid_publish_resumes_idempotently(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=4)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    eng.run(epoch_files=epochs[:1])
    eng.create_branch("b")
    br = eng.branch_engine("b", num_actors=2)
    br.run(epoch_files=epochs)  # branch commits epochs 1..3

    # simulate a crash window: hand-publish only the FIRST branch epoch
    bman = Manifest(eng._branch_root("b"))
    rec = bman.read_epoch(1)
    eng.manifest.commit(1, rec["partitions"],
                        {**rec.get("metrics", {}),
                         "published_from_branch": "b"},
                        rec.get("partitioning"), changes=rec.get("changes"))
    # main is dense and consistent at epoch 1; replayed publish finishes
    res = eng.publish_branch("b")
    assert res["published_epochs"] == 2 and res["epoch"] == 3
    ctl = CdcEngine(str(tmp_path / "ctl"), num_partitions=8, num_actors=2)
    ctl.run(epoch_files=epochs)
    assert _sorted(eng.final_table()).equals(_sorted(ctl.final_table()))


def test_branch_validation(ray_session, tmp_path):
    epochs = _fixture(tmp_path, n_events=6000, n_convs=60, epochs=2)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=4, num_actors=2)
    with pytest.raises(ValueError, match="nothing committed"):
        eng.create_branch("x")
    eng.run(epoch_files=epochs)
    eng.create_branch("x")
    with pytest.raises(ValueError, match="already exists"):
        eng.create_branch("x")
    with pytest.raises(ValueError, match="invalid branch name"):
        eng.create_branch("../evil")
    assert eng.branches() == ["x"]


def test_indexed_postings_table_branches_and_publishes(ray_session, tmp_path):
    """Mirrored sibling chains branch WITH the table: the branch engine's
    index/postings reads span shared parent files (the local reroot
    transform resolves their twins under the PARENT's sibling roots) and
    publish replays every sibling record in the same per-epoch txn."""
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    kw = dict(num_partitions=8, num_actors=2, compact_every=2,
              index_columns=["role"], postings_column="text")
    eng = CdcEngine(out, **kw)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("b")
    br = eng.branch_engine("b", num_actors=2)
    assert br.index_columns == ["role"] and br.postings_column == "text"
    br.run(epoch_files=epochs)
    # branch-side index + search read across shared and branch-new files
    n_idx = br.index_dataset().count()
    assert n_idx == br.final_dataset().count()
    eng.publish_branch("b")

    ctl = CdcEngine(str(tmp_path / "ctl"), **kw)
    ctl.run(epoch_files=epochs)
    assert _sorted(eng.final_table()).equals(_sorted(ctl.final_table()))
    assert eng.index_dataset().count() == ctl.index_dataset().count()
    tok = str(eng.final_dataset(columns=["text"]).take_batch(1)["text"][0]
              ).lower().split()[0]
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(eng.search_ranked([tok]).take_all(), key=key) == sorted(
        ctl.search_ranked([tok]).take_all(), key=key
    )
    # restore across a published epoch re-commits the sibling records too
    eng.restore(1)
    assert eng.index_dataset().count() == eng.final_dataset().count()


def test_branch_carries_schema_log(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.rename_column("text", "body")
    eng.create_branch("b")
    br = eng.branch_engine("b", num_actors=2)
    assert br.schema_log() == eng.schema_log()
    t = br.final_table()
    assert "body" in t.column_names and "text" not in t.column_names


def test_concurrent_branch_writers(ray_session, tmp_path):
    """Optimistic multi-writer via branches: two writers hold DIFFERENT run
    locks (one per branch root) and ingest concurrently; the first publish
    wins, the loser's publish raises non-fast-forward (re-branch + replay
    is its retry path) — the engine's single-writer-per-TABLE rule stays."""
    epochs = _fixture(tmp_path, epochs=4)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("w1")
    eng.create_branch("w2")
    b1 = eng.branch_engine("w1", num_actors=2)
    b2 = eng.branch_engine("w2", num_actors=2)
    # prove the locks are independent: while w1's run lock is held, w2
    # ingests to completion
    b1.manifest.acquire_run_lock()
    try:
        b2.run(epoch_files=epochs[:3])
    finally:
        b1.manifest.release_run_lock()
    b1.run(epoch_files=epochs)
    assert eng.publish_branch("w2")["epoch"] == 2
    with pytest.raises(ValueError, match="fast-forward"):
        eng.publish_branch("w1")


def test_branch_side_schema_op_publishes(ray_session, tmp_path):
    """A rename performed ON the branch re-stamps the branch's base record;
    publish syncs the schema log onto main even when the branch committed
    no new epochs (and normally via the replayed records' carried log)."""
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("s")
    br = eng.branch_engine("s", num_actors=2)
    br.rename_column("text", "body")
    # metadata-only branch: no new epochs, just the schema op
    res = eng.publish_branch("s")
    assert res["published_epochs"] == 1
    assert eng.schema_log() == br.schema_log()
    t = eng.final_table()
    assert "body" in t.column_names and "text" not in t.column_names
    # and with new epochs: the carried log arrives with the replay (the
    # post-drop producer ships epoch 2 WITHOUT the dropped column — files
    # that still carry it would legally re-add it as a new column)
    import pyarrow.parquet as pq

    eng2 = CdcEngine(str(tmp_path / "out2"), num_partitions=8, num_actors=2)
    eng2.run(epoch_files=epochs[:2])
    eng2.create_branch("s2")
    br2 = eng2.branch_engine("s2", num_actors=2)
    br2.drop_column("tool")
    e2 = []
    for f in epochs[2]:
        t = pq.read_table(f).drop_columns(["tool"])
        p = str(tmp_path / f"notool-{os.path.basename(f)}")
        pq.write_table(t, p)
        e2.append(p)
    br2.run(epoch_files=epochs[:2] + [e2])
    eng2.publish_branch("s2")
    assert eng2.schema_log() == br2.schema_log()
    assert "tool" not in eng2.final_table().column_names


def test_publish_detects_same_epoch_rewrite_on_main(ray_session, tmp_path):
    """Epoch number + restore_gen alone miss same-epoch rewrite commits
    (rename/drop/migrate re-commit the SAME epoch) — the base-record
    fingerprint catches them."""
    epochs = _fixture(tmp_path, epochs=3)
    eng = CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("b")
    br = eng.branch_engine("b", num_actors=2)
    br.run(epoch_files=epochs)
    eng.rename_column("text", "body")  # same-epoch rewrite on main
    with pytest.raises(ValueError, match="REWRITTEN"):
        eng.publish_branch("b")
    # migrate is the same class of rewrite
    eng2 = CdcEngine(str(tmp_path / "out2"), num_partitions=8, num_actors=2)
    eng2.run(epoch_files=epochs[:2])
    eng2.create_branch("b")
    br2 = eng2.branch_engine("b", num_actors=2)
    br2.run(epoch_files=epochs)
    eng2.migrate(force=True)
    with pytest.raises(ValueError, match="REWRITTEN"):
        eng2.publish_branch("b")


def test_branch_vacuum_protects_published_parent_refs(ray_session, tmp_path):
    """After a publish, main's pointers reference files under the branch
    dir; a branch that KEEPS ingesting (aggressive retention + compaction)
    must not vacuum them away."""
    epochs = _fixture(tmp_path, epochs=5)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("live")
    br = eng.branch_engine("live", num_actors=2, vacuum_retain=1,
                           compact_every=2)
    br.run(epoch_files=epochs[:3])
    eng.publish_branch("live")
    main_rows = eng.final_table().num_rows
    # branch keeps running: compactions supersede the published epoch-2
    # delta inside the BRANCH's own retain window
    br2 = eng.branch_engine("live", num_actors=2, vacuum_retain=1,
                            compact_every=2)
    br2.run(epoch_files=epochs)
    # main must still read everything it published
    assert eng.final_table().num_rows == main_rows


def test_drop_branch_retention_disabled_walks_full_history(
    ray_session, tmp_path
):
    """vacuum_retain=None disables GC: EVERY committed record stays valid
    for time travel / restore, so drop_branch must walk the whole history —
    checking only the newest record per chain would let rmtree delete
    branch-dir files an older, still-restorable main record references."""
    epochs = _fixture(tmp_path, epochs=5)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("wap")
    br = eng.branch_engine("wap", num_actors=2, vacuum_retain=None)
    br.run(epoch_files=epochs[:3])
    eng.publish_branch("wap")
    publish_epoch = eng.manifest.committed_epochs()[-1]
    # OPTIMIZE rewrites the NEWEST record's state into the main tree — but
    # the publish-epoch record (and its change files) still live under the
    # branch dir, and with retention disabled that record is restorable
    # forever
    eng.migrate(force=True)
    eng.run(epoch_files=epochs)  # several epochs past the publish
    with pytest.raises(ValueError, match="references"):
        eng.drop_branch("wap")
    # the guard is earning its keep: restore to the publish epoch still
    # resolves branch-dir files
    r = eng.restore(to_epoch=publish_epoch)
    assert r["restored_to"] == publish_epoch
    assert eng.final_table().num_rows > 0
