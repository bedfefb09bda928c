"""End-to-end CDC engine tests: replay equivalence, idempotent re-run,
crash-resume, schema evolution, metrics."""

import numpy as np

import pyarrow.compute as pc
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.functions.oracle import expected_final_state
from encode_ingest_ray.pipelines.cdc import CdcEngine, discover_epoch_files


@pytest.fixture(scope="module")
def gen(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc-events")
    meta = generate_cdc_events(
        str(d),
        n_events=20_000,
        n_convs=200,
        epochs=4,
        seed=7,
        dup_ratio=0.08,
        evolve_at_lsn=12_000,
    )
    return str(d), meta


def assert_matches_oracle(engine, files):
    got = engine.final_table()
    want = expected_final_state(files)
    assert got.num_rows == want.num_rows
    want = want.select(got.column_names)  # same column order
    got_pd = got.to_pandas()
    want_pd = want.to_pandas()
    # per-turn text equality under stable turn ordering (the north-rule invariant)
    assert got_pd["conv_id"].tolist() == want_pd["conv_id"].tolist()
    assert got_pd["turn_idx"].tolist() == want_pd["turn_idx"].tolist()
    assert got_pd["text"].tolist() == want_pd["text"].tolist()
    for col in got.column_names:
        assert got_pd[col].fillna("∅").tolist() == want_pd[col].fillna("∅").tolist(), col


def test_replay_equivalence(gen, tmp_path):
    events_dir, meta = gen
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=4)
    summary = engine.run(events_dir)
    assert summary["epochs_run"] == meta["epochs"]
    assert summary["dup_lsn_dropped"] > 0  # generator injected replays
    assert_matches_oracle(engine, meta["files"])
    # schema evolution: the additive column made it to the final table
    assert "model" in engine.final_table().column_names


def test_rerun_is_idempotent(gen, tmp_path):
    events_dir, meta = gen
    out = str(tmp_path / "out")
    e1 = CdcEngine(out, num_partitions=16, num_actors=4)
    e1.run(events_dir)
    before = e1.final_table()
    # a fresh engine over the same out_dir re-applies nothing
    e2 = CdcEngine(out, num_partitions=16, num_actors=4)
    s2 = e2.run(events_dir)
    assert s2["epochs_run"] == 0 and s2["epochs_skipped"] == meta["epochs"]
    assert e2.final_table().equals(before)


def test_crash_resume_mid_stream(gen, tmp_path):
    """Kill the driver after 2 of 4 epochs; a fresh engine resumes from the
    committed manifest without duplicates."""
    events_dir, meta = gen
    out = str(tmp_path / "out")
    epoch_files = discover_epoch_files(events_dir)
    e1 = CdcEngine(out, num_partitions=16, num_actors=4)
    e1.run(epoch_files=epoch_files[:2])  # "crash" after epoch 1 commit
    assert set(e1.manifest.committed_epochs()) == {0, 1}
    # new process / new engine: resumes, skipping committed epochs
    e2 = CdcEngine(out, num_partitions=16, num_actors=4)
    s = e2.run(events_dir)
    assert s["epochs_skipped"] == 2 and s["epochs_run"] == 2
    assert_matches_oracle(e2, meta["files"])


def test_partial_prefix_matches_oracle_prefix(gen, tmp_path):
    """State after k epochs == oracle over the first k epochs' lsn range
    (per-partition lineage: watermarks bound what has been applied)."""
    events_dir, meta = gen
    epoch_files = discover_epoch_files(events_dir)
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=4)
    engine.run(epoch_files=epoch_files[:2])
    lsn_hi = 2 * meta["epoch_size"] - 1
    got = engine.final_table()
    want = expected_final_state(meta["files"], lsn_hi=lsn_hi)
    assert got.num_rows == want.num_rows
    assert (
        got.to_pandas()["text"].tolist() == want.to_pandas()["text"].tolist()
    )


def test_metrics_and_lineage_in_manifest(gen, tmp_path):
    events_dir, meta = gen
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=4)
    engine.run(events_dir)
    rec = engine.manifest.latest()
    assert rec["epoch"] == meta["epochs"] - 1
    m = rec["metrics"]
    assert m["events_in"] >= m["applied"] > 0
    assert m["commit_latency_s"] >= 0
    assert m["per_partition"]  # per-partition metrics present
    # lineage: every pointer carries its lsn watermark and base/delta files
    for ptr in rec["partitions"].values():
        assert ptr["lsn_hi"] >= 0
        files = ([ptr["base"]] if ptr["base"] else []) + ptr["deltas"]
        assert files and all(f.endswith(".parquet") for f in files)
    # watermark sanity: max watermark equals max generated lsn
    assert max(p["lsn_hi"] for p in rec["partitions"].values()) == meta["n_events"] - 1


def test_hot_conversation_spreads_over_partitions(gen, tmp_path):
    events_dir, meta = gen
    engine = CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=4)
    engine.run(events_dir)
    rec = engine.manifest.latest()
    touched = {int(p) for p in rec["partitions"]}
    # zipf head conv c0 has thousands of turns → salted across many partitions
    assert len(touched) >= 12
    # events applied per partition across epochs: no single hot partition
    applied = {}
    for e in engine.manifest.committed_epochs():
        for p, m in engine.manifest.read_epoch(e)["metrics"]["per_partition"].items():
            applied[p] = applied.get(p, 0) + m["applied"]
    counts = np.array(list(applied.values()))
    assert counts.max() < 4 * counts.mean()


def test_adversarial_configs_match_oracle(tmp_path):
    """Pathological generator configs (heavy dup/delete ratios, huge
    out-of-order windows, evolution from lsn 1, single-conversation streams)
    must still replay to the oracle under two different partitionings."""
    configs = [
        dict(n_events=5000, n_convs=3, epochs=5, seed=101, dup_ratio=0.3,
             delete_ratio=0.2, update_ratio=0.5, ooo_window_us=10_000_000_000,
             zipf_a=1.1),
        dict(n_events=6000, n_convs=40, epochs=6, seed=103, dup_ratio=0.5,
             delete_ratio=0.4, update_ratio=0.4, evolve_at_lsn=1),
    ]
    for i, cfg in enumerate(configs):
        d = str(tmp_path / f"ev{i}")
        meta = generate_cdc_events(d, **cfg)
        for parts, tb, ce in [(4, 8, 2), (32, 64, 3)]:
            eng = CdcEngine(str(tmp_path / f"out{i}-{parts}"), num_partitions=parts,
                            num_actors=2, turn_block=tb, compact_every=ce)
            eng.run(d)
            got = eng.final_table().to_pandas()
            want = expected_final_state(meta["files"]).to_pandas()
            assert len(got) == len(want)
            assert got["text"].tolist() == want["text"].tolist()


def test_crash_between_flush_and_commit_replays_exactly_once(gen, tmp_path):
    """Die AFTER the flush fan-out staged delta files but BEFORE the
    manifest commit: the staged paths are deterministic per (partition,
    epoch), so the replay re-stages identical bytes and the final state
    still matches the oracle (no duplicates, no loss)."""
    import ray

    events_dir, meta = gen
    out = str(tmp_path / "out")
    epoch_files = discover_epoch_files(events_dir)

    e1 = CdcEngine(out, num_partitions=16, num_actors=4)
    e1.run(epoch_files=epoch_files[:1])  # epoch 0 committed
    # epoch 1: exchange + flush launch + flush_result, then CRASH before commit
    e1._actors = e1._spawn_actors()
    stats = e1._exchange(1, epoch_files[1])
    ray.get([a.flush.remote(1) for a in e1._actors])
    ray.get([a.flush_result.remote(1) for a in e1._actors])  # deltas staged
    e1._kill_actors()  # simulated death: staged files exist, no manifest entry
    assert set(e1.manifest.committed_epochs()) == {0}
    import glob as g

    assert g.glob(str(tmp_path / "out" / "part=*" / "delta-000001.parquet"))

    e2 = CdcEngine(out, num_partitions=16, num_actors=4)
    s = e2.run(events_dir)
    assert s["epochs_skipped"] == 1 and s["epochs_run"] == len(epoch_files) - 1
    assert_matches_oracle(e2, meta["files"])


def test_empty_epoch_commits_and_resumes(gen, tmp_path):
    """A tail can land an epoch with zero rows (e.g. all rows filtered
    upstream): the engine must commit it (so it is skipped on resume) and
    the final state must be unaffected."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    events_dir, meta = gen
    epoch_files = discover_epoch_files(events_dir)
    # splice an empty epoch in as the LAST epoch
    empty_path = str(tmp_path / "empty.parquet")
    pq.write_table(pq.read_table(epoch_files[0][0]).slice(0, 0), empty_path)
    spliced = epoch_files + [[empty_path]]

    out = str(tmp_path / "out")
    e1 = CdcEngine(out, num_partitions=16, num_actors=4)
    s = e1.run(epoch_files=spliced)
    assert s["epochs_run"] == len(spliced)
    assert set(e1.manifest.committed_epochs()) == set(range(len(spliced)))
    assert_matches_oracle(e1, meta["files"])
    # rerun: everything (including the empty epoch) skips
    e2 = CdcEngine(out, num_partitions=16, num_actors=4)
    s2 = e2.run(epoch_files=spliced)
    assert s2["epochs_run"] == 0 and s2["epochs_skipped"] == len(spliced)


def test_incremental_mv_state_is_per_epoch_partials(ray_session):
    """The maintained view must be built from ONE committed partial row per
    (user, epoch) — if a recompute (or per-block partials surviving LWW)
    slipped in, the state row count would differ and the fold would drift
    from the from-scratch oracle (seen live: per-block partials sharing a
    key replaced each other and dropped 80% of the counts at sf0.1)."""
    import duckdb

    from encode_ingest_ray.pipelines.cdc_queries import incremental_user_totals

    sf = "/root/testdata/sf0.001"
    out = incremental_user_totals(sf)
    con = duckdb.connect()
    truth = con.sql(
        f"SELECT COUNT(DISTINCT user_id) AS u FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    # one folded row per user, totals equal the one-shot aggregate
    assert out.num_rows == truth
    oracle = con.sql(
        f"SELECT CAST(COUNT(*) AS BIGINT) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    import pyarrow.compute as pc

    assert pc.sum(out.column("n_events")).as_py() == oracle


def test_migrate_partitioning_preserves_table_and_resume(gen, tmp_path):
    """Partition evolution: after migrate(16→8, turn_block 64→32) the live
    table is bit-identical, a fresh engine ADOPTS the new identity, later
    epochs apply on the new layout, replayed LSNs stay deduped (global
    watermark), and vacuum leaves no orphaned old-layout files behind
    retention."""
    import glob
    import os

    events_dir, meta = gen
    out = str(tmp_path / "out")
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    # commit only the first 3 of 4 epochs, then migrate, then resume epoch 4
    by_epoch = {}
    for f in files:
        by_epoch.setdefault(f.split("-epoch-")[1][:6], []).append(f)
    epoch_files = [by_epoch[k] for k in sorted(by_epoch)]

    e1 = CdcEngine(out, num_partitions=16, num_actors=4)
    e1.run(epoch_files=epoch_files[:3])
    before = e1.final_table()

    res = e1.migrate(new_num_partitions=8, new_turn_block=32)
    assert res["new"] == {"num_partitions": 8, "turn_block": 32,
                          "index_columns": None, "lateness_us": None,
                          "postings_column": None,
                          "changefeed_preimages": False,
                          "stats_columns": None}
    assert e1.final_table().equals(before)

    # identity guard: the OLD params now conflict, the new ones (or none)
    # adopt
    with pytest.raises(ValueError):
        CdcEngine(out, num_partitions=16)
    e2 = CdcEngine(out, num_actors=4)
    assert e2.num_partitions == 8 and e2.turn_block == 32

    # resume: 3 epochs skip, the 4th applies on the migrated layout and the
    # result matches the all-four oracle (dup LSNs from epoch 4's replays
    # of earlier epochs must still drop via the migrated global watermark)
    s = e2.run(epoch_files=epoch_files)
    assert s["epochs_skipped"] == 3 and s["epochs_run"] == 1
    assert_matches_oracle(e2, meta["files"])

    # no-op migrate
    assert e2.migrate()["noop"] is True

    # vacuum hygiene: after two more commits age the pre-migration epoch
    # out of retention, no old-layout (16-partition mix) state files remain
    # referenced; every on-disk state file is in the latest-2 manifests
    refs = set()
    for ep in e2.manifest.committed_epochs()[-2:]:
        rec = e2.manifest.read_epoch(ep)
        for ptr in rec["partitions"].values():
            if ptr.get("base"):
                refs.add(os.path.abspath(ptr["base"]))
            refs.update(os.path.abspath(d) for d in ptr.get("deltas", []))
        # retained epochs keep their changefeed files (the feed horizon)
        refs.update(os.path.abspath(c) for c in rec.get("changes") or [])
    e2.manifest.vacuum(2)
    on_disk = {
        os.path.abspath(f)
        for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))
    }
    assert on_disk <= refs
