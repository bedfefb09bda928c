"""Atomic multi-table commit (state/txn.py) + covering-index sibling table:
invariants, crash-window recovery, resume adoption, vacuum, migration."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine
from encode_ingest_ray.state.manifest import Manifest
from encode_ingest_ray.state.txn import TxnLog


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("txn-events"))
    generate_cdc_events(
        d, n_events=12000, n_convs=150, epochs=3, seed=13, evolve_at_lsn=7000
    )
    return d


def _table(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tabs, promote_options="default").combine_chunks()
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_index_mirrors_live_projection(events_dir, tmp_path):
    eng = CdcEngine(
        str(tmp_path / "out"), num_partitions=8, num_actors=2,
        compact_every=2, index_columns=["role"],
    )
    eng.run(events_dir)
    live = _table(eng.final_dataset())
    idx = _table(eng.index_dataset())
    assert idx.column_names == ["conv_id", "turn_idx", "role", "ts"]
    proj = live.select(["conv_id", "turn_idx", "role", "ts"])
    assert idx.equals(proj)
    # both manifests advanced in lockstep
    assert Manifest(eng.out_dir).committed_epochs() == \
        Manifest(eng.index_root).committed_epochs() == [0, 1, 2]
    # no transaction records left behind
    assert glob.glob(os.path.join(eng.out_dir, "_txn", "txn-*.json")) == []


def test_crash_between_record_and_publish_rolls_forward(tmp_path):
    root = str(tmp_path / "t")
    live = Manifest(os.path.join(root, "live"))
    idx = Manifest(os.path.join(root, "index"))
    # simulate the crash window: both staged, txn record written, only the
    # LIVE manifest promoted before the process died
    live.stage(0, {"0": {"base": None, "deltas": []}}, {})
    idx.stage(0, {"0": {"base": None, "deltas": []}}, {})
    log = TxnLog(root)
    with open(os.path.join(log.dir, "txn-000000.json"), "w") as f:
        json.dump({"epoch": 0, "manifest_dirs": {"live": live.dir, "index": idx.dir}}, f)
    live.publish(0)
    assert live.committed_epochs() == [0] and idx.committed_epochs() == []
    healed = TxnLog(root).recover()
    assert healed == 1
    assert idx.committed_epochs() == [0]
    assert glob.glob(os.path.join(log.dir, "txn-*.json")) == []
    # idempotent second recovery
    assert TxnLog(root).recover() == 0


def test_crash_before_record_is_rolled_back(tmp_path):
    root = str(tmp_path / "t2")
    live = Manifest(os.path.join(root, "live"))
    live.stage(0, {"0": {"base": None, "deltas": []}}, {})
    # no txn record: staging is write-ahead, nothing committed
    assert TxnLog(root).recover() == 0
    assert live.committed_epochs() == []
    assert os.path.exists(live.staged_path(0))  # orphan, overwritten on retry


def test_engine_heals_interrupted_txn_on_init(events_dir, tmp_path):
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, index_columns=["role"])
    eng.run(events_dir)
    # rewind the INDEX manifest's last commit back into the crash window
    idx_man = Manifest(eng.index_root)
    last = idx_man.committed_epochs()[-1]
    final = os.path.join(idx_man.dir, f"epoch={last:06d}.json")
    os.replace(final, idx_man.staged_path(last))
    with open(os.path.join(out, "_txn", f"txn-{last:06d}.json"), "w") as f:
        json.dump({"epoch": last, "manifest_dirs":
                   {"live": Manifest(out).dir, "index": idx_man.dir}}, f)
    # fresh engine: __init__ must roll the transaction forward (and adopt
    # the index config from the committed partitioning identity)
    eng2 = CdcEngine(out, num_actors=2)
    assert eng2.index_columns == ["role"]
    assert Manifest(eng2.index_root).committed_epochs()[-1] == last
    summary = eng2.run(events_dir)
    assert summary["epochs_run"] == 0 and summary["epochs_skipped"] == 3


def test_index_identity_conflict_rejected(events_dir, tmp_path):
    out = str(tmp_path / "out")
    CdcEngine(out, num_partitions=8, num_actors=2, index_columns=["role"]).run(events_dir)
    with pytest.raises(ValueError, match="index_columns"):
        CdcEngine(out, num_actors=2, index_columns=["tool"])


def test_index_vacuum_and_resume(events_dir, tmp_path):
    out = str(tmp_path / "out")
    eng = CdcEngine(
        out, num_partitions=8, num_actors=2, compact_every=2,
        vacuum_retain=1, index_columns=["role"],
    )
    eng.run(events_dir)
    # on-disk index files ⊆ files referenced by the retained index manifest
    referenced = set()
    rec = Manifest(eng.index_root).latest()
    for ptr in rec["partitions"].values():
        if ptr.get("base"):
            referenced.add(os.path.abspath(ptr["base"]))
        referenced.update(os.path.abspath(d) for d in ptr.get("deltas", []))
    on_disk = {
        os.path.abspath(f)
        for f in glob.glob(os.path.join(eng.index_root, "part=*", "*.parquet"))
    }
    assert on_disk <= referenced and on_disk
    # index stays readable after vacuum
    assert _table(eng.index_dataset()).num_rows > 0


def test_migrate_keeps_index_in_lockstep(events_dir, tmp_path):
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, index_columns=["role"])
    eng.run(events_dir)
    before = _table(eng.index_dataset())
    res = eng.migrate(new_num_partitions=4)
    assert res["partitions_written"] > 0
    eng2 = CdcEngine(out, num_actors=2)
    after = _table(eng2.index_dataset())
    assert after.equals(before)
    live = _table(eng2.final_dataset())
    assert after.equals(live.select(["conv_id", "turn_idx", "role", "ts"]))


def test_projection_pushdown_reads(events_dir, tmp_path):
    """final_dataset(columns=...) must LWW-resolve identically while reading
    only meta + requested payload — including an evolved column absent from
    early-epoch files (null-filled by schema alignment)."""
    eng = CdcEngine(
        str(tmp_path / "out"), num_partitions=8, num_actors=2,
        compact_every=2, index_columns=["role"],
    )
    eng.run(events_dir)
    full = _table(eng.final_dataset())
    narrow = _table(eng.final_dataset(columns=["conv_id", "turn_idx", "model"]))
    assert narrow.column_names == ["conv_id", "turn_idx", "model"]
    assert narrow.equals(full.select(["conv_id", "turn_idx", "model"]))
    idx_narrow = _table(eng.index_dataset(columns=["conv_id", "turn_idx", "role"]))
    assert idx_narrow.equals(full.select(["conv_id", "turn_idx", "role"]))


def test_lookup_partition_pruning(events_dir, tmp_path):
    """lookup() must return exactly final_dataset filtered to the requested
    conversations while touching only the salted sub-key partitions."""
    # pruning pays when partitions >> per-conv sub-keys (the 64Ki shape);
    # 512 partitions vs <=65 sub-keys per conversation
    eng = CdcEngine(str(tmp_path / "out"), num_partitions=512, num_actors=2)
    eng.run(events_dir)
    full = _table(eng.final_dataset())
    convs = sorted(set(full.column("conv_id").to_pylist()))[:3]
    got = _table(eng.lookup(convs))
    want = full.filter(pc.is_in(full.column("conv_id"), value_set=pa.array(convs)))
    assert got.equals(want.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]))
    # pruning really happened: candidate partitions < committed partitions
    import zlib
    import numpy as np
    from encode_ingest_ray.state.partition import mix_partition
    tbs = np.arange(0, 4096 // eng.turn_block + 1, dtype=np.uint64)
    turns = (tbs * np.uint64(eng.turn_block)).astype(np.int64)
    cand = set()
    for c in convs:
        h = np.full(len(turns), zlib.crc32(c.encode()), np.uint64)
        cand.update(mix_partition(h, turns, eng.num_partitions, eng.turn_block).astype(int).tolist())
    committed = set(eng.partition_files())
    assert len(cand & committed) < len(committed)
    # narrow lookup composes with projection pushdown
    narrow = _table(eng.lookup(convs, columns=["conv_id", "turn_idx", "role"]))
    assert narrow.column_names == ["conv_id", "turn_idx", "role"]
    assert narrow.equals(want.select(["conv_id", "turn_idx", "role"]))
