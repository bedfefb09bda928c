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


def test_payload_ingest_cas_dedup_and_crash(events_dir, tmp_path):
    """Binary payload ingest: content-addressed staging dedups by md5,
    the registry pairs atomically with the live manifest via TxnLog, and
    a crash in any window replays to the identical registry."""
    import hashlib

    out = str(tmp_path / "pay")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(events_dir)

    n_ids, n_distinct = 200, 50
    payloads = [f"payload-{i % n_distinct}".encode() * 3 for i in range(n_ids)]
    src = pa.table(
        {
            "file_id": pa.array([f"f{i:04d}" for i in range(n_ids)]),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    ds = ray.data.from_arrow(src)
    res = eng.ingest_payloads(ds)
    assert res["files"] == n_ids and res["blobs_written"] == n_distinct

    reg = _table_any(eng.payload_registry())
    assert reg.num_rows == n_ids
    assert len(set(reg.column("md5").to_pylist())) == n_distinct
    cas = glob.glob(os.path.join(out, "files", "cas", "*", "*.bin"))
    assert len(cas) == n_distinct
    # path contract + content round-trip
    row = reg.slice(0, 1).to_pylist()[0]
    with open(eng.payload_path(row["md5"]), "rb") as f:
        b = f.read()
    assert hashlib.md5(b).hexdigest() == row["md5"]
    assert len(b) == row["nbytes"]

    # crash window A: refs staged + CAS written, manifest never committed
    # -> replaying the ingest rebuilds epoch 1 exactly, zero new blobs
    files_man = Manifest(os.path.join(out, "files"))
    res2 = eng.ingest_payloads(ds)  # legitimate second epoch (append)
    assert res2["epoch"] == 1 and res2["blobs_written"] == 0
    os.unlink(os.path.join(files_man.dir, "epoch=000001.json"))
    res3 = eng.ingest_payloads(ds)  # replay of the "crashed" epoch 1
    assert res3["epoch"] == 1 and res3["blobs_written"] == 0
    reg2 = _table_any(eng.payload_registry())
    assert reg2.num_rows == 2 * n_ids  # epochs 0+1, no duplicate rows

    # crash window B: txn record written, files manifest promoted but live
    # not re-published -> recover() at next engine init rolls forward
    live_man = Manifest(out)
    last_live = live_man.committed_epochs()[-1]
    final = os.path.join(live_man.dir, f"epoch={last_live:06d}.json")
    os.replace(final, live_man.staged_path(last_live))
    with open(os.path.join(out, "_txn", f"txn-{last_live:06d}.json"), "w") as f:
        json.dump(
            {
                "epoch": last_live,
                "epochs": {"live": last_live, "files": 1},
                "manifest_dirs": {"live": live_man.dir, "files": files_man.dir},
            },
            f,
        )
    eng2 = CdcEngine(out, num_actors=2)
    assert Manifest(out).committed_epochs()[-1] == last_live
    assert _table_any(eng2.payload_registry()).num_rows == 2 * n_ids


def _table_any(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default").combine_chunks()


def test_quad_chain_crash_window_heals(events_dir, tmp_path):
    """Lateness + covering index + postings all enabled: every epoch's
    TxnLog txn spans FOUR manifests.  A crash that promotes only two of
    them must heal at the next engine init, leaving all four chains at the
    same epoch and every read surface consistent."""
    out = str(tmp_path / "quad")
    eng = CdcEngine(
        out, num_partitions=8, num_actors=2, compact_every=2,
        index_columns=["role"], postings_column="text",
        lateness_us=10**15,
    )
    eng.run(events_dir)
    live_man = Manifest(out)
    idx_man = Manifest(eng.index_root)
    post_man = Manifest(eng.postings_root)
    late_man = Manifest(eng.late_root)
    last = live_man.committed_epochs()[-1]
    assert (idx_man.committed_epochs()[-1] == post_man.committed_epochs()[-1]
            == late_man.committed_epochs()[-1] == last)
    want_live = _table(eng.final_dataset())
    want_stats = {
        p: ptr.get("doc_stats")
        for p, ptr in live_man.pointers().items()
    }

    # rewind postings + late back into the crash window (live/index stayed
    # promoted), write the txn record, heal on init
    for man in (post_man, late_man):
        final = os.path.join(man.dir, f"epoch={last:06d}.json")
        os.replace(final, man.staged_path(last))
    with open(os.path.join(out, "_txn", f"txn-{last:06d}.json"), "w") as f:
        json.dump(
            {
                "epoch": last,
                "manifest_dirs": {
                    "live": live_man.dir, "index": idx_man.dir,
                    "postings": post_man.dir, "late": late_man.dir,
                },
            },
            f,
        )
    assert post_man.committed_epochs()[-1] < last

    eng2 = CdcEngine(out, num_actors=2)
    for man in (Manifest(out), Manifest(eng2.index_root),
                Manifest(eng2.postings_root), Manifest(eng2.late_root)):
        assert man.committed_epochs()[-1] == last
    assert _table(eng2.final_dataset()).equals(want_live)
    assert {
        p: ptr.get("doc_stats") for p, ptr in eng2.manifest.pointers().items()
    } == want_stats
    # replay is a no-op; a follow-up migrate keeps all four in lockstep
    assert eng2.run(events_dir)["epochs_run"] == 0
    eng2.migrate(new_num_partitions=4)
    e3 = CdcEngine(out, num_actors=2)
    mans = [Manifest(out), Manifest(e3.index_root),
            Manifest(e3.postings_root), Manifest(e3.late_root)]
    assert len({m.committed_epochs()[-1] for m in mans}) == 1
    assert _table(e3.final_dataset()).equals(want_live)


def test_file_submission_export(ray_session, tmp_path):
    """file_submission: the hack/ control-row emitters as one streaming
    projection over the registry — flattened targetPath, content-address
    file_ref, bucket-scheme choice on sourcePath."""
    import hashlib
    out = str(tmp_path / "t")
    eng = CdcEngine(out, num_partitions=4, num_actors=2)
    src = pa.table({
        "file_id": pa.array(["a.txt", "dir/b.txt"]),
        "payload": pa.array([b"alpha", b"beta"], pa.binary()),
    })
    eng.ingest_payloads(ray.data.from_arrow(src))
    rows = sorted(
        _table_any(eng.file_submission(bucket="s3://stage")).to_pylist(),
        key=lambda r: r["description"],
    )
    assert [r["description"] for r in rows] == ["a.txt", "dir/b.txt"]
    for r in rows:
        h = r["file_ref"]
        assert r["sourcePath"] == f"s3://stage/cas/{h[:2]}/{h}.bin"
        assert r["targetPath"] == f"/cas_{h[:2]}_{h}.bin"
        assert "/" not in r["targetPath"][1:]
    assert rows[0]["file_ref"] == hashlib.md5(b"alpha").hexdigest()
