"""Sharded deployment (pipelines/sharded.py): disjoint salted-key ownership,
union == single-engine table, per-shard resume, and the real multi-process
path (each shard its own Ray cluster)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine
from encode_ingest_ray.pipelines.sharded import (
    run_shard,
    shard_epoch_files,
    sharded_final_table,
)


@pytest.fixture(scope="module")
def sharded_events(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sharded-events"))
    meta = generate_cdc_events(
        d,
        n_events=60_000,
        n_convs=300,
        epochs=2,
        seed=7,
        dup_ratio=0.05,
        evolve_at_lsn=40_000,
        key_shards=8,
    )
    return d, meta


def test_key_sharded_files_partition_events(sharded_events):
    import pyarrow.parquet as pq

    from encode_ingest_ray.state.partition import conv_hashes, mix_partition

    d, meta = sharded_events
    # all 8 files exist per epoch, and each file holds exactly its salted
    # key range (source mix = seed 1, decorrelated from the engine's seed 0)
    assert len(meta["files"]) == 2 * 8
    total = 0
    for f in meta["files"]:
        shard_no = int(f.rsplit("-", 1)[1].split(".")[0])
        t = pq.read_table(f, columns=["conv_id", "turn_idx"])
        total += t.num_rows
        if t.num_rows:
            ids = mix_partition(
                conv_hashes(t.column("conv_id")),
                t.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False),
                8,
                seed=1,
            )
            assert set(ids.tolist()) == {shard_no}
    assert total >= meta["n_events"]  # originals + replayed dups


def test_shard_epoch_files_split(sharded_events):
    d, meta = sharded_events
    a = shard_epoch_files(d, 0, 2)
    b = shard_epoch_files(d, 1, 2)
    assert len(a) == len(b) == 2
    for ea, eb in zip(a, b):
        assert not (set(ea) & set(eb))
        assert len(ea) == len(eb) == 4


def test_sharded_union_equals_single_engine(sharded_events, tmp_path):
    d, meta = sharded_events
    # two shards run in THIS session (ownership/union logic; the
    # multi-process path is covered below)
    for k in range(2):
        s = run_shard(d, str(tmp_path / "table"), k, 2)
        assert s["epochs_run"] == 2
    single = CdcEngine(str(tmp_path / "single"))
    single.run(d)
    t1 = single.final_table()
    t2 = sharded_final_table(str(tmp_path / "table"))
    assert t1.num_rows == t2.num_rows > 0
    assert t1.select(sorted(t1.column_names)).equals(
        t2.select(sorted(t2.column_names))
    )
    # evolved column present through the union reader
    assert "model" in t2.column_names


def test_shard_resume_skips_committed(sharded_events, tmp_path):
    d, meta = sharded_events
    run_shard(d, str(tmp_path / "t"), 0, 2)
    again = run_shard(d, str(tmp_path / "t"), 0, 2)
    assert again["epochs_run"] == 0
    assert again["epochs_skipped"] == 2


def test_unsharded_files_rejected(tmp_path):
    import pyarrow.parquet as pq

    # positional (non-key) shard names lack the guarantee; shard_count>1
    # must refuse rather than silently mis-own keys — but the single-shard
    # path accepts any layout
    f = str(tmp_path / "events-epoch-000000.parquet")
    pq.write_table(pa.table({"conv_id": ["c1"]}), f)
    assert shard_epoch_files(str(tmp_path), 0, 1) == [[f]]
    with pytest.raises(ValueError):
        shard_epoch_files(str(tmp_path), 0, 2)


def test_spawn_shards_multiprocess(sharded_events, tmp_path):
    """The real path: 2 engine processes, each its own Ray cluster."""
    d, meta = sharded_events
    out = subprocess.run(
        [
            sys.executable, "-m", "encode_ingest_ray",
            "run-sharded",
            "--events", d,
            "--out", str(tmp_path / "table"),
            "--shards", "2",
            "--cpus-per-shard", "2",
            "--object-store-gb", "1",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["epochs_run"] == 4
    assert s["events_raw"] >= meta["n_events"]
    assert s["dup_lsn_dropped"] > 0
    # both shard manifests committed
    for k in range(2):
        sub = tmp_path / "table" / f"shard-{k:02d}-of-02" / "_manifest"
        assert any(f.name.startswith("epoch=") for f in sub.iterdir())


def test_elastic_reshard_grow_2_to_4(ray_session, tmp_path):
    """Elastic K->2K grow with zero downtime (SCALE.md §elastic re-shard):
    new shards replicate their key subsets from the old shards while the
    old deployment keeps ingesting; catch-up is incremental; after cutover
    the new tailers resume from the replicated epochs (dense-prefix rule)
    and the logical table equals a single-engine control end-to-end."""
    from encode_ingest_ray.pipelines.sharded import reshard, shard_dir
    from encode_ingest_ray.state.partition import conv_hashes, mix_partition

    d = str(tmp_path / "ev")
    generate_cdc_events(
        d, n_events=24_000, n_convs=200, epochs=4, seed=13,
        dup_ratio=0.05, key_shards=8,
    )
    old_root, new_root = str(tmp_path / "old"), str(tmp_path / "new")

    def run_old(k, upto):
        files = shard_epoch_files(d, k, 2)[:upto]
        eng = CdcEngine(shard_dir(old_root, k, 2),
                        num_partitions=8, num_actors=2)
        return eng.run(epoch_files=files)

    for k in range(2):          # live 2-shard deployment, 2 epochs in
        run_old(k, 2)
    r1 = reshard(old_root, new_root, 4, num_partitions=4, num_actors=2)
    assert r1["epochs_run"] == 4 * 2      # 4 new shards x 2 epochs each
    for k in range(2):          # old cluster ingests MORE while growing
        run_old(k, 3)
    r2 = reshard(old_root, new_root, 4)   # incremental catch-up pass
    assert r2["epochs_run"] == 4 * 1      # only the new epoch crosses
    assert all(s["epochs_run"] == 1 for s in r2["shards"])
    # cutover point: both layouts hold the same logical table
    t_old = sharded_final_table(old_root)
    t_new = sharded_final_table(new_root)
    cols = sorted(t_old.column_names)
    assert t_old.num_rows == t_new.num_rows > 0
    assert t_old.select(cols).equals(t_new.select(cols))
    # resume writers on the NEW deployment: 4 tailers, same source — the
    # replicated epochs are skipped (replica epochs mirror the source 1:1),
    # epoch 4 applies on top
    for kp in range(4):
        s = run_shard(d, new_root, kp, 4)
        assert s["epochs_skipped"] == 3 and s["epochs_run"] == 1
    ctl = CdcEngine(str(tmp_path / "ctl"), num_partitions=8, num_actors=2)
    ctl.run(d)
    t_final = sharded_final_table(new_root)
    want = ctl.final_table()
    assert t_final.num_rows == want.num_rows
    assert want.select(sorted(want.column_names)).equals(
        t_final.select(sorted(t_final.column_names))
    )
    # ownership: each new shard holds exactly its salted key range
    for kp in range(4):
        t = CdcEngine(shard_dir(new_root, kp, 4)).final_table()
        assert t.num_rows > 0
        sid = mix_partition(
            conv_hashes(t.column("conv_id")),
            t.column("turn_idx").combine_chunks().to_numpy(
                zero_copy_only=False),
            4, seed=1,
        )
        assert set(sid.tolist()) == {kp}
