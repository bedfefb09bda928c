"""Extreme skew: one conversation carries ~80% of all events.  The salted
partitioner must spread it across partitions (no single hot partition /
actor) and correctness must be unaffected."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from encode_ingest_ray.functions.oracle import expected_final_state
from encode_ingest_ray.pipelines.cdc import CdcEngine
from encode_ingest_ray.state.partition import partition_ids


def test_one_conv_dominates(tmp_path):
    rng = np.random.default_rng(9)
    n = 30_000
    hot = rng.random(n) < 0.8
    conv = np.where(hot, "viral", rng.choice([f"c{i}" for i in range(200)], n))
    turn = np.where(hot, rng.integers(0, 5000, n), rng.integers(0, 40, n)).astype(np.int32)
    lsn = np.arange(n, dtype=np.int64)
    ts = np.int64(1_700_000_000_000_000) + lsn * 1000 + rng.integers(-500, 500, n)
    op = rng.choice(["insert", "update", "delete"], n, p=[0.7, 0.25, 0.05])
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    table = pa.table(
        {
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(turn),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"{c}/{t}@{l}" for c, t, l in zip(conv, turn, lsn)]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "op": pa.array(op),
            "lsn": pa.array(lsn),
        }
    )
    half = n // 2
    f0 = str(events_dir / "events-epoch-000000.parquet")
    f1 = str(events_dir / "events-epoch-000001.parquet")
    pq.write_table(table.slice(0, half), f0)
    pq.write_table(table.slice(half), f1)

    # the hot conversation's events spread over (almost) every partition
    parts = partition_ids(table.column("conv_id"), table.column("turn_idx"), 16)
    hot_parts = np.unique(parts[np.asarray(hot)])
    assert len(hot_parts) >= 14

    engine = CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=4)
    engine.run(str(events_dir))
    # per-partition applied counts: the hot conv cannot pin one partition
    applied = {}
    for e in engine.manifest.committed_epochs():
        for p, m in engine.manifest.read_epoch(e)["metrics"]["per_partition"].items():
            applied[p] = applied.get(p, 0) + m["applied"]
    counts = np.array(list(applied.values()))
    assert counts.max() < 3 * counts.mean()

    got = engine.final_table()
    want = expected_final_state([f0, f1])
    assert got.num_rows == want.num_rows
    assert got.to_pandas()["text"].tolist() == want.to_pandas()["text"].tolist()
    # and the final sink still puts the viral conversation whole in one file
    r = engine.write_final(str(tmp_path / "final"))
    assert r["rows"] == want.num_rows
    homes = []
    import os

    for name in os.listdir(str(tmp_path / "final")):
        t = pq.read_table(str(tmp_path / "final" / name), columns=["conv_id"])
        if "viral" in set(t.column("conv_id").to_pylist()):
            homes.append(name)
    assert len(homes) == 1
