"""Metadata tables: commit history and chain-file inventory (Iceberg
``$history`` / ``$files`` analog)."""

import os

import pyarrow.compute as pc

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine, discover_epoch_files


def test_history_and_file_inventory(ray_session, tmp_path):
    ev = str(tmp_path / "events")
    generate_cdc_events(ev, n_events=10_000, n_convs=120, epochs=3, seed=13)
    epochs = discover_epoch_files(ev)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=2,
                    index_columns=["role"], postings_column="text",
                    vacuum_retain=None)
    eng.run(epoch_files=epochs)
    h = eng.history()
    assert h.column("epoch").to_pylist() == [0, 1, 2]
    assert all(v > 0 for v in h.column("applied").to_pylist())
    assert sum(h.column("change_files").to_pylist()) > 0
    assert h.column("restore_gen").to_pylist() == [0, 0, 0]

    inv = eng.file_inventory()
    chains = set(inv.column("chain").to_pylist())
    assert chains == {"live", "index", "postings"}
    assert all(b and b > 0 for b in inv.column("bytes").to_pylist())
    assert not any(inv.column("shared").to_pylist())
    # every listed file exists (the inventory is the vacuum's referenced set
    # for the latest record, so a missing file would be a GC bug)
    assert all(os.path.exists(p) for p in inv.column("path").to_pylist())

    # schema ops and restore marks surface in history
    eng.restore(1)
    h2 = eng.history()
    last = h2.slice(h2.num_rows - 1).to_pylist()[0]
    assert last["restore_gen"] == 1 and last["restored_to"] == 1


def test_inventory_marks_shared_branch_files(ray_session, tmp_path):
    ev = str(tmp_path / "events")
    generate_cdc_events(ev, n_events=10_000, n_convs=120, epochs=3, seed=14)
    epochs = discover_epoch_files(ev)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.create_branch("b")
    br = eng.branch_engine("b", num_actors=2)
    br.run(epoch_files=epochs)
    inv = br.file_inventory()
    shared = inv.filter(pc.equal(inv.column("shared"), True))
    own = inv.filter(pc.equal(inv.column("shared"), False))
    # the branch's inventory shows BOTH shared parent files and its own
    assert shared.num_rows > 0 and own.num_rows > 0
    root = os.path.abspath(br.out_dir)
    assert all(not p.startswith(root) for p in shared.column("path").to_pylist())


def test_epoch_asof_resolution(ray_session, tmp_path):
    import time

    import pytest

    ev = str(tmp_path / "events")
    generate_cdc_events(ev, n_events=6000, n_convs=80, epochs=2, seed=17)
    epochs = discover_epoch_files(ev)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:1])
    time.sleep(0.05)
    eng.run(epoch_files=epochs)
    h = eng.history()
    t0, t1 = h.column("committed_at_us").to_pylist()
    assert t0 < t1
    assert eng.epoch_asof(t0) == 0
    assert eng.epoch_asof(t1 - 1) == 0
    assert eng.epoch_asof(int(time.time() * 1e6)) == 1
    with pytest.raises(ValueError, match="no commit"):
        eng.epoch_asof(t0 - 10)
