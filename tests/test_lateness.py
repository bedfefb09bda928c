"""Allowed-lateness quarantine: late events divert to the append-only audit
table, committed atomically with the live table; replaying live-deltas ∪
late through LWW reconstructs the no-lateness state exactly."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine
from encode_ingest_ray.state.lww import live_view, lww_reduce
from encode_ingest_ray.state.manifest import Manifest

BOUND_US = 3_600_000_000  # 1 hour


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("late-events"))
    # huge out-of-order window → plenty of genuinely late events
    generate_cdc_events(
        d, n_events=15000, n_convs=150, epochs=3, seed=23,
        ooo_window_us=50_000_000_000,
    )
    return d


def _table(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    t = pa.concat_tables(tabs, promote_options="default").combine_chunks()
    keys = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    # the late AUDIT table keeps every quarantined raw event, so
    # (conv_id, turn_idx) is not unique — without the lsn tiebreak the
    # sort isn't total and .equals() flakes on block arrival order
    if "lsn" in t.column_names:
        keys.append(("lsn", "ascending"))
    return t.sort_by(keys)


def test_quarantine_replay_equivalence(events_dir, tmp_path):
    bounded = CdcEngine(
        str(tmp_path / "b"), num_partitions=8, num_actors=2,
        lateness_us=BOUND_US,
    )
    sb = bounded.run(events_dir)
    plain = CdcEngine(str(tmp_path / "p"), num_partitions=8, num_actors=2)
    plain.run(events_dir)

    late = _table(bounded.late_dataset())
    assert late.num_rows > 0
    assert sb["epochs_run"] == 3
    # metrics surfaced per epoch and in totals
    last = bounded.manifest.latest()["metrics"]
    assert last["events_in"] == last["applied"] + last["dup_lsn_dropped"] + \
        last["quarantined_late"]

    # the audit rows are RAW events (op + lsn intact)
    assert {"op", "lsn"} <= set(late.column_names)

    # LWW(live ∪ late) == no-lateness final: merge the bounded LIVE STATE
    # (op/lsn retained in state files) with the quarantined raw events
    state_rows = []
    for ptr in bounded.manifest.pointers().values():
        from encode_ingest_ray.state.merger import load_partition_state

        st = load_partition_state(ptr)
        if st is not None and st.num_rows:
            state_rows.append(st)
    from encode_ingest_ray.state.merger import _concat_unified

    merged = live_view(lww_reduce(_concat_unified(state_rows + [late])))
    merged = merged.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    want = _table(plain.final_dataset())
    assert merged.select(want.column_names).equals(want)

    # every quarantined event really was older than its partition's bound:
    # strictly below the final applied high-water mark minus the bound is a
    # NECESSARY condition (the commit-time ts_hi was <= the final one)
    ts_hi = {
        int(p): ptr["ts_hi"] for p, ptr in bounded.manifest.pointers().items()
    }
    assert max(ts_hi.values()) - BOUND_US > int(
        pc.min(pc.cast(late.column("ts"), pa.int64())).as_py()
    )


def test_lateness_rerun_is_idempotent(events_dir, tmp_path):
    out = str(tmp_path / "b")
    e1 = CdcEngine(out, num_partitions=8, num_actors=2, lateness_us=BOUND_US)
    e1.run(events_dir)
    late_before = _table(e1.late_dataset())
    live_before = _table(e1.final_dataset())
    # fresh engine adopts the committed lateness policy and replays nothing
    e2 = CdcEngine(out, num_partitions=8, num_actors=2)
    assert e2.lateness_us == BOUND_US
    s = e2.run(events_dir)
    assert s["epochs_run"] == 0 and s["epochs_skipped"] == 3
    assert _table(e2.late_dataset()).equals(late_before)
    assert _table(e2.final_dataset()).equals(live_before)
    # all three manifests in lockstep
    assert Manifest(out).committed_epochs() == \
        Manifest(e2.late_root).committed_epochs() == [0, 1, 2]


def test_lateness_with_index_three_table_txn(events_dir, tmp_path):
    out = str(tmp_path / "bi")
    eng = CdcEngine(
        out, num_partitions=8, num_actors=2, lateness_us=BOUND_US,
        index_columns=["role"],
    )
    eng.run(events_dir)
    live = _table(eng.final_dataset())
    idx = _table(eng.index_dataset())
    assert idx.equals(live.select(["conv_id", "turn_idx", "role", "ts"]))
    assert _table(eng.late_dataset()).num_rows > 0
    for root in (out, eng.index_root, eng.late_root):
        assert Manifest(root).committed_epochs() == [0, 1, 2]
    assert not os.listdir(os.path.join(out, "_txn"))


def test_no_lateness_keeps_pointer_clean(events_dir, tmp_path):
    eng = CdcEngine(str(tmp_path / "p"), num_partitions=8, num_actors=2)
    eng.run(events_dir)
    for ptr in eng.manifest.pointers().values():
        assert "late_delta" not in ptr
        assert ptr["ts_hi"] > 0  # tracked always (enables enabling later)
