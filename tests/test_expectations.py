"""Ingest expectations (Delta-Live-Tables 'expect or drop' analog): rules
gate each key's EPOCH-WINNING version at flush (post-LWW — deterministic
under any blocking; tombstones bypass); failing winners divert to the
append-only expect/ audit chain with a first-failing-rule ``reason``, the
key keeps its previous committed state, and the chain commits atomically
with the live table (TxnLog)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import (
    CdcEngine,
    discover_epoch_files,
    expect_nonempty,
    expect_not_null,
)
from encode_ingest_ray.state.lww import live_view, lww_reduce, merge_state


def _gated_oracle(files, gate):
    """Single-process fold: per epoch, wm-filter (replayed lsns never
    re-quarantine — the fixture's epochs segment the lsn log, so the global
    high-water equals the per-partition watermarks' effect), LWW-reduce,
    keep winners passing ``gate`` (tombstones bypass), merge into state."""
    state = None
    quarantined = []
    lsn_hi = -1
    for efiles in files:
        raw = pa.concat_tables(
            [pq.read_table(f) for f in efiles], promote_options="default"
        )
        prev_hi, lsn_hi = lsn_hi, max(
            lsn_hi, pc.max(raw.column("lsn")).as_py()
        )
        raw = raw.filter(pc.greater(raw.column("lsn"), prev_hi))
        delta = lww_reduce(raw)
        ok = pc.fill_null(pc.cast(gate(delta), pa.bool_()), False)
        is_del = pc.equal(delta.column("op"), pa.scalar("delete"))
        keep = pc.or_(ok, is_del)
        quarantined.append(delta.filter(pc.invert(keep)))
        state = merge_state(state, delta.filter(keep))
    return live_view(state), pa.concat_tables(
        quarantined, promote_options="default"
    )


def _canon(t: pa.Table) -> pa.Table:
    return t.select(sorted(t.column_names)).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("lsn", "ascending") if "lsn" in t.column_names
         else ("ts", "ascending")]
    )


@pytest.fixture(scope="module")
def exp_env(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("exp-events"))
    generate_cdc_events(
        d, n_events=8_000, n_convs=100, epochs=3, seed=9, dup_ratio=0.05
    )
    return d, discover_epoch_files(d)


def test_gated_live_table_and_quarantine_match_oracle(exp_env, tmp_path):
    d, files = exp_env
    eng = CdcEngine(
        str(tmp_path / "out"), num_partitions=8, num_actors=2,
        expectations={"not_null_tool": expect_not_null("tool")},
    )
    s = eng.run(epoch_files=files)
    assert s["expect_failed"] > 0
    want_live, want_q = _gated_oracle(
        files, lambda t: pc.is_valid(t.column("tool"))
    )
    got_live = eng.final_table()
    assert _canon(got_live).equals(_canon(want_live.select(got_live.column_names)))
    got_q = pa.Table.from_pylist(eng.expect_dataset().take_all())
    assert got_q.num_rows == s["expect_failed"] == want_q.num_rows
    assert set(got_q.column("reason").to_pylist()) == {"not_null_tool"}
    # from_pylist re-infers types (all-null tool -> null, ints -> int64):
    # project to the oracle's column order and cast before the exact compare
    cols = [c for c in want_q.column_names]
    assert _canon(got_q.select(cols).cast(want_q.schema)).equals(
        _canon(want_q)
    )
    # replay determinism: a rerun is a no-op, nothing double-quarantines
    s2 = eng.run(epoch_files=files)
    assert s2["epochs_run"] == 0 and s2["expect_failed"] == 0
    assert eng.expect_dataset().count() == got_q.num_rows


def test_first_failing_rule_wins_and_deletes_bypass(exp_env, tmp_path):
    """Rule order is the dict order: a row failing several rules carries the
    FIRST rule's name; tombstones are never evaluated."""
    d, files = exp_env
    eng = CdcEngine(
        str(tmp_path / "out"), num_partitions=8, num_actors=2,
        expectations={
            # every row has role, so this fails only where role == 'tool'
            "role_not_tool": lambda t: pc.not_equal(
                t.column("role"), pa.scalar("tool")
            ),
            # tool is null on a superset pattern — overlapping failures
            "not_null_tool": expect_not_null("tool"),
        },
    )
    eng.run(epoch_files=files)
    q = pa.Table.from_pylist(eng.expect_dataset().take_all())
    reasons = set(q.column("reason").to_pylist())
    assert reasons == {"role_not_tool", "not_null_tool"}
    # overlap resolved to the first rule: no row failing role_not_tool may
    # carry the second rule's name while also having role == 'tool'
    second = q.filter(pc.equal(q.column("reason"), pa.scalar("not_null_tool")))
    assert pc.sum(
        pc.equal(second.column("role"), pa.scalar("tool"))
    ).as_py() in (0, None)
    # tombstones bypass: no delete ever lands in quarantine
    assert pc.sum(pc.equal(q.column("op"), pa.scalar("delete"))).as_py() in (
        0, None,
    )
    # live table holds no row violating either rule
    live = eng.final_table()
    assert pc.sum(pc.equal(live.column("role"), pa.scalar("tool"))).as_py() in (
        0, None,
    )


def test_key_keeps_previous_state_when_update_fails(tmp_path):
    """A later failing version must not clobber an earlier passing one."""
    ev = pa.table({
        "conv_id": ["c1", "c1"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": ["user", "user"],
        "text": ["good", ""],
        "tool": ["api", "api"],
        "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
        "op": ["insert", "update"],
        "lsn": pa.array([0, 1], pa.int64()),
    })
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(ev.slice(0, 1), str(d / "events-epoch-000000-000000.parquet"))
    pq.write_table(ev.slice(1, 1), str(d / "events-epoch-000001-000000.parquet"))
    eng = CdcEngine(
        str(tmp_path / "out"), num_partitions=2, num_actors=2,
        expectations={"nonempty_text": expect_nonempty("text")},
    )
    s = eng.run(str(d))
    assert s["expect_failed"] == 1
    live = eng.final_table()
    assert live.num_rows == 1 and live.column("text").to_pylist() == ["good"]
    # the failed lsn still advanced the watermark: replaying it is a dup
    s2 = eng.run(epoch_files=[
        [str(d / "events-epoch-000000-000000.parquet")],
        [str(d / "events-epoch-000001-000000.parquet")],
    ])
    assert s2["epochs_run"] == 0


def test_expect_chain_survives_resume_without_callables(exp_env, tmp_path):
    """Callables are not persisted; a fresh engine over the committed table
    still reads the quarantine history (and status-style consumers need no
    predicates)."""
    d, files = exp_env
    out = str(tmp_path / "out")
    eng = CdcEngine(
        out, num_partitions=8, num_actors=2,
        expectations={"not_null_tool": expect_not_null("tool")},
    )
    s = eng.run(epoch_files=files)
    resumed = CdcEngine(out)  # no expectations supplied
    assert resumed.expectations is None
    assert resumed.expect_dataset().count() == s["expect_failed"]


def test_migrate_carries_expect_chain(exp_env, tmp_path):
    d, files = exp_env
    out = str(tmp_path / "out")
    eng = CdcEngine(
        out, num_partitions=8, num_actors=2,
        expectations={"not_null_tool": expect_not_null("tool")},
    )
    s = eng.run(epoch_files=files)
    before = _canon(eng.final_table())
    eng.migrate(new_num_partitions=4)
    assert _canon(eng.final_table()).equals(before)
    assert eng.expect_dataset().count() == s["expect_failed"]


def test_expect_or_fail_aborts_epoch(ray_session, tmp_path):
    """DLT expect_or_fail: a failing winner ABORTS the epoch before commit
    (deterministic — run raises without retry); nothing publishes, and a
    re-run without the rule (or with fixed data) applies the epoch."""
    import pyarrow.compute as pc
    import pytest
    import ray as _ray

    from encode_ingest_ray.functions.generator import generate_cdc_events
    from encode_ingest_ray.pipelines.cdc import CdcEngine, discover_epoch_files

    ev = str(tmp_path / "events")
    generate_cdc_events(ev, n_events=6000, n_convs=80, epochs=2, seed=21)
    epochs = discover_epoch_files(ev)
    out = str(tmp_path / "out")

    def tool_not_python(t):
        # fails: plenty of winners carry tool == 'python'
        return pc.not_equal(pc.fill_null(t.column("tool"), ""), "python")

    eng = CdcEngine(out, num_partitions=8, num_actors=2,
                    fail_expectations={"no_python_tool": tool_not_python})
    with pytest.raises(_ray.exceptions.RayTaskError, match="no_python_tool"):
        eng.run(epoch_files=epochs[:1])
    assert CdcEngine(out, num_actors=2).manifest.latest() is None

    # a passing fail-rule commits normally
    def never_fails(t):
        return pc.is_valid(t.column("conv_id"))

    eng2 = CdcEngine(out, num_partitions=8, num_actors=2,
                     fail_expectations={"key_present": never_fails})
    s = eng2.run(epoch_files=epochs)
    assert s["epochs_run"] == 2
    # and the aborted attempt left nothing behind: equal to a control run
    ctl = CdcEngine(str(tmp_path / "ctl"), num_partitions=8, num_actors=2)
    ctl.run(epoch_files=epochs)
    assert eng2.final_table().equals(ctl.final_table())
