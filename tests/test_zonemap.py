"""Zone-map partition stats + pruned range scan (CdcEngine.scan).

Pruning is whole-partition (file-level skipping would break the LWW
resolve) and conservative (bounds cover every stored version).  It pays
when per-partition bounds are narrow — sparse-key regimes, key-correlated
columns, or after a retention delete's compaction re-tightens the bounds;
under a dense uniform hash layout bounds converge to the global range and
the scan degrades gracefully to the exact residual filter."""

import pyarrow.compute as pc

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine, discover_epoch_files
from encode_ingest_ray.state.merger import column_bounds, merge_bounds

import pyarrow as pa


def test_bounds_kernels():
    t = pa.table({"a": [3, 1, 7], "b": ["x", None, "m"],
                  "c": pa.nulls(3, pa.int64())})
    b = column_bounds(t, ["a", "b", "c", "missing"])
    assert b["a"] == [1, 7] and b["b"] == ["m", "x"]
    assert b["c"] is None and b["missing"] is None
    assert merge_bounds({"a": [2, 5]}, {"a": [1, 3]})["a"] == [1, 5]
    assert merge_bounds(None, {"a": [1, 3]})["a"] == [1, 3]
    assert merge_bounds({"a": [1, 3]}, {"a": None})["a"] == [1, 3]


def _events(tmp_path, **kw):
    ev = str(tmp_path / "events")
    generate_cdc_events(ev, **kw)
    return discover_epoch_files(ev)


def test_scan_is_exact_and_prunes_sparse_keys(ray_session, tmp_path):
    # sparse regime: 12 conversations over 64 partitions -> each dirty
    # partition holds ~one conversation's turn-blocks, so per-partition
    # turn_idx bounds are NARROW and a range scan skips most of the table
    epochs = _events(tmp_path, n_events=8000, n_convs=12, epochs=2, seed=3)
    eng = CdcEngine(str(tmp_path / "out"), num_partitions=64, num_actors=2,
                    compact_every=2, stats_columns=["ts", "turn_idx"])
    eng.run(epoch_files=epochs)
    ptrs = eng.manifest.pointers()
    assert all(
        p.get("stats", {}).get("turn_idx") is not None for p in ptrs.values()
    )
    lo, hi = 0, 2
    parts, pruned = eng.prune_partitions({"turn_idx": (lo, hi)})
    assert pruned > 0 and len(parts) + pruned == len(ptrs)
    got = eng.scan({"turn_idx": (lo, hi)}).take_all()
    want = [
        r for r in eng.final_dataset().take_all() if lo <= r["turn_idx"] <= hi
    ]
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key) and len(got) > 0

    # timestamp bounds: integer-microsecond encoding, exact residual
    # (raw stored µs — naive datetimes interpreted as UTC, NOT the host TZ)
    from datetime import timezone

    def us(dt):
        return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1e6)

    all_ts = [us(r["ts"]) for r in eng.final_dataset().take_all()]
    t_lo, t_hi = min(all_ts), min(all_ts) + (max(all_ts) - min(all_ts)) // 10
    got_ts = eng.scan({"ts": (t_lo, t_hi)}).take_all()
    want_n = sum(1 for v in all_ts if t_lo <= v <= t_hi)
    assert len(got_ts) == want_n

    # disjoint range: zero partitions touched, empty result
    parts0, pruned0 = eng.prune_partitions({"turn_idx": (10**9, None)})
    assert not parts0 and pruned0 == len(ptrs)
    assert eng.scan({"turn_idx": (10**9, None)}).count() == 0


def test_stats_adopt_resume_and_survive_migrate(ray_session, tmp_path):
    epochs = _events(tmp_path, n_events=8000, n_convs=12, epochs=3, seed=4)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=32, num_actors=2, compact_every=2,
                    stats_columns=["turn_idx"])
    eng.run(epoch_files=epochs[:2])
    # resume adopts the committed policy
    eng2 = CdcEngine(out, num_actors=2)
    assert eng2.stats_columns == ["turn_idx"]
    eng2.run(epoch_files=epochs)
    before = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in eng2.scan({"turn_idx": (0, 3)}).take_all()
    )
    # migrate recomputes exact bounds for the new layout
    eng2.migrate(new_num_partitions=8)
    ptrs = eng2.manifest.pointers()
    assert any(p.get("stats", {}).get("turn_idx") for p in ptrs.values())
    after = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in eng2.scan({"turn_idx": (0, 3)}).take_all()
    )
    assert after == before


def test_stats_enabled_mid_life_never_claims_untracked_history(
    ray_session, tmp_path
):
    """Enabling stats on a table with committed history must NOT prune by
    bounds that only cover the new delta — unknown columns stay unpruned
    until a compaction recomputes exact bounds from the full state."""
    epochs = _events(tmp_path, n_events=8000, n_convs=12, epochs=3, seed=6)
    out = str(tmp_path / "out")
    # epoch 0 committed WITHOUT stats
    CdcEngine(out, num_partitions=32, num_actors=2,
              compact_every=100).run(epoch_files=epochs[:1])
    # resume WITH stats; epochs 1-2 commit bounds (no compaction happens)
    eng = CdcEngine(out, num_actors=2, compact_every=100,
                    stats_columns=["turn_idx"])
    eng.run(epoch_files=epochs)
    parts, pruned = eng.prune_partitions({"turn_idx": (0, 1)})
    assert pruned == 0  # history untracked -> nothing may be pruned
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in eng.scan({"turn_idx": (0, 1)}).take_all()
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in eng.final_dataset().take_all()
        if r["turn_idx"] <= 1
    )
    assert got == want
    # a compaction (OPTIMIZE) establishes exact bounds -> pruning resumes
    eng.migrate(force=True)
    _, pruned2 = eng.prune_partitions({"turn_idx": (0, 1)})
    assert pruned2 > 0
    got2 = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in eng.scan({"turn_idx": (0, 1)}).take_all()
    )
    assert got2 == want


def test_stats_columns_protected_from_schema_ops(ray_session, tmp_path):
    import pytest

    epochs = _events(tmp_path, n_events=4000, n_convs=10, epochs=2, seed=8)
    eng = CdcEngine(str(tmp_path / "out"), num_partitions=8, num_actors=2,
                    stats_columns=["tool"])
    eng.run(epoch_files=epochs)
    with pytest.raises(ValueError, match="protected"):
        eng.rename_column("tool", "instrument")
    with pytest.raises(ValueError, match="protected"):
        eng.drop_column("tool")


def test_scan_residual_on_date32_column(ray_session, tmp_path):
    """column_bounds tracks date32 (and time) columns as raw ints; the scan
    residual must mirror that temporal handling — a direct
    pc.greater_equal(date32, int64 scalar) raises ArrowNotImplementedError,
    so the residual casts date/time through their raw int width first."""
    epochs = _events(tmp_path, n_events=4000, n_convs=12, epochs=2, seed=7)

    def add_day(t: pa.Table) -> pa.Table:
        # derive a date32 column from ts at ingest (nested def: cloudpickle
        # ships it by value — test modules are not importable on workers)
        return t.append_column("day", pc.cast(t.column("ts"), pa.date32()))

    eng = CdcEngine(str(tmp_path / "out"), num_partitions=16, num_actors=2,
                    stats_columns=["day"], ingest_transform=add_day)
    eng.run(epoch_files=epochs)
    ptrs = eng.manifest.pointers()
    stats = [p.get("stats", {}).get("day") for p in ptrs.values()]
    tracked = [s for s in stats if s is not None]
    assert tracked and all(
        isinstance(s[0], int) and isinstance(s[1], int) for s in tracked
    )
    rows = eng.final_dataset().take_all()
    days = sorted({(r["day"].toordinal() - 719163) for r in rows})
    lo, hi = days[0], days[len(days) // 2]
    got = eng.scan({"day": (lo, hi)}).take_all()
    want_n = sum(
        1 for r in rows if lo <= (r["day"].toordinal() - 719163) <= hi
    )
    assert len(got) == want_n and len(got) > 0
    # unbounded-side shapes exercise both residual branches
    assert eng.scan({"day": (None, hi)}).count() >= len(got)
    assert eng.scan({"day": (hi + 10**6, None)}).count() == 0
