"""Size-aware compaction deferral (compact_min_bytes_ratio): a partition
whose delta bytes are tiny next to its base defers the rewrite until the
ratio is met or the 4x chain-length hard cap fires; timing never changes
the live table, and crash replay reaches identical verdicts."""

from __future__ import annotations

import os
import tempfile
import uuid


def _events(tmp, n_epochs=10):
    from encode_ingest_ray.functions.generator import generate_cdc_events

    ev = os.path.join(tmp, "events")
    generate_cdc_events(
        ev, n_events=5000, n_convs=50, epochs=n_epochs, seed=11,
        dup_ratio=0.02,
    )
    return ev


def test_ratio_defers_until_hard_cap_and_content_identical(ray_session):
    from encode_ingest_ray.pipelines.cdc import CdcEngine

    tmp = tempfile.mkdtemp(prefix=f"cpolicy-{uuid.uuid4().hex[:8]}-")
    ev = _events(tmp)

    control = CdcEngine(
        os.path.join(tmp, "control"), num_partitions=4, num_actors=2,
        compact_every=2, vacuum_retain=None,
    )
    control.run(ev)
    deferred = CdcEngine(
        os.path.join(tmp, "deferred"), num_partitions=4, num_actors=2,
        compact_every=2, compact_min_bytes_ratio=1000.0, vacuum_retain=None,
    )
    deferred.run(ev)

    def chain_history(man):
        out = []
        for e in man.committed_epochs():
            rec = man.read_epoch(e)
            out += [len(p["deltas"]) for p in rec["partitions"].values()]
        return out

    # control compacts every 2 deltas: chains stay short at EVERY epoch
    ctrl = chain_history(control.manifest)
    assert max(ctrl) < 2 + 1
    # the absurd ratio defers everything past compact_every; only the first
    # compaction (no base yet -> ratio rule inapplicable) and the 4x hard
    # cap (chain_len >= 8) fire.  With 10 dirty epochs per partition some
    # mid-history chain must have grown well beyond the control's bound
    # and the hard cap must have held throughout.
    dfr = chain_history(deferred.manifest)
    assert max(dfr) > max(ctrl)
    assert max(dfr) < 4 * 2  # the hard cap held

    # compaction timing is invisible in the live table
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    a = control.final_table().sort_by(key)
    b = deferred.final_table().sort_by(key)
    assert a.select(sorted(a.column_names)).equals(b.select(sorted(b.column_names)))

    # replay determinism: a rerun is a no-op (same deferral verdicts)
    replay = CdcEngine(
        os.path.join(tmp, "deferred"), num_partitions=4, num_actors=2,
        compact_every=2, compact_min_bytes_ratio=1000.0, vacuum_retain=None,
    )
    s = replay.run(ev)
    assert s["epochs_run"] == 0


def test_ratio_met_compacts_like_control(ray_session):
    """ratio=0.0 is always met -> behaves exactly like the count trigger."""
    from encode_ingest_ray.pipelines.cdc import CdcEngine

    tmp = tempfile.mkdtemp(prefix=f"cpolicy0-{uuid.uuid4().hex[:8]}-")
    ev = _events(tmp, n_epochs=6)
    a = CdcEngine(os.path.join(tmp, "a"), num_partitions=4, num_actors=2,
                  compact_every=2, vacuum_retain=None)
    a.run(ev)
    b = CdcEngine(os.path.join(tmp, "b"), num_partitions=4, num_actors=2,
                  compact_every=2, compact_min_bytes_ratio=0.0,
                  vacuum_retain=None)
    b.run(ev)
    pa_, pb = a.manifest.pointers(), b.manifest.pointers()
    assert {k: (v["base"] is not None, len(v["deltas"])) for k, v in pa_.items()} \
        == {k: (v["base"] is not None, len(v["deltas"])) for k, v in pb.items()}
