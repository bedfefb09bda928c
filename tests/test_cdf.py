"""Retraction-capable changefeed (Delta-CDF "full" mode): with
changefeed_preimages=True every commit stores the previous committed LIVE
version of each touched key as a sidecar; changes_cdf() tags rows
_change_type ∈ {insert, update_preimage, update_postimage, delete} and the
telescoping invariant Σpost − Σpre == live table holds over any epoch
prefix — the contract incremental downstream MVs rely on."""

import collections
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import (
    CdcEngine,
    ChangefeedHorizonError,
    discover_epoch_files,
)


@pytest.fixture(scope="module")
def cdf_env(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdf-events"))
    generate_cdc_events(
        d, n_events=8_000, n_convs=100, epochs=4, seed=13, dup_ratio=0.05,
        delete_ratio=0.08, update_ratio=0.4,
    )
    out = str(tmp_path_factory.mktemp("cdf-out") / "table")
    eng = CdcEngine(out, num_partitions=8, num_actors=2,
                    changefeed_preimages=True, compact_every=3,
                    vacuum_retain=None)
    eng.run(str(d))
    return eng, discover_epoch_files(d)


def _feed(eng, **kw) -> pa.Table:
    rows = eng.changes_cdf(**kw).take_all()
    return pa.Table.from_pylist(rows) if rows else pa.table({})


def _signed_mv(feed: pa.Table) -> dict:
    """Driver-side fold of the signed stream: conv -> [count, chars]."""
    mv: dict = {}
    for c, ct, txt in zip(
        feed.column("conv_id").to_pylist(),
        feed.column("_change_type").to_pylist(),
        feed.column("text").to_pylist(),
    ):
        s = 1 if ct in ("insert", "update_postimage") else -1
        a = mv.setdefault(c, [0, 0])
        a[0] += s
        a[1] += s * len(txt)
    return {k: tuple(v) for k, v in mv.items() if v != [0, 0]}


def test_telescoping_invariant_and_tags(cdf_env):
    eng, _ = cdf_env
    feed = _feed(eng)
    tags = collections.Counter(feed.column("_change_type").to_pylist())
    assert set(tags) == {"insert", "update_preimage", "update_postimage",
                         "delete"}
    assert tags["update_preimage"] == tags["update_postimage"]
    live = eng.final_table()
    want = {}
    for c, t in zip(live.column("conv_id").to_pylist(),
                    live.column("text").to_pylist()):
        a = want.setdefault(c, [0, 0])
        a[0] += 1
        a[1] += len(t)
    assert _signed_mv(feed) == {k: tuple(v) for k, v in want.items()}
    # ...and over every prefix window + its complement (incremental syncs)
    part1, part2 = _feed(eng, to_epoch=1), _feed(eng, since_epoch=1)
    merged: dict = {}
    for k, (n, ch) in list(_signed_mv(part1).items()) + list(
        _signed_mv(part2).items()
    ):
        a = merged.setdefault(k, [0, 0])
        a[0] += n
        a[1] += ch
    merged = {k: tuple(v) for k, v in merged.items() if v != [0, 0]}
    assert merged == {k: tuple(v) for k, v in want.items()}


def test_pairing_and_delete_carries_old_row(cdf_env):
    eng, _ = cdf_env
    feed = _feed(eng)

    def keyset(tag):
        t = feed.filter(pc.equal(feed.column("_change_type"), pa.scalar(tag)))
        return set(zip(t.column("epoch").to_pylist(),
                       t.column("conv_id").to_pylist(),
                       t.column("turn_idx").to_pylist()))

    assert keyset("update_preimage") == keyset("update_postimage")
    # delete-tagged rows are PREIMAGES: their own op is a live op, never
    # 'delete' (the tombstone itself is not emitted in CDF mode)
    dels = feed.filter(
        pc.equal(feed.column("_change_type"), pa.scalar("delete"))
    )
    assert dels.num_rows > 0
    assert "delete" not in set(dels.column("op").to_pylist())
    # inserts never have a same-epoch preimage
    assert not (keyset("insert") & keyset("update_preimage"))


def test_flag_off_table_raises(cdf_env, tmp_path):
    _, files = cdf_env
    eng = CdcEngine(str(tmp_path / "plain"), num_partitions=4, num_actors=2)
    eng.run(epoch_files=files[:1])
    with pytest.raises(ChangefeedHorizonError, match="preimage"):
        eng.changes_cdf().take_all()
    # the plain record-level feed still works on the same table
    assert eng.changes().count() > 0


def test_policy_adopted_on_resume_and_replay_noop(cdf_env, tmp_path):
    eng, files = cdf_env
    resumed = CdcEngine(eng.out_dir)
    assert resumed.changefeed_preimages is True
    s = resumed.run(epoch_files=files)
    assert s["epochs_run"] == 0
    # the feed is unchanged by the no-op replay
    assert _feed(resumed).num_rows == _feed(eng).num_rows


def test_vacuum_protects_retained_preimages_and_gcs_old(tmp_path):
    d = str(tmp_path / "ev")
    generate_cdc_events(d, n_events=6_000, n_convs=60, epochs=6, seed=7,
                        update_ratio=0.5, delete_ratio=0.05)
    eng = CdcEngine(str(tmp_path / "out"), num_partitions=4, num_actors=2,
                    changefeed_preimages=True, compact_every=2,
                    vacuum_retain=1)
    eng.run(d)
    # retained window readable...
    last = eng.manifest.committed_epochs()[-1]
    assert eng.changes_cdf(since_epoch=last - 1).count() >= 0
    # ...full-history window is past the horizon (files vacuumed)
    with pytest.raises(ChangefeedHorizonError):
        eng.changes_cdf().take_all()
    # and old pre- files were actually deleted from disk
    import glob

    stale = [
        f for f in glob.glob(os.path.join(eng.out_dir, "part=*", "pre-*.parquet"))
        if int(os.path.basename(f)[4:10]) < last - 1
    ]
    referenced = set()
    for e in eng.manifest.committed_epochs()[-1:]:
        referenced.update(eng.manifest.read_epoch(e).get("preimages") or [])
    assert not [f for f in stale if f not in referenced]


def test_replication_from_preimaged_source(cdf_env, tmp_path):
    """The plain feed (and so replicate_from) is byte-identical whether or
    not the source also writes preimages."""
    eng, _ = cdf_env
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=5, num_actors=2)
    rep.replicate_from(eng)
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    a = eng.final_table()
    b = rep.final_table()
    assert a.select(sorted(a.column_names)).sort_by(key).equals(
        b.select(sorted(b.column_names)).sort_by(key)
    )
