"""Metadata-only schema evolution (column rename / drop) — the epoch-stamped
schema log (state/schemalog.py).

Reference analog: the reference evolves schemas by editing Jade
``*.table.json`` column lists (/root/reference/schema/README.md); the engine
adds Iceberg/Delta-style metadata-only rename/drop on top of its additive
evolution.  The contract under test: an entry recorded at epoch E applies to
every chain file with file epoch <= E; files written later already carry
logical names (flush maps the chains it folds)."""

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from encode_ingest_ray.functions.generator import generate_cdc_events
from encode_ingest_ray.pipelines.cdc import CdcEngine, discover_epoch_files
from encode_ingest_ray.state.schemalog import (
    file_epoch,
    map_schema,
    map_table,
    physical_name,
)

# ---------------------------------------------------------------- kernels


def test_file_epoch_parses_chain_naming():
    assert file_epoch("part=00003/delta-000007.parquet") == 7
    assert file_epoch("/x/part=00001/base-000012.parquet") == 12
    assert file_epoch("/x/part=00001/base-000012-mig.parquet") == 12
    assert file_epoch("pre-000004.parquet") == 4
    assert file_epoch("dlbase-000009.parquet") == 9
    with pytest.raises(ValueError):
        file_epoch("events-epoch-000001.parquet")


def test_map_table_chained_renames_and_drop():
    log = [
        {"epoch": 3, "op": "rename", "from": "a", "to": "b"},
        {"epoch": 5, "op": "drop", "column": "junk"},
        {"epoch": 7, "op": "rename", "from": "b", "to": "c"},
    ]
    t = pa.table({"a": [1], "junk": [2], "keep": [3]})
    # a file at epoch 2 applies all three entries in order
    assert map_table(t, 2, log).column_names == ["c", "keep"]
    # a file in (3, 5] was written post-first-rename: physically 'b'
    t45 = pa.table({"b": [1], "junk": [2]})
    assert map_table(t45, 5, log).column_names == ["c"]
    # a file past every entry maps to itself
    t9 = pa.table({"c": [1]})
    assert map_table(t9, 9, log).column_names == ["c"]
    # schema twin agrees
    assert map_schema(t.schema, 2, log).names == ["c", "keep"]


def test_physical_name_traces_renames_and_blocks_dropped_lineage():
    log = [
        {"epoch": 3, "op": "rename", "from": "a", "to": "b"},
        {"epoch": 7, "op": "rename", "from": "b", "to": "c"},
    ]
    assert physical_name("c", 2, log) == "a"
    assert physical_name("c", 5, log) == "b"
    assert physical_name("c", 9, log) == "c"
    # drop + later rename re-creating the name: old files' physical col is
    # NOT the logical one
    log2 = [
        {"epoch": 4, "op": "drop", "column": "x"},
        {"epoch": 6, "op": "rename", "from": "y", "to": "x"},
    ]
    assert physical_name("x", 2, log2) == "y"  # traces through the rename
    # a file between drop and rename: logical x is the dropped lineage
    assert physical_name("x", 5, log2) == "y"
    log3 = [{"epoch": 4, "op": "drop", "column": "x"}]
    assert physical_name("x", 2, log3) is None
    assert physical_name("x", 9, log3) == "x"  # re-added by later ingest


# ------------------------------------------------------------- engine e2e


def _fixture(tmp_path, n_events=12_000, n_convs=200, epochs=4, seed=23):
    ev = str(tmp_path / "events")
    generate_cdc_events(ev, n_events=n_events, n_convs=n_convs,
                        epochs=epochs, seed=seed)
    return discover_epoch_files(ev)


def _renamed_epochs(tmp_path, epochs, which, drop_tool=True):
    """Rewrite the given epoch indices as post-rename source files: payload
    column ``text`` shipped as ``body`` (and ``tool`` omitted)."""
    out = list(epochs)
    for e in which:
        fs = []
        for f in epochs[e]:
            t = pq.read_table(f)
            t = t.rename_columns(
                ["body" if c == "text" else c for c in t.column_names]
            )
            if drop_tool and "tool" in t.column_names:
                t = t.drop_columns(["tool"])
            d = str(tmp_path / f"renamed-e{e}")
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, os.path.basename(f))
            pq.write_table(t, p)
            fs.append(p)
        out[e] = fs
    return out


def _oracle_final(event_glob: str) -> pa.Table:
    """DuckDB LWW fold over ALL raw event files (mixed pre/post-rename
    schemas): the logical value of ``body`` is the winner's text-or-body."""
    con = duckdb.connect()
    t = con.execute(
        f"""
        WITH ev AS (
          SELECT * FROM read_parquet('{event_glob}', union_by_name=true)
        ),
        ranked AS (
          SELECT *, row_number() OVER (
              PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
          FROM ev
        )
        SELECT conv_id, turn_idx, role, COALESCE(body, text) AS body, ts
        FROM ranked WHERE rn = 1 AND op <> 'delete'
        ORDER BY conv_id, turn_idx
        """
    ).arrow()
    con.close()
    return pa.table({c: t.column(c) for c in t.column_names})


def _sorted_live(t: pa.Table, cols) -> pa.Table:
    t = t.select(cols).combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(idx)


def test_rename_drop_roundtrip_matches_oracle(ray_session, tmp_path):
    epochs = _fixture(tmp_path)
    out = str(tmp_path / "out")
    # compact_every=2 forces base folds BOTH sides of the rename boundary
    eng = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=2)
    eng.run(epoch_files=epochs[:2])
    eng.rename_column("text", "body")
    eng.drop_column("tool")
    new_epochs = _renamed_epochs(tmp_path, epochs, (2, 3))
    # fresh engine (resume path): adopts the committed log implicitly
    eng2 = CdcEngine(out, num_partitions=8, num_actors=2, compact_every=2)
    s = eng2.run(epoch_files=new_epochs)
    assert s["epochs_skipped"] == 2 and s["epochs_run"] == 2

    got = eng2.final_table()
    assert set(got.column_names) == {"conv_id", "turn_idx", "role", "ts", "body"}
    want = _oracle_final(str(tmp_path / "*" / "*.parquet"))
    cols = ["conv_id", "turn_idx", "role", "body", "ts"]
    assert _sorted_live(got, cols).equals(
        _sorted_live(want, cols).cast(_sorted_live(got, cols).schema)
    )

    # projection pushdown crosses the rename (old files read 'text' bytes)
    proj = eng2.final_dataset(columns=["body"]).take_batch(20)
    assert "body" in proj and all(v is not None for v in proj["body"][:5])

    # replayed full run is a no-op and keeps the log
    s2 = CdcEngine(out, num_partitions=8, num_actors=2,
                   compact_every=2).run(epoch_files=new_epochs)
    assert s2["epochs_run"] == 0
    assert len(eng2.schema_log()) == 2


def test_time_travel_and_restore_rewind_the_log(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    eng.run(epoch_files=epochs[:2])
    eng.rename_column("text", "body")  # stamps epoch 1
    eng2 = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    eng2.run(epoch_files=_renamed_epochs(tmp_path, epochs, (2,)))

    # epoch 0 predates the rename: its record has no log -> old names
    t0 = eng2.final_dataset(epoch=0).take_batch(5)
    assert "text" in t0 and "body" not in t0
    # epoch 1 was re-stamped BY the rename (same-epoch re-commit): new names
    t1 = eng2.final_dataset(epoch=1).take_batch(5)
    assert "body" in t1 and "text" not in t1

    # RESTORE to epoch 0 rewinds the schema log with the data
    eng2.restore(0)
    eng3 = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    assert eng3.schema_log() == []
    t = eng3.final_table()
    assert "text" in t.column_names and "body" not in t.column_names


def test_migrate_force_rewrites_to_logical_names(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.rename_column("text", "body")
    before = eng.final_table()
    res = eng.migrate(force=True)  # OPTIMIZE: fold chains into one base
    assert res["rows"] > 0
    after = eng.final_table()
    cols = ["conv_id", "turn_idx", "role", "body", "ts"]
    assert _sorted_live(before, cols).equals(_sorted_live(after, cols))
    # the rewritten base files physically carry the logical name
    base = next(
        f for f in glob.glob(os.path.join(out, "part=*", "base-*-mig.parquet"))
    )
    names = pq.read_schema(base).names
    assert "body" in names and "text" not in names
    # re-partitioning after the rename also maps (read_state path)
    eng.migrate(new_num_partitions=4)
    assert _sorted_live(eng.final_table(), cols).equals(
        _sorted_live(before, cols)
    )


def test_validation_rejects_protected_and_unknown(ray_session, tmp_path):
    epochs = _fixture(tmp_path, n_events=4000, n_convs=80, epochs=2)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=4, num_actors=2,
                    index_columns=["role"])
    eng.run(epoch_files=epochs)
    with pytest.raises(ValueError, match="protected"):
        eng.rename_column("conv_id", "cid")
    with pytest.raises(ValueError, match="protected"):
        eng.rename_column("role", "speaker")  # covering-index column
    with pytest.raises(ValueError, match="protected"):
        eng.drop_column("lsn")
    with pytest.raises(ValueError, match="not in the table"):
        eng.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        eng.rename_column("text", "tool")
    with pytest.raises(ValueError, match="no-op"):
        eng.rename_column("text", "text")
    # a valid op on an indexed table commits (single live-manifest commit)
    eng.rename_column("text", "body")
    assert "body" in eng.final_table().column_names


def test_drop_then_readd_is_a_new_column(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2)
    eng.run(epoch_files=epochs[:2])
    eng.drop_column("tool")
    assert "tool" not in eng.final_table().column_names
    # epoch 2 re-introduces 'tool' (unchanged fixture files still carry it)
    eng.run(epoch_files=epochs)
    t = eng.final_table()
    assert "tool" in t.column_names
    # keys untouched since the drop hold NULL tool (old values are invisible)
    lsn_hi_e1 = 0
    for f in epochs[0] + epochs[1]:
        lsn_hi_e1 = max(lsn_hi_e1, pc.max(pq.read_table(f, columns=["lsn"]).column("lsn")).as_py())
    con = duckdb.connect()
    touched = con.execute(
        f"""SELECT DISTINCT conv_id || '#' || CAST(turn_idx AS VARCHAR)
            FROM read_parquet('{tmp_path}/events/*.parquet')
            WHERE lsn > {lsn_hi_e1}"""
    ).fetchall()
    con.close()
    touched_keys = {r[0] for r in touched}
    key = pc.binary_join_element_wise(
        t.column("conv_id").combine_chunks(),
        pc.cast(t.column("turn_idx"), pa.string()).combine_chunks(),
        "#",
    )
    untouched_mask = pc.invert(
        pc.is_in(key, value_set=pa.array(sorted(touched_keys)))
    )
    untouched_tool = t.column("tool").combine_chunks().filter(untouched_mask)
    assert untouched_tool.null_count == len(untouched_tool)


def test_changefeed_is_logical_across_rename(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=3)
    out = str(tmp_path / "out")
    eng = CdcEngine(out, num_partitions=8, num_actors=2, vacuum_retain=None)
    eng.run(epoch_files=epochs[:2])
    eng.rename_column("text", "body")
    eng.run(epoch_files=_renamed_epochs(tmp_path, epochs, (2,), drop_tool=False))
    feed = eng.changes(-1).take_batch(50)
    assert "body" in feed and "text" not in feed


def test_replication_mirrors_the_schema_log(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=4)
    src_dir, rep_dir = str(tmp_path / "src"), str(tmp_path / "rep")
    src = CdcEngine(src_dir, num_partitions=8, num_actors=2,
                    vacuum_retain=None, compact_every=2)
    src.run(epoch_files=epochs[:2])
    rep = CdcEngine(rep_dir, num_partitions=4, num_actors=2,
                    vacuum_retain=None, compact_every=2)
    rep.replicate_from(src)  # syncs pre-rename epochs
    src.rename_column("text", "body")
    src.run(epoch_files=_renamed_epochs(tmp_path, epochs, (2, 3)))
    rep.replicate_from(src)  # post-rename epochs + copied log
    assert rep.schema_log() == src.schema_log()
    cols = ["conv_id", "turn_idx", "role", "body", "ts"]
    assert _sorted_live(rep.final_table(), cols).equals(
        _sorted_live(src.final_table(), cols)
    )


def test_bootstrap_refuses_stale_log_until_optimize(ray_session, tmp_path):
    epochs = _fixture(tmp_path, epochs=3)
    src_dir = str(tmp_path / "src")
    src = CdcEngine(src_dir, num_partitions=8, num_actors=2,
                    vacuum_retain=None)
    src.run(epoch_files=epochs)
    src.rename_column("text", "body")
    rep = CdcEngine(str(tmp_path / "rep"), num_partitions=4, num_actors=2)
    with pytest.raises(ValueError, match="migrate"):
        rep.replicate_from(src, bootstrap=True)
    src.migrate(force=True)  # OPTIMIZE rewrites the chain to logical names
    rep.replicate_from(src, bootstrap=True)
    cols = ["conv_id", "turn_idx", "role", "body", "ts"]
    assert _sorted_live(rep.final_table(), cols).equals(
        _sorted_live(src.final_table(), cols)
    )
