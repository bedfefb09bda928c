"""PIVOT / ROLLUP kernels (stages/aggregate.py) — tiny-table parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.aggregate import pivot_count_columns, rollup_sums


def _table(rows, schema):
    return pa.Table.from_pylist(rows, schema=schema)


def test_pivot_counts_masks_nulls_and_unlisted(ray_session):
    t = _table(
        [
            {"k": "a", "c": "x"},
            {"k": "a", "c": "x"},
            {"k": "a", "c": "y"},
            {"k": "a", "c": None},      # counts toward total only
            {"k": "b", "c": "z"},       # unlisted category: total only
            {"k": "b", "c": "y"},
        ],
        pa.schema([("k", pa.string()), ("c", pa.string())]),
    )
    ds = ray.data.from_arrow(t)
    out = pivot_count_columns(ds, "k", "c", ["x", "y"]).to_pandas()
    out = out.set_index("k").sort_index()
    assert out.loc["a", "n_x"] == 2 and out.loc["a", "n_y"] == 1
    assert out.loc["a", "n_total"] == 4
    assert out.loc["b", "n_x"] == 0 and out.loc["b", "n_y"] == 1
    assert out.loc["b", "n_total"] == 2


def test_pivot_wide_partials_cross_blocks(ray_session):
    # same key split across blocks must merge into one wide row
    t1 = _table([{"k": "a", "c": "x"}], pa.schema([("k", pa.string()), ("c", pa.string())]))
    t2 = _table([{"k": "a", "c": "x"}], pa.schema([("k", pa.string()), ("c", pa.string())]))
    ds = ray.data.from_arrow([t1, t2])
    out = pivot_count_columns(ds, "k", "c", ["x"]).to_pandas()
    assert len(out) == 1 and out.iloc[0]["n_x"] == 2 and out.iloc[0]["n_total"] == 2


def test_rollup_levels_and_nulls(ray_session):
    t = _table(
        [
            {"f": "A", "s": "p", "v": 1},
            {"f": "A", "s": "p", "v": 2},
            {"f": "A", "s": "q", "v": 4},
            {"f": "B", "s": "p", "v": 8},
        ],
        pa.schema([("f", pa.string()), ("s", pa.string()), ("v", pa.int64())]),
    )
    ds = ray.data.from_arrow(t)
    out = rollup_sums(ds, ["f", "s"], ["v"]).to_pandas()
    # levels: 3 finest + 2 per-f + 1 grand
    assert len(out) == 6
    by = {(r["f"], r["s"]): r["v"] for _, r in out.iterrows()}
    finest = {(f, s): v for (f, s), v in by.items() if f is not None and s is not None}
    assert finest == {("A", "p"): 3, ("A", "q"): 4, ("B", "p"): 8}
    perf = {f: v for (f, s), v in by.items() if f is not None and s is None}
    assert perf == {"A": 7, "B": 8}
    grand = [v for (f, s), v in by.items() if f is None and s is None]
    assert grand == [15]


def test_q3_shipping_priority_runs(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    out = registry.QUERIES["q3_shipping_priority"](sf_dir)
    rows = out.take_all()
    assert 0 < len(rows) <= 10
    revs = [r["revenue_cents"] for r in rows]
    assert revs == sorted(revs, reverse=True)
