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


# ------------------------------------------------------------- MERGE INTO


def test_merge_into_edge_semantics(ray_session):
    """Matched insert = no-op keep; unmatched update/delete = no-op; delete
    drops; update rewrites only set_col; insert carries NULL payloads."""
    from encode_ingest_ray.stages.merge import merge_into

    target = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "tag": pa.array(["a", "b", "c", "d"]),
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    changes = pa.table(
        {
            "k": pa.array([2, 3, 4, 5, 6], pa.int64()),
            "action": pa.array(["update", "delete", "insert", "insert", "update"]),
            "new_val": pa.array([99, None, 77, 55, 88], pa.int64()),
        }
    )
    got = (
        merge_into(
            ray.data.from_arrow([target.slice(0, 2), target.slice(2)]),
            ray.data.from_arrow([changes.slice(0, 3), changes.slice(3)]),
            key="k",
            payload_cols=["tag", "v"],
            set_col="v",
            new_val_col="new_val",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1 untouched; k=2 updated to 99; k=3 deleted; k=4 matched-insert noop;
    # k=5 inserted with NULL tag; k=6 unmatched update = no-op (no row)
    assert list(got["k"]) == [1, 2, 4, 5]
    assert list(got["v"]) == [10, 99, 40, 55]
    assert list(got["tag"][:3]) == ["a", "b", "d"]
    assert got["tag"].isna().tolist() == [False, False, False, True]
