"""Data-quality suite (stages/dq.py) and spatial grid join (stages/spatial.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from encode_ingest_ray.stages.dq import dq_suite
from encode_ingest_ray.stages.spatial import grid_pairs_within


def _chunked(table: pa.Table, n_chunks: int = 4):
    """Multi-block dataset so per-block partials and the exchange are real."""
    rows = table.num_rows
    step = max(1, rows // n_chunks)
    return ray.data.from_arrow(
        [table.slice(i, step) for i in range(0, rows, step)]
    )


# ------------------------------------------------------------------- dq


def test_dq_suite_counts_injected_violations(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 2, 2, 3, 4, 4, 4, 5], pa.int64()),
            "fk": pa.array([1, None, 3, None, 5, 6, 7, 8], pa.int64()),
            "status": pa.array(["O", "F", "X", "P", "O", "Y", "O", "F"]),
            "v": pa.array([5, -1, 10, 200, 0, 7, 3, 150], pa.int64()),
        }
    )
    got = (
        dq_suite(
            _chunked(t),
            [
                ("not_null", "fk"),
                ("accepted", "status", ["O", "F", "P"]),
                ("bounds", "v", 1, 100, lambda c: c),
                ("unique", "k"),
            ],
        )
        .to_pandas()
        .set_index("check")
    )
    assert got.loc["row_count", "metric"] == 8
    assert got.loc["row_count", "passed"] == 1
    assert got.loc["not_null:fk", "metric"] == 2  # two injected nulls
    assert got.loc["accepted:status", "metric"] == 2  # X and Y
    # v outside [1, 100]: -1, 200, 0, 150
    assert got.loc["bounds:v", "metric"] == 4
    # duplicate keys: 2 (x2) and 4 (x3) -> 2 keys with count > 1
    assert got.loc["unique:k", "metric"] == 2
    assert (got.loc[got.index != "row_count", "passed"] == 0).all()


def test_dq_suite_all_green_and_null_in_accepted(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "status": pa.array(["O", None, "F"]),
        }
    )
    got = (
        dq_suite(_chunked(t, 2), [("accepted", "status", ["O", "F"]), ("unique", "k")])
        .to_pandas()
        .set_index("check")
    )
    # NULL is not an accepted value — counts as a violation
    assert got.loc["accepted:status", "metric"] == 1
    assert got.loc["unique:k", "metric"] == 0
    assert got.loc["unique:k", "passed"] == 1


# -------------------------------------------------------------- spatial


def _brute_pairs(ids, x, y, d):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
            if d2 <= d * d:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d2))
    return out


def test_grid_pairs_match_brute_force(ray_session):
    rng = np.random.default_rng(11)
    n, extent, d = 400, 2000, 150
    ids = np.arange(1, n + 1, dtype=np.int64)
    x = rng.integers(0, extent, n).astype(np.int64)
    y = rng.integers(0, extent, n).astype(np.int64)
    ds = _chunked(pa.table({"id": ids, "x": x, "y": y}), 5)
    got = grid_pairs_within(ds, id_col="id", x_col="x", y_col="y", d=d).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"], got["dist2"]))
    assert len(got) == len(got_set)  # no duplicate pairs
    assert got_set == _brute_pairs(ids, x, y, d)


def test_grid_pairs_boundary_same_cell_and_exact_distance(ray_session):
    # exactly at distance d (kept), just past (dropped), same-cell neighbors,
    # cross-cell border partners, and a point at the grid origin
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "x": pa.array([0, 100, 199, 200, 350], pa.int64()),
            "y": pa.array([0, 0, 0, 0, 0], pa.int64()),
        }
    )
    got = grid_pairs_within(
        _chunked(t, 2), id_col="id", x_col="x", y_col="y", d=100
    ).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (1, 2) in pairs  # exactly d apart
    assert (2, 3) in pairs  # same-cell pair (cells of 100: x=100 vs 199)
    assert (3, 4) in pairs  # cross-cell border pair
    assert (1, 3) not in pairs  # 199 > d
    assert (4, 5) not in pairs  # 150 > d
    assert pairs == {(1, 2), (2, 3), (2, 4), (3, 4)}  # (2,4) also exactly d


@pytest.mark.parametrize("name", ["dq_checks_orders", "spatial_pairs_customers"])
def test_registered_queries_run(ray_session, sf_dir, name):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    ds = registry.QUERIES[name](sf_dir)
    assert ds.count() > 0
    assert name in registry.ORACLE
