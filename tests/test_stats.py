"""Kernel + end-to-end tests for the statistical-analytics family
(stages/stats.py): ROWS-frame moving sum, OHLC mergeable downsampling,
integer z-score outlier filtering, and column profiling."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from encode_ingest_ray.stages.stats import (
    grouped_outlier,
    moving_sum,
    moving_sum_table,
    ohlc,
    ohlc_merge,
    ohlc_partial,
    profile_dataset,
)


def _naive_moving(keys, order, vals, preceding):
    from collections import defaultdict

    by_k = defaultdict(list)
    for k, o, v in zip(keys, order, vals):
        by_k[k].append((o, v))
    out = {}
    for k, rows in by_k.items():
        rows.sort()
        for i, (o, _) in enumerate(rows):
            out[(k, o)] = sum(v for _, v in rows[max(0, i - preceding) : i + 1])
    return out


def test_moving_sum_table_matches_naive():
    rng = np.random.default_rng(7)
    n = 400
    keys = rng.integers(0, 12, n)
    order = rng.permutation(n)
    vals = rng.integers(-50, 200, n)
    t = pa.table({"k": keys, "o": order, "v": vals})
    got = moving_sum_table(t, ["k"], ["o"], "v", 3, "ms")
    expect = _naive_moving(keys.tolist(), order.tolist(), vals.tolist(), 3)
    for r in got.to_pylist():
        assert r["ms"] == expect[(r["k"], r["o"])]


def test_moving_sum_table_empty_and_single():
    t = pa.table({"k": pa.array([], pa.int64()), "o": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    assert moving_sum_table(t, ["k"], ["o"], "v", 3, "ms").num_rows == 0
    t1 = pa.table({"k": [5], "o": [1], "v": [42]})
    assert moving_sum_table(t1, ["k"], ["o"], "v", 3, "ms")["ms"].to_pylist() == [42]


def test_moving_sum_distributed_matches_kernel(ray_session):
    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "k": rng.integers(0, 50, n),
            "o": rng.permutation(n),
            "v": rng.integers(0, 1000, n),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = pa.concat_tables(
        [pa.Table.from_pandas(b.to_pandas()) for b in
         moving_sum(ds, ["k"], ["o"], "v", 3, "ms").iter_batches(batch_format="pyarrow")],
        promote_options="permissive",
    ).sort_by([("k", "ascending"), ("o", "ascending")])
    want = moving_sum_table(t, ["k"], ["o"], "v", 3, "ms").sort_by(
        [("k", "ascending"), ("o", "ascending")]
    )
    assert got.select(["k", "o", "v", "ms"]).equals(want.select(["k", "o", "v", "ms"]))


def _naive_ohlc(rows):
    # rows: (key, ts, id, v) -> key: (open, high, low, close, n)
    out = {}
    for k, ts, i, v in rows:
        cur = out.get(k)
        if cur is None:
            out[k] = [(ts, i, v), v, v, (ts, i, v), 1]
        else:
            if (ts, i) < cur[0][:2]:
                cur[0] = (ts, i, v)
            if (ts, i) > cur[3][:2]:
                cur[3] = (ts, i, v)
            cur[1] = max(cur[1], v)
            cur[2] = min(cur[2], v)
            cur[4] += 1
    return {
        k: (c[0][2], c[1], c[2], c[3][2], c[4]) for k, c in out.items()
    }


def test_ohlc_partial_then_merge_matches_naive():
    rng = np.random.default_rng(3)
    n = 600
    rows = [
        (int(k), int(ts), int(i), int(v))
        for k, ts, i, v in zip(
            rng.integers(0, 20, n),
            rng.integers(0, 40, n),  # many ts collisions -> tie-breaks matter
            rng.permutation(n),
            rng.integers(-100, 100, n),
        )
    ]
    t = pa.table(
        {
            "k": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "id": [r[2] for r in rows],
            "v": [r[3] for r in rows],
        }
    )
    # split into 3 chunks, partial each, merge
    parts = [
        ohlc_partial(t.slice(i * 200, 200), ["k"], "ts", "id", "v")
        for i in range(3)
    ]
    merged = ohlc_merge(pa.concat_tables(parts), ["k"])
    want = _naive_ohlc(rows)
    assert merged.num_rows == len(want)
    for r in merged.to_pylist():
        o, h, lo, c, cnt = want[r["k"]]
        assert (r["open_v"], r["max_v"], r["min_v"], r["close_v"], r["n"]) == (
            o, h, lo, c, cnt,
        )


def test_ohlc_merge_idempotent_and_empty():
    empty = pa.table(
        {"k": pa.array([], pa.int64()), "ts": pa.array([], pa.int64()),
         "id": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
    )
    p = ohlc_partial(empty, ["k"], "ts", "id", "v")
    assert p.num_rows == 0
    assert ohlc_merge(p, ["k"]).num_rows == 0
    one = pa.table({"k": [1, 1], "ts": [5, 5], "id": [2, 1], "v": [10, 20]})
    p1 = ohlc_partial(one, ["k"], "ts", "id", "v")
    m1 = ohlc_merge(p1, ["k"])
    m2 = ohlc_merge(m1, ["k"])  # merging a merged partial changes nothing
    assert m1.to_pylist() == m2.to_pylist()
    # ts tie broken by id: open is id=1 (v=20), close id=2 (v=10)
    r = m1.to_pylist()[0]
    assert (r["open_v"], r["close_v"]) == (20, 10)


def test_ohlc_distributed(ray_session):
    rng = np.random.default_rng(9)
    n = 4000
    t = pa.table(
        {
            "k": rng.integers(0, 30, n),
            "ts": rng.integers(0, 100, n),
            "id": rng.permutation(n),
            "v": rng.integers(0, 10_000, n),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = {
        r["k"]: (r["open_v"], r["max_v"], r["min_v"], r["close_v"], r["n"])
        for r in ohlc(ds, ["k"], "ts", "id", "v").take_all()
    }
    rows = list(zip(*[t.column(c).to_pylist() for c in ["k", "ts", "id", "v"]]))
    assert got == _naive_ohlc(rows)


def test_grouped_outlier_flags_exact_boundary(ray_session):
    # group 1: values 0,0,0,100 -> mean 25, sigma = sqrt((4*10000-10000*... )
    # integer check: n=4, s1=100, s2=10000; row x=100: (400-100)^2=90000 vs
    # 4*(40000-10000)=120000 -> NOT an outlier at k=2 (z^2 = 3 < 4).
    # group 2: 0,0,0,0,100 -> n=5,s1=100,s2=10000; x=100: (500-100)^2=160000
    # vs 4*(50000-10000)=160000 -> strict > fails AT the boundary (z^2==4).
    # group 3: 0,0,0,0,0,100 -> n=6: (600-100)^2=250000 > 4*(60000-10000)
    # =200000 -> outlier.
    t = pa.table(
        {
            "g": [1] * 4 + [2] * 5 + [3] * 6,
            "x": [0, 0, 0, 100, 0, 0, 0, 0, 100, 0, 0, 0, 0, 0, 100],
            "rid": list(range(15)),
        }
    )
    fact = ray.data.from_arrow(t).repartition(3)
    stats = ray.data.from_arrow(t.select(["g", "x"])).repartition(3)
    got = grouped_outlier(fact, stats, key="g", value_col="x", k=2, min_n=2).take_all()
    assert [(r["g"], r["x"]) for r in got] == [(3, 100)]


def test_profile_dataset_nulls_and_strings(ray_session):
    t = pa.table(
        {
            "a": pa.array([3, None, 1, 9, None], pa.int64()),
            "s": pa.array(["b", "a", None, "z", "a"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)  # some blocks all-null / empty
    rows = {r["col"]: r for r in profile_dataset(ds, ["a", "s"]).take_all()}
    assert rows["a"] == {
        "col": "a", "n_rows": 5, "n_null": 2, "min_val": "1", "max_val": "9"
    }
    assert rows["s"] == {
        "col": "s", "n_rows": 5, "n_null": 1, "min_val": "a", "max_val": "z"
    }


def _naive_skyline(pts):
    out = []
    for a in pts:
        dominated = any(
            b[0] <= a[0] and b[1] <= a[1] and (b[0] < a[0] or b[1] < a[1])
            for b in pts
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_table_matches_naive_with_duplicates():
    from encode_ingest_ray.stages.stats import skyline_table

    rng = np.random.default_rng(5)
    x = rng.integers(0, 15, 300)
    y = rng.integers(0, 15, 300)  # small domain -> duplicates + ties
    t = pa.table({"x": x, "y": y, "id": np.arange(300)})
    got = sorted(zip(*[skyline_table(t, "x", "y").column(c).to_pylist() for c in ["x", "y"]]))
    assert got == _naive_skyline(list(zip(x.tolist(), y.tolist())))
    # duplicates of a skyline point must ALL survive
    t2 = pa.table({"x": [1, 1, 2], "y": [1, 1, 0], "id": [1, 2, 3]})
    from encode_ingest_ray.stages.stats import skyline_table as sk
    assert sk(t2, "x", "y").num_rows == 3  # (1,1)x2 and (2,0) are all Pareto


def test_skyline_distributed_local_merge(ray_session):
    from encode_ingest_ray.stages.stats import skyline, skyline_table

    rng = np.random.default_rng(17)
    t = pa.table(
        {
            "x": rng.integers(0, 1000, 6000),
            "y": rng.integers(0, 1000, 6000),
            "id": np.arange(6000),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = sorted(
        (r["x"], r["y"], r["id"]) for r in skyline(ds, "x", "y").take_all()
    )
    want = sorted(
        zip(*[skyline_table(t, "x", "y").column(c).to_pylist() for c in ["x", "y", "id"]])
    )
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "moving_sum_orders",
        "ohlc_user_daily",
        "outlier_zscore_events",
        "grouped_regression_supplier",
        "profile_orders_columns",
        "skyline_parts",
        "stratified_sample_docs",
        "grouped_mad_orders",
    ],
)
def test_registered_stats_queries_run(ray_session, sf_dir, name):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    ds = registry.QUERIES[name](sf_dir)
    assert ds.count() >= 0
    assert name in registry.ORACLE


def test_grouped_mad_table_matches_naive():
    from encode_ingest_ray.stages.stats import grouped_mad_table

    rng = np.random.default_rng(23)
    k = rng.integers(0, 20, 500)
    v = rng.integers(-100, 100, 500)
    got = grouped_mad_table(
        pa.table({"k": k, "v": v}), "k", "v", "med", "mad"
    ).to_pandas().set_index("k")
    for key in np.unique(k):
        vals = np.sort(v[k == key])
        med = vals[(len(vals) - 1) // 2]
        ad = np.sort(np.abs(v[k == key] - med))
        assert got.loc[key, "med"] == med
        assert got.loc[key, "mad"] == ad[(len(ad) - 1) // 2]


# ------------------------------------------------- CUSUM / entropy / Gini


def test_cusum_table_matches_recursive_definition():
    from encode_ingest_ray.stages.stats import cusum_table

    rng = np.random.default_rng(41)
    n = 600
    k = rng.integers(0, 15, n)
    o = rng.permutation(n)
    v = rng.integers(-40, 60, n)
    t = pa.table({"k": k, "o": o, "v": v})
    got = {
        (r["k"], r["o"]): r["cusum"]
        for r in cusum_table(t, ["k"], ["o"], "v", 7, "cusum", ["k", "o"]).to_pylist()
    }
    from collections import defaultdict

    by_k = defaultdict(list)
    for kk, oo, vv in zip(k.tolist(), o.tolist(), v.tolist()):
        by_k[kk].append((oo, vv))
    for kk, rows in by_k.items():
        rows.sort()
        s = 0
        for oo, vv in rows:
            s = max(0, s + vv - 7)
            assert got[(kk, oo)] == s


def test_cusum_table_empty():
    from encode_ingest_ray.stages.stats import cusum_table

    t = pa.table({"k": pa.array([], pa.int64()), "o": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    assert cusum_table(t, ["k"], ["o"], "v", 1, "c", ["k", "o"]).num_rows == 0


def test_grouped_entropy_terms_and_uniform_case():
    import math

    from encode_ingest_ray.stages.stats import grouped_entropy_table

    # user 1: uniform over 4 types x 3 -> entropy = ln(4); user 2: single type
    rows_k, rows_t = [], []
    for ty in "abcd":
        rows_k += [1, 1, 1]
        rows_t += [ty] * 3
    rows_k += [2, 2]
    rows_t += ["z", "z"]
    t = pa.table({"u": rows_k, "ty": rows_t,
                  "n": np.ones(len(rows_k), np.int64)})
    got = {r["u"]: r for r in grouped_entropy_table(t, "u", "ty", "n").to_pylist()}
    assert got[2]["entropy_micro"] == 0 and got[2]["n_types"] == 1
    assert got[1]["n_events"] == 12 and got[1]["n_types"] == 4
    term = math.floor(3 * math.log(12 / 3) / 12 * 1000000 + 0.5)
    assert got[1]["entropy_micro"] == 4 * term
    assert abs(got[1]["entropy_micro"] - round(math.log(4) * 1e6)) <= 4


def test_gini_from_counts_known_values():
    from encode_ingest_ray.stages.stats import gini_from_counts

    # perfectly equal values -> gini 0; one-holder extreme -> (n-1)/n = 0.75
    t = pa.table({
        "g": ["eq", "eq", "ineq", "ineq"],
        "v": [50, 50, 0, 100],
        "c": [2, 1, 3, 1],
    })
    got = {r["g"]: r for r in gini_from_counts(t, "g", "v", "c").to_pylist()}
    assert got["eq"]["gini_micro"] == 0 and got["eq"]["n_orders"] == 3
    assert got["ineq"]["gini_micro"] == 750000 and got["ineq"]["sum_cents"] == 100


def test_gini_matches_pairwise_definition():
    from encode_ingest_ray.stages.stats import gini_from_counts

    rng = np.random.default_rng(99)
    vals = rng.integers(1, 500, 80)
    uniq, cnt = np.unique(vals, return_counts=True)
    t = pa.table({"g": ["x"] * len(uniq), "v": uniq, "c": cnt})
    got = gini_from_counts(t, "g", "v", "c").to_pylist()[0]
    n, sx = len(vals), int(vals.sum())
    pairwise = sum(abs(int(a) - int(b)) for a in vals for b in vals)
    num, den = pairwise, 2 * n * sx  # G = sum|xi-xj| / (2 n sum x)
    assert got["gini_micro"] == (2000000 * num + 2 * den) // (4 * den) or \
        abs(got["gini_micro"] - round(num / den * 1e6)) <= 1


@pytest.mark.parametrize(
    "name", ["entropy_user_events", "cusum_user_value", "gini_order_value"]
)
def test_registered_info_stats_queries_run(ray_session, sf_dir, name):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    ds = registry.QUERIES[name](sf_dir)
    assert ds.count() > 0
    assert name in registry.ORACLE


def test_impute_mean_handles_all_missing_user(ray_session, tmp_path):
    """A user whose EVERY value is masked must impute to (NULL, 0) — the
    group has no present values; others fill with exact (Σv, n) partials."""
    import pandas as pd
    import pyarrow.parquet as pq

    from encode_ingest_ray.pipelines.stats_queries import impute_mean_events

    # user 1: events 13 (missing) and 14 (present, v=2.0)
    # user 2: only event 26 -> missing, no present values at all
    t = pa.table(
        {
            "event_id": pa.array([13, 14, 26], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([9.0, 2.0, 9.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = (
        impute_mean_events(str(d))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["fill_num"].tolist() == [2000.0, 2000, 0] or [
        x if not pd.isna(x) else None for x in got["fill_num"]
    ] == [2000, 2000, None]
    assert pd.isna(got["fill_num"].iloc[2])
    assert got["fill_den"].tolist() == [1, 1, 0]
