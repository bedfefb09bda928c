"""Funnel / cohort-retention kernels (stages/funnel.py) — tiny-table parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.funnel import (
    cohort_partials,
    funnel_first_times,
    funnel_table,
)

_US = 10**6
_WEEK = 7 * 86400 * _US


def _events(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("u", pa.int64()), ("ts", pa.timestamp("us")), ("et", pa.string())]
        ),
    )


def _ts(sec):
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=sec)


def test_funnel_strictly_after_semantics():
    t = _events(
        [
            # u=1: click BEFORE signup must not count; the later click does
            {"u": 1, "et": "click", "ts": _ts(5)},
            {"u": 1, "et": "signup", "ts": _ts(10)},
            {"u": 1, "et": "click", "ts": _ts(20)},
            {"u": 1, "et": "purchase", "ts": _ts(15)},  # before click: no
            {"u": 1, "et": "purchase", "ts": _ts(30)},
            # u=2: signup only -> enters funnel, later stages NULL
            {"u": 2, "et": "signup", "ts": _ts(1)},
            # u=3: never signs up -> not in output
            {"u": 3, "et": "click", "ts": _ts(2)},
            # u=4: click at EXACTLY signup ts is not strictly after
            {"u": 4, "et": "signup", "ts": _ts(7)},
            {"u": 4, "et": "click", "ts": _ts(7)},
        ]
    )
    out = {
        r["u"]: r
        for r in funnel_table(t, "u", "ts", "et", ["signup", "click", "purchase"]).to_pylist()
    }
    assert set(out) == {1, 2, 4}
    assert out[1]["t_signup"] == 10 * _US
    assert out[1]["t_click"] == 20 * _US
    assert out[1]["t_purchase"] == 30 * _US
    assert out[2]["t_click"] is None and out[2]["t_purchase"] is None
    assert out[4]["t_click"] is None


def test_funnel_user_split_across_blocks(ray_session):
    b1 = _events([{"u": 1, "et": "signup", "ts": _ts(10)}])
    b2 = _events([{"u": 1, "et": "click", "ts": _ts(20)}])
    out = funnel_first_times(
        ray.data.from_arrow([b1, b2]), "u", "ts", "et", ["signup", "click"]
    ).take_all()
    assert out == [{"u": 1, "t_signup": 10 * _US, "t_click": 20 * _US}]


def test_cohort_partials_first_touch_and_offsets():
    t = _events(
        [
            # u=1: first event week 0, active weeks {0, 2}
            {"u": 1, "et": "view", "ts": _ts(100)},
            {"u": 1, "et": "view", "ts": _ts(200)},  # same week: distinct
            {"u": 1, "et": "view", "ts": _ts(2 * 7 * 86400 + 5)},
            # u=2: cohort week 1, active week 1 only
            {"u": 2, "et": "view", "ts": _ts(8 * 86400)},
        ]
    )
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_partials(t, "u", "ts").to_pylist()
    }
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_json_extract_int64_nulls_and_missing():
    import pyarrow as pa

    from encode_ingest_ray.stages.jsoncol import json_extract_int64

    t = pa.table({"props": ['{"k": 69}', '{"k": -2, "x": 1}', None, "{}"]})
    out = json_extract_int64(t, "props", "k", "k")
    assert out.column("k").to_pylist() == [69, -2, None, None]
    assert out.column("k").type == pa.int64()


def test_json_props_stats_runs(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    out = registry.QUERIES["json_props_stats"](sf_dir)
    assert out.count() == 5
    assert "json_props_stats" in registry.ORACLE


def test_rolling_active_users_matches_naive(ray_session, sf_dir):
    import duckdb

    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    out = registry.QUERIES["rolling_active_users"](sf_dir)
    got = {
        (r["day"], r["rolling7_users"]) for r in out.take_all()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = set(
        map(tuple, con.execute(registry.ORACLE["rolling_active_users"]).fetchall())
    )
    assert got == want
