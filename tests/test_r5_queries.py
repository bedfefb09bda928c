"""Round-5 query-family tests: CEP regex matching, CUSUM alarm summary,
TPC-H Q18, and histogram split finding — each checked against an
independent brute-force recomputation (the DuckDB oracles are checked by
tools/check_oracles.py; these prove the SEMANTICS against naive Python)."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow.parquet as pq


def _events(sf_dir):
    return pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()


def test_event_regex_match_vs_python_re(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = (
        registry.QUERIES["event_regex_match"](sf_dir)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = _events(sf_dir)
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    pat = re.compile(r"s[cev]*p")
    for uid, grp in ev.groupby("user_id"):
        seq = "".join(t[0] for t in grp["event_type"])
        assert got.loc[uid, "seq"] == seq
        assert got.loc[uid, "seq_len"] == len(seq)
        assert got.loc[uid, "n_matches"] == len(pat.findall(seq))
    assert len(got) == ev["user_id"].nunique()


def test_cusum_drift_user_vs_recursive_loop(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = (
        registry.QUERIES["cusum_drift_user"](sf_dir)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = _events(sf_dir)
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["v"] = np.round(ev["value"] * 1000).astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    K, H = 245_000, 1_000_000
    for uid, grp in ev.groupby("user_id"):
        s, mx, over = 0, 0, 0
        for v in grp["v"]:
            s = max(0, s + (int(v) - K))
            mx = max(mx, s)
            over += s > H
        assert got.loc[uid, "max_cusum"] == mx
        assert got.loc[uid, "n_over"] == over
        assert got.loc[uid, "n"] == len(grp)


def test_q18_heavy_orders_semantics(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = registry.QUERIES["q18_large_volume"](sf_dir).to_pandas()
    line = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).to_pandas()
    line["q"] = np.round(line["l_quantity"]).astype("int64")
    sums = line.groupby("l_orderkey")["q"].sum()
    heavy = set(sums[sums > 250].index)
    assert len(got) == len(heavy) > 0
    assert set(got["o_orderkey"]) == heavy
    assert (got["sum_qty"] > 250).all()
    assert got["c_name"].notna().all()


def test_best_split_orders_vs_bruteforce(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = (
        registry.QUERIES["best_split_orders"](sf_dir)
        .to_pandas()
        .set_index("split_bucket")
        .sort_index()
    )
    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_totalprice", "o_orderstatus"],
    ).to_pandas()
    cents = np.round(orders["o_totalprice"] * 100).astype("int64")
    bucket = cents // 2_500_000
    y = (orders["o_orderstatus"] == "F").astype("int64")
    buckets = np.sort(bucket.unique())
    total_n, total_p = len(orders), int(y.sum())
    for b in buckets:
        nl = int((bucket <= b).sum())
        pl = int(y[bucket <= b].sum())
        nr, pr = total_n - nl, total_p - pl
        if nl == 0 or nr == 0:
            assert b not in got.index
            continue
        assert got.loc[b, "n_left"] == nl and got.loc[b, "pos_left"] == pl
        assert got.loc[b, "n_right"] == nr and got.loc[b, "pos_right"] == pr
        score = (pl * pl + (nl - pl) * (nl - pl)) / nl + (
            pr * pr + (nr - pr) * (nr - pr)
        ) / nr
        assert got.loc[b, "score_micro"] == int(np.floor(1e6 * score))


def test_mutual_info_terms_vs_bruteforce(ray_session, sf_dir):
    import math

    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = (
        registry.QUERIES["mutual_info_event_dow"](sf_dir)
        .to_pandas()
        .set_index(["event_type", "dow"])
        .sort_index()
    )
    ev = _events(sf_dir)
    dow = (ev["ts"].astype("int64") // 86400000000) % 7
    cells = (
        ev.assign(dow=dow).groupby(["event_type", "dow"]).size().rename("n")
    )
    n = int(cells.sum())
    nx = cells.groupby("event_type").sum()
    ny = cells.groupby("dow").sum()
    assert len(got) == len(cells)
    for (e, d), c in cells.items():
        row = got.loc[(e, d)]
        assert row["n_xy"] == c
        assert row["n_x"] == nx[e] and row["n_y"] == ny[d]
        term = int(
            math.floor(
                1e6 * (float(c) * math.log(float(c) * n / (float(nx[e]) * ny[d])) / n)
                + 0.5
            )
        )
        assert row["term_micro"] == term
    # MI estimate itself must be >= 0 up to per-cell rounding slack
    assert got["term_micro"].sum() >= -len(got)


def test_incremental_join_mv_vs_bruteforce(ray_session, sf_dir):
    """The delta-join maintenance result must equal a naive full join of
    the two derived live views (B tombstones excluded, empty-A convs
    excluded)."""
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = (
        registry.QUERIES["cdc_incremental_join_mv"](sf_dir)
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    ev = _events(sf_dir)
    # derive stream A (transcripts)
    a = ev.copy()
    a["conv_id"] = "u" + a["user_id"].astype(str)
    a["turn_idx"] = a["event_id"] % 40
    a["text"] = a["event_type"] + ":" + a["props"]
    a["op"] = np.where(
        a["event_type"] == "error", "delete",
        np.where(a["event_type"] == "purchase", "update", "insert"),
    )
    a["lsn"] = a["event_id"]
    a = a.sort_values(["ts", "lsn"]).groupby(["conv_id", "turn_idx"]).last()
    live_a = a[a["op"] != "delete"]
    agg_a = live_a.groupby("conv_id").agg(
        n_turns=("lsn", "size"), text_chars=("text", lambda s: s.str.len().sum())
    )
    # derive stream B (labels)
    b = ev.copy()
    b["conv_id"] = "u" + b["user_id"].astype(str)
    b["label"] = b["event_id"].mod(4).map(
        {0: "bronze", 1: "silver", 2: "gold", 3: "basic"}
    )
    b["op"] = np.where(b["event_type"] == "signup", "delete", "update")
    b["lsn"] = b["event_id"]
    b = b.sort_values(["ts", "lsn"]).groupby("conv_id").last()
    live_b = b[b["op"] != "delete"][["label"]]
    joined = agg_a.join(live_b, how="inner")
    want = joined.groupby("label").agg(
        n_turns=("n_turns", "sum"), text_chars=("text_chars", "sum"),
        n_convs=("n_turns", "size"),
    ).sort_index()
    assert list(got.index) == list(want.index)
    for col in ("n_turns", "text_chars", "n_convs"):
        assert (got[col] == want[col]).all(), col


def test_eventually_follows_vs_bruteforce(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = (
        registry.QUERIES["eventually_follows_matrix"](sf_dir)
        .to_pandas()
        .set_index(["x", "y"])["n_users"]
        .sort_index()
    )
    ev = _events(sf_dir)
    ev["t"] = ev["ts"].astype("int64")
    firsts = {}
    for (u, e), grp in ev.groupby(["user_id", "event_type"]):
        tmin = grp["t"].min()
        firsts[(u, e)] = (tmin, grp.loc[grp["t"] == tmin, "event_id"].min())
    import collections

    want = collections.Counter()
    users = ev["user_id"].unique()
    types = sorted(ev["event_type"].unique())
    for u in users:
        for x in types:
            for y in types:
                if x == y or (u, x) not in firsts or (u, y) not in firsts:
                    continue
                if firsts[(u, x)] < firsts[(u, y)]:
                    want[(x, y)] += 1
    assert dict(got) == dict(want)


def test_association_rules_integer_identities(ray_session, sf_dir):
    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    got = registry.QUERIES["association_rules_parts"](sf_dir).to_pandas()
    assert len(got) == 100  # both directions of the top-50 pairs
    # integer identities hold row-by-row
    assert (got["conf_micro"] == (1000000 * got["n_pair"]) // got["n_ante"]).all()
    assert (got["n_pair"] <= got[["n_ante", "n_cons"]].min(axis=1)).all()
    # each unordered pair appears exactly twice (a->b and b->a)
    key = got.apply(lambda r: tuple(sorted((r["antecedent"], r["consequent"]))), axis=1)
    assert (key.value_counts() == 2).all()
