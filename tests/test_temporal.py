"""Temporal operators: as-of join, interval/range join, lag gaps, CDC time
travel — each validated against a brute-force reference on randomized data
(seeded), including the tie cases the vectorized kernels must resolve
deterministically."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from encode_ingest_ray.stages.temporal import asof_join_bucketed, interval_count_join


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def _chunked(table: pa.Table, n: int = 4):
    """Driver-side dataset with multiple blocks (from_arrow of one table is
    ONE block = one task; CLAUDE.md)."""
    step = max(1, table.num_rows // n)
    parts = [table.slice(i, step) for i in range(0, table.num_rows, step)]
    return ray.data.from_arrow(parts)


def _brute_asof(left, right):
    """Reference: per left row, right row with same key maximizing
    (ts, tiebreak) with right.ts <= left.ts; None if no match."""
    out = []
    for lk, lts, lid in left:
        best = None
        for rk, rts, rtb, rv in right:
            if rk == lk and rts <= lts:
                cand = (rts, rtb)
                if best is None or cand > (best[0], best[1]):
                    best = (rts, rtb, rv)
        if best is not None:
            out.append((lid, best[1], best[2]))
    return sorted(out)


def test_asof_join_matches_brute_force_with_ties():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lk = rng.integers(0, 12, n_l)
    lts = rng.integers(0, 50, n_l)  # small range -> many ts collisions
    lid = np.arange(n_l)
    rk = rng.integers(0, 14, n_r)  # some keys absent from left and vice versa
    rts = rng.integers(0, 50, n_r)
    rtb = rng.permutation(n_r)  # unique tiebreak
    rv = rng.integers(0, 1000, n_r)
    left = pa.table(
        {"k": lk, "ts": lts.astype("int64"), "lid": lid.astype("int64")}
    )
    right = pa.table(
        {
            "rk": rk,
            "rts": rts.astype("int64"),
            "rtb": rtb.astype("int64"),
            "rv": rv.astype("int64"),
        }
    )
    out = _collect(
        asof_join_bucketed(
            _chunked(left),
            _chunked(right),
            key="k",
            right_key="rk",
            left_ts="ts",
            right_ts="rts",
            tiebreak="rtb",
            right_cols=["rtb", "rv"],
            num_buckets=5,
        )
    )
    got = sorted(
        zip(
            out.column("lid").to_pylist(),
            out.column("rtb").to_pylist(),
            out.column("rv").to_pylist(),
        )
    )
    want = _brute_asof(
        list(zip(lk.tolist(), lts.tolist(), lid.tolist())),
        list(zip(rk.tolist(), rts.tolist(), rtb.tolist(), rv.tolist())),
    )
    assert got == want
    # inner semantics: every matched left row appears exactly once
    assert len(got) == len({g[0] for g in got})


def test_asof_join_string_keys():
    rng = np.random.default_rng(19)
    n_l, n_r = 200, 150
    lk = [f"conv{int(i)}" for i in rng.integers(0, 9, n_l)]
    lts = rng.integers(0, 40, n_l)
    rk = [f"conv{int(i)}" for i in rng.integers(0, 11, n_r)]
    rts = rng.integers(0, 40, n_r)
    rtb = np.arange(n_r)
    left = pa.table({"k": lk, "ts": lts.astype("int64"),
                     "lid": np.arange(n_l, dtype="int64")})
    right = pa.table({"rk": rk, "rts": rts.astype("int64"),
                      "rtb": rtb.astype("int64"),
                      "rv": rng.integers(0, 100, n_r).astype("int64")})
    out = _collect(
        asof_join_bucketed(
            _chunked(left), _chunked(right),
            key="k", right_key="rk", left_ts="ts", right_ts="rts",
            tiebreak="rtb", right_cols=["rtb", "rv"], num_buckets=4,
        )
    )
    got = sorted(zip(out.column("lid").to_pylist(), out.column("rtb").to_pylist(),
                     out.column("rv").to_pylist()))
    want = _brute_asof(
        list(zip(lk, lts.tolist(), range(n_l))),
        list(zip(rk, rts.tolist(), rtb.tolist(),
                 right.column("rv").to_pylist())),
    )
    assert got == want


def test_asof_join_empty_sides():
    left = pa.table({"k": pa.array([], pa.int64()), "ts": pa.array([], pa.int64()),
                     "lid": pa.array([], pa.int64())})
    right = pa.table({"rk": [1], "rts": [5], "rtb": [0], "rv": [9]})
    out = _collect(
        asof_join_bucketed(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            key="k", right_key="rk", left_ts="ts", right_ts="rts",
            tiebreak="rtb", right_cols=["rv"], num_buckets=3,
        )
    )
    assert out.num_rows == 0


def test_interval_count_join_matches_brute_force():
    rng = np.random.default_rng(11)
    n_p, n_iv = 2000, 150
    pts = rng.integers(0, 100_000, n_p).astype("int64")
    starts = rng.integers(0, 100_000, n_iv).astype("int64")
    length = 7_321  # deliberately NOT the bin width
    points = pa.table({"ts": pts})
    ivs = pa.table({"iid": np.arange(n_iv, dtype="int64"), "start": starts})
    out = _collect(
        interval_count_join(
            _chunked(points),
            _chunked(ivs),
            point_ts="ts",
            iv_id="iid",
            iv_start="start",
            length_us=length,
            bin_us=2_000,  # interval spans ~4-5 bins -> exercises replication
            num_buckets=7,
        )
    )
    got = dict(
        zip(out.column("iid").to_pylist(), out.column("n_in_window").to_pylist())
    )
    want = {}
    for i, s in enumerate(starts.tolist()):
        c = int(((pts >= s) & (pts < s + length)).sum())
        if c:
            want[i] = c
    assert got == want


def test_interval_count_join_boundary_inclusion():
    # ts == start included; ts == start+length excluded; bin-boundary points
    points = pa.table({"ts": pa.array([10, 19, 20, 29, 30], pa.int64())})
    ivs = pa.table({"iid": pa.array([1], pa.int64()), "start": pa.array([10], pa.int64())})
    out = _collect(
        interval_count_join(
            ray.data.from_arrow(points), ray.data.from_arrow(ivs),
            point_ts="ts", iv_id="iid", iv_start="start",
            length_us=20, bin_us=10, num_buckets=3,
        )
    )
    assert out.column("n_in_window").to_pylist() == [4]  # 10,19,20,29 in [10,30)


def test_snapshot_diff_matches_brute_force():
    rng = np.random.default_rng(3)
    n = 500
    keys = [(f"c{i % 37}", i % 11) for i in range(n)]
    keys = sorted(set(keys))

    def mk(drop_frac, seed):
        r = np.random.default_rng(seed)
        rows = [
            (k, t, f"v{r.integers(0, 4)}", None if r.random() < 0.2 else f"x{r.integers(0, 3)}")
            for (k, t) in keys
            if r.random() > drop_frac
        ]
        return pa.table(
            {
                "k": [x[0] for x in rows],
                "t": pa.array([x[1] for x in rows], pa.int32()),
                "val": [x[2] for x in rows],
                "opt": [x[3] for x in rows],
            }
        )

    old, new = mk(0.15, 1), mk(0.15, 2)
    from encode_ingest_ray.stages.diff import snapshot_diff

    out = _collect(
        snapshot_diff(
            _chunked(old), _chunked(new),
            key_cols=["k", "t"], compare_cols=["val", "opt"], carry_cols=["val"],
            num_buckets=5,
        )
    )
    got = sorted(
        zip(
            out.column("k").to_pylist(),
            out.column("t").to_pylist(),
            out.column("change_type").to_pylist(),
            out.column("val").to_pylist(),
        )
    )
    om = {(r["k"], r["t"]): (r["val"], r["opt"]) for r in old.to_pylist()}
    nm = {(r["k"], r["t"]): (r["val"], r["opt"]) for r in new.to_pylist()}
    want = []
    for key in set(om) | set(nm):
        if key not in om:
            want.append((*key, "insert", nm[key][0]))
        elif key not in nm:
            want.append((*key, "delete", None))
        elif om[key] != nm[key]:
            want.append((*key, "update", nm[key][0]))
    assert got == sorted(want)


def test_snapshot_diff_rejects_duplicate_keys():
    import pytest

    from encode_ingest_ray.stages.diff import snapshot_diff

    old = pa.table({"k": ["a", "a"], "v": ["1", "2"]})
    new = pa.table({"k": ["a"], "v": ["1"]})
    with pytest.raises(Exception):
        _collect(
            snapshot_diff(
                ray.data.from_arrow(old), ray.data.from_arrow(new),
                key_cols=["k"], compare_cols=["v"], num_buckets=2,
            )
        )


def test_cdc_time_travel_snapshot_equals_prefix_replay(tmp_path, sf_dir):
    """final_dataset(epoch=0) after a 3-epoch run must equal the final state
    of an engine that only ever saw epoch 0's files — per-turn text equality
    under stable turn ordering (the north-rule invariant), historically."""
    import os

    from encode_ingest_ray.pipelines.cdc import CdcEngine
    from encode_ingest_ray.pipelines.cdc_queries import _write_epoch_fixtures

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    _write_epoch_fixtures(sf_dir, events_dir, n_epochs=3)

    full = CdcEngine(str(tmp_path / "full"), num_partitions=4, num_actors=2)
    full.run(events_dir)

    prefix_dir = str(tmp_path / "events0")
    os.makedirs(prefix_dir)
    for f in os.listdir(events_dir):
        if f.startswith("events-epoch-000000"):
            os.link(os.path.join(events_dir, f), os.path.join(prefix_dir, f))
    prefix = CdcEngine(str(tmp_path / "pfx"), num_partitions=4, num_actors=2)
    prefix.run(prefix_dir)

    def _sorted(ds):
        t = _collect(ds).combine_chunks()
        return t.take(
            pc.sort_indices(
                t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )

    snap = _sorted(full.final_dataset(epoch=0))
    want = _sorted(prefix.final_dataset())
    assert snap.column_names == want.column_names
    assert snap.equals(want)
    # and the latest view differs (later epochs really applied)
    assert not _sorted(full.final_dataset()).equals(want)


def test_scd2_current_slice_equals_live_table(ray_session):
    """The SCD2 history's is_current rows, minus keys whose LAST version in
    (ts, lsn) order is a delete, must equal the LWW live table — both views
    resolve versions by the same order, so disagreement means the history
    intervals are wrong."""
    import pandas as pd

    from encode_ingest_ray.pipelines.cdc_queries import (
        cdc_scd2_history,
        cdc_upsert,
    )

    sf = "/root/testdata/sf0.001"
    hist = cdc_scd2_history(sf).to_pandas()
    live = cdc_upsert(sf).to_pandas()

    cur = hist[hist["is_current"]][["conv_id", "turn_idx", "text"]]
    # keys live in the upsert view (delete-last keys are tombstoned there and
    # have NO current history row: their last non-delete version is closed)
    live_k = live[["conv_id", "turn_idx", "text"]]
    l = cur.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    r = live_k.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(l, r)

    # every closed interval ends where a successor (or tombstone) begins
    closed = hist[~hist["is_current"]]
    assert (closed["valid_to_lsn"] > closed["valid_from_lsn"]).all()


def test_autocorr_partials_match_pandas_brute_force(ray_session, sf_dir):
    """Lag-1 autocorrelation moment partials must equal a per-user pandas
    shift() reduction over the same (ts, event_id) order and the same
    milli-integer value encoding — covering the same-user mask, the
    reduceat segment sums, and the pair count."""
    import pandas as pd

    from encode_ingest_ray.pipelines.temporal import autocorr_user_value

    got = (
        autocorr_user_value(sf_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    df = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    df["v"] = (
        np.sign(df["value"]) * np.floor(np.abs(df["value"]) * 1000 + 0.5)
    ).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    df["x"] = df.groupby("user_id")["v"].shift(1)
    p = df.dropna(subset=["x"]).copy()
    p["x"] = p["x"].astype(np.int64)
    want = (
        p.groupby("user_id")
        .apply(
            lambda g: pd.Series(
                {
                    "n_pairs": len(g),
                    "s_x": g["x"].sum(),
                    "s_y": g["v"].sum(),
                    "s_xx": (g["x"] ** 2).sum(),
                    "s_yy": (g["v"] ** 2).sum(),
                    "s_xy": (g["x"] * g["v"]).sum(),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in ["n_pairs", "s_x", "s_y", "s_xx", "s_yy", "s_xy"]:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_ewma_matches_pandas_brute_force(ray_session, sf_dir):
    """Truncated geometric window: numerator/weight-sum per event must equal
    an 8-term pandas shift() reduction over the same order and encoding."""
    import pandas as pd

    from encode_ingest_ray.pipelines.temporal import ewma_user_value

    got = (
        ewma_user_value(sf_dir)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    df = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    df["v"] = (
        np.sign(df["value"]) * np.floor(np.abs(df["value"]) * 1000 + 0.5)
    ).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    num = np.zeros(len(df), np.int64)
    ws = np.zeros(len(df), np.int64)
    g = df.groupby("user_id")["v"]
    for j in range(8):
        w = 1 << (7 - j)
        s = g.shift(j)
        num += (s.fillna(0).astype(np.int64) * w).to_numpy()
        ws += np.where(s.notna().to_numpy(), w, 0)
    df["smooth_num"], df["weight_sum"] = num, ws
    want = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert (got["smooth_num"].to_numpy() == want["smooth_num"].to_numpy()).all()
    assert (got["weight_sum"].to_numpy() == want["weight_sum"].to_numpy()).all()
