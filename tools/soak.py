"""10^8-event soak: the north rule's sustained shape, single node.

Phases (each engine phase runs in a FRESH subprocess = a real process
boundary, so kills are kill -9 and resume is genuine crash recovery):

  gen      seeded 100M-event / 128-epoch / 32-key-shard corpus (~3 GB)
  single   uninterrupted engine run -> /dev/shm table (reference state)
  killed   same input, kill -9 mid-run, resume to completion, then a
           replay run that must be a no-op (epochs_run == 0)
  sharded  4 independent engine processes over disjoint salted key
           ranges; ONE shard is kill -9'd mid-run and respawned
  compare  (a) single vs killed: partition-wise EXACT table equality
           (same partitioning identity -> same partition contents);
           (b) single vs sharded union: per-conversation fingerprint
           table equality (shards partition independently, so the
           comparison key is the logical one)
  oracle   DuckDB LWW fold over all 128 epochs of raw events ->
           global fingerprint equality with the engine's live table
  all      run everything in order and print the soak report

Fingerprints are exact integer vectors (counts + modular sums mirrored
between pyarrow kernels and DuckDB HUGEINT arithmetic) — overflow-free
and order-independent, so no phase ever materializes a 10^8-row table
in one process.

Usage: python tools/soak.py all  [--events N] [--epochs K]
State lives under /dev/shm/soak (tables) and /tmp/soak (events).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVENTS_BASE = "/tmp/soak"
STATE_BASE = "/dev/shm/soak" if os.path.isdir("/dev/shm") else "/tmp/soak-state"
MOD = 1_000_003  # fingerprint modulus (fits every sum far below 2^63)


def events_dir(n: int, epochs: int) -> str:
    return os.path.join(EVENTS_BASE, f"events-n{n}-e{epochs}-s99-ks32")


def gen(n: int, epochs: int) -> dict:
    d = events_dir(n, epochs)
    marker = os.path.join(d, "_complete.json")
    if os.path.exists(marker):
        return json.load(open(marker))
    from encode_ingest_ray.functions.generator import generate_cdc_events

    os.makedirs(d, exist_ok=True)
    t0 = time.perf_counter()
    meta = generate_cdc_events(
        d, n_events=n, n_convs=max(1000, n // 2000), epochs=epochs,
        seed=99, dup_ratio=0.05, evolve_at_lsn=int(n * 0.7), key_shards=32,
    )
    meta["gen_wall_s"] = round(time.perf_counter() - t0, 1)
    with open(marker, "w") as f:
        json.dump(meta, f)
    return meta


def _run_cmd(ev: str, out: str, cpus: int = 32, shard: tuple | None = None):
    cmd = [
        sys.executable, "-m", "encode_ingest_ray", "--num-cpus", str(cpus),
        "run", "--events", ev, "--out", out,
        "--object-store-gb", "20" if shard is None else "6",
    ]
    if shard is not None:
        cmd += ["--shard-index", str(shard[0]), "--shard-count", str(shard[1])]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = REPO
    return cmd, env


def _summary(proc_out: str) -> dict:
    return json.loads(proc_out.strip().splitlines()[-1])


def single(ev: str) -> dict:
    out = os.path.join(STATE_BASE, "single")
    cmd, env = _run_cmd(ev, out)
    t0 = time.perf_counter()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    s = _summary(r.stdout)
    s["phase_wall_s"] = round(time.perf_counter() - t0, 1)
    s["state_bytes"] = _du(out)
    return s


def killed(ev: str, kill_after_s: float) -> dict:
    out = os.path.join(STATE_BASE, "killed")
    cmd, env = _run_cmd(ev, out)
    p = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    time.sleep(kill_after_s)
    try:
        os.kill(p.pid, signal.SIGKILL)  # the real thing: no atexit, no cleanup
    except ProcessLookupError:
        pass
    p.wait()
    committed_at_kill = _committed(out)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    resume = _summary(r.stdout)
    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    replay = _summary(r2.stdout)
    assert replay["epochs_run"] == 0, f"replay not a no-op: {replay}"
    return {
        "killed_after_s": kill_after_s,
        "epochs_committed_at_kill": committed_at_kill,
        "resume": resume,
        "replay_noop": True,
        "state_bytes": _du(out),
    }


def sharded(ev: str, kill_after_s: float, shards: int = 4) -> dict:
    procs = []
    for k in range(shards):
        out = os.path.join(STATE_BASE, "sharded", f"shard-{k:02d}-of-{shards:02d}")
        cmd, env = _run_cmd(ev, out, cpus=8, shard=(k, shards))
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    time.sleep(kill_after_s)
    victim = shards // 2
    try:
        os.kill(procs[victim].pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    results = {}
    for k, p in enumerate(procs):
        out_, err = p.communicate()
        if k == victim:
            continue
        if p.returncode != 0:
            raise RuntimeError(f"shard {k}: {err[-2000:]}")
        results[k] = _summary(out_)
    # respawn the victim: real per-node crash recovery
    vout = os.path.join(STATE_BASE, "sharded", f"shard-{victim:02d}-of-{shards:02d}")
    committed_at_kill = _committed(vout)
    cmd, env = _run_cmd(ev, vout, cpus=8, shard=(victim, shards))
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    results[victim] = _summary(r.stdout)
    return {
        "victim": victim,
        "victim_epochs_committed_at_kill": committed_at_kill,
        "per_shard": {k: {x: results[k][x] for x in
                          ("epochs_run", "events_raw", "wall_s")}
                      for k in sorted(results)},
        "state_bytes": _du(os.path.join(STATE_BASE, "sharded")),
    }


def _committed(out: str) -> int:
    from encode_ingest_ray.state.manifest import Manifest

    eps = Manifest(out).committed_epochs()
    return len(eps)


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


# -- fingerprints (fresh-Ray subprocess phases) -----------------------------
def _init_ray(cpus: int = 32):
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")


def _fp_tables(ds):
    """(global fingerprint vector, per-conv fingerprint table) of a live
    Dataset — exact integers, order-independent, overflow-free."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def per_block(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64())
        g = pa.table({
            "conv_id": t.column("conv_id"),
            "n": pa.array([1] * t.num_rows, pa.int64()),
            "turn_m": pc.cast(t.column("turn_idx"), pa.int64()),
            "ts_m": pc.subtract(ts, pc.multiply(pc.divide(ts, MOD), MOD)),
            "len_m": pc.cast(pc.binary_length(
                pc.cast(pc.fill_null(t.column("text"), ""), pa.binary())
            ), pa.int64()),
        }).group_by(["conv_id"]).aggregate(
            [("n", "sum"), ("turn_m", "sum"),
             ("ts_m", "sum"), ("len_m", "sum")]
        )
        return g.rename_columns(["conv_id", "n", "turn_m", "ts_m", "len_m"])

    parts = ds.map_batches(per_block, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    merged = pa.concat_tables(tabs).group_by(["conv_id"]).aggregate(
        [("n", "sum"), ("turn_m", "sum"),
         ("ts_m", "sum"), ("len_m", "sum")]
    ).rename_columns(["conv_id", "n", "turn_m", "ts_m", "len_m"])
    merged = merged.sort_by([("conv_id", "ascending")])
    glob_fp = {
        c: int(pc.sum(merged.column(c)).as_py() or 0)
        for c in ("n", "turn_m", "ts_m", "len_m")
    }
    glob_fp["n_convs"] = merged.num_rows
    return glob_fp, merged


def compare(n: int, epochs: int) -> dict:
    """single vs killed: partition-wise EXACT; single vs sharded: per-conv
    fingerprint table EXACT."""
    import pyarrow as pa
    import ray

    _init_ray()
    from encode_ingest_ray.pipelines.cdc import CdcEngine
    from encode_ingest_ray.pipelines.sharded import sharded_final_dataset

    single_dir = os.path.join(STATE_BASE, "single")
    killed_dir = os.path.join(STATE_BASE, "killed")
    e_single = CdcEngine(single_dir)
    e_killed = CdcEngine(killed_dir)
    ps, pk = e_single.partition_files(), e_killed.partition_files()
    assert set(ps) == set(pk), "partition sets differ"
    items = [
        {"a_base": ps[p]["base"] or "", "a_deltas": ps[p]["deltas"],
         "b_base": pk[p]["base"] or "", "b_deltas": pk[p]["deltas"]}
        for p in sorted(ps)
    ]

    def eq(batch: pa.Table) -> pa.Table:
        from encode_ingest_ray.state.lww import live_view
        from encode_ingest_ray.state.merger import load_partition_state

        ok, rows = True, 0
        for row in batch.to_pylist():
            a = load_partition_state(
                {"base": row["a_base"] or None, "deltas": list(row["a_deltas"])})
            b = load_partition_state(
                {"base": row["b_base"] or None, "deltas": list(row["b_deltas"])})
            if a is None or b is None:
                ok = ok and (a is None and b is None)
                continue
            la = live_view(a).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")])
            lb = live_view(b).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")])
            ok = ok and la.select(sorted(la.column_names)).equals(
                lb.select(sorted(lb.column_names)))
            rows += la.num_rows
        return pa.table({"ok": pa.array([ok]), "rows": pa.array([rows])})

    res = ray.data.from_items(items).map_batches(
        eq, batch_size=1, batch_format="pyarrow").take_all()
    part_ok = all(r["ok"] for r in res)
    live_rows = sum(r["rows"] for r in res)

    fp_single, conv_single = _fp_tables(e_single.final_dataset())
    fp_shard, conv_shard = _fp_tables(
        sharded_final_dataset(os.path.join(STATE_BASE, "sharded")))
    shard_ok = conv_single.equals(conv_shard)
    out = {
        "single_vs_killed_partitionwise_exact": bool(part_ok),
        "live_rows": live_rows,
        "single_vs_sharded_perconv_fp_exact": bool(shard_ok),
        "global_fp": fp_single,
        "sharded_global_fp": fp_shard,
    }
    import ray as _r
    _r.shutdown()
    return out


def oracle(n: int, epochs: int) -> dict:
    """DuckDB LWW fold over ALL raw epochs -> global fingerprint; must
    equal the engine's (compare phase prints the engine side)."""
    import duckdb

    ev = events_dir(n, epochs)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(32, os.cpu_count() or 8)}")
    q = f"""
WITH ev AS (
  SELECT conv_id, turn_idx, ts, op, lsn, text
  FROM parquet_scan('{ev}/events-epoch-*.parquet', union_by_name=true)
),
dedup AS (SELECT DISTINCT ON (lsn) * FROM ev ORDER BY lsn),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM dedup
),
live AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'delete')
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(SUM(CAST(turn_idx AS BIGINT)) AS BIGINT) AS turn_m,
       CAST(SUM(epoch_us(ts) % {MOD}) AS BIGINT) AS ts_m,
       CAST(SUM(octet_length(CAST(COALESCE(text,'') AS BLOB))) AS BIGINT)
         AS len_m
FROM live
"""
    row = con.execute(q).fetchone()
    cols = ["n", "n_convs", "turn_m", "ts_m", "len_m"]
    return dict(zip(cols, [int(x) for x in row]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["gen", "single", "killed", "sharded",
                                      "compare", "oracle", "all"])
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--epochs", type=int, default=128)
    ap.add_argument("--kill-after-s", type=float, default=None)
    args = ap.parse_args()
    n, epochs = args.events, args.epochs
    ev = events_dir(n, epochs)

    if args.phase == "gen":
        print(json.dumps(gen(n, epochs)))
        return
    if args.phase == "single":
        print(json.dumps(single(ev)))
        return
    if args.phase == "killed":
        print(json.dumps(killed(ev, args.kill_after_s or 30.0)))
        return
    if args.phase == "sharded":
        print(json.dumps(sharded(ev, args.kill_after_s or 20.0)))
        return
    if args.phase == "compare":
        print(json.dumps(compare(n, epochs)))
        return
    if args.phase == "oracle":
        print(json.dumps(oracle(n, epochs)))
        return

    report: dict = {"events": n, "epochs": epochs}
    report["gen"] = gen(n, epochs)
    t0 = time.perf_counter()
    report["single"] = single(ev)
    half = max(10.0, report["single"]["wall_s"] * 0.45)
    report["killed"] = killed(ev, args.kill_after_s or half)
    report["sharded"] = sharded(ev, (args.kill_after_s or half) / 2)
    # compare + oracle in fresh subprocesses (their own Ray / DuckDB)
    for ph in ("compare", "oracle"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), ph,
             "--events", str(n), "--epochs", str(epochs)],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        if r.returncode != 0:
            raise RuntimeError(f"{ph}: {r.stderr[-3000:]}")
        report[ph] = json.loads(r.stdout.strip().splitlines()[-1])
    report["oracle_matches_engine"] = (
        report["oracle"] == report["compare"]["global_fp"]
    )
    report["soak_wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
