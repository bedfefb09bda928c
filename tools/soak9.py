"""10^9-event soak: one more decade past tools/soak.py (VERDICT r4 item 3).

A single long-lived table ingests a 10^9-event / 640-epoch corpus through
every operational event a production CDC table sees, then its final state
is proven exact three independent ways.

Corpus (gen phase): ten 10^8-event SEGMENTS drawn by parallel fresh
subprocesses via the generator's segment offsets (lsn_offset /
conv_offset / epoch_offset — functions/generator.py): disjoint LSN
decades, dense consecutive epoch ranges, 50%-overlapping conversation
ranges (old conversations keep receiving updates while new ones appear,
so compaction keeps touching cold partitions).  Schema evolution fires at
the absolute LSN 0.7e9 (mid-segment 7).  A single-process draw at 10^9
would need ~90 GB of driver numpy — the segment composition is the only
way to build the corpus on this box, and it is also the honest shape:
real binlog decades arrive over time, not from one RNG call.

Chaos run: segments gate through the `.done`-marker completeness protocol
(markers held back, released one segment per phase), each phase a FRESH
engine process (`python -m encode_ingest_ray run`):

  phase 2   kill -9 mid-phase, then resume (crash recovery at depth)
  after 3   `migrate --force` — the mid-run OPTIMIZE/compaction
  phase 6   ingested on a WAP BRANCH (branch create → branch engine
            consumes the segment — with its own kill -9 + resume →
            publish fast-forwards main) — branch publish under load
  after 6   `migrate --force` again (rewrites branch-referenced files
            into main's part dirs, the publish→optimize→drop workflow)
  after 9   drop the branch (retention epochs have passed)

Disk budget: the engine's own compact_every=8 + vacuum_retain=2 cadence
bounds table state at live-size + recent deltas (~3 GB on /dev/shm) for
the whole run; raw events are ~30 GB zstd on /tmp; Ray spill is wiped
between phases.  State bytes are sampled after every phase — the report
carries the full size-over-time series.

Proofs:
  clean     an uninterrupted single-process reference run over all 640
            epochs into a second table
  compare   (a) chaos vs clean: partition-wise EXACT live-table equality
            (same partitioning identity → same partition contents);
            (b) per-conversation fingerprint table (exact integer vector)
            written to parquet for the oracle phase
  oracle    DuckDB folds ALL raw epochs in ONE streaming aggregation —
            arg_max over the HUGEINT composite (ts·2^32 + lsn), the LWW
            order — into the same per-conv fingerprint table; EXCEPT in
            both directions must be empty.  (The 10^8 soak's window-rank
            oracle would materialize 400 GB of decoded text at this
            scale; arg_max over pre-projected integers never holds more
            than the group table.)  Verbatim duplicate replays need no
            DISTINCT: equal composite keys carry equal values, so arg_max
            is replay-invariant.

Usage: python tools/soak9.py all [--events 1000000000] [--segments 10]
       [--epochs-per-segment 64] [--gen-procs 3]
Events under /tmp/soak9, tables under /dev/shm/soak9.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak import MOD, _du, _fp_tables, _summary  # noqa: E402

EVENTS_BASE = "/tmp/soak9"
STATE_BASE = "/dev/shm/soak9" if os.path.isdir("/dev/shm") else "/tmp/soak9-state"
BRANCH = "soak-wap"


def _phase_plan(segments: int) -> tuple[int, int, int]:
    """(kill phase, migrate-after phase, branch phase) scaled to the
    segment count so a small-scale validation run (--segments 3) still
    exercises every operational event; at the default 10 segments this is
    (2, 3, 6)."""
    kill = min(2, segments - 1)
    mig = min(3, segments - 1)
    branch = max(mig + 1, segments * 6 // 10) if segments >= 3 else segments - 1
    # keep >=1 phase after the branch so retention epochs pass before drop
    return kill, mig, min(branch, max(1, segments - 2))


def events_dir(n: int, segments: int, eps: int) -> str:
    return os.path.join(EVENTS_BASE, f"events-n{n}-seg{segments}-e{eps}")


def _env() -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = REPO
    return env


# -- gen ---------------------------------------------------------------------
def gen(n: int, segments: int, eps: int, procs: int) -> dict:
    d = events_dir(n, segments, eps)
    marker = os.path.join(d, "_complete.json")
    if os.path.exists(marker):
        return json.load(open(marker))
    os.makedirs(d, exist_ok=True)
    seg_events = n // segments
    n_convs = max(1000, seg_events // 2000)
    conv_step = n_convs // 2          # 50% conv overlap between segments
    evolve = int(n * 0.7)
    t0 = time.perf_counter()

    def seg_cmd(s: int) -> list[str]:
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from encode_ingest_ray.functions.generator import generate_cdc_events\n"
            "import json\n"
            "m = generate_cdc_events(%r, n_events=%d, n_convs=%d, epochs=%d,\n"
            "    seed=%d, dup_ratio=0.05, evolve_at_lsn=%d, key_shards=32,\n"
            "    lsn_offset=%d, conv_offset=%d, epoch_offset=%d)\n"
            "print(json.dumps({'files': len(m['files'])}))\n"
        ) % (REPO, d, seg_events, n_convs, eps, 99 + s, evolve,
             s * seg_events, s * conv_step, s * eps)
        return [sys.executable, "-c", code]

    done_marker = lambda s: os.path.join(d, f"_seg{s:02d}.json")  # noqa: E731
    pending = [s for s in range(segments) if not os.path.exists(done_marker(s))]
    running: dict[int, subprocess.Popen] = {}
    while pending or running:
        while pending and len(running) < procs:
            s = pending.pop(0)
            running[s] = subprocess.Popen(
                seg_cmd(s), env=_env(), stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True)
        time.sleep(2)
        for s, p in list(running.items()):
            if p.poll() is None:
                continue
            out, err = p.communicate()
            del running[s]
            if p.returncode != 0:
                raise RuntimeError(f"segment {s}: {err[-3000:]}")
            # hold this segment's markers back until its chaos phase
            lo, hi = s * eps, (s + 1) * eps
            for e in range(lo, hi):
                dm = os.path.join(d, f"events-epoch-{e:06d}.done")
                if os.path.exists(dm):
                    os.rename(dm, dm + ".hold")
            with open(done_marker(s), "w") as f:
                json.dump({"segment": s, "ok": True}, f)
    meta = {
        "n_events": n, "segments": segments, "epochs_per_segment": eps,
        "n_convs_per_segment": n_convs, "conv_step": conv_step,
        "evolve_at_lsn": evolve, "gen_procs": procs,
        "gen_wall_s": round(time.perf_counter() - t0, 1),
        "events_bytes": _du(d),
    }
    with open(marker, "w") as f:
        json.dump(meta, f)
    return meta


def release_segment(d: str, s: int, eps: int) -> None:
    for e in range(s * eps, (s + 1) * eps):
        h = os.path.join(d, f"events-epoch-{e:06d}.done.hold")
        if os.path.exists(h):
            os.rename(h, h[: -len(".hold")])


def release_all(d: str) -> None:
    for h in glob.glob(os.path.join(d, "events-epoch-*.done.hold")):
        os.rename(h, h[: -len(".hold")])


def _wipe_ray_spill() -> None:
    for p in glob.glob("/tmp/ray/session_*"):
        shutil.rmtree(p, ignore_errors=True)


# -- engine process drivers --------------------------------------------------
def _run_proc(ev: str, out: str) -> list[str]:
    return [sys.executable, "-m", "encode_ingest_ray", "run",
            "--events", ev, "--out", out, "--object-store-gb", "20"]


def _run(ev: str, out: str) -> dict:
    r = subprocess.run(_run_proc(ev, out), env=_env(),
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    return _summary(r.stdout)


def _run_with_kill(ev: str, out: str, kill_after_s: float) -> dict:
    p = subprocess.Popen(_run_proc(ev, out), env=_env(),
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(kill_after_s)
    try:
        os.kill(p.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    p.wait()
    _wipe_ray_spill()
    resume = _run(ev, out)
    resume["killed_after_s"] = kill_after_s
    return resume


def _cli(args: list[str]) -> str:
    r = subprocess.run([sys.executable, "-m", "encode_ingest_ray"] + args,
                       env=_env(), capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"{args}: {r.stderr[-3000:]}")
    return r.stdout


def chaos(n: int, segments: int, eps: int) -> dict:
    d = events_dir(n, segments, eps)
    out = os.path.join(STATE_BASE, "chaos")
    # re-hold every marker so a rerun (e.g. after a later-phase crash)
    # gates segments phase-by-phase again instead of ingesting everything
    # in phase 0
    for dm in glob.glob(os.path.join(d, "events-epoch-*.done")):
        os.rename(dm, dm + ".hold")
    KILL_PHASE, MIGRATE_AFTER, BRANCH_PHASE = _phase_plan(segments)
    phases: list[dict] = []
    ops: list[dict] = []
    engine_wall = 0.0
    events_applied = 0
    est_phase_s = None
    for s in range(segments):
        release_segment(d, s, eps)
        t0 = time.perf_counter()
        if s == BRANCH_PHASE:
            _cli(["branch", "--out", out, "--create", BRANCH])
            broot = os.path.join(out, "_branches", BRANCH)
            kill_at = max(8.0, 0.4 * (est_phase_s or 30.0))
            summ = _run_with_kill(d, broot, kill_at)
            _cli(["branch", "--out", out, "--publish", BRANCH])
            note = f"WAP branch: create -> ingest (kill -9 @{kill_at:.0f}s + resume) -> publish"
        elif s == KILL_PHASE:
            kill_at = max(8.0, 0.4 * (est_phase_s or 30.0))
            summ = _run_with_kill(d, out, kill_at)
            note = f"kill -9 @{kill_at:.0f}s + resume"
        else:
            summ = _run(d, out)
            note = ""
        wall = time.perf_counter() - t0
        est_phase_s = est_phase_s or wall
        engine_wall += wall
        events_applied += summ.get("events_raw", 0)
        phases.append({
            "phase": s, "note": note,
            "epochs_run": summ.get("epochs_run"),
            "events_raw": summ.get("events_raw"),
            "engine_wall_s": summ.get("wall_s"),
            "phase_wall_s": round(wall, 1),
            "events_per_s": (round(summ["events_raw"] / summ["wall_s"])
                             if summ.get("wall_s") else None),
            "state_bytes": _du(out),
        })
        _wipe_ray_spill()
        if s == MIGRATE_AFTER or s == BRANCH_PHASE:
            t1 = time.perf_counter()
            _cli(["migrate", "--out", out, "--force"])
            ops.append({"op": "migrate --force", "after_phase": s,
                        "wall_s": round(time.perf_counter() - t1, 1),
                        "state_bytes": _du(out)})
            _wipe_ray_spill()
    if BRANCH_PHASE < segments - 1:
        # publish -> migrate --force -> retention epochs -> drop: by now
        # no retained main record references files under the branch dir
        t1 = time.perf_counter()
        _cli(["branch", "--out", out, "--drop", BRANCH])
        ops.append({"op": "drop branch", "after_phase": segments - 1,
                    "wall_s": round(time.perf_counter() - t1, 1),
                    "state_bytes": _du(out)})
    # authoritative raw-event total from parquet footers (kill-9 phases'
    # pre-kill work is invisible to the resume summaries)
    import pyarrow.parquet as pq

    events_total = sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in glob.glob(os.path.join(d, "events-epoch-*.parquet"))
    )
    return {
        "phases": phases, "ops": ops,
        "events_raw_total": events_total,
        "events_raw_from_resumes": events_applied,
        "engine_wall_s": round(engine_wall, 1),
        "sustained_events_per_s": round(events_total / engine_wall),
        "final_state_bytes": _du(out),
    }


def clean(n: int, segments: int, eps: int) -> dict:
    d = events_dir(n, segments, eps)
    release_all(d)
    out = os.path.join(STATE_BASE, "clean")
    t0 = time.perf_counter()
    s = _run(d, out)
    s["phase_wall_s"] = round(time.perf_counter() - t0, 1)
    s["state_bytes"] = _du(out)
    s["events_per_s"] = round(s["events_raw"] / s["wall_s"])
    _wipe_ray_spill()
    return s


# -- proofs ------------------------------------------------------------------
def compare() -> dict:
    """chaos vs clean partition-wise EXACT; emit chaos per-conv fp parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from encode_ingest_ray.pipelines.cdc import CdcEngine

    e_chaos = CdcEngine(os.path.join(STATE_BASE, "chaos"))
    e_clean = CdcEngine(os.path.join(STATE_BASE, "clean"))
    ps, pk = e_chaos.partition_files(), e_clean.partition_files()
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

    glob_fp, conv_fp = _fp_tables(e_chaos.final_dataset())
    pq.write_table(conv_fp, os.path.join(STATE_BASE, "chaos_conv_fp.parquet"))
    ray.shutdown()
    return {
        "chaos_vs_clean_partitionwise_exact": bool(part_ok),
        "live_rows": live_rows,
        "partitions": len(items),
        "global_fp": glob_fp,
    }


def oracle(n: int, segments: int, eps: int) -> dict:
    """DuckDB single-aggregation LWW fold of all raw epochs -> per-conv
    fingerprints; exact set-equality against the engine's table.

    The fold streams SEGMENT BY SEGMENT into an incremental arg_max
    aggregation state (win table re-aggregated per merge): one glob over
    all 20k+ files exceeds RLIMIT_NOFILE, and arg_max merges
    associatively, so per-segment partial winners then a final arg_max
    over the union is the same LWW fold (composite keys are globally
    comparable)."""
    import duckdb

    d = events_dir(n, segments, eps)
    fp_path = os.path.join(STATE_BASE, "chaos_conv_fp.parquet")
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(32, os.cpu_count() or 8)}")
    con.execute("SET preserve_insertion_order=false")

    def seg_fold(s: int) -> str:
        lo, hi = s * eps, (s + 1) * eps - 1
        # dense zero-padded epoch ids: match per-segment via range glob
        pats = ", ".join(
            f"'{d}/events-epoch-{e:06d}-*.parquet'" for e in range(lo, hi + 1)
        )
        return f"""
WITH ev AS (
  SELECT conv_id, turn_idx, op,
         CAST(epoch_us(ts) AS HUGEINT) * 4294967296 + lsn AS k,
         epoch_us(ts) % {MOD} AS ts_r,
         octet_length(CAST(COALESCE(text, '') AS BLOB)) AS tl
  FROM parquet_scan([{pats}], union_by_name=true)
)
SELECT conv_id, turn_idx,
       arg_max(op, k) AS op, arg_max(ts_r, k) AS ts_r,
       arg_max(tl, k) AS tl, CAST(MAX(k) AS HUGEINT) AS k
FROM ev GROUP BY conv_id, turn_idx
"""

    t0 = time.perf_counter()
    con.execute(
        "CREATE TEMP TABLE win (conv_id VARCHAR, turn_idx INTEGER,"
        " op VARCHAR, ts_r BIGINT, tl BIGINT, k HUGEINT)"
    )
    for s in range(segments):
        con.execute(f"INSERT INTO win {seg_fold(s)}")
        # re-fold so the running winner table stays one row per key
        con.execute(f"""
CREATE OR REPLACE TEMP TABLE win AS
SELECT conv_id, turn_idx,
       arg_max(op, k) AS op, arg_max(ts_r, k) AS ts_r,
       arg_max(tl, k) AS tl, CAST(MAX(k) AS HUGEINT) AS k
FROM win GROUP BY conv_id, turn_idx
""")
    con.execute("""
CREATE TEMP TABLE duck_fold AS
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(turn_idx AS BIGINT)) AS BIGINT) AS turn_m,
       CAST(SUM(ts_r) AS BIGINT) AS ts_m,
       CAST(SUM(tl) AS BIGINT) AS len_m
FROM win WHERE op <> 'delete' GROUP BY conv_id
""")
    fold_s = round(time.perf_counter() - t0, 1)
    mism = con.execute(f"""
SELECT CAST(COUNT(*) AS BIGINT) FROM (
  (SELECT conv_id, n, turn_m, ts_m, len_m FROM duck_fold
   EXCEPT SELECT conv_id, n, turn_m, ts_m, len_m FROM '{fp_path}')
  UNION ALL
  (SELECT conv_id, n, turn_m, ts_m, len_m FROM '{fp_path}'
   EXCEPT SELECT conv_id, n, turn_m, ts_m, len_m FROM duck_fold)
)""").fetchone()[0]
    glob_row = con.execute(
        "SELECT CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),"
        " CAST(SUM(turn_m) AS BIGINT), CAST(SUM(ts_m) AS BIGINT),"
        " CAST(SUM(len_m) AS BIGINT) FROM duck_fold").fetchone()
    return {
        "fold_wall_s": fold_s,
        "perconv_mismatch_rows": int(mism),
        "perconv_exact": int(mism) == 0,
        "global_fp": dict(zip(("n", "n_convs", "turn_m", "ts_m", "len_m"),
                              [int(x) for x in glob_row])),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["gen", "chaos", "clean", "compare",
                                      "oracle", "all"])
    ap.add_argument("--events", type=int, default=1_000_000_000)
    ap.add_argument("--segments", type=int, default=10)
    ap.add_argument("--epochs-per-segment", type=int, default=64)
    ap.add_argument("--gen-procs", type=int, default=3)
    args = ap.parse_args()
    n, segs, eps = args.events, args.segments, args.epochs_per_segment

    if args.phase == "gen":
        print(json.dumps(gen(n, segs, eps, args.gen_procs)))
        return
    if args.phase == "chaos":
        print(json.dumps(chaos(n, segs, eps)))
        return
    if args.phase == "clean":
        print(json.dumps(clean(n, segs, eps)))
        return
    if args.phase == "compare":
        print(json.dumps(compare()))
        return
    if args.phase == "oracle":
        print(json.dumps(oracle(n, segs, eps)))
        return

    report: dict = {"events": n, "segments": segs, "epochs": segs * eps}
    report["gen"] = gen(n, segs, eps, args.gen_procs)
    t0 = time.perf_counter()
    report["chaos"] = chaos(n, segs, eps)
    print("CHAOS:", json.dumps(report["chaos"]), flush=True)
    report["clean"] = clean(n, segs, eps)
    print("CLEAN:", json.dumps(report["clean"]), flush=True)
    # compare + oracle in fresh subprocesses (own Ray / DuckDB sessions)
    for ph in ("compare", "oracle"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), ph,
             "--events", str(n), "--segments", str(segs),
             "--epochs-per-segment", str(eps)],
            capture_output=True, text=True, env=_env(),
        )
        if r.returncode != 0:
            raise RuntimeError(f"{ph}: {r.stderr[-3000:]}")
        report[ph] = json.loads(r.stdout.strip().splitlines()[-1])
    report["oracle_matches_engine"] = (
        report["oracle"]["perconv_exact"]
        and report["oracle"]["global_fp"] == report["compare"]["global_fp"]
    )
    report["soak_wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
