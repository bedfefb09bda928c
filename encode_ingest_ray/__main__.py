"""CLI entry points — the `ray job submit` surface of the engine.

    python -m encode_ingest_ray generate --out DIR --events N --epochs E
    python -m encode_ingest_ray run      --events DIR --out DIR      # resume-safe
    python -m encode_ingest_ray final    --out DIR --dest DIR        # sorted sink
    python -m encode_ingest_ray status   --out DIR                   # manifest view

Reference analog: the Argo cron driver (orchestration/templates/
cron-workflow.yaml) — each weekly run here is one `run` invocation; re-runs
are idempotent (committed epochs are skipped).  This is the only module in
the package that may own a Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="encode_ingest_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="seeded synthetic transcript CDC events")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=1_000_000)
    g.add_argument("--epochs", type=int, default=4)
    g.add_argument("--convs", type=int, default=None)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--evolve-at", type=int, default=None)

    r = sub.add_parser("run", help="apply uncommitted epochs (resume-safe)")
    r.add_argument("--events", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--partitions", type=int, default=None)
    r.add_argument("--actors", type=int, default=None)
    r.add_argument("--follow", action="store_true",
                   help="tail mode: keep polling for newly-landed epochs")
    r.add_argument("--poll-s", type=float, default=2.0)
    r.add_argument("--max-idle-polls", type=int, default=3)

    f = sub.add_parser("final", help="materialize sorted per-partition parquet")
    f.add_argument("--out", required=True)
    f.add_argument("--dest", required=True)
    f.add_argument("--overwrite", action="store_true")

    s = sub.add_parser("status", help="print the latest manifest summary")
    s.add_argument("--out", required=True)

    args = p.parse_args(argv)

    if args.cmd == "generate":
        from encode_ingest_ray.functions.generator import generate_cdc_events

        meta = generate_cdc_events(
            args.out,
            n_events=args.events,
            n_convs=args.convs or max(1000, args.events // 2000),
            epochs=args.epochs,
            seed=args.seed,
            evolve_at_lsn=args.evolve_at,
        )
        print(json.dumps({k: v for k, v in meta.items() if k != "files"}))
        return 0

    if args.cmd == "status":
        from encode_ingest_ray.state.manifest import Manifest

        rec = Manifest(args.out).latest()
        if rec is None:
            print(json.dumps({"committed_epochs": 0}))
            return 0
        m = dict(rec["metrics"])
        m.pop("per_partition", None)
        print(
            json.dumps(
                {
                    "last_epoch": rec["epoch"],
                    "partitions": len(rec["partitions"]),
                    "lsn_hi": max(p["lsn_hi"] for p in rec["partitions"].values()),
                    "last_epoch_metrics": m,
                }
            )
        )
        return 0

    _init_ray(args.num_cpus)
    import ray

    from encode_ingest_ray.pipelines.cdc import CdcEngine

    try:
        if args.cmd == "run":
            eng = CdcEngine(
                args.out, num_partitions=args.partitions, num_actors=args.actors
            )
            if args.follow:
                print(json.dumps(eng.tail(args.events, poll_s=args.poll_s,
                                          max_idle_polls=args.max_idle_polls)))
            else:
                print(json.dumps(eng.run(args.events)))
        elif args.cmd == "final":
            eng = CdcEngine(args.out)
            print(json.dumps(eng.write_final(args.dest, overwrite=args.overwrite)))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
