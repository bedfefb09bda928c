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
import os
import sys


def _init_ray(num_cpus: int | None, object_store_gb: float | None = None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        if object_store_gb:
            # sharded "nodes" co-resident on one box must not each claim the
            # default 30%-of-RAM plasma store
            kwargs["object_store_memory"] = int(object_store_gb * (1 << 30))
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
    g.add_argument("--key-shards", type=int, default=None,
                   help="key-partitioned source: one file per salted key "
                        "range per epoch (enables sharded runs)")

    r = sub.add_parser("run", help="apply uncommitted epochs (resume-safe)")
    r.add_argument("--events", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--partitions", type=int, default=None)
    r.add_argument("--actors", type=int, default=None)
    r.add_argument("--follow", action="store_true",
                   help="tail mode: keep polling for newly-landed epochs")
    r.add_argument("--poll-s", type=float, default=2.0)
    r.add_argument("--max-idle-polls", type=int, default=3)
    r.add_argument("--shard-index", type=int, default=None,
                   help="this process owns source shards SSSS %% shard-count "
                        "== shard-index (key-sharded events required)")
    r.add_argument("--shard-count", type=int, default=None)
    r.add_argument("--object-store-gb", type=float, default=None)
    r.add_argument(
        "--compact-min-bytes-ratio", type=float, default=None,
        help="defer a partition's compaction until its delta bytes reach "
             "RATIO x base bytes (4x chain-length hard cap); default: "
             "chain-length-only trigger",
    )
    r.add_argument("--index-columns", default=None,
                   help="comma-separated payload columns for the engine-"
                        "maintained covering index (durable table identity; "
                        "committed tables adopt theirs automatically)")
    r.add_argument("--postings-column", default=None,
                   help="maintain a full-text postings index over this "
                        "payload column (durable identity; enables `search`)")
    r.add_argument("--lateness-s", type=float, default=None,
                   help="allowed lateness in seconds: events whose ts falls "
                        "further behind the partition's applied high-water "
                        "mark divert to the append-only late/ audit table "
                        "(committed atomically with the live table)")
    r.add_argument("--changefeed-preimages", action="store_true",
                   help="retraction-capable changefeed (Delta-CDF 'full' "
                        "mode): each commit also stores the previous live "
                        "version of every touched key; enables "
                        "`changes --cdf` and incremental downstream MVs")
    r.add_argument("--expect-not-null", action="append", default=None,
                   metavar="COL",
                   help="ingest expectation: quarantine epoch-winning "
                        "versions whose COL is null to the expect/ audit "
                        "table (repeatable; rule name not_null_COL)")
    r.add_argument("--expect-nonempty", action="append", default=None,
                   metavar="COL",
                   help="ingest expectation: quarantine versions whose COL "
                        "is null or '' (repeatable; rule name nonempty_COL)")
    r.add_argument("--expect-fail-not-null", action="append", default=None,
                   metavar="COL",
                   help="expect_or_fail: ABORT the epoch (nothing commits) "
                        "if any winning version has a null COL (repeatable; "
                        "rule name fail_not_null_COL)")
    r.add_argument("--stats-columns", default=None,
                   help="comma-separated columns to track per-partition "
                        "[min,max] zone-map stats for (policy knob; enables "
                        "pruned range scans via CdcEngine.scan)")
    r.add_argument("--warmup", action="store_true",
                   help="spin up the worker pool with an untimed tiny read "
                        "before running (bench parity)")

    rs = sub.add_parser(
        "run-sharded",
        help="spawn K independent engine processes (own Ray cluster each = "
             "the multi-node analog) over disjoint key ranges of one table",
    )
    rs.add_argument("--events", required=True)
    rs.add_argument("--out", required=True, help="table root; shards commit "
                    "to shard-KK-of-NN/ subdirs")
    rs.add_argument("--shards", type=int, required=True)
    rs.add_argument("--cpus-per-shard", type=int, default=4)
    rs.add_argument("--partitions", type=int, default=None)
    rs.add_argument("--object-store-gb", type=float, default=4.0)

    rh = sub.add_parser(
        "reshard",
        help="elastic grow: replicate each NEW shard's key subset from the "
             "old shard that owns it (incremental; call repeatedly while "
             "the old deployment keeps ingesting, final pass at cutover)",
    )
    rh.add_argument("--old", required=True, help="current sharded table root")
    rh.add_argument("--new", required=True, help="new sharded table root")
    rh.add_argument("--count", type=int, required=True,
                    help="new shard count (multiple of the current count; "
                         "must divide the source's key_shards)")
    rh.add_argument("--partitions", type=int, default=None)
    rh.add_argument("--actors", type=int, default=None)

    t = sub.add_parser(
        "transform",
        help="unified transformation driver: raw entity JSON dumps -> all 15 "
             "processing trees -> manifest-committed per-table Parquet "
             "(resume-safe: committed tables skip)",
    )
    t.add_argument("--input", required=True, help="dir of <EntityName>/*.json dumps")
    t.add_argument("--out", required=True)
    t.add_argument("--overwrite", action="store_true")

    x = sub.add_parser(
        "extract",
        help="ENCODE metadata extraction (S1): search-API crawl -> "
             "distinct-by-id JSON-list dumps feeding `transform`; "
             "--fixtures serves a local mini-ENCODE (offline), otherwise "
             "the live HTTP client is used",
    )
    x.add_argument("--out", required=True)
    x.add_argument("--fixtures", default=None,
                   help="dir of <Entity>.jsonl fixture files (offline mode)")
    x.add_argument("--base-url", default=None)
    x.add_argument("--initial-query", default="",
                   help="comma-separated k=v filters for the biosample seed")

    pr = sub.add_parser(
        "prep",
        help="LLM corpus preparation: clean -> dedup -> repetition filter -> "
             "decontaminate -> mixture -> split, written as train/ + val/ "
             "Parquet with a _SUCCESS marker (re-runs skip)",
    )
    pr.add_argument("--docs", required=True,
                    help="dir containing documents.parquet (file or shard dir)")
    pr.add_argument("--out", required=True)
    pr.add_argument("--overwrite", action="store_true")

    f = sub.add_parser("final", help="materialize sorted per-partition parquet")
    f.add_argument("--out", required=True)
    f.add_argument("--dest", required=True)
    f.add_argument("--asof-ts", type=float, default=None,
                   help="TIMESTAMP AS OF: export the newest commit at or "
                        "before this wall-clock (seconds since the Unix "
                        "epoch); mutually exclusive with --epoch")
    f.add_argument("--overwrite", action="store_true")
    f.add_argument("--epoch", type=int, default=None,
                   help="export a historical commit (time travel, within "
                        "vacuum retention)")

    s = sub.add_parser("status", help="print the latest manifest summary")
    s.add_argument("--out", required=True)

    fi = sub.add_parser(
        "ingest-files",
        help="bulk binary payload ingest: stage a directory's files "
             "content-addressed under <out>/files/cas (md5 dedup, "
             "idempotent replay) and commit the reference registry "
             "atomically with the table manifest",
    )
    fi.add_argument("--src", required=True, help="directory of payload files")
    fi.add_argument("--out", required=True, help="committed table root")

    fs = sub.add_parser(
        "submission",
        help="emit bulk-file-load control rows (sourcePath/targetPath/"
             "description/file_ref) from the payload registry — the "
             "reference hack/ manifest emitters as a streaming projection",
    )
    fs.add_argument("--out", required=True, help="committed table root")
    fs.add_argument("--bucket", default="gs://ingest-staging")
    fs.add_argument("--dest", help="write JSONL here instead of stdout")

    se = sub.add_parser(
        "search",
        help="full-text search over the live table via the engine-maintained "
             "postings index (requires run --postings-column)",
    )
    se.add_argument("tokens", nargs="+")
    se.add_argument("--out", required=True)
    se.add_argument("--limit", type=int, default=20)
    se.add_argument("--all", action="store_true",
                    help="require every token (AND semantics)")
    se.add_argument("--ranked", action="store_true",
                    help="BM25-ranked results (score_micro, exact-integer)")

    df = sub.add_parser(
        "diff",
        help="change stream between two committed tables (or two epochs of "
             "one table): one row per key whose state differs, tagged "
             "insert/update/delete",
    )
    df.add_argument("--left", required=True, help="table dir (old side)")
    df.add_argument("--right", required=True, help="table dir (new side)")
    df.add_argument("--epoch-left", type=int, default=None)
    df.add_argument("--epoch-right", type=int, default=None)
    df.add_argument("--dest", default=None, help="write the change rows here")
    df.add_argument("--limit", type=int, default=10)

    ch = sub.add_parser(
        "changes",
        help="read the record-level changefeed for a committed-epoch window "
             "(epoch-tagged LWW change rows, tombstones included; horizon = "
             "vacuum retention)",
    )
    ch.add_argument("--out", required=True, help="committed table root")
    ch.add_argument("--since-epoch", type=int, default=-1,
                    help="exclusive lower bound (default -1 = from start)")
    ch.add_argument("--to-epoch", type=int, default=None,
                    help="inclusive upper bound (default latest)")
    ch.add_argument("--dest", default=None, help="write the window here")
    ch.add_argument("--limit", type=int, default=10)
    ch.add_argument("--cdf", action="store_true",
                    help="emit the retraction-capable view (_change_type in "
                         "{insert, update_preimage, update_postimage, "
                         "delete}); requires run --changefeed-preimages")

    co = sub.add_parser(
        "consume",
        help="consumer-group changefeed delivery: write every change file "
             "past the named consumer's checkpoint to --dest at "
             "deterministic paths, then advance the checkpoint (crash "
             "anywhere before the ack -> the rerun overwrites the same "
             "bytes)",
    )
    co.add_argument("name", help="consumer group name")
    co.add_argument("--out", required=True, help="committed table root")
    co.add_argument("--dest", required=True, help="delivery directory")
    co.add_argument("--max-epochs", type=int, default=None,
                    help="bound one call's window (pagination)")

    rst = sub.add_parser(
        "restore",
        help="roll the table back to a committed epoch (atomic manifest "
             "re-commit, zero data movement; valid within vacuum retention; "
             "later source epochs stay committed = their effects are "
             "discarded, new epochs apply on top)",
    )
    rst.add_argument("--out", required=True)
    rst.add_argument("--epoch", type=int, required=True,
                     help="committed epoch to restore to")

    rp = sub.add_parser(
        "replicate",
        help="maintain --out as a replica of --source by consuming its "
             "changefeed (incremental, exactly-once; replica may use its "
             "own partitioning/index; falls back to a snapshot bootstrap "
             "past the feed horizon; refuses to diverge across a source "
             "restore)",
    )
    rp.add_argument("--out", required=True, help="replica table root")
    rp.add_argument("--source", required=True, help="source table root")
    rp.add_argument("--max-epochs", type=int, default=None,
                    help="bound one call's window (pagination)")
    rp.add_argument("--partitions", type=int, default=None,
                    help="replica partition count (defaults like run)")
    rp.add_argument("--actors", type=int, default=None)
    rp.add_argument("--bootstrap", choices=["auto", "always", "never"],
                    default="auto",
                    help="snapshot-bootstrap policy when the incremental "
                         "feed is unavailable (default auto)")

    mg = sub.add_parser(
        "migrate",
        help="partition evolution: rewrite the committed table under a new "
             "(num_partitions, turn_block) identity, atomic manifest swap",
    )
    mg.add_argument("--out", required=True)
    mg.add_argument("--partitions", type=int, default=None)
    mg.add_argument("--turn-block", type=int, default=None)
    mg.add_argument("--force", action="store_true",
                    help="rewrite even with unchanged identity (OPTIMIZE: "
                         "fold every base+delta chain into one compacted "
                         "base per partition)")

    hi = sub.add_parser(
        "history",
        help="commit history (or --files: the referenced chain-file "
             "inventory) as a table",
    )
    hi.add_argument("--out", required=True)
    hi.add_argument("--files", action="store_true",
                    help="list referenced data files with sizes instead")
    hi.add_argument("--epoch", type=int, default=None,
                    help="with --files: inventory of a historical commit")

    br = sub.add_parser(
        "branch",
        help="write-audit-publish branches: zero-copy snapshot branch, "
             "fast-forward publish, guarded drop",
    )
    br.add_argument("--out", required=True)
    bg = br.add_mutually_exclusive_group(required=True)
    bg.add_argument("--create", metavar="NAME")
    bg.add_argument("--publish", metavar="NAME")
    bg.add_argument("--drop", metavar="NAME")
    bg.add_argument("--list", action="store_true", dest="list_branches")

    rn = sub.add_parser(
        "rename-column",
        help="metadata-only column rename (one manifest re-commit; old "
             "files map at read via the epoch-stamped schema log)",
    )
    rn.add_argument("--out", required=True)
    rn.add_argument("--from", dest="old", required=True, metavar="OLD")
    rn.add_argument("--to", dest="new", required=True, metavar="NEW")

    dc = sub.add_parser(
        "drop-column",
        help="metadata-only column drop (the column leaves the logical "
             "schema; later ingest may re-introduce the name as a new column)",
    )
    dc.add_argument("--out", required=True)
    dc.add_argument("--column", required=True)

    q = sub.add_parser(
        "query",
        help="run a registered analytics query over a table directory "
        "(list names with --list)",
    )
    q.add_argument("name", nargs="?", help="query name (see --list)")
    q.add_argument("--sf", default="/root/testdata/sf0.01", help="table dir")
    q.add_argument("--dest", help="write result parquet here instead of printing")
    q.add_argument("--limit", type=int, default=20, help="rows to print")
    q.add_argument("--list", action="store_true", help="list registered queries")
    q.add_argument("--stats", action="store_true",
                   help="print the Ray Data execution stats (per-operator "
                        "wall/cpu/rows) after running the query")
    q.add_argument("--num-cpus", type=int, default=None)

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
            key_shards=args.key_shards,
        )
        print(json.dumps({k: v for k, v in meta.items() if k != "files"}))
        return 0

    if args.cmd == "run-sharded":
        # the parent owns NO Ray session; each shard child starts its own
        from encode_ingest_ray.pipelines.sharded import spawn_shards

        print(
            json.dumps(
                spawn_shards(
                    args.events,
                    args.out,
                    args.shards,
                    cpus_per_shard=args.cpus_per_shard,
                    num_partitions=args.partitions,
                    object_store_gb=args.object_store_gb,
                )
            )
        )
        return 0

    if args.cmd == "status":
        from encode_ingest_ray.state.manifest import Manifest
        from encode_ingest_ray.state.txn import TxnLog

        # roll any in-flight multi-table txn forward BEFORE reading the
        # manifests (cheap no-op when the txn log is empty) — otherwise a
        # crash between the txn record rename and the last promotion shows
        # sibling tables at diverging epochs until the next engine init
        TxnLog(args.out).recover()
        rec = Manifest(args.out).latest()
        if rec is None:
            print(json.dumps({"committed_epochs": 0}))
            return 0
        m = dict(rec["metrics"])
        m.pop("per_partition", None)
        part = rec.get("partitioning") or {}
        out = {
            "last_epoch": rec["epoch"],
            "partitions": len(rec["partitions"]),
            "lsn_hi": max(p["lsn_hi"] for p in rec["partitions"].values()),
            "last_epoch_metrics": m,
        }
        if part.get("index_columns"):
            out["index_columns"] = part["index_columns"]
        if part.get("postings_column"):
            out["postings_column"] = part["postings_column"]
        if part.get("lateness_us") is not None:
            out["lateness_us"] = part["lateness_us"]
            late = Manifest(os.path.join(args.out, "late")).latest()
            if late:
                out["late_files"] = sum(
                    len(p.get("deltas", []))
                    for p in late["partitions"].values()
                )
        if part.get("changefeed_preimages"):
            out["changefeed_preimages"] = True
        if part.get("stats_columns"):
            out["stats_columns"] = part["stats_columns"]
        if os.path.isdir(os.path.join(args.out, "expect", "_manifest")):
            exp = Manifest(os.path.join(args.out, "expect")).latest()
            if exp:
                out["expect_files"] = sum(
                    len(p.get("deltas", []))
                    for p in exp["partitions"].values()
                )
        out["restore_gen"] = int(rec.get("restore_gen", 0) or 0)
        if rec.get("schema_log"):
            out["schema_log"] = rec["schema_log"]
        br_dir = os.path.join(args.out, "_branches")
        if os.path.isdir(br_dir):
            brs = {}
            for name in sorted(os.listdir(br_dir)):
                broot = os.path.join(br_dir, name)
                if not os.path.isdir(os.path.join(broot, "_manifest")):
                    continue
                b = Manifest(broot).latest()
                if b:
                    entry = {"epoch": b["epoch"]}
                    info_path = os.path.join(broot, "branch.json")
                    if os.path.exists(info_path):
                        with open(info_path) as f:
                            entry["base_epoch"] = json.load(f)["base_epoch"]
                    brs[name] = entry
            if brs:
                out["branches"] = brs
        # replication: this table's upstream cursor (if it is a replica)
        # and its downstream consumer-group checkpoints (if any)
        cur = os.path.join(args.out, "_replication", "cursor.json")
        if os.path.exists(cur):
            with open(cur) as f:
                out["replication_cursor"] = json.load(f)
        cons_dir = os.path.join(args.out, "_consumers")
        if os.path.isdir(cons_dir):
            out["consumers"] = {}
            for name in sorted(os.listdir(cons_dir)):
                if name.endswith(".json") and not name.startswith("."):
                    with open(os.path.join(cons_dir, name)) as f:
                        epoch = int(json.load(f)["epoch"])
                    out["consumers"][name[:-5]] = {
                        "epoch": epoch, "lag": rec["epoch"] - epoch,
                    }
        print(json.dumps(out))
        return 0

    if args.cmd == "query":
        from encode_ingest_ray.pipelines import registry

        registry.load_all()
        if args.list or not args.name:
            for n in sorted(registry.QUERIES):
                kind = "exact " if n in registry.ORACLE else "rows  "
                print(f"{kind} {n}")
            return 0
        if args.name not in registry.QUERIES:
            raise SystemExit(f"unknown query {args.name!r} (use --list)")
        _init_ray(args.num_cpus, None)
        import ray

        try:
            res = registry.QUERIES[args.name](args.sf)
            if isinstance(res, ray.data.Dataset):
                if args.stats:
                    res = res.materialize()
                if args.dest:
                    res.write_parquet(args.dest)
                    print(json.dumps({"query": args.name, "dest": args.dest}))
                else:  # never materialize more than the printed head
                    print(res.limit(args.limit).to_pandas().to_string())
                if args.stats:
                    print(res.stats())
            else:  # pa.Table / pandas result
                df = res.to_pandas() if hasattr(res, "to_pandas") else res
                if args.dest:
                    import pyarrow as pa
                    import pyarrow.parquet as pq

                    pq.write_table(
                        pa.Table.from_pandas(df, preserve_index=False), args.dest
                    )
                    print(json.dumps({"query": args.name, "dest": args.dest}))
                else:
                    print(df.head(args.limit).to_string())
        finally:
            ray.shutdown()
        return 0

    _init_ray(args.num_cpus, getattr(args, "object_store_gb", None))
    import ray

    from encode_ingest_ray.pipelines.cdc import CdcEngine

    try:
        if args.cmd == "run":
            index_columns = (
                [c.strip() for c in args.index_columns.split(",") if c.strip()]
                if args.index_columns else None
            )
            lateness_us = (
                int(args.lateness_s * 1_000_000)
                if args.lateness_s is not None else None
            )
            postings_column = args.postings_column
            cdf_pre = True if args.changefeed_preimages else None
            stats_columns = (
                [c.strip() for c in args.stats_columns.split(",") if c.strip()]
                if args.stats_columns else None
            )
            fail_expectations = None
            if args.expect_fail_not_null:
                from encode_ingest_ray.pipelines.cdc import expect_not_null

                fail_expectations = {
                    f"fail_not_null_{c}": expect_not_null(c)
                    for c in args.expect_fail_not_null
                }
            expectations = None
            if args.expect_not_null or args.expect_nonempty:
                from encode_ingest_ray.pipelines.cdc import (
                    expect_nonempty, expect_not_null,
                )

                expectations = {}
                for c in args.expect_not_null or []:
                    expectations[f"not_null_{c}"] = expect_not_null(c)
                for c in args.expect_nonempty or []:
                    expectations[f"nonempty_{c}"] = expect_nonempty(c)
            if args.shard_index is not None:
                from encode_ingest_ray.pipelines.sharded import shard_epoch_files

                if not args.shard_count:
                    raise SystemExit("--shard-index requires --shard-count")
                eng = CdcEngine(
                    args.out, num_partitions=args.partitions,
                    num_actors=args.actors, index_columns=index_columns,
                    lateness_us=lateness_us, postings_column=postings_column,
                    expectations=expectations, changefeed_preimages=cdf_pre,
                    stats_columns=stats_columns,
                    fail_expectations=fail_expectations,
                    compact_min_bytes_ratio=args.compact_min_bytes_ratio,
                )
                files = shard_epoch_files(
                    args.events, args.shard_index, args.shard_count
                )
                if args.warmup and files and files[0]:
                    import ray.data

                    # spawn the merger pool while the warmup read spins the
                    # worker pool — both are cold-start costs, paid once
                    eng._actors = eng._spawn_actors()
                    ray.data.read_parquet(files[0]).map_batches(
                        lambda t: t.slice(0, 1), batch_format="pyarrow"
                    ).count()
                s = eng.run(epoch_files=files)
                s["shard_index"] = args.shard_index
                s["shard_count"] = args.shard_count
                print(json.dumps(s))
            elif args.follow:
                eng = CdcEngine(
                    args.out, num_partitions=args.partitions,
                    num_actors=args.actors, index_columns=index_columns,
                    lateness_us=lateness_us, postings_column=postings_column,
                    expectations=expectations, changefeed_preimages=cdf_pre,
                    stats_columns=stats_columns,
                    fail_expectations=fail_expectations,
                    compact_min_bytes_ratio=args.compact_min_bytes_ratio,
                )
                print(json.dumps(eng.tail(args.events, poll_s=args.poll_s,
                                          max_idle_polls=args.max_idle_polls)))
            else:
                eng = CdcEngine(
                    args.out, num_partitions=args.partitions,
                    num_actors=args.actors, index_columns=index_columns,
                    lateness_us=lateness_us, postings_column=postings_column,
                    expectations=expectations, changefeed_preimages=cdf_pre,
                    stats_columns=stats_columns,
                    fail_expectations=fail_expectations,
                    compact_min_bytes_ratio=args.compact_min_bytes_ratio,
                )
                print(json.dumps(eng.run(args.events)))
        elif args.cmd == "extract":
            from encode_ingest_ray.pipelines.extraction import (
                run_extraction_pipeline,
            )
            from encode_ingest_ray.sources.encode_client import (
                ENCODE_BASE_URL,
                FileTransport,
                HttpTransport,
            )

            if args.fixtures:
                root = args.fixtures
                factory = lambda: FileTransport(root)  # noqa: E731
            else:
                factory = HttpTransport
            initial = [
                tuple(kv.split("=", 1))
                for kv in args.initial_query.split(",")
                if kv
            ]
            print(
                json.dumps(
                    run_extraction_pipeline(
                        factory, args.out, initial,
                        base_url=args.base_url or ENCODE_BASE_URL,
                    )
                )
            )
        elif args.cmd == "transform":
            from encode_ingest_ray.pipelines.transform_driver import (
                run_transformation_pipeline,
            )

            print(
                json.dumps(
                    run_transformation_pipeline(
                        args.input, args.out, overwrite=args.overwrite
                    )
                )
            )
        elif args.cmd == "prep":
            from encode_ingest_ray.pipelines.llmprep import run_corpus_prep

            print(
                json.dumps(
                    run_corpus_prep(args.docs, args.out, overwrite=args.overwrite)
                )
            )
        elif args.cmd == "final":
            eng = CdcEngine(args.out)
            epoch = args.epoch
            if getattr(args, "asof_ts", None) is not None:
                if epoch is not None:
                    raise SystemExit("--asof-ts and --epoch are exclusive")
                epoch = eng.epoch_asof(int(args.asof_ts * 1_000_000))
            print(json.dumps(eng.write_final(
                args.dest, overwrite=args.overwrite, epoch=epoch)))
        elif args.cmd == "diff":
            from encode_ingest_ray.stages.diff import snapshot_diff

            old = CdcEngine(args.left).final_dataset(epoch=args.epoch_left)
            new = CdcEngine(args.right).final_dataset(epoch=args.epoch_right)
            # compare every non-key column of the NEW side (evolved
            # columns included)
            compare = [
                c for c in new.schema().names
                if c not in ("conv_id", "turn_idx")
            ]
            changes = snapshot_diff(
                old, new, key_cols=["conv_id", "turn_idx"],
                compare_cols=compare, carry_cols=compare,
            ).materialize()
            counts: dict = {}
            for row in changes.map_batches(
                lambda t: t.group_by(["change_type"]).aggregate(
                    [([], "count_all")]
                ).rename_columns(["change_type", "n"]),
                batch_format="pyarrow", batch_size=None,
            ).take_all():
                counts[row["change_type"]] = counts.get(row["change_type"], 0) + row["n"]
            if args.dest:
                changes.write_parquet(args.dest)
            print(json.dumps({"changes": counts, "total": changes.count()}))
            print(changes.limit(args.limit).to_pandas().to_string())
        elif args.cmd == "search":
            eng = CdcEngine(args.out)
            if args.ranked:
                hits = eng.search_ranked(args.tokens)
            else:
                hits = eng.search(args.tokens, require_all=args.all)
            print(hits.limit(args.limit).to_pandas().to_string())
        elif args.cmd == "ingest-files":
            import re

            import pyarrow as pa

            src = os.path.abspath(args.src)
            ds = ray.data.read_binary_files(src, include_paths=True)
            prefix = f"^{re.escape(src)}/?"

            def to_payload(t: "pa.Table") -> "pa.Table":
                import pyarrow.compute as pc

                rel = pc.replace_substring_regex(t.column("path"), prefix, "")
                return pa.table({"file_id": rel, "payload": t.column("bytes")})

            eng = CdcEngine(args.out)
            print(json.dumps(eng.ingest_payloads(ds.map_batches(
                to_payload, batch_format="pyarrow", zero_copy_batch=True,
            ))))
        elif args.cmd == "submission":
            eng = CdcEngine(args.out)
            rows = eng.file_submission(bucket=args.bucket)
            if args.dest:
                import pandas as _pd  # noqa: F401  (to_pandas dependency)

                with open(args.dest, "w") as f:
                    for b in rows.iter_batches(batch_format="pyarrow"):
                        for r in b.to_pylist():
                            f.write(json.dumps(r) + "\n")
                print(json.dumps({"dest": args.dest}))
            else:
                for b in rows.iter_batches(batch_format="pyarrow"):
                    for r in b.to_pylist():
                        print(json.dumps(r))
        elif args.cmd == "reshard":
            from encode_ingest_ray.pipelines.sharded import reshard

            print(json.dumps(reshard(
                args.old, args.new, args.count,
                num_partitions=args.partitions, num_actors=args.actors,
            )))
        elif args.cmd == "changes":
            eng = CdcEngine(args.out)
            reader = eng.changes_cdf if args.cdf else eng.changes
            feed = reader(since_epoch=args.since_epoch,
                          to_epoch=args.to_epoch)
            if args.dest:
                # one materialization: count from the written output rather
                # than feed.count(), which would re-execute the whole
                # read/map pipeline a second time.  Count ONLY the files
                # this invocation writes — a re-run into the same dest
                # (pagination, later windows) must not attribute the old
                # files' rows to this window.
                import pyarrow.parquet as pq

                before = (
                    set(os.listdir(args.dest))
                    if os.path.isdir(args.dest) else set()
                )
                feed.write_parquet(args.dest)
                rows = sum(
                    pq.read_metadata(os.path.join(args.dest, f)).num_rows
                    for f in os.listdir(args.dest)
                    if f.endswith(".parquet") and f not in before
                )
                print(json.dumps({"dest": args.dest, "rows": rows}))
            else:
                print(feed.limit(args.limit).to_pandas().to_string())
        elif args.cmd == "consume":
            eng = CdcEngine(args.out)
            print(json.dumps(eng.consume(
                args.name, args.dest, max_epochs=args.max_epochs)))
        elif args.cmd == "restore":
            eng = CdcEngine(args.out)
            print(json.dumps(eng.restore(args.epoch)))
        elif args.cmd == "replicate":
            src = CdcEngine(args.source)
            rep = CdcEngine(args.out, num_partitions=args.partitions,
                            num_actors=args.actors)
            boot = {"auto": "auto", "always": True, "never": False}[args.bootstrap]
            print(json.dumps(rep.replicate_from(
                src, max_epochs=args.max_epochs, bootstrap=boot)))
        elif args.cmd == "history":
            eng = CdcEngine(args.out)
            t = (
                eng.file_inventory(epoch=args.epoch)
                if args.files
                else eng.history()
            )
            print(t.to_pandas().to_string(index=False, max_colwidth=60))
        elif args.cmd == "branch":
            eng = CdcEngine(args.out)
            if args.list_branches:
                print(json.dumps({"branches": eng.branches()}))
            elif args.create:
                print(json.dumps(eng.create_branch(args.create)))
            elif args.publish:
                print(json.dumps(eng.publish_branch(args.publish)))
            elif args.drop:
                print(json.dumps(eng.drop_branch(args.drop)))
        elif args.cmd == "rename-column":
            eng = CdcEngine(args.out)
            print(json.dumps(eng.rename_column(args.old, args.new)))
        elif args.cmd == "drop-column":
            eng = CdcEngine(args.out)
            print(json.dumps(eng.drop_column(args.column)))
        elif args.cmd == "migrate":
            eng = CdcEngine(args.out)
            print(
                json.dumps(
                    eng.migrate(
                        new_num_partitions=args.partitions,
                        new_turn_block=args.turn_block,
                        force=args.force,
                    )
                )
            )
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
