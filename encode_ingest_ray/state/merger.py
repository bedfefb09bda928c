"""Partition-merger actor: the stateful stage of the engine.

Reference analog: the per-worker stateful singleton of
``ScalaAsyncLookupDoFn`` (/root/reference/extraction/src/main/scala/org/
broadinstitute/monster/encode/extraction/ExtractionPipelineBuilder.scala:31-42)
generalized to own upsert partitions — SURVEY.md §2.3 ST2.

Each actor owns a fixed subset of partitions.  Per partition it holds the
**monotonic LSN watermark** (the sequence-number dedup high-water mark) and
an epoch delta buffer; durable state lives in Parquet (base + deltas), so
actor RAM stays O(watermarks + one epoch delta) — at 10^10-event scale the
table itself can never be required to fit in actor memory.

Commit layout (write amplification matters at 10^10 events): each epoch
stages a *delta* file per dirty partition
(``part=PPPPP/delta-EEEEEE.parquet``: the LWW-collapsed epoch delta) and,
every ``compact_every`` deltas, a compacted *base* snapshot
(``base-EEEEEE.parquet``).  A partition's state = base merged with newer
deltas (merge-on-read via the LWW kernel).  All staged paths are
deterministic per (partition, epoch): a replayed crash re-stages identical
bytes, and writes go through temp + ``os.replace`` so a racing zombie writer
cannot leave a torn file.  Files are zstd-compressed — at lake scale you buy
scalable CPU and save non-scalable IO/network bytes.

Exactly-once under retries: a retried routing task re-pushes identical
sub-tables; LWW winner selection is idempotent under duplicates, cross-epoch
replays are cut by the committed watermark, in-epoch duplicate LSNs collapse
in the delta reduce.  (Reference analog: "will not re-ingest or re-delete
rows if the state already matches", ingest-processed-data.yaml:7-12.)
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from encode_ingest_ray.functions.text import split_whitespace
from encode_ingest_ray.state.lww import lww_reduce
from encode_ingest_ray.schema import align_to_schema, unify_schemas

PARQUET_OPTS = dict(compression="zstd", compression_level=3, row_group_size=131_072)


class ExpectationFailedError(RuntimeError):
    """An ``expect_or_fail`` rule rejected an epoch-winning version: the
    epoch ABORTS before its manifest commit (staged files are harmless —
    a replay re-stages them byte-identically), exactly the
    Delta-Live-Tables ``expect_or_fail`` contract."""


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def _concat_unified(tables: list[pa.Table]) -> pa.Table:
    """Concat tables whose schemas may differ additively (schema evolution
    mid-stream): align every table to the unified column set."""
    if len(tables) == 1:
        return tables[0]
    schema = tables[0].schema
    for t in tables[1:]:
        schema = unify_schemas(schema, t.schema)
    return pa.concat_tables([align_to_schema(t, schema) for t in tables])


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, **PARQUET_OPTS)
    os.replace(tmp, path)


#: LWW key + merge metadata every covering-index file must retain so the
#: standard merge-on-read kernel (load_partition_state → live_view) applies
#: to the index chain unchanged.
INDEX_META_COLUMNS = ["conv_id", "turn_idx", "ts", "op", "lsn"]


def project_index(table: pa.Table, index_columns: list[str]) -> pa.Table:
    """Covering-index projection of a delta/base: key + merge metadata plus
    the configured payload subset (columns absent in an early-epoch schema
    are simply skipped — read-side schema alignment null-fills them)."""
    cols = INDEX_META_COLUMNS + [
        c for c in index_columns
        if c in table.column_names and c not in INDEX_META_COLUMNS
    ]
    return table.select(cols)


def project_postings(table: pa.Table, column: str) -> pa.Table:
    """Full-text postings projection of a delta/base: one row per DISTINCT
    (lower-cased whitespace token, key) over the LIVE rows, carrying the
    key's ``lsn`` (read-time validity join — the log-structured secondary
    index needs no retraction records), the token's in-row term frequency
    ``tf`` and the row's token count ``dl`` (the ranking signals BM25
    needs).  Output is SORTED by token so parquet row-group stats prune
    single-token searches."""
    import numpy as np

    live = table.filter(pc.not_equal(table.column("op"), pa.scalar("delete")))
    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "lsn": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
        }
    )
    if live.num_rows == 0 or column not in live.column_names:
        return empty
    toks = split_whitespace(
        pc.utf8_lower(pc.fill_null(live.column(column).combine_chunks(), ""))
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.asarray(toks.value_lengths(), dtype=np.int64)
    row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_of = row_of[keep]
    flat = flat.filter(pa.array(keep))
    if len(flat) == 0:
        return empty
    dl_of_row = np.bincount(row_of, minlength=live.num_rows).astype(np.int64)
    exploded = pa.table(
        {
            "token": flat,
            "conv_id": live.column("conv_id").combine_chunks().take(pa.array(row_of)),
            "turn_idx": live.column("turn_idx").combine_chunks().take(pa.array(row_of)),
            "lsn": live.column("lsn").combine_chunks().take(pa.array(row_of)),
            "dl": pa.array(dl_of_row[row_of]),
        }
    )
    d = exploded.group_by(
        ["token", "conv_id", "turn_idx", "lsn", "dl"]
    ).aggregate([([], "count_all")])
    d = d.rename_columns(["token", "conv_id", "turn_idx", "lsn", "dl", "tf"])
    d = d.select(["token", "conv_id", "turn_idx", "lsn", "tf", "dl"])
    return d.sort_by([("token", "ascending"), ("conv_id", "ascending"),
                      ("turn_idx", "ascending")])


def project_doclens(table: pa.Table, column: str) -> pa.Table:
    """Doc-length sidecar projection: ONE row per key-version carrying the
    LWW merge metadata plus ``dl`` (the version's non-empty whitespace token
    count over ``column`` — bit-identical to the ``dl`` project_postings
    emits, 0 for tombstones / null / pre-evolution rows).  The sidecar chain
    is a narrow LWW mini-table: folding it with the standard merge-on-read
    kernel yields each key's live ``dl``, which is how the flush maintains
    the partition's exact BM25 corpus stats (n_docs, Σdl) as pointer
    statistics — ``search_ranked`` then issues ZERO corpus pre-scans."""
    import numpy as np

    meta = {c: table.column(c) for c in INDEX_META_COLUMNS}
    if column not in table.column_names or table.num_rows == 0:
        return pa.table(
            {**meta, "dl": pa.array(np.zeros(table.num_rows, np.int64))}
        )
    toks = split_whitespace(
        pc.utf8_lower(pc.fill_null(table.column(column).combine_chunks(), ""))
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.asarray(toks.value_lengths(), dtype=np.int64)
    row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.bincount(row_of[keep], minlength=table.num_rows).astype(np.int64)
    return pa.table({**meta, "dl": pa.array(dl)})


def doc_stats_of(doclens: pa.Table | None) -> dict:
    """Exact BM25 corpus stats of an LWW-REDUCED doclens table: documents
    with a live, ≥1-token version (the same population the postings chain's
    validity join yields — tokenless live rows have no postings rows)."""
    if doclens is None or doclens.num_rows == 0:
        return {"n": 0, "s": 0}
    live = doclens.filter(
        pc.and_(
            pc.not_equal(doclens.column("op"), pa.scalar("delete")),
            pc.greater(doclens.column("dl"), pa.scalar(0)),
        )
    )
    return {
        "n": live.num_rows,
        "s": int(pc.sum(live.column("dl")).as_py() or 0),
    }


#: merge metadata the LWW kernel + live projection require from every file
LWW_META_COLUMNS = ("conv_id", "turn_idx", "ts", "lsn", "op")


def column_bounds(table: pa.Table, columns: list[str]) -> dict:
    """Per-column [min, max] zone-map bounds over a table's rows (None for
    absent/all-null columns).  Bounds over ALL versions — superseded and
    tombstoned rows included — which over-approximates the live values, the
    safe direction for pruning.  Temporal types are cast to their RAW
    integer representation (timestamps → µs) BEFORE min/max — never through
    datetime.timestamp(), which applies the host's local timezone and would
    shift the bounds against scan()'s raw-int64 residual compare.  Columns
    whose bounds are not JSON scalars (binary, decimal, …) record None
    (never pruned — the safe default)."""
    out: dict = {}
    for c in columns:
        if c not in table.column_names or table.num_rows == 0:
            out[c] = None
            continue
        col = table.column(c)
        if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type) \
                or pa.types.is_time(col.type):
            width32 = getattr(col.type, "bit_width", 64) == 32
            col = pc.cast(
                pc.cast(col, pa.int32() if width32 else pa.int64()), pa.int64()
            )
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or not isinstance(lo, (int, float, str, bool)):
            out[c] = None
        else:
            out[c] = [lo, hi]
    return out


def merge_bounds(prev: dict | None, new: dict) -> dict:
    """Widen previous bounds with an epoch's — bounds only ever widen
    between compactions (a compaction recomputes them exactly from the
    folded state, which is what re-tightens after deletes)."""
    out = dict(prev or {})
    for c, b in new.items():
        p = out.get(c)
        if b is None:
            out.setdefault(c, None)
        elif p is None:
            out[c] = list(b)
        else:
            out[c] = [min(p[0], b[0]), max(p[1], b[1])]
    return out


def load_partition_state(
    ptr: dict,
    columns: list[str] | None = None,
    schema_log: list | None = None,
) -> pa.Table | None:
    """Reconstruct a partition's durable state from its manifest pointer:
    base snapshot merged with subsequent deltas in epoch order
    (merge-on-read).  ``columns`` pushes a PAYLOAD projection down to the
    parquet reads (merge metadata is always read; columns a file predates
    are skipped per file and null-filled by the caller's schema alignment)
    — a stats read over a wide transcript table then never decodes text.

    ``schema_log`` (state/schemalog.py) applies metadata-only renames /
    drops per file by its file epoch; a requested LOGICAL column is
    translated to each file's physical name before the projected read, so
    pushdown crosses renames too."""
    want = None
    if columns is not None:
        want = list(LWW_META_COLUMNS) + [
            c for c in columns if c not in LWW_META_COLUMNS
        ]
    log = list(schema_log or [])

    def read(path: str) -> pa.Table:
        if not log:
            if want is None:
                return pq.read_table(path)
            have = set(pq.read_schema(path).names)
            return pq.read_table(path, columns=[c for c in want if c in have])
        from encode_ingest_ray.state.schemalog import (
            file_epoch,
            map_table,
            physical_name,
        )

        fe = file_epoch(path)
        if want is None:
            return map_table(pq.read_table(path), fe, log)
        have = set(pq.read_schema(path).names)
        phys: list[str] = []
        for c in want:
            # request the logical name TOO when it differs: files rewritten
            # at an entry's own epoch (migrate/compaction at the rename
            # epoch) already carry logical names even though the entry
            # still nominally applies to them; map_table applies the
            # entries in order, so reading both can never duplicate
            for p in (physical_name(c, fe, log), c):
                if p is not None and p in have and p not in phys:
                    phys.append(p)
        return map_table(pq.read_table(path, columns=phys), fe, log)

    tables = []
    if ptr.get("base"):
        tables.append(read(ptr["base"]))
    for d in ptr.get("deltas", []):
        tables.append(read(d))
    if not tables:
        return None
    if len(tables) == 1:
        return tables[0]
    return lww_reduce(_concat_unified(tables))


# num_cpus=0: flush tasks must not consume scheduler slots — epoch e's
# flush OVERLAPS epoch e+1's routing tasks by design, and a reservation
# would serialize the two legs at low cpu counts (same rule as the
# mergers' own zero reservation).
@ray.remote(num_cpus=0)
def _flush_partitions(
    out_dir: str,
    epoch: int,
    parts_group: list[int],
    blob_refs: list,
    metas: list[tuple],
    watermarks: dict[int, int],
    prev_pointers: dict[int, dict],
    compact_every: int,
    index_root: str | None = None,
    index_columns: list[str] | None = None,
    late_root: str | None = None,
    lateness_us: int | None = None,
    postings_root: str | None = None,
    postings_column: str | None = None,
    expect_root: str | None = None,
    expectations: dict | None = None,
    cdf_preimages: bool = False,
    schema_log: list | None = None,
    stats_columns: list | None = None,
    fail_expectations: dict | None = None,
    compact_min_bytes_ratio: float | None = None,
) -> dict[int, dict]:
    """Stateless flush worker: decompress the actor's buffered blobs, slice
    out this group's partitions, and run wm-filter + LWW + stage per
    partition.  Fanning flush out as tasks makes the flush leg scale with the
    CLUSTER's cpus instead of the actor count — with 8 actors on 32 cpus an
    actor-side flush left 3/4 of the machine idle during the epoch tail."""
    from encode_ingest_ray.state.wire import unpack_table

    want = set(parts_group)
    buffers: dict[int, list[pa.Table]] = {}
    for blob, (parts, lens) in zip(ray.get(list(blob_refs)), metas):
        t = unpack_table(blob)
        off = 0
        for part, n in zip(parts, lens):
            if n and part in want:
                buffers.setdefault(part, []).append(t.slice(off, n))
            off += n
    out: dict[int, dict] = {}
    for part in sorted(buffers):
        t0 = time.perf_counter()
        raw = _concat_unified(buffers[part])
        wm = watermarks.get(part, -1)
        fresh = raw
        if wm >= 0 and raw.num_rows:
            fresh = raw.filter(pc.greater(raw.column("lsn"), pa.scalar(wm)))
        metrics = {
            "events_in": raw.num_rows,
            "dup_lsn_dropped": raw.num_rows - fresh.num_rows,
            "applied": fresh.num_rows,
        }
        prev = prev_pointers.get(part, {})
        late_path = None
        quarantined = 0
        # lsn high-water over EVERYTHING fresh this epoch (quarantined rows
        # included): replays of a quarantined event must hit the dedup
        # filter, or a later epoch would append it to the audit table twice
        epoch_lsn_hi = (
            int(pc.max(fresh.column("lsn")).as_py()) if fresh.num_rows else wm
        )
        if lateness_us is not None and fresh.num_rows:
            # allowed-lateness quarantine: events with event time older than
            # (previous epoch's max applied ts − bound) divert to the
            # append-only late table BEFORE the LWW reduce — deterministic
            # under replay because the bound derives from COMMITTED state
            prev_ts_hi = prev.get("ts_hi")
            if prev_ts_hi is not None:
                bound = prev_ts_hi - lateness_us
                ts_us = pc.cast(fresh.column("ts"), pa.int64())
                late_mask = pc.less(ts_us, pa.scalar(bound))
                quarantined = int(pc.sum(late_mask).as_py() or 0)
                if quarantined:
                    late = fresh.filter(late_mask)
                    late_path = os.path.join(
                        _part_dir(late_root, part), f"delta-{epoch:06d}.parquet"
                    )
                    _atomic_write(late, late_path)
                    fresh = fresh.filter(pc.invert(late_mask))
        metrics["quarantined_late"] = quarantined
        metrics["applied"] = fresh.num_rows
        if schema_log:
            # map the in-flight rows with THEIR epoch: a no-op for ordinary
            # runs (every entry predates the running epoch), but a replica
            # mid-catchup replays pre-rename change rows at pre-rename epoch
            # numbers — without this, a compaction would fold mapped prev
            # state with unmapped delta rows and split the column
            from encode_ingest_ray.state.schemalog import map_table

            fresh = map_table(fresh, epoch, schema_log)
        if fresh.num_rows == 0:
            if late_path is not None:
                # nothing merges, but the quarantine must still commit:
                # emit a pointer that only advances the late chain
                out[part] = {
                    **{k: prev.get(k) for k in ("base",)},
                    "deltas": list(prev.get("deltas", [])),
                    "epoch": epoch,
                    "rows_delta": 0,
                    "rows_state": prev.get("rows_state"),
                    "rows_live": prev.get("rows_live"),
                    "lsn_hi": max(wm, epoch_lsn_hi),
                    "ts_hi": prev.get("ts_hi"),
                    "turn_hi": prev.get("turn_hi"),
                    "late_delta": late_path,
                    "cdf": None,
                    "metrics": metrics,
                }
                if stats_columns:
                    out[part]["stats"] = prev.get("stats")
                if postings_root is not None:
                    out[part]["dl_base"] = prev.get("dl_base")
                    out[part]["dl_deltas"] = list(prev.get("dl_deltas", []))
                    out[part]["doc_stats"] = prev.get("doc_stats")
            continue
        delta = lww_reduce(fresh)
        expect_path = None
        expect_failed = 0
        if expectations and delta.num_rows:
            # ingest expectations (Delta-Live-Tables analog) gate each key's
            # EPOCH-WINNING version — evaluated post-LWW so the outcome is a
            # pure function of the input epoch (the block-level combiner may
            # drop superseded versions before flush, so per-raw-row checks
            # would depend on block boundaries).  Tombstones are engine
            # semantics, not payload rows: they bypass the rules.  A failing
            # winner is diverted whole (with a first-failing-rule ``reason``)
            # to the append-only expect/ audit chain and the key keeps its
            # previous committed state; failed lsns still advance the
            # watermark (epoch_lsn_hi above), so replays stay exactly-once.
            reason = pa.nulls(delta.num_rows, pa.string())
            not_delete = pc.not_equal(delta.column("op"), pa.scalar("delete"))
            for rule_name, pred in expectations.items():
                ok = pc.fill_null(pc.cast(pred(delta), pa.bool_()), False)
                fails_now = pc.and_(
                    pc.and_(pc.invert(ok), not_delete), pc.is_null(reason)
                )
                reason = pc.if_else(fails_now, pa.scalar(rule_name), reason)
            fail_mask = pc.is_valid(reason)
            expect_failed = int(pc.sum(fail_mask).as_py() or 0)
            if expect_failed:
                failed = delta.filter(fail_mask).append_column(
                    "reason", reason.filter(fail_mask)
                )
                expect_path = os.path.join(
                    _part_dir(expect_root, part), f"delta-{epoch:06d}.parquet"
                )
                _atomic_write(failed, expect_path)
                delta = delta.filter(pc.invert(fail_mask))
        metrics["expect_failed"] = expect_failed
        if fail_expectations and delta.num_rows:
            # expect_or_fail (DLT analog): ANY failing epoch-winning version
            # aborts the WHOLE epoch before its commit — evaluated post-LWW
            # and post-quarantine like the drop rules, tombstones bypass
            not_delete = pc.not_equal(delta.column("op"), pa.scalar("delete"))
            for rule_name, pred in fail_expectations.items():
                ok = pc.fill_null(pc.cast(pred(delta), pa.bool_()), False)
                bad = int(
                    pc.sum(pc.and_(pc.invert(ok), not_delete)).as_py() or 0
                )
                if bad:
                    raise ExpectationFailedError(
                        f"expect_or_fail rule {rule_name!r} rejected {bad} "
                        f"winning version(s) in partition {part} of epoch "
                        f"{epoch}; the epoch is aborted (nothing committed) "
                        "— fix the source or relax the rule, then re-run"
                    )
        wm = max(wm, epoch_lsn_hi)
        prev_ts = prev.get("ts_hi")
        ts_hi = int(pc.max(pc.cast(fresh.column("ts"), pa.int64())).as_py())
        if prev_ts is not None:
            ts_hi = max(prev_ts, ts_hi)
        # committed turn high-water: lets point lookups derive the exact
        # partition-pruning bound instead of trusting a caller guess
        turn_hi = int(pc.max(fresh.column("turn_idx")).as_py())
        prev_turn = prev.get("turn_hi")
        if prev_turn is not None:
            turn_hi = max(int(prev_turn), turn_hi)

        deltas = list(prev.get("deltas", []))
        base = prev.get("base")
        dl_base = prev.get("dl_base")
        dl_deltas = list(prev.get("dl_deltas", []))
        doc_stats = None
        rows_state = None
        rows_live = None
        # the epoch's change rows ALWAYS publish as a standalone file — the
        # consumable changefeed (manifest record-level ``changes`` list).
        # On non-compaction epochs it doubles as the pointer-chain delta; a
        # compaction epoch folds the delta into the base, so the feed costs
        # one extra small write there.  Vacuum retention is the horizon.
        cdf_path = os.path.join(_part_dir(out_dir, part), f"delta-{epoch:06d}.parquet")
        chain_len = len(deltas) + 1
        compacting = chain_len >= compact_every
        if compacting and compact_min_bytes_ratio is not None and base:
            # size-aware deferral (LSM/OPTIMIZE tradeoff): a partition whose
            # accumulated delta bytes are still tiny next to its base defers
            # the rewrite — a cold 1 GB partition must not re-copy itself
            # for a few KB of churn.  The 4x chain-length hard cap bounds
            # read amplification regardless.  Decision inputs are committed
            # chain files only, so a crash-replay reaches the identical
            # verdict.
            try:
                base_b = os.path.getsize(base)
                delta_b = sum(os.path.getsize(x) for x in deltas)
            except OSError:
                base_b, delta_b = 0, 0
            if (delta_b < compact_min_bytes_ratio * base_b
                    and chain_len < 4 * compact_every):
                compacting = False
        pre_path = None
        prev_state = None
        if (cdf_preimages or compacting) and (base or deltas):
            # one chain read serves both the preimage lookup and (on
            # compaction epochs) the base fold; the schema log maps old
            # files to LOGICAL names here, so every file written at THIS
            # epoch (compacted base, preimage sidecar) is logical-named —
            # the invariant the epoch-stamp read rule relies on
            prev_state = load_partition_state(
                {"base": base, "deltas": deltas}, schema_log=schema_log
            )
        if cdf_preimages and delta.num_rows and prev_state is not None:
            # Delta-CDF "full" mode: the previous committed LIVE version of
            # every key this epoch touches, written as a sidecar next to the
            # change file (manifest record-level ``preimages`` list).  The
            # preimage derives from COMMITTED state, so replays re-stage
            # identical bytes.  Cost: the chain read above per dirty
            # partition per epoch — the price of retraction-capable feeds;
            # opt-in (changefeed_preimages=True).
            live_prev = prev_state.filter(
                pc.not_equal(prev_state.column("op"), pa.scalar("delete"))
            )
            if live_prev.num_rows:
                pre = live_prev.join(
                    delta.select(["conv_id", "turn_idx"]),
                    keys=["conv_id", "turn_idx"],
                    join_type="left semi",
                )
                if pre.num_rows:
                    pre_path = os.path.join(
                        _part_dir(out_dir, part), f"pre-{epoch:06d}.parquet"
                    )
                    _atomic_write(pre, pre_path)
        if compacting:
            # amortized compaction: fold base+deltas+this delta into a base
            state = prev_state
            state = (
                delta if state is None else lww_reduce(_concat_unified([state, delta]))
            )
            base = os.path.join(_part_dir(out_dir, part), f"base-{epoch:06d}.parquet")
            _atomic_write(state, base)
            if index_root is not None:
                # mirrored chain: same file name under the index root, so the
                # index pointer map is a pure path transform of the main one
                _atomic_write(
                    project_index(state, index_columns or []),
                    os.path.join(_part_dir(index_root, part), f"base-{epoch:06d}.parquet"),
                )
            if postings_root is not None:
                # postings base from the compacted LIVE state: dead postings
                # from superseded versions age out with the compaction
                _atomic_write(
                    project_postings(state, postings_column or "text"),
                    os.path.join(_part_dir(postings_root, part), f"base-{epoch:06d}.parquet"),
                )
                # doclens sidecar compacts with it; state is already
                # LWW-reduced, so the corpus stats read straight off
                dltab = project_doclens(state, postings_column or "text")
                dl_base = os.path.join(
                    _part_dir(postings_root, part), f"dlbase-{epoch:06d}.parquet"
                )
                _atomic_write(dltab, dl_base)
                dl_deltas = []
                doc_stats = doc_stats_of(dltab)
            _atomic_write(delta, cdf_path)
            deltas = []
            rows_state = state.num_rows
            rows_live = int(
                pc.sum(pc.not_equal(state.column("op"), pa.scalar("delete"))).as_py()
                or 0
            )
        else:
            dpath = cdf_path
            _atomic_write(delta, dpath)
            if index_root is not None:
                _atomic_write(
                    project_index(delta, index_columns or []),
                    os.path.join(_part_dir(index_root, part), f"delta-{epoch:06d}.parquet"),
                )
            if postings_root is not None:
                _atomic_write(
                    project_postings(delta, postings_column or "text"),
                    os.path.join(_part_dir(postings_root, part), f"delta-{epoch:06d}.parquet"),
                )
                dlpath = os.path.join(
                    _part_dir(postings_root, part), f"dldelta-{epoch:06d}.parquet"
                )
                _atomic_write(
                    project_doclens(delta, postings_column or "text"), dlpath
                )
                dl_deltas.append(dlpath)
                # exact incremental corpus stats: LWW-fold the NARROW sidecar
                # chain (one row per key-version, no text) — O(partition key
                # versions since last compaction) per dirty partition, ~2% of
                # the bytes a main-chain fold would touch
                doc_stats = doc_stats_of(
                    load_partition_state({"base": dl_base, "deltas": dl_deltas})
                )
            deltas.append(dpath)

        metrics["rows_delta"] = delta.num_rows
        metrics["merge_flush_s"] = round(time.perf_counter() - t0, 4)
        bounds = None
        if stats_columns:
            if compacting:
                # recompute exact bounds from the folded state — this is
                # what re-tightens the zone map after deletes/updates (and
                # what FIRST establishes bounds for columns enabled after
                # the partition already held untracked history)
                bounds = column_bounds(state, list(stats_columns))
            else:
                prev_stats = prev.get("stats")
                new_b = column_bounds(delta, list(stats_columns))
                if prev.get("base") or prev.get("deltas"):
                    # the partition holds PRE-EXISTING rows: a column with
                    # no committed bounds (stats enabled mid-life, or newly
                    # added to the list) must stay UNKNOWN — claiming the
                    # delta's bounds as authoritative would prune matching
                    # old rows.  Absent keys persist (never pruned) until
                    # the next compaction recomputes from the full state.
                    known = set((prev_stats or {}).keys())
                    new_b = {c: b for c, b in new_b.items() if c in known}
                bounds = merge_bounds(prev_stats, new_b)
        out[part] = {
            "base": base,
            "deltas": deltas,
            "epoch": epoch,
            "rows_delta": delta.num_rows,
            "rows_state": rows_state,
            "rows_live": rows_live,
            "lsn_hi": wm,
            "ts_hi": ts_hi,
            "turn_hi": turn_hi,
            "late_delta": late_path,
            "expect_delta": expect_path,
            "cdf": cdf_path,
            "pre": pre_path,
            "metrics": metrics,
        }
        if stats_columns:
            out[part]["stats"] = bounds
        if postings_root is not None:
            out[part]["dl_base"] = dl_base
            out[part]["dl_deltas"] = dl_deltas
            out[part]["doc_stats"] = doc_stats
    return out


@ray.remote(max_restarts=0)
class PartitionMerger:
    """One merger owns a fixed set of partitions: their LSN watermarks, the
    current epoch's delta buffers, and the staging of delta/base files."""

    def __init__(
        self,
        out_dir: str,
        pointers: dict[int, dict],
        compact_every: int = 8,
        flush_fanout: int = 4,
        index_root: str | None = None,
        index_columns: list[str] | None = None,
        late_root: str | None = None,
        lateness_us: int | None = None,
        postings_root: str | None = None,
        postings_column: str | None = None,
        expect_root: str | None = None,
        expectations: dict | None = None,
        cdf_preimages: bool = False,
        schema_log: list | None = None,
        stats_columns: list | None = None,
        fail_expectations: dict | None = None,
        compact_min_bytes_ratio: float | None = None,
    ):
        self.out_dir = out_dir
        self.pointers = pointers  # part -> committed pointer
        self.compact_every = compact_every
        self.compact_min_bytes_ratio = compact_min_bytes_ratio
        self.flush_fanout = max(1, flush_fanout)
        self.index_root = index_root
        self.index_columns = index_columns
        self.late_root = late_root
        self.lateness_us = lateness_us
        self.postings_root = postings_root
        self.postings_column = postings_column
        self.expect_root = expect_root
        self.expectations = expectations
        self.cdf_preimages = cdf_preimages
        self.schema_log = list(schema_log or [])
        self.stats_columns = list(stats_columns) if stats_columns else None
        self.fail_expectations = fail_expectations
        self.watermark: dict[int, int] = {
            p: ptr["lsn_hi"] for p, ptr in pointers.items()
        }
        # payload buffers are keyed by epoch so concurrent pushes for
        # different epochs stay separable.  Actor task ordering guarantees
        # flush(e) runs before flush(e+1), keeping watermark updates
        # epoch-ordered.
        # Each entry is a zstd-IPC blob plus its (part, len) run boundaries —
        # decompression and slicing happen ONCE, batched, at flush (per-push
        # Arrow work on plasma-backed views costs ~10ms a call).
        self.payloads: dict[int, list[tuple]] = {}
        self.events_in: dict[tuple[int, int], int] = {}
        self._inflight: dict[int, list] = {}

    def apply_block(
        self, epoch: int, parts: list[int], lens: list[int], payload
    ) -> int:
        """Buffer one routed blob: the decompressed table is ordered so that
        the rows of ``parts[i]`` occupy the next ``lens[i]`` rows.  One actor
        call per (routing task, actor); nothing is decoded here."""
        self.payloads.setdefault(epoch, []).append((payload, parts, lens))
        for part, n in zip(parts, lens):
            if n:
                key = (epoch, part)
                self.events_in[key] = self.events_in.get(key, 0) + n
        return sum(lens)

    def flush(self, epoch: int) -> dict[int, dict]:
        """Per dirty partition: wm-filter + LWW-collapse the buffered delta,
        stage it as this epoch's delta file; every ``compact_every`` epochs
        fold base+deltas into a new base (amortized O(state)).

        The heavy work fans out to ``flush_fanout`` stateless Ray TASKS (one
        per partition group): the actor re-puts its compressed blobs to the
        object store once (cheap — blobs are zstd'd, many times smaller than
        the rows) and remains the single owner of watermarks and pointers, so
        the exactly-once bookkeeping is unchanged while the decompress + LWW
        + parquet-write leg uses every free cpu in the cluster instead of one
        core per actor.

        TWO-PHASE: this method only LAUNCHES the tasks (returns immediately,
        keeping the actor responsive — a blocking flush would queue every
        later apply_block behind its ray.get); ``flush_result`` collects."""
        items = self.payloads.pop(epoch, [])
        if not items:
            self._inflight[epoch] = []
            return True
        dirty = sorted(
            {p for _, parts, lens in items for p, n in zip(parts, lens) if n}
        )
        blob_refs = [ray.put(p) for p, _, _ in items]
        metas = [(parts, lens) for _, parts, lens in items]
        k = min(self.flush_fanout, len(dirty))
        self._inflight[epoch] = [
            _flush_partitions.remote(
                self.out_dir,
                epoch,
                group,
                blob_refs,
                metas,
                {p: self.watermark.get(p, -1) for p in group},
                {p: self.pointers[p] for p in group if p in self.pointers},
                self.compact_every,
                self.index_root,
                self.index_columns,
                self.late_root,
                self.lateness_us,
                self.postings_root,
                self.postings_column,
                self.expect_root,
                self.expectations,
                self.cdf_preimages,
                self.schema_log,
                self.stats_columns,
                self.fail_expectations,
                compact_min_bytes_ratio=self.compact_min_bytes_ratio,
            )
            for group in (dirty[i::k] for i in range(k))
        ]
        return True

    def flush_result(self, epoch: int) -> dict[int, dict]:
        """Second phase: collect the flush tasks' pointers and fold them into
        the actor's durable bookkeeping.  Called at COMMIT time — by then the
        tasks have had the whole next exchange to finish, so the ray.get here
        does not hold the actor hostage while pushes stream in (a blocking
        flush stalled every apply_block of the overlapped epoch)."""
        futs = self._inflight.pop(epoch, [])
        out: dict[int, dict] = {}
        for res in ray.get(futs):
            for part, ptr in res.items():
                # events_in counted at push time (includes rows the wm filter
                # later drops as cross-epoch replays)
                pushed = self.events_in.pop((epoch, part), None)
                if pushed is not None:
                    ptr["metrics"]["events_in"] = pushed
                    ptr["metrics"]["dup_lsn_dropped"] = (
                        pushed
                        - ptr["metrics"]["applied"]
                        - ptr["metrics"].get("quarantined_late", 0)
                    )
                self.watermark[part] = ptr["lsn_hi"]
                self.pointers[part] = {
                    k2: v for k2, v in ptr.items() if k2 != "metrics"
                }
                out[part] = ptr
        # clean partitions whose rows were all wm-dropped (no pointer update)
        for key in [key for key in self.events_in if key[0] == epoch]:
            del self.events_in[key]
        return out

    def ping(self) -> bool:
        return True
