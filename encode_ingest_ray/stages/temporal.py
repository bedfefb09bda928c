"""Temporal join operators: keyed as-of join and interval (range) join.

Neither exists in Ray Data's Dataset API; both are expressed as the repo's
standard one-exchange shape (tag → union → single hash exchange → vectorized
per-bucket kernel) per the custom-operator guidance in SURVEY.md §2.4/§2.8.

* ``asof_join_bucketed`` — for each left row, the single right row with the
  same key and the greatest right-timestamp ≤ the left timestamp (backward
  as-of; ties on the right timestamp resolved by max tiebreak column).  The
  reference has no as-of operator — its closest shape is the LWW
  latest-wins pick (SURVEY.md §2.9 J13); this is the join-form
  generalization a transcript CDC engine needs (e.g. "state of the user's
  config at the time of each turn").  Partitioning assumption: all rows of
  one key fit in one bucket task (standard keyed-join assumption; size
  ``num_buckets`` accordingly — skewed keys need salting upstream).

* ``interval_count_join`` — non-equi containment join ``point.ts ∈
  [iv.start, iv.start+len)`` aggregated to a per-interval count, via
  time-bin co-partitioning: points land in exactly one bin of width
  ``bin_us``, intervals replicate to every bin they overlap (≤ len/bin + 1
  replicas), so each (point, interval) match is witnessed in exactly one
  bin and counting is a clamped ``np.searchsorted`` over the bin's sorted
  point timestamps — no pair materialization ever.  Partitioning
  assumption: one bin's points fit in a task; bin width defaults to the
  interval length (2 replicas max) and can be shrunk independently for
  point-dense streams.

Both kernels run on int64 views (timestamps cast to epoch-micros), so the
hot path is pandas ``merge_asof`` / numpy ``searchsorted`` C code — no
Python rows, no datetime unit conversions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import (
    bucketed_sum_combine,
    dynamic_num_buckets,
)
from encode_ingest_ray.stages.joins import _hash_bucket_column, _tag


def _i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """int64 numpy view of an int/timestamp column (epoch-micros for ts)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def asof_join_bucketed(
    left,
    right,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str,
    right_cols: list[str],
    num_buckets: int | None = None,
):
    """Backward as-of join (inner): each left row picks the right row with
    ``right_key == key`` maximizing ``(right_ts, tiebreak)`` subject to
    ``right_ts <= left_ts``; left rows with no qualifying right row drop.

    One tagged-union hash exchange on the key; per bucket the match is
    ``pandas.merge_asof`` over int64 views — right sorted by
    ``(ts, tiebreak)`` so the last row among equal timestamps (the
    merge_asof winner) is the max-tiebreak one, exactly
    ``ORDER BY ts DESC, tiebreak DESC LIMIT 1``.
    """
    if num_buckets is None:
        num_buckets = max(dynamic_num_buckets(left), dynamic_num_buckets(right))

    left_schema = left.schema().base_schema
    left_names = list(left_schema.names)
    right_schema = right.schema().base_schema
    keep_right = [right_key, right_ts, tiebreak] + [
        c for c in right_cols if c not in (right_key, right_ts, tiebreak)
    ]
    unified = pa.schema(
        list(left_schema)
        + [
            pa.field(f"__r_{n}", right_schema.field(n).type)
            for n in keep_right
        ]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def _prep(batch: pa.Table, side: int, k: str) -> pa.Table:
        batch = _tag(_hash_bucket_column(batch, k, num_buckets), side)
        if side == 1:
            batch = batch.rename_columns(
                [f"__r_{c}" if not c.startswith("__") else c for c in batch.column_names]
            )
        cols = []
        for f in unified:
            if f.name in batch.column_names:
                cols.append(batch.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=unified)

    lt = left.map_batches(
        lambda t: _prep(t, 0, key),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    rt = right.select_columns(keep_right).map_batches(
        lambda t: _prep(t, 1, right_key),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    out_fields = [left_schema.field(n) for n in left_names] + [
        pa.field(c, right_schema.field(c).type)
        for c in right_cols
        if c not in left_names
    ]
    out_schema = pa.schema(out_fields)

    def _asof_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("__side"), 0)
        l = group.filter(mask)
        r = group.filter(pc.invert(mask))
        if l.num_rows == 0 or r.num_rows == 0:
            return out_schema.empty_table()
        lkc = l.column(key).combine_chunks()
        rkc = r.column(f"__r_{right_key}").combine_chunks()
        if pa.types.is_integer(lkc.type):
            lk, rk = _i64(lkc), _i64(rkc)
        else:
            # generic keys (conv_id strings etc.): dense-encode over the
            # bucket's combined key domain — equality is all merge_asof needs
            codes = pa.concat_arrays([lkc, rkc]).dictionary_encode()
            both_codes = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            lk, rk = both_codes[: len(lkc)], both_codes[len(lkc):]
        lts = _i64(l.column(left_ts))
        rts = _i64(r.column(f"__r_{right_ts}"))
        rtb = _i64(r.column(f"__r_{tiebreak}"))
        lorder = np.argsort(lts, kind="stable")
        rorder = np.lexsort((rtb, rts))
        ldf = pd.DataFrame(
            {"__ts": lts[lorder], "__k": lk[lorder], "__li": lorder}
        )
        rdf = pd.DataFrame(
            {"__ts": rts[rorder], "__k": rk[rorder],
             "__ri": rorder.astype(np.int64)}
        )
        m = pd.merge_asof(ldf, rdf, on="__ts", by="__k")
        hit = m["__ri"].notna().to_numpy()
        li = pa.array(m["__li"].to_numpy()[hit])
        ri = pa.array(m["__ri"].to_numpy()[hit].astype(np.int64))
        cols = [pc.take(l.column(n), li) for n in left_names]
        for f in out_fields[len(left_names):]:
            cols.append(pc.take(r.column(f"__r_{f.name}"), ri))
        return pa.Table.from_arrays(cols, schema=out_schema)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(_asof_bucket, batch_format="pyarrow")


def interval_count_join(
    points,
    intervals,
    point_ts: str,
    iv_id: str,
    iv_start: str,
    length_us: int,
    out_count: str = "n_in_window",
    bin_us: int | None = None,
    num_buckets: int | None = None,
):
    """Per-interval count of points with ``ts ∈ [start, start+length)`` —
    a pure range (containment) join with no equi key, aggregated without
    materializing matched pairs.

    Points are assigned to one time bin ``ts // bin_us``; each interval is
    replicated to every bin its window overlaps.  Bins co-locate through one
    hash exchange; per bucket the partial count is a pair of clamped
    ``searchsorted`` probes against that bin's sorted point timestamps (the
    clamp keeps each match witnessed exactly once even when two of an
    interval's bins hash to the same bucket).  Replica partials then combine
    with one tiny keyed sum.  Intervals with zero matching points drop
    (inner semantics).
    """
    if bin_us is None:
        bin_us = length_us
    if num_buckets is None:
        num_buckets = max(dynamic_num_buckets(points), dynamic_num_buckets(intervals))

    iv_schema = intervals.schema().base_schema
    id_type = iv_schema.field(iv_id).type
    unified = pa.schema(
        [
            pa.field("__ts", pa.int64()),       # points only
            pa.field("__id", id_type),          # intervals only
            pa.field("__start", pa.int64()),    # intervals only
            pa.field("__bin", pa.int64()),
            pa.field("__side", pa.int8()),
        ]
    )

    def _prep_points(batch: pa.Table) -> pa.Table:
        ts = _i64(batch.column(point_ts))
        n = len(ts)
        return pa.Table.from_arrays(
            [
                pa.array(ts),
                pa.nulls(n, id_type),
                pa.nulls(n, pa.int64()),
                pa.array(ts // bin_us),
                pa.array(np.zeros(n, np.int8)),
            ],
            schema=unified,
        )

    def _prep_intervals(batch: pa.Table) -> pa.Table:
        start = _i64(batch.column(iv_start))
        first = start // bin_us
        last = (start + length_us - 1) // bin_us  # inclusive end-bin of [start, start+len)
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(start)), reps)
        # bin of each replica: first[i], first[i]+1, ... — offset within run
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        bins = first[idx] + offs
        ids = pc.take(batch.column(iv_id).combine_chunks(), pa.array(idx))
        n = len(idx)
        return pa.Table.from_arrays(
            [
                pa.nulls(n, pa.int64()),
                ids,
                pa.array(start[idx]),
                pa.array(bins),
                pa.array(np.ones(n, np.int8)),
            ],
            schema=unified,
        )

    pt = points.map_batches(
        _prep_points, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    it = intervals.map_batches(
        _prep_intervals, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    both = pt.union(it).map_batches(
        lambda t: _hash_bucket_column(t, "__bin", num_buckets),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    partial_schema = pa.schema([pa.field(iv_id, id_type), pa.field(out_count, pa.int64())])

    def _count_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group.column("__side"), 0)
        p = group.filter(mask)
        iv = group.filter(pc.invert(mask))
        if p.num_rows == 0 or iv.num_rows == 0:
            return partial_schema.empty_table()
        pts = np.sort(_i64(p.column("__ts")))
        start = _i64(iv.column("__start"))
        ibin = _i64(iv.column("__bin"))
        # clamp each replica's probe window to its own bin: bin = ts//bin_us
        # is monotone in ts, so the globally ts-sorted point array IS
        # bin-major, and a clamped range never crosses into another bin —
        # two plain vectorized searchsorted probes count exactly the
        # replica's own-bin matches (each match witnessed once)
        lo_ts = np.maximum(start, ibin * bin_us)
        hi_ts = np.minimum(start + length_us, (ibin + 1) * bin_us)
        cnt = np.searchsorted(pts, hi_ts, side="left") - np.searchsorted(
            pts, lo_ts, side="left"
        )
        keep = cnt > 0
        if not keep.any():
            return partial_schema.empty_table()
        ids = iv.column("__id").filter(pa.array(keep))
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
             pa.array(cnt[keep])],
            schema=partial_schema,
        )

    partials = both.groupby("__bucket").map_groups(
        _count_bucket, batch_format="pyarrow"
    )
    return bucketed_sum_combine(partials, [iv_id], [out_count])


_DAY_US = 86_400_000_000


def gap_fill_daily_bucket(
    t: pa.Table,
    key: str = "user_id",
    ts: str = "ts_us",
    id_col: str = "event_id",
    label: str = "event_type",
) -> pa.Table:
    """Per-bucket kernel for the daily resample + forward-fill operator: for
    every key, emit one row per calendar day from its first to its last
    event day — ``n_events`` that day (0 on gap days) and ``last_type``, the
    label of the latest event at or before the day's end ((ts, id)
    tie-broken).  The time-series gap-fill / LOCF-imputation shape: the
    dense grid is GENERATED (np.repeat + arange), counts and carry-forward
    indices come from two ``searchsorted`` probes over the sorted events —
    no per-key loop, no row ever crosses another bucket (each key's whole
    series is co-hashed here by construction)."""
    if t.num_rows == 0:
        return pa.table(
            {
                key: pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "last_type": pa.array([], pa.string()),
            }
        )
    eid = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
    uid = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    tus = t.column(ts).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, tus, uid))
    u, s = uid[order], tus[order]
    day = s // _DAY_US
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    ends = np.r_[starts[1:], len(u)]
    lo, hi = day[starts], day[ends - 1]
    span = (hi - lo + 1).astype(np.int64)
    # dense (key, day) grid, one row per key-day
    grid_key = np.repeat(u[starts], span)
    base = np.repeat(lo, span)
    offs = np.arange(span.sum(), dtype=np.int64) - np.repeat(
        np.r_[0, np.cumsum(span)[:-1]], span
    )
    grid_day = base + offs
    # encode (key, day) pairs on one axis so a single searchsorted serves
    # every key: day < 2^20 (epoch-days reach 2^20 in year 4840), leaving
    # keys 43 bits before int64 overflow — both bounds enforced, not assumed
    if len(day) and (int(day.max()) >= (1 << 20) or int(day.min()) < 0):
        raise ValueError("gap_fill: day out of the 20-bit encode domain")
    if int(u.max()) >= (1 << 43) or int(u.min()) < 0:
        raise ValueError("gap_fill: key out of the 43-bit encode domain")
    enc_ev = u * (1 << 20) + day
    enc_grid = grid_key * (1 << 20) + grid_day
    right = np.searchsorted(enc_ev, enc_grid, side="right")
    left = np.searchsorted(enc_ev, enc_grid, side="left")
    n_events = (right - left).astype(np.int64)
    # carry-forward: latest event at-or-before day end; grid starts at each
    # key's first event day, so right >= 1 within the key — never underflows
    # into the previous key
    labels = t.column(label).combine_chunks().take(pa.array(order, pa.int64()))
    last_type = labels.take(pa.array(right - 1, pa.int64()))
    return pa.table(
        {
            key: pa.array(grid_key, pa.int64()),
            "day": pa.array(grid_day, pa.int64()),
            "n_events": pa.array(n_events),
            "last_type": last_type,
        }
    )


def last_touch_bucket(
    t: pa.Table,
    touch_types: tuple[str, ...] = ("click", "view"),
    target_type: str = "purchase",
    window_us: int = 30 * 60 * 1_000_000,
    key: str = "user_id",
    ts: str = "ts_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> pa.Table:
    """Per-bucket last-touch attribution: each ``target_type`` event is
    attributed to the nearest strictly-preceding (stream order: (ts, id))
    event of a ``touch_types`` type by the same key within ``window_us``.
    One ``np.maximum.accumulate`` over touch positions in the sorted bucket
    — the cross-key guard is positional (a carried index from another key
    fails the ``key[idx] == key[i]`` check because the sort groups keys)."""
    eid = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
    uid = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    tus = t.column(ts).combine_chunks().to_numpy(zero_copy_only=False)
    et = t.column(type_col).combine_chunks()
    order = np.lexsort((eid, tus, uid))
    u, s, e = uid[order], tus[order], eid[order]
    types = et.take(pa.array(order, pa.int64()))
    is_touch = pc.is_in(types, value_set=pa.array(touch_types)).to_numpy(
        zero_copy_only=False
    )
    is_target = pc.equal(types, target_type).to_numpy(zero_copy_only=False)
    n = len(u)
    pos = np.arange(n, dtype=np.int64)
    touch_pos = np.where(is_touch, pos, -1)
    # exclusive accumulate: shift so a target never attributes to itself
    carried = np.maximum.accumulate(touch_pos)
    prev = np.empty(n, np.int64)
    prev[0] = -1
    prev[1:] = carried[:-1]
    ti = np.flatnonzero(is_target)
    cand = prev[ti]
    ok = cand >= 0
    ok &= np.where(ok, u[np.maximum(cand, 0)] == u[ti], False)
    ok &= np.where(ok, s[ti] - s[np.maximum(cand, 0)] <= window_us, False)
    ti, cand = ti[ok], cand[ok]
    return pa.table(
        {
            "purchase_id": pa.array(e[ti]),
            key: pa.array(u[ti]),
            "touch_id": pa.array(e[cand]),
            "touch_type": types.take(pa.array(cand, pa.int64())),
        }
    )


def debounce_bucket(
    t: pa.Table,
    window_us: int,
    keys: tuple[str, str] = ("user_id", "event_type"),
    ts: str = "ts_us",
    id_col: str = "event_id",
) -> pa.Table:
    """Per-bucket debounce/throttle: within each key, keep an event iff its
    timestamp is more than ``window_us`` after the last KEPT event (first
    event always kept; ties ordered by (ts, id)).  The kept set is a greedy
    chain — inherently sequential per key (each decision depends on the
    previous KEPT row, which no lag/session window expresses), so the
    kernel walks kept events with ``searchsorted`` jumps: O(kept · log n)
    per key, keys independent and parallel across buckets.  This is the
    stateful stream-selection op (throttle, notification rate-limit,
    alarm-suppression) the brief's "stateful streaming" custom-operator
    class calls for."""
    if t.num_rows == 0:
        return t
    k1 = t.column(keys[0]).combine_chunks().to_numpy(zero_copy_only=False)
    k2d = t.column(keys[1]).combine_chunks().dictionary_encode()
    k2 = k2d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tus = t.column(ts).combine_chunks().to_numpy(zero_copy_only=False)
    eid = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, tus, k2, k1))
    u1, u2, s = k1[order], k2[order], tus[order]
    n = len(s)
    runs = np.flatnonzero(np.r_[True, (u1[1:] != u1[:-1]) | (u2[1:] != u2[:-1])])
    bounds = np.r_[runs, n]
    keep = np.zeros(n, bool)
    for ri in range(len(runs)):
        lo, hi = int(bounds[ri]), int(bounds[ri + 1])
        i = lo
        seg = s[lo:hi]
        while i < hi:
            keep[i] = True
            # first strictly-later-than-window event in this key's segment
            i = lo + int(np.searchsorted(seg, s[i] + window_us, side="right"))
    sel = pa.array(order[keep], pa.int64())
    return pa.table(
        {
            keys[0]: t.column(keys[0]).combine_chunks().take(sel),
            keys[1]: t.column(keys[1]).combine_chunks().take(sel),
            ts: t.column(ts).combine_chunks().take(sel),
            id_col: t.column(id_col).combine_chunks().take(sel),
        }
    )
