"""Distributed triangle counting over an undirected graph.

Classic oriented-wedge algorithm (Cohen's MapReduce formulation / Suri &
Vassilvitskii "Counting Triangles and the Curse of the Last Reducer",
WWW'11), Ray-Data-first:

1. edges are oriented low-id → high-id, so every triangle ``a < b < c`` has
   exactly ONE wedge centre ``b`` (edges (a,b) and (b,c) both oriented) —
   each triangle is generated once, no post-division by 3;
2. wedge build: each edge plays two roles — "into m" (key v, payload u) and
   "out of m" (key u, payload v); one hash exchange on m, then a vectorized
   per-centre cross product (numpy repeat/tile over segment boundaries);
3. closure check: wedge (a,c) partials (pre-counted per block) union the
   edge set, one exchange on (a,c), and each bucket emits a single count of
   wedges whose endpoints are also an edge.

Three bucketed exchanges total; nothing quadratic in the graph crosses the
wire except the wedges themselves, which ARE the algorithm's output-sized
intermediate.  Skew contract (the paper's "last reducer"): a centre of
degree d emits d_in × d_out wedges inside one task — for power-law graphs
cap or split hot centres upstream (same remedy as candidate_pairs_bulk's
``max_bucket`` star trick).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply


def _run_bounds(keys: np.ndarray) -> np.ndarray:
    n = len(keys)
    if n == 0:
        return np.array([0], dtype=np.int64)
    return np.concatenate(
        ([0], np.flatnonzero(np.diff(keys) != 0) + 1, [n])
    ).astype(np.int64)


def pairs_within_groups(t: pa.Table, key_col: str, id_col: str) -> pa.Table:
    """Distinct unordered id pairs (u < v) sharing a group key.

    Fully vectorized: after one (key, id) sort + first-occurrence dedup,
    the pairs of every group are exactly the index-distance-d pairs of the
    sorted array whose keys match — so the only Python loop is over d = 1..
    max(group size)-1 (for order→part co-occurrence that is ≤ 6; the
    per-GROUP loop this replaced cost 4x the whole stage at sf0.1).  Since
    ids are ascending within a run, u < v falls out for free.  Quadratic in
    group size by nature — cap hot groups upstream for power-law keys."""
    keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
    ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    n = len(keys)
    if n:
        keep = np.ones(n, dtype=bool)
        keep[1:] = (keys[1:] != keys[:-1]) | (ids[1:] != ids[:-1])
        keys, ids = keys[keep], ids[keep]
    out_u, out_v = [], []
    d = 1
    while d < len(keys):
        mask = keys[d:] == keys[:-d]
        if not mask.any():
            break
        out_u.append(ids[:-d][mask])
        out_v.append(ids[d:][mask])
        d += 1
    if not out_u:
        return pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )
    return pa.table(
        {"u": pa.array(np.concatenate(out_u)), "v": pa.array(np.concatenate(out_v))}
    )


def group_pair_edges(ds, key_col: str, id_col: str, num_buckets=None):
    """Distinct co-occurrence edges (u < v appear under the same key): one
    exchange on the key, per-bucket run-scan pair generation, then one
    exchange on (u, v) to dedupe pairs that co-occur under many keys."""

    def gen(t: pa.Table) -> pa.Table:
        return pairs_within_groups(t, key_col, id_col)

    raw = bucketed_groupby_apply(ds, [key_col], gen, num_buckets)

    def distinct(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["u", "v"]).aggregate([("u", "count")]).select(["u", "v"])
        )

    local = raw.map_batches(
        distinct, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_groupby_apply(local, ["u", "v"], distinct, num_buckets)


def _edge_composite(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Pack an edge (u, v) into one uint64 — requires ids < 2^32."""
    return (u.astype(np.uint64) << np.uint64(32)) | v.astype(np.uint64)


def triangle_count(
    edges, num_buckets: int | None = 64, broadcast_max_edges: int = 50_000_000
) -> int:
    """Count triangles in a DISTINCT low→high oriented edge Dataset
    (columns u < v).  Returns the exact count (a scalar — the caller wraps
    it; everything up to the final per-bucket counts is distributed).

    Closure strategy: when the edge set fits a broadcast
    (≤ ``broadcast_max_edges`` rows AND ids < 2^32), the sorted uint64
    edge-composite array ships via ``ray.put`` ONCE and every wedge task
    closes its own wedges with a vectorized ``searchsorted`` — the O(Σ
    d_in·d_out) wedge intermediate never crosses the wire (measured at
    sf0.1: 49 M wedges, exchange path 28 s → broadcast path, only 2·|E|
    role rows ever shuffle).  Past the bound it falls back to the
    exchange-based closure (wedge partials co-hashed with the edge set) —
    the same small-side-broadcast-else-cohash discipline as
    stages/joins.py."""
    import ray

    edge_comp = None
    if edges.count() <= broadcast_max_edges:
        parts = [
            b
            for b in edges.iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        ]
        tab = pa.concat_tables(parts) if parts else None
        if tab is not None and tab.num_rows:
            u = tab.column("u").to_numpy(zero_copy_only=False)
            v = tab.column("v").to_numpy(zero_copy_only=False)
            if u.max() < 2**32 and v.max() < 2**32 and u.min() >= 0 and v.min() >= 0:
                comp = np.sort(_edge_composite(u, v))
                edge_comp = ray.put(comp)
        else:
            return 0
    if edge_comp is not None:
        return _triangle_count_broadcast(edges, edge_comp, num_buckets)
    return _triangle_count_exchange(edges, num_buckets)


def _gen_wedges(t: pa.Table):
    """Per-centre cross products from role-tagged rows; yields (a, c) numpy
    pairs per centre run (Python loop only over CENTRES with both roles)."""
    m = t.column("m").combine_chunks().to_numpy(zero_copy_only=False)
    other = t.column("other").combine_chunks().to_numpy(zero_copy_only=False)
    role = t.column("role").combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((role, m))
    m, other, role = m[order], other[order], role[order]
    bounds = _run_bounds(m)
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        r = role[lo:hi]
        split = lo + int(np.searchsorted(r, 1))
        a = other[lo:split]  # edges (a, m)
        c = other[split:hi]  # edges (m, c)
        if len(a) and len(c):
            yield np.repeat(a, len(c)), np.tile(c, len(a))


def _triangle_count_broadcast(edges, edge_comp_ref, num_buckets) -> int:
    """One exchange (role rows on the centre id); each bucket generates its
    wedges and closes them against the broadcast sorted edge composites."""
    import ray

    tagged = _role_tagged(edges)

    def close_bucket(t: pa.Table) -> pa.Table:
        comp = ray.get(edge_comp_ref)
        packed = [_edge_composite(a, c) for a, c in _gen_wedges(t)]
        if not packed:
            return pa.table({"n": pa.array([0], pa.int64())})
        w = np.concatenate(packed)  # one searchsorted per BUCKET, not centre
        pos = np.searchsorted(comp, w)
        pos[pos >= len(comp)] = 0
        total = int((comp[pos] == w).sum())
        return pa.table({"n": pa.array([total], pa.int64())})

    partials = bucketed_groupby_apply(tagged, ["m"], close_bucket, num_buckets)
    return int(partials.sum("n") or 0)


def _role_tagged(edges):
    def roles(t: pa.Table) -> pa.Table:
        u = t.column("u")
        v = t.column("v")
        m = pa.chunked_array([v.combine_chunks(), u.combine_chunks()])
        other = pa.chunked_array([u.combine_chunks(), v.combine_chunks()])
        role = pa.array(
            np.repeat(np.array([0, 1], np.int8), [t.num_rows, t.num_rows])
        )
        return pa.table({"m": m, "other": other, "role": role})

    return edges.map_batches(
        roles, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _triangle_count_exchange(edges, num_buckets: int | None = 64) -> int:
    """Exchange-based closure (the >broadcast-bound path): wedge (u,v)
    partials co-hashed with the edge set, membership checked per bucket."""

    tagged = _role_tagged(edges)

    def wedges(t: pa.Table) -> pa.Table:
        out_a, out_c = [], []
        for a_rep, c_tile in _gen_wedges(t):
            out_a.append(a_rep)
            out_c.append(c_tile)
        if not out_a:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "wedge_n": pa.array([], pa.int64())}
            )
        w = (
            pa.table(
                {"u": pa.array(np.concatenate(out_a)),
                 "v": pa.array(np.concatenate(out_c))}
            )
            .group_by(["u", "v"])
            .aggregate([("v", "count")])
        )
        return w.rename_columns(["u", "v", "wedge_n"])

    wedge_counts = bucketed_groupby_apply(tagged, ["m"], wedges, num_buckets)

    def as_edge_flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {"u": t.column("u"), "v": t.column("v"),
             "wedge_n": pa.array(np.zeros(t.num_rows, np.int64)),
             "is_edge": pa.array(np.ones(t.num_rows, np.int64))}
        )

    def as_wedge_flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_edge", pa.array(np.zeros(t.num_rows, np.int64))
        )

    unioned = wedge_counts.map_batches(
        as_wedge_flag, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).union(
        edges.map_batches(
            as_edge_flag, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )

    def closing(t: pa.Table) -> pa.Table:
        g = t.group_by(["u", "v"]).aggregate(
            [("wedge_n", "sum"), ("is_edge", "max")]
        )
        wn = g.column("wedge_n_sum").to_numpy(zero_copy_only=False)
        ie = g.column("is_edge_max").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((wn * ie).sum())], pa.int64())})

    partials = bucketed_groupby_apply(unioned, ["u", "v"], closing, num_buckets)
    return int(partials.sum("n") or 0)
