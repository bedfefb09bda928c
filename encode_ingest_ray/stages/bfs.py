"""Distributed BFS shortest-path hop labels over an edge Dataset.

The graph-TRAVERSAL member of the iterative-operator family (beside
stages/pagerank.py's numeric fixed point and stages/components.py's label
propagation): from one source node, label every node reachable within K
rounds with its minimum hop count.  Bit-exact, so the registered query
carries a DuckDB ``WITH RECURSIVE`` oracle (the near_dup_clusters
precedent) — ``UNION`` dedups (id, hop) pairs and the hop bound terminates
the recursion.

Scale shape, per round:

* the frontier (nodes first reached last round) probes the materialized
  edge set.  Small frontiers — the common case; a frontier is at most one
  BFS level — are broadcast (``ray.put`` of a sorted id array, read once
  per task, ``searchsorted`` membership per block), so the probe is ONE
  edge scan with NO exchange.  A frontier past ``broadcast_limit`` falls
  back to the co-hashed join (one edges+frontier exchange) — same trade,
  same guard, as stages/bloomjoin.py's build side.
* per-block candidate dedup (``np.unique``) shrinks the probe output, then
  ONE hash exchange min-merges ``union(state, candidates@hop k)`` — the
  only all-to-all of the round, carrying (id, hop) pairs only, never edges.
* state is repartitioned to a constant block count and materialized every
  round: it is consumed twice per round (next frontier + next merge), and
  lazy lineage would re-execute round 1 exponentially (the documented
  iterative-op trap).

Assumption (per the custom-operator guidance): edges are fed pre-oriented
— for an undirected traversal pass both directions, as the co-purchase
query does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
from encode_ingest_ray.stages.joins import cohash_join


def _min_hop(t: pa.Table) -> pa.Table:
    g = t.group_by(["id"]).aggregate([("hop", "min")])
    return pa.table(
        {"id": g.column("id"), "hop": pc.cast(g.column("hop_min"), pa.int64())}
    )


def bfs_hops(
    edges,
    source: int,
    rounds: int,
    num_buckets: int | None = None,
    broadcast_limit: int = 5_000_000,
):
    """Label every node within ``rounds`` hops of ``source`` with its
    minimum hop count.  ``edges`` has columns ``src:int64, dst:int64``.
    Returns a Dataset of ``(id:int64, hop:int64)`` including the source at
    hop 0.
    """
    edges = edges.materialize()
    if num_buckets is None:
        num_buckets = int(max(2, min(1024, edges.count() // 250_000 + 1)))

    state = ray.data.from_arrow(
        pa.table({"id": pa.array([source], pa.int64()),
                  "hop": pa.array([0], pa.int64())})
    ).materialize()
    frontier = state  # (id, hop) rows first reached last round

    for k in range(1, rounds + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_limit:
            # empty bucket blocks carry a degenerate schema — skip them
            tabs = [t for t in ray.get(frontier.to_arrow_refs()) if t.num_rows]
            ids = np.sort(
                np.concatenate(
                    [
                        t.column("id").combine_chunks().to_numpy(
                            zero_copy_only=False
                        )
                        for t in tabs
                    ]
                )
            )
            ids_ref = ray.put(ids)

            def probe(t: pa.Table, _ids_ref=ids_ref) -> pa.Table:
                f = ray.get(_ids_ref)
                src = t.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                pos = np.searchsorted(f, src)
                pos[pos == len(f)] = 0
                hit = f[pos] == src
                dst = t.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False
                )[hit]
                return pa.table({"id": pa.array(np.unique(dst), pa.int64())})

            cand = edges.map_batches(
                probe,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        else:
            cand = cohash_join(
                edges,
                frontier,
                "src",
                "id",
                num_buckets=num_buckets,
                map_joined=lambda j: pa.table(
                    {
                        "id": pc.unique(
                            j.column("dst").combine_chunks()
                        ).cast(pa.int64())
                    }
                ),
            )
        cand = cand.map_batches(
            lambda t, _k=k: t.append_column(
                "hop", pa.array(np.full(t.num_rows, _k, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        # checkpoint: state is consumed twice (frontier filter + next merge),
        # and the bucketed apply re-emits a constant num_buckets blocks, so
        # block count does not compound across rounds
        state = bucketed_groupby_apply(
            state.union(cand), ["id"], _min_hop, num_buckets
        ).materialize()

        def hop_eq(t: pa.Table, _k=k) -> pa.Table:
            return t.filter(pc.equal(t.column("hop"), _k))

        frontier = state.map_batches(
            hop_eq, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()

    return state


def _min_dist(t: pa.Table) -> pa.Table:
    """Per-bucket min-merge of (id, dist, fresh) rows: the surviving row's
    ``fresh`` flag says whether a CANDIDATE (fresh=1) strictly beat the held
    state (fresh=0 rows), i.e. whether the node belongs to the next
    frontier.  One vectorized group_by: min dist, then min fresh among rows
    AT the min dist — a held row at the same dist wins (no re-relaxation,
    matching Bellman-Ford's 'strictly improved' frontier rule)."""
    ids = t.column("id").combine_chunks().to_numpy(zero_copy_only=False)
    dist = t.column("dist").combine_chunks().to_numpy(zero_copy_only=False)
    fresh = t.column("fresh").combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((fresh, dist, ids))
    ids, dist, fresh = ids[order], dist[order], fresh[order]
    if len(ids) == 0:
        return pa.table(
            {
                "id": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
                "fresh": pa.array([], pa.int64()),
            }
        )
    first = np.ones(len(ids), bool)
    first[1:] = ids[1:] != ids[:-1]
    return pa.table(
        {
            "id": pa.array(ids[first]),
            "dist": pa.array(dist[first]),
            "fresh": pa.array(fresh[first]),
        }
    )


def sssp_dists(
    edges,
    source: int,
    rounds: int,
    num_buckets: int | None = None,
    broadcast_limit: int = 5_000_000,
):
    """Weighted single-source shortest paths, Bellman-Ford supersteps:
    after round k every labeled node holds the exact minimum-weight
    distance over paths of <= k edges — bit-equal to an unrolled
    min-merge CTE chain, so the registered query oracles exactly.

    ``edges``: columns ``src:int64, dst:int64, w:int64`` (non-negative
    integer weights).  Returns ``(id:int64, dist:int64)``.

    Same scale shape as :func:`bfs_hops` (broadcast-frontier probe, one
    (id, dist) min-merge exchange per round, per-round materialize against
    the lineage-blowup trap); the delta-relaxation frontier — only nodes
    whose distance STRICTLY improved relax next round — preserves the
    per-round d_k exactly, because a non-improved node's outgoing
    candidates were already generated the round it last improved and the
    merge keeps minima.
    """
    edges = edges.materialize()
    if num_buckets is None:
        num_buckets = int(max(2, min(1024, edges.count() // 250_000 + 1)))

    init = pa.table(
        {
            "id": pa.array([source], pa.int64()),
            "dist": pa.array([0], pa.int64()),
            "fresh": pa.array([0], pa.int64()),
        }
    )
    state = ray.data.from_arrow(init).materialize()
    frontier = state  # (id, dist) rows that improved last round

    for _ in range(rounds):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_limit:
            tabs = [t for t in ray.get(frontier.to_arrow_refs()) if t.num_rows]
            fid = np.concatenate(
                [
                    t.column("id").combine_chunks().to_numpy(zero_copy_only=False)
                    for t in tabs
                ]
            )
            fdist = np.concatenate(
                [
                    t.column("dist").combine_chunks().to_numpy(zero_copy_only=False)
                    for t in tabs
                ]
            )
            o = np.argsort(fid)
            ref = ray.put((fid[o], fdist[o]))

            def probe(t: pa.Table, _ref=ref) -> pa.Table:
                fid, fdist = ray.get(_ref)
                src = t.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                pos = np.searchsorted(fid, src)
                pos[pos == len(fid)] = 0
                hit = fid[pos] == src
                dst = t.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False
                )[hit]
                w = t.column("w").combine_chunks().to_numpy(
                    zero_copy_only=False
                )[hit]
                cand = fdist[pos[hit]] + w
                # per-block combiner: keep one (min) candidate per dst
                order = np.lexsort((cand, dst))
                dst, cand = dst[order], cand[order]
                first = np.ones(len(dst), bool)
                first[1:] = dst[1:] != dst[:-1]
                return pa.table(
                    {
                        "id": pa.array(dst[first].astype(np.int64)),
                        "dist": pa.array(cand[first].astype(np.int64)),
                    }
                )

            cand = edges.map_batches(
                probe,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        else:
            def relax(j: pa.Table) -> pa.Table:
                c = pc.add(j.column("dist"), j.column("w"))
                g = pa.table(
                    {"id": j.column("dst"), "dist": c}
                ).group_by(["id"]).aggregate([("dist", "min")])
                return pa.table(
                    {
                        "id": g.column("id"),
                        "dist": pc.cast(g.column("dist_min"), pa.int64()),
                    }
                )

            cand = cohash_join(
                edges,
                frontier.select_columns(["id", "dist"]),
                "src",
                "id",
                num_buckets=num_buckets,
                map_joined=relax,
            )
        cand = cand.map_batches(
            lambda t: t.append_column(
                "fresh", pa.array(np.ones(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        def demote(t: pa.Table) -> pa.Table:
            # state rows re-enter the next merge as held rows; lazy on top
            # of the materialized merge output (single consumer, no re-exec)
            return t.set_column(
                t.schema.get_field_index("fresh"),
                "fresh",
                pa.array(np.zeros(t.num_rows, np.int64)),
            )

        merged = bucketed_groupby_apply(
            state.union(cand), ["id"], _min_dist, num_buckets
        ).materialize()

        def is_fresh(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("fresh"), 1))

        frontier = merged.map_batches(
            is_fresh, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).materialize()
        state = merged.map_batches(
            demote, batch_format="pyarrow", batch_size=None
        )

    return state.select_columns(["id", "dist"])
