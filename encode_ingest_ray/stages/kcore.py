"""k-core peeling — iterative degree filtering over an edge Dataset.

The third iterative-graph shape beside the numeric fixed point
(stages/pagerank.py) and the frontier traversal (stages/bfs.py): each round
drops every node whose CURRENT degree is below k, then drops edges touching
a dropped node; after R rounds the survivors are the "R-peel k-core"
(the true k-core is the fixed point; a bounded R keeps the result — like
the PageRank rounds — bit-reproducible by an unrolled SQL CTE chain).

Scale shape per round: ONE bucketed degree count (per-block pre-combine, so
the exchange carries (id, partial) rows), then the surviving id set filters
the edge set — broadcast as a sorted int array when small (searchsorted
membership per block, no exchange), else two co-hashed semi-joins (src
side, then dst side).  Edges re-materialize each round: the iterative
lineage trap applies here exactly as in BFS/PageRank.  Degrees count
parallel edges, matching SQL ``COUNT(*)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from encode_ingest_ray.stages.aggregate import bucketed_sum_combine


def _degrees(edges, num_buckets=None):
    """(id, deg) from the src side — feed both edge directions for an
    undirected graph, as the callers do."""

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([([], "count_all")])
        return g.rename_columns(["id", "deg"])

    return bucketed_sum_combine(
        edges.map_batches(
            pre, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        ["id"],
        ["deg"],
        num_buckets,
    )


def k_core(edges, k: int, rounds: int, broadcast_limit: int = 5_000_000):
    """``rounds`` peels of the (degree < k) filter; returns the survivors'
    ``(id, deg)`` with degrees measured on the final surviving edge set.
    ``edges``: columns ``src:int64, dst:int64``, pre-oriented both ways for
    undirected graphs."""
    edges = edges.materialize()

    for _ in range(rounds):
        deg = _degrees(edges)

        def ge_k(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t.column("deg"), k))

        surv = deg.map_batches(
            ge_k, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()
        n_surv = surv.count()
        if n_surv == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"id": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
                )
            )
        if n_surv <= broadcast_limit:
            tabs = [t for t in ray.get(surv.to_arrow_refs()) if t.num_rows]
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
            ref = ray.put(ids)

            def keep(t: pa.Table, _ref=ref) -> pa.Table:
                ids = ray.get(_ref)
                s = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
                d = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)

                def member(a):
                    pos = np.searchsorted(ids, a)
                    pos[pos == len(ids)] = 0
                    return ids[pos] == a

                return t.filter(pa.array(member(s) & member(d)))

            edges = edges.map_batches(
                keep, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).materialize()
        else:  # the BFS/bloom guard: two co-hashed semi-joins, one per side
            from encode_ingest_ray.stages.joins import cohash_join

            ids_only = surv.select_columns(["id"])
            edges = cohash_join(
                edges, ids_only, "src", "id",
                map_joined=lambda j: j.select(["src", "dst"]),
            )
            edges = cohash_join(
                edges, ids_only, "dst", "id",
                map_joined=lambda j: j.select(["src", "dst"]),
            ).materialize()

    return _degrees(edges)
