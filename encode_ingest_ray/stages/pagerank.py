"""Iterative fixed-point PageRank over an edge Dataset.

The representative of the ITERATIVE-algorithm operator class (the brief's
"genuinely non-SQL-expressible ops ... iterative algorithms" — made
SQL-expressible here anyway by integer fixed-point arithmetic: ranks are
per-mille BIGINTs, per-edge contributions are floor divisions, so a
K-iteration run is exactly reproduced by K unrolled CTE levels in DuckDB).

Scale shape: each iteration is TWO single-exchange ops —
(1) edges ⋈ contributions co-hashed on the source id, with the per-bucket
    partial SUM by destination pushed INSIDE the join task (only partials
    leave), and
(2) node-state ⋈ those partials co-hashed on the node id, the new rank
    computed in-task.
Nothing is ever materialized on the driver; the edge set streams through
each iteration and state stays a Dataset of (id, deg, rank) rows.  K
iterations therefore cost exactly 2K all-to-all exchanges of
(edges + nodes) rows — the irreducible PageRank communication pattern —
plus one exchange to build out-degrees.  Hot (high in-degree) nodes only
concentrate PARTIAL rows (one per source bucket), not raw edges.

Assumption (documented per the custom-operator guidance): every node
appears as a SOURCE at least once — true by construction for undirected
graphs fed as both edge directions.  Pure sinks would need a separate node
universe; they'd otherwise be dropped from the ranking.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import bucketed_sum_combine
from encode_ingest_ray.stages.joins import cohash_join


def pagerank_fixed_point(
    edges,
    iterations: int = 3,
    init_milli: int = 1000,
    damping_permille: int = 850,
    num_buckets: int | None = None,
):
    """Rank every node of ``edges`` (columns ``src:int64, dst:int64``;
    parallel edges count once each) after ``iterations`` synchronous
    PageRank rounds in per-mille integer arithmetic:

        contrib(u)   = rank(u) // out_deg(u)            (per edge u->v)
        rank'(v)     = (1000 - d) * init//1000 + (d * SUM contrib) // 1000

    with ``d = damping_permille``.  Returns a Dataset of
    ``(id, rank_milli)``.  Every operation is integer floor division /
    addition, so the result is bit-equal to the unrolled SQL oracle.
    """
    base = (1000 - damping_permille) * init_milli // 1000

    # Pregel-style supersteps need the edge set resident anyway (every round
    # consumes it; lazy re-execution would re-scan + re-derive per round), so
    # materialize it FIRST and size the exchange width from its now-free row
    # count: ~250k of these narrow int rows per bucket.  File-lineage sizing
    # is wrong twice here — derived/materialized datasets lose lineage (64-
    # bucket fallback = 64 reduce tasks per exchange at ANY size, measured
    # ~2s/round of pure task overhead on a 120k-edge graph), and each round
    # runs 2 exchanges × iterations, multiplying any per-task overhead.
    edges = edges.materialize()
    if num_buckets is None:
        num_buckets = int(max(2, min(1024, edges.count() // 250_000 + 1)))

    # out-degree: per-block count partials, one exchange
    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([("dst", "count")])
        return pa.table(
            {"id": g.column("src"), "deg": pc.cast(g.column("dst_count"), pa.int64())}
        )

    local = edges.map_batches(
        deg_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    deg = bucketed_sum_combine(local, ["id"], ["deg"], num_buckets)

    def init_state(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array([init_milli] * t.num_rows, pa.int64())
        )

    state = deg.map_batches(init_state, batch_format="pyarrow", batch_size=None)

    def to_contrib(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cid": t.column("id"),
                "c": pc.divide(t.column("rank"), t.column("deg")),
            }
        )

    def sum_by_dst(joined: pa.Table) -> pa.Table:
        g = joined.group_by(["dst"]).aggregate([("c", "sum")])
        return pa.table({"dst": g.column("dst"), "s": g.column("c_sum")})

    def new_rank(joined: pa.Table) -> pa.Table:
        # joined: (id, deg, rank, s-partials); ids fully contained per bucket
        g = joined.group_by(["id", "deg"]).aggregate([("s", "sum")])
        s = pc.fill_null(g.column("s_sum"), 0)
        rank = pc.add(
            base,
            pc.divide(pc.multiply(pa.scalar(damping_permille, pa.int64()), s), 1000),
        )
        return pa.table(
            {"id": g.column("id"), "deg": g.column("deg"), "rank": rank}
        )

    # State is checkpointed per round — it is consumed TWICE per round
    # (contribution map + the rank join), and a lazy Dataset re-executes its
    # whole lineage per consumer, turning K rounds into 2^K re-executions of
    # round 1.  State is O(nodes), edges O(input); both spill via the object
    # store rather than the driver heap.
    state = state.materialize()
    state_blocks = int(max(1, min(num_buckets, state.count() // 250_000 + 1)))
    for _ in range(iterations):
        contrib = state.map_batches(
            to_contrib, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        partials = cohash_join(
            edges,
            contrib,
            "src",
            "cid",
            num_buckets=num_buckets,
            map_joined=sum_by_dst,
        )
        state = cohash_join(
            state,
            partials,
            "id",
            "dst",
            how="left",
            num_buckets=num_buckets,
            map_joined=new_rank,
        )
        # coalesce before checkpointing: map_groups emits one block per
        # bucket task, and the next round's tagged union would otherwise
        # carry edges_blocks + state_blocks into its sort — block count
        # (and sort fan-in) would grow every round on a constant-size state
        state = state.repartition(state_blocks).materialize()

    return state.map_batches(
        lambda t: pa.table({"id": t.column("id"), "rank_milli": t.column("rank")}),
        batch_format="pyarrow",
        batch_size=None,
    )
