"""Distributed connected components — min-label propagation.

The operator real dedup pipelines run AFTER near-dup pair generation:
collapse the pair graph into clusters so one canonical document per cluster
survives.  Classic Pregel-style iteration expressed in Ray Data:

* each round, every node's label becomes the min of its own label and its
  neighbors' labels — two bucketed hash exchanges per round (edge⋈label
  scatter, then per-node min), both via ``bucketed_groupby_apply`` with
  vectorized Arrow C++ joins/aggregations per bucket;
* labels only decrease, so the integer label SUM is a monotone convergence
  metric — one tiny aggregate per round, equal sums ⇒ fixpoint;
* rounds needed = graph diameter.  Near-dup clusters are clique-ish
  (diameter 1-2), so the loop converges in 2-3 rounds.

Scale shape: the label table is one row per node OF THE PAIR GRAPH (the
near-dup docs — far smaller than the corpus), materialized once per round;
edges are materialized once and re-streamed every round.  No driver-side
rows except the per-round scalar sum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

_EMPTY_LABELS = pa.table(
    {"node": pa.array([], pa.int64()), "lbl": pa.array([], pa.int64())}
)


def _min_labels(ds):
    """(node, lbl) rows → one min-label row per node; one bucketed exchange,
    per-bucket C++ group_by."""

    def m(t: pa.Table) -> pa.Table:
        g = t.group_by(["node"]).aggregate([("lbl", "min")])
        g = g.rename_columns([{"lbl_min": "lbl"}.get(n, n) for n in g.column_names])
        return g.select(["node", "lbl"])

    return bucketed_groupby_apply(ds, ["node"], m)


def connected_components(
    pairs_ds, col_a: str = "doc_a", col_b: str = "doc_b", max_iters: int = 50
):
    """Labels every node of the undirected pair graph with the MIN node id
    reachable from it (the component id).  Returns a Dataset (node, lbl)
    covering exactly the nodes that appear in some pair."""
    import ray.data

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(col_a).combine_chunks().cast(pa.int64())
        b = t.column(col_b).combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "src": pa.chunked_array([a, b]).combine_chunks(),
                "dst": pa.chunked_array([b, a]).combine_chunks(),
            }
        )

    edges = pairs_ds.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_EMPTY_LABELS)

    def init_lbl(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("src").combine_chunks())
        return pa.table({"node": u, "lbl": u})

    labels = _min_labels(
        edges.map_batches(
            init_lbl, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    ).materialize()
    prev_sum = labels.sum("lbl")

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("src"),
                "other": t.column("dst"),
                "lbl": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    for _ in range(max_iters):
        lbls = labels

        def tag_lbls(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t.column("node"),
                    "other": pa.nulls(t.num_rows, pa.int64()),
                    "lbl": t.column("lbl"),
                }
            )

        unioned = edges.map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).union(
            lbls.map_batches(
                tag_lbls, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        )

        def scatter(t: pa.Table) -> pa.Table:
            # every key's label reaches every neighbor: C++ hash join per bucket
            lbl_rows = t.filter(pc.is_valid(t.column("lbl"))).select(["key", "lbl"])
            edge_rows = t.filter(pc.is_valid(t.column("other"))).select(["key", "other"])
            if lbl_rows.num_rows == 0 or edge_rows.num_rows == 0:
                return _EMPTY_LABELS
            j = edge_rows.join(lbl_rows, keys="key", join_type="inner")
            return pa.table({"node": j.column("other"), "lbl": j.column("lbl")})

        cands = bucketed_groupby_apply(unioned, ["key"], scatter)
        labels = _min_labels(cands.union(lbls)).materialize()
        s = labels.sum("lbl")
        if s == prev_sum:
            break
        prev_sum = s
    return labels
