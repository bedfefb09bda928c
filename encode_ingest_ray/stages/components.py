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


def _local_components(edges: pa.Table) -> pa.Table:
    """Vectorized min-label propagation over a driver-collected edge list:
    dense-encode nodes, then repeat ``labels[dst] = min(labels[dst],
    labels[src])`` (one ``np.minimum.at`` per pass) until the label sum is
    stable.  Same fixpoint as the distributed loop, diameter passes."""
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    nodes, inv_src = np.unique(src, return_inverse=True)
    inv_dst = np.searchsorted(nodes, dst)  # sym edges: dst nodes == src nodes
    labels = nodes.copy()
    prev = labels.sum()
    # labels strictly decrease between non-converged passes and are bounded
    # below, so this always terminates — no iteration cap needed locally
    # (max_iters only bounds the exchange-priced distributed loop)
    while True:
        np.minimum.at(labels, inv_dst, labels[inv_src])
        s = labels.sum()
        if s == prev:
            break
        prev = s
    return pa.table({"node": pa.array(nodes), "lbl": pa.array(labels)})


def connected_components(
    pairs_ds,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iters: int = 50,
    driver_max_edges: int = 5_000_000,
):
    """Labels every node of the undirected pair graph with the MIN node id
    reachable from it (the component id).  Returns a Dataset (node, lbl)
    covering exactly the nodes that appear in some pair.

    Graphs with ≤ ``driver_max_edges`` symmetric edges take the driver fast
    path (:func:`_local_components` — the caller already assumes the LABEL
    table is broadcastable, and each distributed round costs two fixed-price
    sort exchanges that dwarf a small graph's compute: measured 18.6 s
    distributed vs <0.5 s local for a 120k-node graph).  Larger graphs run
    the general distributed loop below."""
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
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_EMPTY_LABELS)
    if n_edges <= driver_max_edges:
        local = pa.concat_tables(
            [b for b in edges.iter_batches(batch_size=None, batch_format="pyarrow")]
        )
        return ray.data.from_arrow(_local_components(local))

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
