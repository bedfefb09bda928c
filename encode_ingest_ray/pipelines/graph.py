"""Iterative graph analytics over the TPC-H FK graph.

``pagerank_lineitem`` ranks the bipartite order↔part graph induced by
lineitem (both edge directions, parallel edges counted) with 3 synchronous
PageRank rounds in per-mille integer arithmetic — the iterative-algorithm
operator class, exactly reproduced in SQL by unrolling the 3 rounds as CTE
levels (integer floor division makes every round bit-deterministic).
Companion to the BFS crawl (pipelines/crawl.py) and the connected-components
clustering (stages/components.py) in the graph family.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.pipelines.analogs import _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.pagerank import pagerank_fixed_point

_ITER_CTE = """
s{i} AS (
  SELECT e.dst AS id, CAST(SUM(r.rank // r.deg) AS BIGINT) AS s
  FROM edges e JOIN r{j} r ON r.id = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT d.id, d.deg,
         150 + (850 * COALESCE(s{i}.s, 0)) // 1000 AS rank
  FROM deg d LEFT JOIN s{i} ON s{i}.id = d.id
)"""

PAGERANK_SQL = (
    """
WITH edges AS (
  SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_partkey * 2 + 1 AS src, l_orderkey * 2 AS dst FROM lineitem
),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT id, deg, CAST(1000 AS BIGINT) AS rank FROM deg),"""
    + ",".join(_ITER_CTE.format(i=i, j=i - 1) for i in (1, 2, 3))
    + """
SELECT id, rank AS rank_milli FROM r3
"""
)


@register("pagerank_lineitem", PAGERANK_SQL)
def pagerank_lineitem(sf_dir: str):
    """3-round fixed-point PageRank over the order↔part bipartite graph.

    One lineitem scan emits both edge directions (node ids namespaced by
    parity: orderkey*2 vs partkey*2+1); each round is two co-hashed
    exchanges with per-bucket partial sums pushed inside the join tasks
    (stages/pagerank.py).  Exact oracle: the same 3 rounds unrolled as CTE
    levels in integer per-mille arithmetic.
    """
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both_directions(t: pa.Table) -> pa.Table:
        o = pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()), 2)
        p = pc.add(
            pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()), 2), 1
        )
        fwd = pa.table({"src": o, "dst": p})
        rev = pa.table({"src": p, "dst": o})
        return pa.concat_tables([fwd, rev])

    edges = ds.map_batches(
        both_directions, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return pagerank_fixed_point(edges, iterations=3)


TRIANGLES_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


@register("triangle_count_copurchase", TRIANGLES_SQL)
def triangle_count_copurchase(sf_dir: str):
    """Exact triangle count of the co-purchase graph (parts sharing an
    order).  Oriented-wedge algorithm (Suri & Vassilvitskii WWW'11), three
    bucketed exchanges: per-order pair-gen -> (u,v) distinct -> wedge build
    per centre -> closure check co-hashed with the edge set
    (stages/triangles.py).  Every triangle a<b<c is generated exactly once
    at its unique oriented centre b."""
    import pyarrow as _pa

    from encode_ingest_ray.stages.triangles import group_pair_edges, triangle_count

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = group_pair_edges(ds, "l_orderkey", "l_partkey")
    n = triangle_count(edges.materialize())  # consumed twice (roles + flag)
    return _pa.table({"n_triangles": _pa.array([n], _pa.int64())})


FREQ_PAIRS_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT u, v, COUNT(*) AS n
FROM pairs GROUP BY u, v
ORDER BY n DESC, u, v LIMIT 20
"""


@register("frequent_part_pairs", FREQ_PAIRS_SQL)
def frequent_part_pairs(sf_dir: str):
    """Frequent-itemset mining (the Apriori pair step): top-20 part pairs
    by co-purchase support.  Per-order distinct pairs via the vectorized
    distance-d run scan (stages/triangles.pairs_within_groups), per-block
    count partials, one (u, v) sum exchange, deterministic
    (n desc, u, v) top-k."""
    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )
    from encode_ingest_ray.stages.triangles import pairs_within_groups

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def gen(t: pa.Table) -> pa.Table:
        return pairs_within_groups(t, "l_orderkey", "l_partkey")

    raw = bucketed_groupby_apply(ds, ["l_orderkey"], gen)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["u", "v"]).aggregate([("u", "count")])
        return g.rename_columns(["u", "v", "n"])

    local = raw.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    counts = bucketed_sum_combine(local, ["u", "v"], ["n"])
    return counts.sort(["n", "u", "v"], descending=[True, False, False]).limit(20)


BFS_SQL = """
WITH RECURSIVE edges AS (
  SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_partkey * 2 + 1 AS src, l_orderkey * 2 AS dst FROM lineitem
),
bfs(id, hop) AS (
  SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, b.hop + 1
  FROM bfs b JOIN edges e ON e.src = b.id
  WHERE b.hop < 4
)
SELECT id, CAST(MIN(hop) AS BIGINT) AS hop FROM bfs GROUP BY id
"""


@register("bfs_hops_copurchase", BFS_SQL)
def bfs_hops_copurchase(sf_dir: str):
    """4-round BFS hop labels from part 1 (node id 3) over the same
    order↔part bipartite graph pagerank_lineitem ranks.  Each round is one
    broadcast-frontier edge probe (no exchange) + one (id, hop) min-merge
    exchange; the oracle is DuckDB's WITH RECURSIVE with the identical hop
    bound (stages/bfs.py)."""
    from encode_ingest_ray.stages.bfs import bfs_hops

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both_directions(t: pa.Table) -> pa.Table:
        o = pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()), 2)
        p = pc.add(
            pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()), 2), 1
        )
        return pa.concat_tables(
            [pa.table({"src": o, "dst": p}), pa.table({"src": p, "dst": o})]
        )

    edges = ds.map_batches(
        both_directions, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return bfs_hops(edges, source=3, rounds=4)


def _dk(prev: str, k: int) -> str:
    return f"""
d{k} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM {prev}
    UNION ALL
    SELECT e.dst, {prev}.dist + e.w FROM {prev} JOIN e ON e.src = {prev}.id
  ) GROUP BY id
)"""


SSSP_SQL = (
    """
WITH e AS (
  SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  UNION ALL
  SELECT l_partkey * 2 + 1, l_orderkey * 2, CAST(l_quantity AS BIGINT)
  FROM lineitem
),
d0(id, dist) AS (SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)),"""
    + ",".join(_dk(f"d{k - 1}", k) for k in range(1, 5))
    + """
SELECT id, CAST(dist AS BIGINT) AS dist FROM d4
"""
)


@register("sssp_copurchase", SSSP_SQL)
def sssp_copurchase(sf_dir: str):
    """Weighted single-source shortest paths (4 Bellman-Ford supersteps,
    quantity-weighted order↔part edges, source = part 1 / node 3): after
    round k every node holds its exact min-weight distance over paths of
    <= k edges, so the oracle is the min-merge CTE chain unrolled 4x —
    NOT a WITH RECURSIVE path enumeration, whose distinct (id, dist) state
    explodes combinatorially on a dense bipartite graph (stages/bfs.py
    sssp_dists; the pagerank_lineitem unrolled-oracle precedent)."""
    from encode_ingest_ray.stages.bfs import sssp_dists

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])

    def both_directions(t: pa.Table) -> pa.Table:
        o = pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()), 2)
        p = pc.add(
            pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()), 2), 1
        )
        w = pc.cast(t.column("l_quantity"), pa.int64())
        return pa.concat_tables(
            [
                pa.table({"src": o, "dst": p, "w": w}),
                pa.table({"src": p, "dst": o, "w": w}),
            ]
        )

    edges = ds.map_batches(
        both_directions, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return sssp_dists(edges, source=3, rounds=4)


_PEEL_CTE = """
d{i} AS (SELECT src AS id, COUNT(*) AS deg FROM e{j} GROUP BY src),
n{i} AS (SELECT id FROM d{i} WHERE deg >= {k}),
e{i} AS (
  SELECT e.src, e.dst FROM e{j} e
  JOIN n{i} a ON a.id = e.src
  JOIN n{i} b ON b.id = e.dst
)"""

_KCORE_K, _KCORE_R = 5, 3

KCORE_SQL = (
    """
WITH e0 AS (
  SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_partkey * 2 + 1 AS src, l_orderkey * 2 AS dst FROM lineitem
),"""
    + ",".join(
        _PEEL_CTE.format(i=i, j=i - 1, k=_KCORE_K)
        for i in range(1, _KCORE_R + 1)
    )
    + f"""
SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
FROM e{_KCORE_R} GROUP BY src
"""
)


@register("kcore_copurchase", KCORE_SQL)
def kcore_copurchase(sf_dir: str):
    """3-peel 5-core of the order↔part bipartite graph: iterative DEGREE
    FILTERING — the third iterative-graph shape beside the PageRank fixed
    point and the BFS/SSSP frontier.  Each peel is one pre-combined degree
    exchange + a broadcast-survivor edge filter (cohash semi-join past the
    broadcast guard); the bounded peel count makes the result bit-equal to
    the unrolled CTE chain (stages/kcore.py).  Degrees count parallel
    edges (SQL COUNT(*))."""
    from encode_ingest_ray.stages.kcore import k_core

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def both_directions(t: pa.Table) -> pa.Table:
        o = pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()), 2)
        p = pc.add(
            pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()), 2), 1
        )
        return pa.concat_tables(
            [pa.table({"src": o, "dst": p}), pa.table({"src": p, "dst": o})]
        )

    edges = ds.map_batches(
        both_directions, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return k_core(edges, k=_KCORE_K, rounds=_KCORE_R)


# ---------------------------------------------------------------------------
# Association rules: confidence / lift over the top co-purchase pairs
# ---------------------------------------------------------------------------

ASSOC_RULES_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_orderkey, a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pc AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY u, v),
top AS (SELECT * FROM pc ORDER BY n DESC, u, v LIMIT 50),
item AS (
  SELECT l_partkey, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nx
  FROM lineitem GROUP BY l_partkey
),
nb AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem
),
rules AS (
  SELECT u AS antecedent, v AS consequent, n FROM top
  UNION ALL
  SELECT v AS antecedent, u AS consequent, n FROM top
)
SELECT r.antecedent, r.consequent, r.n AS n_pair,
       ia.nx AS n_ante, ic.nx AS n_cons,
       CAST((1000000 * CAST(r.n AS HUGEINT)) // ia.nx AS BIGINT)
         AS conf_micro,
       CAST((1000000000 * CAST(r.n AS HUGEINT) * nb.n_orders)
            // (CAST(ia.nx AS HUGEINT) * ic.nx) AS BIGINT) AS lift_nano
FROM rules r
JOIN item ia ON ia.l_partkey = r.antecedent
JOIN item ic ON ic.l_partkey = r.consequent
CROSS JOIN nb
"""


@register("association_rules_parts", ASSOC_RULES_SQL)
def association_rules_parts(sf_dir: str):
    """Association-rule mining over the co-purchase pairs (the Apriori
    rule-generation step after ``frequent_part_pairs``): both directed
    rules for each of the top-50 support pairs, with confidence
    n(a,b)/n(a) and lift n(a,b)·N/(n(a)·n(b)) — ALL-INTEGER
    (floor-micro / floor-nano via integer division; DuckDB ``//`` on
    positive HUGEINTs == Python ``//``), so no float ever enters.

    Shape: the pair counts ride the same distance-d pair scan + one
    (u,v) combine as frequent_part_pairs; item supports are one
    part-keyed distinct-order exchange; only the top-50 pairs, their
    ≤100 item rows and ONE scalar (basket count) reach the driver —
    rule arithmetic is metadata-sized."""
    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )
    from encode_ingest_ray.stages.triangles import pairs_within_groups

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def gen(t: pa.Table) -> pa.Table:
        return pairs_within_groups(t, "l_orderkey", "l_partkey")

    raw = bucketed_groupby_apply(ds, ["l_orderkey"], gen)

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["u", "v"]).aggregate([("u", "count")])
        return g.rename_columns(["u", "v", "n"])

    local = raw.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    top = (
        bucketed_sum_combine(local, ["u", "v"], ["n"])
        .sort(["n", "u", "v"], descending=[True, False, False])
        .limit(50)
        .take_all()
    )

    # item supports: distinct orders per part (block-distinct partials ->
    # one part-keyed exchange -> per-bucket distinct count)
    def block_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_partkey", "l_orderkey"]).aggregate([])

    def count_orders(t: pa.Table) -> pa.Table:
        d = t.group_by(["l_partkey", "l_orderkey"]).aggregate([])
        g = d.group_by(["l_partkey"]).aggregate([("l_orderkey", "count")])
        return g.rename_columns(["l_partkey", "nx"])

    dist = ds.map_batches(
        block_distinct, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    parts_needed = sorted({r["u"] for r in top} | {r["v"] for r in top})
    needed = pa.array(parts_needed)
    items = {
        r["l_partkey"]: r["nx"]
        for r in bucketed_groupby_apply(dist, ["l_partkey"], count_orders)
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("l_partkey"), value_set=needed)),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
        .take_all()
    }

    def orders_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey"]).aggregate([])

    n_orders = bucketed_groupby_apply(
        ds.map_batches(
            orders_distinct, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["l_orderkey"],
        orders_distinct,
    ).count()

    rows = []
    for r in top:
        for a, c in ((r["u"], r["v"]), (r["v"], r["u"])):
            na, nc, n = int(items[a]), int(items[c]), int(r["n"])
            rows.append(
                {
                    "antecedent": a, "consequent": c, "n_pair": n,
                    "n_ante": na, "n_cons": nc,
                    "conf_micro": (1000000 * n) // na,
                    "lift_nano": (1000000000 * n * n_orders) // (na * nc),
                }
            )
    return pa.Table.from_pylist(rows).cast(
        pa.schema(
            [
                ("antecedent", pa.int64()), ("consequent", pa.int64()),
                ("n_pair", pa.int64()), ("n_ante", pa.int64()),
                ("n_cons", pa.int64()), ("conf_micro", pa.int64()),
                ("lift_nano", pa.int64()),
            ]
        )
    )
