"""Frequency-mining / index-building queries.

* heavy_hitters_events — the guaranteed-exact two-pass heavy-hitter shape:
  a mergeable Misra-Gries summary (stages/sketch.mg_block_partial) finds
  every candidate above the frequency threshold WITHOUT a full groupby
  shuffle, then a candidate-bounded exact second pass pins exact counts.
  At 100 TB the first pass moves <= k rows per block and the second moves
  only candidate keys — the full-cardinality exchange never happens.
* substring_dup_stats — substring-level training-data dedup (Lee et al.,
  ACL 2022): per-doc counts of duplicated word-8-gram positions
  (stages/dupspans.py; two bucketed exchanges of pre-combined partials).
* inverted_index — search-index build: token -> (df, sorted posting list),
  block-distinct (tok, doc) pairs into one token-bucketed exchange, postings
  joined to CSV inside the bucket (the collect_sorted_parts shape at
  vocabulary cardinality).
* proportional_allocation — largest-remainder (Hamilton) integer quota
  allocation of a sampling budget across document languages: the exact
  arithmetic kernel behind training-mixture quotas (cf. mixture_subsample),
  computed from per-block count partials + one tiny reduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from encode_ingest_ray.pipelines.analogs import _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.pipelines.training import _docs
from encode_ingest_ray.stages.aggregate import (
    bucketed_groupby_apply,
    bucketed_sum_combine,
)

# ---------------------------------------------------------------------------
# Misra-Gries two-pass exact heavy hitters
# ---------------------------------------------------------------------------
_MG_K = 8

HEAVY_HITTERS_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
HAVING COUNT(*) * {_MG_K} > (SELECT COUNT(*) FROM events)
"""


@register("heavy_hitters_events", HEAVY_HITTERS_SQL)
def heavy_hitters_events(sf_dir: str):
    """Event types with frequency > N/k (k = 8), found WITHOUT a
    full-cardinality groupby: pass 1 reduces each block to a <=k-counter
    Misra-Gries summary (+ its row count), merged in one tiny task — any
    key above N/k is guaranteed to survive with summed-sketch count
    > N/(k(k+1)) (Agarwal et al. 2012), so that bound is the candidate
    filter; pass 2 broadcasts the candidate set and takes exact counts of
    ONLY those keys through the standard partial-sum exchange, then applies
    the exact HAVING.  Result is bit-identical to the SQL groupby, but the
    wide exchange is bounded by candidates (< k(k+1) keys), not by the key
    cardinality.  The registered key is the scale-invariantly-skewed
    ``event_type`` (the synthetic tables' per-user shares shrink with scale,
    so a user-keyed variant is empty past sf0.01); the decrement mechanics
    and the survival guarantee at high cardinality are pinned by the
    zipf-stream property test (tests/test_mining.py)."""
    from encode_ingest_ray.stages.sketch import mg_block_partial

    ds = _read(sf_dir, "events", ["event_type"])

    def mg_partial(t: pa.Table) -> pa.Table:
        vals = t.column("event_type").combine_chunks().to_numpy(zero_copy_only=False)
        keys, cnts, n = mg_block_partial(vals, _MG_K)
        blk_n = np.zeros(max(len(keys), 1), np.int64)
        blk_n[0] = n
        if len(keys) == 0:  # empty block still contributes its row count
            keys = np.array([""], object)
            cnts = np.zeros(1, np.int64)
        return pa.table(
            {
                "event_type": pa.array(keys.astype(str), pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
                "blk_n": pa.array(blk_n),
            }
        )

    partials = ds.map_batches(
        mg_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def merge(t: pa.Table) -> pa.Table:
        n_total = int(pc.sum(t.column("blk_n")).as_py() or 0)
        g = t.group_by(["event_type"]).aggregate([("cnt", "sum")])
        keys = np.asarray(g.column("event_type").to_pylist(), object)
        cnts = g.column("cnt_sum").to_numpy(zero_copy_only=False)
        keep = cnts * _MG_K * (_MG_K + 1) > n_total
        return pa.table(
            {
                "event_type": pa.array(keys[keep].astype(str), pa.string()),
                "n_total": pa.array(np.full(int(keep.sum()), n_total, np.int64)),
            }
        )

    # the sketch merge output is tiny by construction (< k(k+1) keys);
    # materializing it on the driver is the broadcast step, not a scan
    cand_rows = partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    if not cand_rows:
        return ray.data.from_arrow(
            pa.table({"event_type": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        )
    n_total = int(cand_rows[0]["n_total"])
    cand_ref = ray.put(pa.array(sorted(r["event_type"] for r in cand_rows), pa.string()))

    def exact_partial(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        col = t.column("event_type").combine_chunks()
        hit = col.filter(pc.is_in(col, value_set=cand))
        u, c = np.unique(np.asarray(hit.to_pylist(), object), return_counts=True)
        return pa.table(
            {"event_type": pa.array(u.astype(str), pa.string()), "n": pa.array(c.astype(np.int64))}
        )

    exact = ds.map_batches(
        exact_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    summed = bucketed_sum_combine(exact, ["event_type"], ["n"], 1)
    return summed.map_batches(
        lambda t: t.filter(
            pc.greater(pc.multiply(t.column("n"), _MG_K), n_total)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# substring-level duplicate spans (Lee et al. 2022 shape)
# ---------------------------------------------------------------------------
_WS = r"list_filter(string_split_regex(coalesce(text, ''), '\s+'), w -> w <> '')"

SUBSTRING_DUP_SQL = f"""
WITH t AS (SELECT doc_id, {_WS} AS ws FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(ws) < 8 THEN [array_to_string(ws, ' ')]
              ELSE list_transform(range(1, len(ws) - 6),
                                  i -> array_to_string(ws[i:i+7], ' ')) END AS grams
  FROM t),
p AS (SELECT doc_id, unnest(grams) AS gram FROM g),
c AS (SELECT gram, COUNT(*) AS total FROM p GROUP BY gram),
d AS (SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COALESCE(SUM(CASE WHEN c.total >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup
      FROM p JOIN c USING (gram) GROUP BY p.doc_id)
SELECT doc_id, n_grams, n_dup,
       (2000 * n_dup + n_grams) // (2 * n_grams) AS dup_milli
FROM d
"""


@register("substring_dup_stats", SUBSTRING_DUP_SQL)
def substring_dup_stats(sf_dir: str):
    """Per-doc duplicated-substring exposure: how many of a document's
    word-8-gram positions carry a gram that occurs >= 2 times corpus-wide
    (within- or cross-document) — the span statistic a substring-level
    dedup (Lee et al. 2022) cuts on.  See stages/dupspans.py for the
    two-exchange partial-combining plan."""
    from encode_ingest_ray.stages.dupspans import dup_doc_partials, gram_position_partials

    docs = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)
    partials = docs.map_batches(
        gram_position_partials,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    doc_parts = bucketed_groupby_apply(partials, ["gram"], dup_doc_partials)
    totals = bucketed_sum_combine(doc_parts, ["doc_id"], ["n_grams", "n_dup"])

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_grams").combine_chunks().to_numpy(zero_copy_only=False)
        d = t.column("n_dup").combine_chunks().to_numpy(zero_copy_only=False)
        milli = (2000 * d + n) // (2 * n)  # n >= 1 always (whole-doc gram)
        return t.append_column("dup_milli", pa.array(milli.astype(np.int64)))

    return totals.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# inverted index (token -> df + sorted postings)
# ---------------------------------------------------------------------------
INVERTED_INDEX_SQL = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({_WS})) AS tok FROM documents)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM t GROUP BY tok HAVING COUNT(*) >= 3
"""


@register("inverted_index", INVERTED_INDEX_SQL)
def inverted_index(sf_dir: str):
    """Search-index build: token -> document frequency + doc_id-sorted CSV
    posting list, for tokens in >= 3 documents.  Per block: Arrow-C++
    tokenize + (tok, doc) pair dedup (the combiner — repeated tokens never
    leave the block); one token-bucketed exchange; per bucket one
    vectorized sort + run-boundary ListArray + binary_join (the
    collect_sorted_parts kernel at vocabulary cardinality)."""
    from encode_ingest_ray.stages.quality import _token_ids

    docs = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)

    def pairs(t: pa.Table) -> pa.Table:
        doc_idx, tok_id, vocab = _token_ids(t.column("text"))
        flat = vocab.take(pa.array(tok_id, pa.int64()))
        ids = t.column("doc_id").combine_chunks().take(
            pa.array(doc_idx, pa.int64())
        )
        p = pa.table({"tok": flat, "doc_id": ids})
        return p.group_by(["tok", "doc_id"]).aggregate([])

    pre = docs.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("tok", "ascending"), ("doc_id", "ascending")]
        )
        g = t.take(idx)
        tok = g.column("tok").combine_chunks()
        codes = tok.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        bounds = np.r_[starts, len(codes)]
        df = np.diff(bounds)
        keep = df >= 3
        doc_str = pc.cast(g.column("doc_id").combine_chunks(), pa.string())
        lists = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int64()).cast(pa.int32()), doc_str
        )
        postings = pc.binary_join(lists, ",")
        out = pa.table(
            {
                "tok": tok.take(pa.array(starts, pa.int64())),
                "df": pa.array(df.astype(np.int64)),
                "postings": postings,
            }
        )
        return out.filter(pa.array(keep))

    return bucketed_groupby_apply(pre, ["tok"], bucket)


# ---------------------------------------------------------------------------
# largest-remainder proportional allocation
# ---------------------------------------------------------------------------
_BUDGET = 100_000

PROP_ALLOC_SQL = f"""
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM c),
s AS (SELECT lang, n, CAST(({_BUDGET} * n) // total_n AS BIGINT) AS base,
             CAST(({_BUDGET} * n) % total_n AS BIGINT) AS rem
      FROM c, tot),
r AS (SELECT lang, n, base,
             row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM s),
l AS (SELECT CAST({_BUDGET} - SUM(base) AS BIGINT) AS leftover FROM s)
SELECT lang, n, CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r, l
"""


@register("proportional_allocation", PROP_ALLOC_SQL)
def proportional_allocation(sf_dir: str):
    """Largest-remainder (Hamilton) integer allocation of a 100k-doc
    sampling budget across languages, proportional to corpus counts — the
    exact quota kernel behind training-mixture assembly (the float-free
    sibling of mixture_subsample).  Counts come from per-block partials +
    one partial-sum exchange; the allocation itself is one task over
    |langs| rows."""
    docs = _docs(sf_dir, ["lang"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang"]).aggregate([("lang", "count")])
        return g.rename_columns(["lang", "n"])

    partials = docs.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    counts = bucketed_sum_combine(partials, ["lang"], ["n"], 1)

    def alloc(t: pa.Table) -> pa.Table:
        lang = np.asarray(t.column("lang").to_pylist())
        n = t.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        N = n.sum()
        base = (_BUDGET * n) // N
        rem = (_BUDGET * n) % N
        leftover = _BUDGET - base.sum()
        order = np.lexsort((lang, -rem))  # rem desc, lang asc
        rk = np.empty(len(n), np.int64)
        rk[order] = np.arange(1, len(n) + 1)
        out_alloc = base + (rk <= leftover)
        return pa.table(
            {
                "lang": pa.array(lang),
                "n": pa.array(n, pa.int64()),
                "alloc": pa.array(out_alloc.astype(np.int64)),
            }
        )

    return counts.repartition(1).map_batches(
        alloc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Exact set-similarity self-join: prefix-filtered overlap join
# ---------------------------------------------------------------------------

BASKET_OVERLAP_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_orderkey AS o1, c.l_orderkey AS o2,
         CAST(COUNT(*) AS BIGINT) AS overlap
  FROM b a JOIN b c
    ON a.l_partkey = c.l_partkey AND a.l_orderkey < c.l_orderkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT o1, o2, overlap FROM p
"""


@register("basket_overlap_pairs", BASKET_OVERLAP_SQL)
def basket_overlap_pairs(sf_dir: str):
    """Exact set-similarity self-join (stages/setsim.py): every pair of
    orders whose part baskets share >= 2 parts, via PPJoin-style prefix
    filtering — candidates are generated only inside rarest-first PREFIX
    token groups, so a hot part never pays its full quadratic posting
    list; the oracle's naive token join is the plan this replaces."""
    from encode_ingest_ray.stages.setsim import overlap_self_join

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # overlap_self_join already emits (o1, o2, overlap) — a Dataset-level
    # rename_columns here measured +6.5 s of tiny-block re-batching overhead
    # for a NO-OP (the map_groups output is many small blocks; rename adds a
    # full extra operator pass over every one)
    return overlap_self_join(
        ds, id_col="l_orderkey", token_col="l_partkey", threshold=2
    )
