"""LLM training-data preparation queries: repetition quality filters,
benchmark decontamination, text normalization, PII redaction, corpus
statistics (document frequency, BPE pair counts), deterministic shuffle
and exact grouped quantiles.

All eight queries carry EXACT DuckDB oracles (integer milli encodings,
floor division, RE2-identical regexes — stages/quality.py documents each
parity argument).  Scale shapes:

* repetition / clean / pii / decontam — shuffle-free per-block maps; the
  decontamination benchmark side is broadcast once (``ray.put``), probed
  via binary search (benchmarks are MBs by definition).
* doc_frequency / bpe_pair_counts — per-block combiner partials (vocab-
  sized, not token-sized) into one small groupby.
* shuffle_order / grouped_quantiles_exact — ONE sort exchange plus the
  two-phase distributed prefix scan (stages/packing.py global_rank);
  per-block counts cross the driver as single ints, rows never do.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.pipelines.training import _docs, _sized_read
from encode_ingest_ray.stages.packing import global_rank
from encode_ingest_ray.stages.quality import (
    DUP_5GRAM_KEEP_MILLI,
    EMAIL_PATTERN,
    TOP_WORD_KEEP_MILLI,
    Decontaminator,
    RepetitionStats,
    benchmark_ngram_hashes,
    bpe_pair_partial,
    clean_text_table,
    doc_frequency_partial,
    redact_pii_table,
)

_WS = r"list_filter(string_split_regex(coalesce(text, ''), '\s+'), w -> w <> '')"

#: distinct word-trigram list from a ``ws`` token-list column (shared by the
#: decontamination and corpus-prep oracles; <3-word docs yield one whole-doc gram)
_GRAMS = (
    "list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')] "
    "ELSE list_transform(range(1, len(ws) - 1), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)"
)


# ---------------------------------------------------------------------------
# Gopher-style repetition quality filter
# ---------------------------------------------------------------------------
REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {_WS} AS ws FROM documents),
m AS (
  SELECT doc_id, len(ws) AS n,
    COALESCE(list_max(list_transform(list_distinct(ws),
                      u -> len(list_filter(ws, x -> x = u)))), 0) AS topw,
    CASE WHEN len(ws) >= 2
         THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
         ELSE [] END AS bg,
    CASE WHEN len(ws) >= 5
         THEN list_transform(range(1, len(ws) - 3),
              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])
         ELSE [] END AS g5
  FROM t),
m2 AS (
  SELECT doc_id, n, topw,
    COALESCE(list_max(list_transform(list_distinct(bg),
                      u -> len(list_filter(bg, x -> x = u)))), 0) AS topb,
    len(bg) AS nb, len(g5) AS n5, len(list_distinct(g5)) AS d5
  FROM m)
SELECT doc_id, CAST(n AS BIGINT) AS n_words,
  CAST(CASE WHEN n > 0 THEN 1000 * topw // n ELSE 0 END AS BIGINT) AS top_word_milli,
  CAST(CASE WHEN nb > 0 THEN 1000 * topb // nb ELSE 0 END AS BIGINT) AS top_bigram_milli,
  CAST(CASE WHEN n5 > 0 THEN 1000 * (n5 - d5) // n5 ELSE 0 END AS BIGINT) AS dup_5gram_milli,
  (CASE WHEN n > 0 THEN 1000 * topw // n ELSE 0 END) <= {TOP_WORD_KEEP_MILLI}
    AND (CASE WHEN n5 > 0 THEN 1000 * (n5 - d5) // n5 ELSE 0 END)
        <= {DUP_5GRAM_KEEP_MILLI} AS keep
FROM m2
"""


@register("repetition_stats", REPETITION_SQL)
def repetition_stats_q(sf_dir: str):
    """Per-document repetition signals (top-word / top-bigram / dup-5-gram
    fractions) + keep flag — the Gopher repetition filter, fully vectorized
    (dictionary-encoded tokens, integer-key np.unique; no per-row loop)."""
    ds = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)
    # stateless kernel (no per-actor state to build) -> task pool, not actors
    return ds.map_batches(
        RepetitionStats(), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------
DECONTAMINATE_SQL = f"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    END)) AS gram
  FROM toks),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
tg AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0),
sz AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
ov AS (SELECT tg.doc_id, count(*) AS n_overlap
       FROM tg JOIN bench USING (gram) GROUP BY tg.doc_id)
SELECT s.doc_id, s.n_grams, COALESCE(o.n_overlap, 0) AS n_overlap,
       1000 * COALESCE(o.n_overlap, 0) // GREATEST(s.n_grams, 1) AS contam_milli
FROM sz s LEFT JOIN ov o ON o.doc_id = s.doc_id
"""


@register("decontaminate_ngram", DECONTAMINATE_SQL)
def decontaminate_ngram_q(sf_dir: str):
    """Benchmark decontamination: documents with ``doc_id % 97 == 0`` act as
    the held-out eval set; every training document reports how many of its
    distinct word-trigrams appear in the benchmark.  The benchmark gram
    hashes are reduced distributed (per-block distinct partials, only
    uint64 hashes reach the driver), unioned, ``ray.put`` once, and probed
    per batch by binary search — the broadcast-small-side join shape."""

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    def bench_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"g": pa.array(benchmark_ngram_hashes(t.column("text")), pa.uint64())}
        )

    bench_parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .map_batches(bench_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    bench = (
        np.unique(np.array([r["g"] for r in bench_parts], np.uint64))
        if bench_parts
        else np.empty(0, np.uint64)
    )
    bench_ref = ray.put(bench)

    def train_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 != 0))

    ds = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)
    return ds.map_batches(
        train_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).map_batches(
        Decontaminator,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        batch_size=None,
        # actors resolve the broadcast once; a FIXED pool of 2 serializes
        # the corpus scan (37s at 800k docs), while a fixed 8 eats every
        # CPU of a small session and starves the upstream read (deadlock).
        # The bounded autoscaling pool does both sizes right.
        concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# text normalization fingerprint
# ---------------------------------------------------------------------------
@register(
    "clean_text",
    r"""SELECT doc_id,
              md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')))
                AS clean_md5
       FROM documents""",
)
def clean_text_q(sf_dir: str):
    """Normalization fingerprint (lower → collapse whitespace → trim → md5):
    the cross-crawl exact-dedup key.  The collapse regex runs in Arrow's
    RE2 — the same engine DuckDB uses, so the oracle is byte-exact."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        clean_text_table, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# PII redaction (events.props carries the digit runs in this corpus)
# ---------------------------------------------------------------------------
PII_SQL = f"""
SELECT event_id,
  CAST(len(regexp_extract_all(coalesce(props, ''), '{EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(coalesce(props, ''), '[0-9]+')) AS BIGINT) AS n_nums,
  regexp_replace(regexp_replace(coalesce(props, ''), '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                 '[0-9]+', '<NUM>', 'g') AS redacted
FROM events
"""


@register("pii_scrub", PII_SQL)
def pii_scrub_q(sf_dir: str):
    """Regex PII redaction (emails, then digit runs) with match counts over
    the original string — RE2-only patterns, vectorized Arrow kernels,
    shuffle-free."""
    ds = _sized_read(os.path.join(sf_dir, "events.parquet"), ["event_id", "props"])
    return ds.map_batches(
        redact_pii_table, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# corpus statistics: document frequency + BPE pair counts
# ---------------------------------------------------------------------------
@register(
    "doc_frequency",
    r"""SELECT w AS word, CAST(count(*) AS BIGINT) AS n_docs
       FROM (SELECT doc_id, unnest(list_distinct(
                list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            w -> w <> ''))) AS w
             FROM documents)
       GROUP BY w""",
)
def doc_frequency_q(sf_dir: str):
    """Document frequency (the IDF numerator): per-block distinct-(doc, word)
    partials — vocab-sized, not token-sized — into one small word groupby.
    Documents never span blocks, so block partials sum exactly."""
    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    ds = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)
    parts = ds.map_batches(
        doc_frequency_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_sum_combine(parts, ["word"], ["n_docs"])


@register(
    "bpe_pair_counts",
    r"""SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, count(*) AS n
       FROM (SELECT unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                                       w -> w <> '')) AS w
             FROM documents) t,
            unnest(range(1, length(w))) AS r(i)
       GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""",
)
def bpe_pair_counts_q(sf_dir: str):
    """One BPE merge iteration's pair statistics: adjacent character-pair
    counts inside whitespace tokens, top-20 by (n desc, pair).  Pairs are
    extracted per UNIQUE word and weighted by word frequency (block-level
    combiner), so the shuffle carries vocabulary-sized partials."""
    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine

    ds = _docs(sf_dir, ["text"], min_blocks=8)
    parts = ds.map_batches(
        bpe_pair_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = bucketed_sum_combine(parts, ["pair"], ["n"])
    return agg.sort(["n", "pair"], descending=[True, False]).limit(20)


# ---------------------------------------------------------------------------
# deterministic global shuffle (training order)
# ---------------------------------------------------------------------------
@register(
    "shuffle_order",
    """SELECT doc_id,
              CAST(row_number() OVER (
                ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 16)
                              AS UBIGINT), doc_id) - 1 AS BIGINT) AS rank
       FROM documents""",
)
def shuffle_order_q(sf_dir: str):
    """Seeded deterministic global shuffle: rank documents by a salted md5
    hash — replayable on any cluster, one sort exchange + the distributed
    prefix scan (offsets cross the driver as ints).  The uint64 hash is
    mapped order-preserving into int64 (msb flip) for the sort key."""
    from encode_ingest_ray.stages.sketch import _hash64

    ds = _docs(sf_dir, ["doc_id"])

    def add_hash(t: pa.Table) -> pa.Table:
        salted = pc.binary_join_element_wise(
            pc.cast(t.column("doc_id"), pa.string()), ":42", ""
        )
        h = _hash64(salted) ^ np.uint64(1 << 63)  # order-preserving msb flip
        return t.append_column("h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    ranked = global_rank(hashed, ["h", "doc_id"])
    return ranked.map_batches(
        lambda t: t.select(["doc_id", "rank"]), batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# exact grouped quantiles (rank selection — the exact counterpart to the
# mergeable-sketch grouped_quantiles query)
# ---------------------------------------------------------------------------
QUANTILES_EXACT_SQL = """
WITH v AS (SELECT event_type, CAST(ROUND(1000 * value) AS BIGINT) AS vm FROM events),
r AS (SELECT event_type, vm,
        row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n
      FROM v)
SELECT event_type,
  MAX(CASE WHEN rn = (500 * n + 999) // 1000 THEN vm END) AS p50_milli,
  MAX(CASE WHEN rn = (950 * n + 999) // 1000 THEN vm END) AS p95_milli,
  MAX(CASE WHEN rn = (990 * n + 999) // 1000 THEN vm END) AS p99_milli
FROM r GROUP BY event_type
"""

_PHIS_PERMILLE = (500, 950, 990)


@ray.remote
def _block_group_counts(block: pa.Table):
    """Ordered per-block (group, count) partial — sorted input means each
    group occupies one contiguous run, possibly spanning blocks."""
    et = block.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    d = et.dictionary_encode()
    ids = d.indices.to_numpy(zero_copy_only=False)
    # dictionary ids are first-appearance ordinals; the block is sorted, so
    # ascending id order IS the sorted group order
    uniq, counts = np.unique(ids, return_counts=True)
    return [str(d.dictionary[int(u)]) for u in uniq], counts.tolist()


@ray.remote
def _block_pick_ranks(block: pa.Table, offset: int, targets: np.ndarray) -> pa.Table:
    pos = offset + np.arange(block.num_rows, dtype=np.int64)
    t = block.append_column("rank", pa.array(pos))
    return t.filter(pa.array(np.isin(pos, targets)))


@register("grouped_quantiles_exact", QUANTILES_EXACT_SQL)
def grouped_quantiles_exact_q(sf_dir: str):
    """EXACT per-group quantiles by distributed rank selection over ONE
    dataset execution: sort on (group, value) and materialize, then two tiny
    per-block passes over the sorted block refs — (1) ordered (group, count)
    partials (a few ints per block cross the driver; rows never do), from
    which group sizes, start offsets and the ~groups x phis target global
    ranks are computed driver-side; (2) each block independently emits the
    target rows it owns.  The value at a rank is tie-invariant, so the SQL
    row_number oracle matches bit-for-bit.  Group cardinality must be
    driver-small; value volume is unbounded."""
    ds = _sized_read(os.path.join(sf_dir, "events.parquet"), ["event_type", "value"])

    def to_milli(t: pa.Table) -> pa.Table:
        vm = pc.cast(
            pc.round(
                pc.multiply(t.column("value"), 1000.0), 0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"event_type": t.column("event_type"), "vm": vm})

    s = ds.map_batches(
        to_milli, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).sort(["event_type", "vm"]).materialize()
    refs = s.to_arrow_refs()  # blocks in sorted order
    if not refs:
        return pa.table(
            {"event_type": pa.array([], pa.string())}
            | {f"p{p // 10}_milli": pa.array([], pa.int64()) for p in _PHIS_PERMILLE}
        )

    parts = ray.get([_block_group_counts.remote(r) for r in refs])
    counts: dict[str, int] = {}
    block_offsets = [0]
    for gs, cs in parts:
        for g, c in zip(gs, cs):
            counts[g] = counts.get(g, 0) + int(c)
        block_offsets.append(block_offsets[-1] + int(sum(cs)))

    groups = sorted(counts)
    start = 0
    target_rank: dict[tuple[str, int], int] = {}
    for g in groups:
        n = counts[g]
        for p in _PHIS_PERMILLE:
            target_rank[(g, p)] = start + (p * n + 999) // 1000 - 1
        start += n
    targets = np.array(sorted(set(target_rank.values())), np.int64)

    rows = pa.concat_tables(
        ray.get(
            [
                _block_pick_ranks.remote(r, off, targets)
                # only blocks owning a target rank run the pick task
                for r, off, off2 in zip(refs, block_offsets[:-1], block_offsets[1:])
                if np.any((targets >= off) & (targets < off2))
            ]
        )
    )
    vm_at = dict(zip(rows.column("rank").to_pylist(), rows.column("vm").to_pylist()))
    return pa.table(
        {
            "event_type": pa.array(groups, pa.string()),
            **{
                f"p{p // 10}_milli": pa.array(
                    [vm_at[target_rank[(g, p)]] for g in groups], pa.int64()
                )
                for p in _PHIS_PERMILLE
            },
        }
    )


# ---------------------------------------------------------------------------
# flagship corpus-prep pipeline: the full cleaning DAG as ONE composed query
# ---------------------------------------------------------------------------
CORPUS_PREP_SQL = f"""
WITH c AS (
  SELECT doc_id, lang, text,
         md5(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) AS cm
  FROM documents),
surv AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY cm),
s1 AS (SELECT c.doc_id, c.lang, c.text FROM c JOIN surv USING (doc_id)),
m AS (
  SELECT doc_id, lang, text, ws, len(ws) AS n,
    COALESCE(list_max(list_transform(list_distinct(ws),
                      u -> len(list_filter(ws, x -> x = u)))), 0) AS topw,
    CASE WHEN len(ws) >= 5
         THEN list_transform(range(1, len(ws) - 3),
              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])
         ELSE [] END AS g5
  FROM (SELECT doc_id, lang, text, {_WS} AS ws FROM s1)),
s2 AS (
  SELECT doc_id, lang, text, ws FROM m
  WHERE (CASE WHEN n > 0 THEN 1000 * topw // n ELSE 0 END) <= {TOP_WORD_KEEP_MILLI}
    AND (CASE WHEN len(g5) > 0
              THEN 1000 * (len(g5) - len(list_distinct(g5))) // len(g5)
              ELSE 0 END) <= {DUP_5GRAM_KEEP_MILLI}
    AND doc_id % 97 <> 0),
benchg AS (
  SELECT DISTINCT gram FROM (
    SELECT unnest({_GRAMS}) AS gram
    FROM (SELECT {_WS} AS ws FROM documents WHERE doc_id % 97 = 0))),
contaminated AS (
  SELECT DISTINCT tg.doc_id
  FROM (SELECT doc_id, unnest({_GRAMS}) AS gram FROM s2) tg
  JOIN benchg USING (gram)),
s3 AS (SELECT s2.doc_id, s2.lang, s2.text FROM s2
       LEFT JOIN contaminated k ON k.doc_id = s2.doc_id WHERE k.doc_id IS NULL),
s4 AS (
  SELECT * FROM s3
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT) % 1000
        < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 1000 WHEN 'es' THEN 1000
                    WHEN 'fr' THEN 1000 WHEN 'zh' THEN 500 ELSE 0 END)
SELECT doc_id, lang,
  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS UBIGINT)
            % 1000 < 100 THEN 'val' ELSE 'train' END AS split,
  CAST(len(regexp_extract_all(coalesce(text, ''), '\\S+')) AS BIGINT) AS n_tokens
FROM s4
"""


@register("corpus_prep", CORPUS_PREP_SQL)
def corpus_prep_q(sf_dir: str):
    """Flagship training-corpus preparation DAG — every cleaning stage this
    module registers standalone, composed end to end with ONE exact oracle:

      normalize-fingerprint → exact dedup (deterministic min-doc_id winner,
      combiner + one bucketed exchange) → repetition quality filter →
      benchmark decontamination (broadcast gram probe, zero-overlap keep) →
      mixture reweighting → split assignment + token counts.

    Shuffle count for the WHOLE pipeline: one (the dedup exchange) plus the
    tiny benchmark reduction; every other stage is a per-block map.  The
    mixture and split stages intentionally reuse the registered primitives'
    unsalted md5(doc_id) hash (their oracles pin it); a production pipeline
    would salt the two decisions apart.
    """
    from encode_ingest_ray.stages.dedup import dedup_exact
    from encode_ingest_ray.stages.packing import (
        MIXTURE_WEIGHTS_PERMILLE,
        mixture_subsample,
        split_column,
    )

    # benchmark gram hashes from the full corpus (same shape as
    # decontaminate_ngram: per-block distinct partials, hashes-only driver union)
    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    def bench_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"g": pa.array(benchmark_ngram_hashes(t.column("text")), pa.uint64())}
        )

    bench_parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .map_batches(bench_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .take_all()
    )
    bench = (
        np.unique(np.array([r["g"] for r in bench_parts], np.uint64))
        if bench_parts
        else np.empty(0, np.uint64)
    )
    bench_ref = ray.put(bench)

    ds = _docs(sf_dir, ["doc_id", "lang", "text"], min_blocks=8)
    with_md5 = ds.map_batches(
        lambda t: clean_text_table(t, keep_source=True),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    surv = dedup_exact(with_md5, ["clean_md5"], "doc_id")

    def rep_keep_and_train(t: pa.Table) -> pa.Table:
        scored = RepetitionStats(keep_source=True)(t)
        ids = scored.column("doc_id").to_numpy(zero_copy_only=False)
        keep = scored.column("keep").to_numpy(zero_copy_only=False)
        return scored.filter(pa.array(keep & (ids % 97 != 0))).select(
            ["doc_id", "lang", "text"]
        )

    s2 = surv.map_batches(
        rep_keep_and_train, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    dec = s2.map_batches(
        Decontaminator,
        fn_constructor_args=(bench_ref,),
        fn_constructor_kwargs={"keep_source": True},
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )

    def uncontaminated(t: pa.Table) -> pa.Table:
        ov = t.column("n_overlap").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ov == 0)).select(["doc_id", "lang", "text"])

    s3 = dec.map_batches(
        uncontaminated, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    s4 = mixture_subsample(s3, "doc_id", "lang", MIXTURE_WEIGHTS_PERMILLE)

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "split": split_column(t.column("doc_id"), val_permille=100),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        pc.fill_null(t.column("text"), ""), pattern=r"\S+"
                    ),
                    pa.int64(),
                ),
            }
        )

    return s4.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# document chunking (fixed token windows — embedding/indexing prep)
# ---------------------------------------------------------------------------
DOC_CHUNKING_SQL = f"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
c AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
ch AS (SELECT doc_id, ws, n,
              CAST(unnest(range(0, (n + 255) // 256)) AS BIGINT) AS chunk_id
       FROM c)
SELECT doc_id, chunk_id,
  CAST(LEAST(256, n - chunk_id * 256) AS BIGINT) AS n_tok,
  md5(array_to_string(
        list_slice(ws, chunk_id * 256 + 1, LEAST((chunk_id + 1) * 256, n)),
        ' ')) AS chunk_md5
FROM ch
"""


@register("doc_chunking", DOC_CHUNKING_SQL)
def doc_chunking_q(sf_dir: str):
    """Fixed-window document chunking (256 whitespace tokens per chunk) —
    the embedding/indexing prep step.  Shuffle-free flat-map shape; each
    chunk level is one Arrow C++ list_slice + binary_join over the whole
    batch (stages/quality.chunk_documents)."""
    from encode_ingest_ray.stages.quality import chunk_documents

    ds = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)
    return ds.map_batches(
        lambda t: chunk_documents(t, chunk_tokens=256),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def run_corpus_prep(sf_dir: str, out_dir: str, overwrite: bool = False) -> dict:
    """User-facing corpus-prep run: the full cleaning DAG written as
    split-partitioned Parquet (``out/train/``, ``out/val/`` — no '=' in
    paths, per the hive-inference rule) with an atomic ``_SUCCESS.json``
    marker, so a re-run is a no-op (resume-safe like the CDC/transform
    sinks) and a crashed run re-writes cleanly."""
    import json
    import shutil

    marker = os.path.join(out_dir, "_SUCCESS.json")
    if os.path.exists(marker) and not overwrite:
        with open(marker) as f:
            return {**json.load(f), "skipped": True}

    os.makedirs(out_dir, exist_ok=True)
    ds = corpus_prep_q(sf_dir).materialize()
    counts: dict[str, int] = {}
    for split in ("train", "val"):
        part = ds.map_batches(
            lambda t, s=split: t.filter(pc.equal(t.column("split"), s)),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
        dest = os.path.join(out_dir, split)
        shutil.rmtree(dest, ignore_errors=True)
        part.write_parquet(dest)
        counts[split] = part.count()
    summary = {"rows": counts, "out": out_dir, "source": sf_dir}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f)
    os.replace(tmp, marker)
    return summary


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document — exact oracle.  The ln is computed ONCE
# per vocabulary word with SCALAR libm log (math.log), bit-equal to DuckDB's
# ln on this machine (the HLL oracle established this; numpy's SIMD log is
# NOT ulp-identical and must not be used here).  Scores are floored to
# integer micro-units BEFORE ranking, so the top-k compare is pure integer
# (score desc, word asc) on both sides.
# ---------------------------------------------------------------------------
TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                       '\s+'), w -> w <> '')) AS w
  FROM documents),
tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.w AS word,
        CAST(FLOOR((1e6 * tf.tf) * ln(n.n / df.df)) AS BIGINT) AS score_micro
      FROM tf JOIN df USING (w) CROSS JOIN n)
SELECT doc_id, word, score_micro
FROM (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_micro DESC, word) AS rn
      FROM s)
WHERE rn <= 3
"""


@register("tf_idf_topk", TFIDF_SQL)
def tf_idf_topk_q(sf_dir: str):
    """Top-3 TF-IDF terms per document.  The document-frequency table is
    reduced distributed (the same vocab-sized combiner as doc_frequency),
    broadcast once with precomputed scalar-libm ln(N/df) per word, and each
    batch scores its own (doc, word) term counts and selects its top-3 with
    one lexsort — shuffle-free after the tiny df reduction.  At extreme
    vocabulary sizes the broadcast IDF table would hash-partition instead;
    the broadcast shape is the standard one (IDF tables are MBs)."""
    import math

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine
    from encode_ingest_ray.stages.quality import _token_ids, doc_frequency_partial

    docs = _docs(sf_dir, ["doc_id", "text"], min_blocks=8)
    n_docs = docs.count()
    df_rows = bucketed_sum_combine(
        docs.map_batches(
            doc_frequency_partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["word"], ["n_docs"],
    ).take_all()
    words = np.array([r["word"] for r in df_rows])
    dfs = np.array([r["n_docs"] for r in df_rows], np.int64)
    order = np.argsort(words)
    words, dfs = words[order], dfs[order]
    # scalar libm ln once per vocabulary word (bit-equal to DuckDB ln)
    lnv = np.array([math.log(n_docs / int(d)) for d in dfs], np.float64)
    ref = ray.put((words, lnv))

    def score(t: pa.Table) -> pa.Table:
        keys, lns = ray.get(ref)
        doc_idx, tok, vocab = _token_ids(t.column("text"), lowercase=True)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(tok) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "word": pa.array([], pa.string()),
                 "score_micro": pa.array([], pa.int64())}
            )
        V = np.int64(len(vocab))
        ukeys, tf = np.unique(doc_idx * V + tok, return_counts=True)
        udoc = (ukeys // V).astype(np.int64)
        utok = (ukeys % V).astype(np.int64)
        wnames = np.asarray(vocab.to_pylist())[utok]
        pos = np.searchsorted(keys, wnames)
        ln_term = lns[pos]  # every batch word exists in the global df table
        score_micro = np.floor((1e6 * tf.astype(np.float64)) * ln_term).astype(np.int64)
        # top-3 per doc by (score desc, word asc): one lexsort + segment take
        o = np.lexsort((wnames, -score_micro, udoc))
        udoc, wnames, score_micro = udoc[o], wnames[o], score_micro[o]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(udoc)) + 1))
        rank = np.arange(len(udoc)) - np.repeat(starts, np.diff(np.concatenate((starts, [len(udoc)]))))
        keep = rank < 3
        return pa.table(
            {
                "doc_id": pa.array(ids[udoc[keep]]),
                "word": pa.array(wnames[keep], pa.string()),
                "score_micro": pa.array(score_micro[keep]),
            }
        )

    return docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# incremental dedup index: the CDC engine maintains (content-hash -> latest
# doc) state across document-arrival epochs — recrawl dedup with
# exactly-once commits, resume, and the full manifest machinery.
# ---------------------------------------------------------------------------
INCREMENTAL_DEDUP_SQL = r"""
SELECT md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')))
         AS fp_md5,
       MAX(doc_id) AS doc_id
FROM documents GROUP BY 1
"""


@register("incremental_dedup", INCREMENTAL_DEDUP_SQL)
def incremental_dedup_q(sf_dir: str):
    """Recrawl-style INCREMENTAL exact dedup: documents arrive in two
    epochs; each batch becomes CDC events keyed by the normalization
    fingerprint (``conv_id = clean_md5``, ``lsn = doc_id``), and the engine
    maintains the hash→latest-doc index with its full machinery — salted
    push exchange, LWW merge, exactly-once two-phase commits, resume,
    replay dedup.  The committed state after both epochs equals the
    one-shot oracle (latest doc per normalized content hash), which is what
    a 100-TB continuous-crawl pipeline needs: each new crawl batch costs
    one epoch against durable state, never a recompute over the corpus."""
    import shutil
    import tempfile

    from encode_ingest_ray.pipelines.cdc import CdcEngine

    docs = _docs(sf_dir, ["doc_id", "text"])
    cutoff = docs.max("doc_id") // 2

    def to_events(t: pa.Table) -> pa.Table:
        c = clean_text_table(t, keep_source=False)  # doc_id, clean_md5
        ids = c.column("doc_id").combine_chunks().cast(pa.int64())
        n = c.num_rows
        return pa.table(
            {
                "conv_id": c.column("clean_md5"),
                "turn_idx": pa.array(np.zeros(n, np.int32)),
                "ts": pc.cast(pc.multiply(ids, 1_000_000), pa.timestamp("us")),
                "doc_id": ids,
                "op": pa.array(["insert"] * n, pa.string()),
                "lsn": ids,
            }
        )

    scratch = tempfile.mkdtemp(prefix="incr-dedup-")
    try:
        epoch_files: list[list[str]] = []
        for e, pred in enumerate(
            (lambda i: i <= cutoff, lambda i: i > cutoff)
        ):
            part_dir = os.path.join(scratch, f"epoch-{e}")
            (
                docs.map_batches(
                    lambda t, p=pred: t.filter(
                        pa.array(p(t.column("doc_id").to_numpy(zero_copy_only=False)))
                    ),
                    batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
                )
                .map_batches(
                    to_events, batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=None,
                )
                .write_parquet(part_dir)
            )
            epoch_files.append(
                sorted(
                    os.path.join(part_dir, f)
                    for f in os.listdir(part_dir)
                    if f.endswith(".parquet")
                )
            )
        engine = CdcEngine(
            os.path.join(scratch, "table"),
            num_partitions=16,
            num_actors=2,
            actor_num_cpus=0,
        )
        engine.run(epoch_files=epoch_files)
        final = engine.final_table()
        return pa.table(
            {
                "fp_md5": final.column("conv_id"),
                "doc_id": final.column("doc_id"),
            }
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# CCNet-style bigram LM scoring (perplexity filtering)
# ---------------------------------------------------------------------------

LM_SCORE_SQL = f"""
WITH t AS (SELECT doc_id, {_WS} AS ws FROM documents),
big AS (
  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS pair
  FROM t, unnest(range(1, len(ws))) AS r(i)
),
cb AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c2 FROM big GROUP BY pair),
cu AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM big GROUP BY w1)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(FLOOR(ln(CAST(c1 AS DOUBLE) / c2) * 1000000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS nll_micro
FROM big JOIN cb USING (pair) JOIN cu USING (w1)
GROUP BY doc_id
"""


@register("lm_perplexity_score", LM_SCORE_SQL)
def lm_perplexity_score(sf_dir: str):
    """Bigram language-model scoring for perplexity filtering (the CCNet /
    Wenzek et al. 2020 quality gate): train the corpus bigram model in one
    vocabulary-sized combine exchange, broadcast it once, then score every
    document's negative log-likelihood in a pure per-block pass.  Exact in
    round-half-up MICRO-nats: each bigram's ln(c(w1·)/c(w1,w2)) term is
    FLOOR-rounded before the per-doc sum (order-independent; one scalar
    libm log per DISTINCT count pair — the entropy/HLL ln equivalence).
    Contract: the model must fit a broadcast (vocabulary-sized — CCNet
    ships a fixed model per language); an open-vocabulary corpus swaps in
    the cohash-join path."""
    import math

    import ray as _ray

    from encode_ingest_ray.stages.aggregate import bucketed_sum_combine
    from encode_ingest_ray.stages.quality import _token_ids

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _bigrams(batch: pa.Table):
        doc_idx, tok, vocab = _token_ids(batch.column("text"))
        if len(tok) < 2:
            e = np.empty(0, np.int64)
            return e, pa.array([], pa.string()), pa.array([], pa.string())
        same = doc_idx[1:] == doc_idx[:-1]
        w1 = pa.array(tok[:-1][same]).cast(pa.int32())
        w2 = pa.array(tok[1:][same]).cast(pa.int32())
        d = doc_idx[:-1][same]
        v1 = vocab.take(w1)
        pair = pc.binary_join_element_wise(v1, vocab.take(w2), " ")
        return d, v1, pair

    def count_partial(t: pa.Table) -> pa.Table:
        _, _, pair = _bigrams(t)
        g = (
            pa.table({"pair": pair})
            .append_column("n", pa.array(np.ones(len(pair), np.int64)))
            .group_by(["pair"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["pair", "n"])

    model_rows = bucketed_sum_combine(
        ds.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["pair"],
        ["n"],
    ).take_all()  # |distinct bigrams| — the broadcast model
    pairs = np.array([r["pair"] for r in model_rows], dtype=object)
    cb = np.array([r["n"] for r in model_rows], np.int64)
    order = np.argsort(pairs)
    pairs, cb = pairs[order], cb[order]
    w1s: dict = {}
    for p, c in zip(pairs, cb):
        w = p.split(" ", 1)[0]
        w1s[w] = w1s.get(w, 0) + int(c)
    uni = np.array(sorted(w1s), dtype=object)
    cu = np.array([w1s[w] for w in uni], np.int64)
    model = _ray.put((pairs, cb, uni, cu))

    def score(t: pa.Table) -> pa.Table:
        ps, pcnt, us, ucnt = _ray.get(model)
        d, v1, pair = _bigrams(t)
        if len(d) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bigrams": pa.array([], pa.int64()),
                 "nll_micro": pa.array([], pa.int64())}
            )
        pair_np = np.array(pair.to_pylist(), dtype=object)
        v1_np = np.array(v1.to_pylist(), dtype=object)
        c2 = pcnt[np.searchsorted(ps, pair_np)]
        c1 = ucnt[np.searchsorted(us, v1_np)]
        # one libm log per DISTINCT (c1, c2) pair; 2-column unique avoids
        # any composite-key overflow at large corpus counts
        uk, inv = np.unique(np.stack([c1, c2], axis=1), axis=0, return_inverse=True)
        terms = np.empty(len(uk), np.int64)
        for i in range(len(uk)):
            a, b = int(uk[i, 0]), int(uk[i, 1])
            terms[i] = math.floor(math.log(a / b) * 1000000 + 0.5)
        per = terms[inv]
        nd = int(d.max()) + 1
        nll = np.zeros(nd, np.int64)
        np.add.at(nll, d, per)  # integer accumulation (bincount weights are float)
        nbg = np.bincount(d, minlength=nd).astype(np.int64)
        doc_ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        keep = nbg > 0
        rows = np.flatnonzero(keep)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[rows]),
                "n_bigrams": pa.array(nbg[rows]),
                "nll_micro": pa.array(nll[rows]),
            }
        )

    return ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
