"""Quality filtering, benchmark decontamination and corpus-statistics
operators for LLM training-data pipelines (documents / events tables).

Large-scale additions beyond the reference's operator set (task brief),
sibling to stages/text.py:

* :class:`RepetitionStats` — Gopher-style repetition quality signals per
  document (top-word fraction, top-bigram fraction, duplicate-5-gram
  fraction) computed fully vectorized: whitespace tokens are
  dictionary-encoded once per batch (Arrow C++), every n-gram statistic is
  integer key arithmetic + ``np.unique`` — no per-row Python loop.
* :func:`benchmark_ngram_hashes` / :class:`Decontaminator` — n-gram-overlap
  decontamination against a benchmark document set.  The benchmark side is
  tiny by definition (eval sets are MBs), so its distinct gram-hash array is
  built once, ``ray.put`` once, and probed per batch via ``np.searchsorted``
  — the broadcast-small-side shape, never a shuffle join.
* :func:`clean_text_table` — normalization (lower, collapse whitespace,
  trim) + md5 content hash; the regex runs in Arrow's RE2, the same engine
  DuckDB uses, so the oracle matches byte-for-byte.
* :func:`redact_pii_table` — regex redaction (emails, digit runs) with
  match counts; RE2-only patterns (no lookahead, per CLAUDE.md).
* :func:`bpe_pair_partial` — one BPE iteration's pair statistics: adjacent
  character-pair counts, computed per UNIQUE word then weighted by word
  frequency (the per-block combiner: a block with 1M tokens over a 50k
  vocab does 50k pair extractions, not 1M).

All ratio outputs are integer milli-units with floor division — exactly
reproducible in the DuckDB oracles (pipelines/llmprep.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: RE2-safe PII patterns (identical literals in the SQL oracles)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
NUMBER_PATTERN = r"[0-9]+"

#: keep thresholds for the repetition filter (measured on the synthetic
#: corpus so both classes occur: top-word milli spans 51-300, median 93)
TOP_WORD_KEEP_MILLI = 100
DUP_5GRAM_KEEP_MILLI = 200

#: odd multiplier for combining per-token 64-bit hashes into n-gram hashes
#: (uint64 wraparound polynomial — uniform, batch-independent)
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)
_GRAM_SEED = np.uint64(0xCBF29CE484222325)


def _token_ids(
    col: pa.ChunkedArray | pa.Array, lowercase: bool = False
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Whitespace tokens of a string column, dictionary-encoded.

    Returns ``(doc_idx, tok_id, vocab)`` flat arrays with empty tokens
    removed — the exact semantics of the oracles'
    ``list_filter(string_split_regex(coalesce(text, ''), '\\s+'), w -> w <> '')``.
    ``doc_idx`` is nondecreasing (tokens stay in document order).  All the
    splitting/encoding runs in Arrow C++; only index arithmetic happens in
    numpy.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if lowercase:
        col = pc.utf8_lower(col)
    from encode_ingest_ray.functions.text import split_whitespace

    lists = split_whitespace(col)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    counts = np.asarray(lists.value_lengths(), dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    enc = flat.dictionary_encode()
    tok = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    # drop empty tokens (the splitter yields '' at string edges)
    empty_mask = pc.equal(vocab, "")
    empty_ids = np.flatnonzero(empty_mask.to_numpy(zero_copy_only=False))
    if len(empty_ids):
        keep = tok != int(empty_ids[0])
        doc_idx, tok = doc_idx[keep], tok[keep]
    return doc_idx, tok, vocab


def _top_count_per_doc(
    ndocs: int, doc_idx: np.ndarray, keys: np.ndarray, key_span: int
) -> tuple[np.ndarray, np.ndarray]:
    """(max multiplicity, distinct count) of ``keys`` per document.

    ``keys`` must be < ``key_span``; one ``np.unique`` over the combined
    (doc, key) integer gives per-distinct-key multiplicities, then a single
    scatter-max / bincount folds them per document.
    """
    top = np.zeros(ndocs, np.int64)
    distinct = np.zeros(ndocs, np.int64)
    if len(keys) == 0:
        return top, distinct
    combined = doc_idx * np.int64(key_span) + keys
    ukeys, ucnt = np.unique(combined, return_counts=True)
    udoc = ukeys // np.int64(key_span)
    np.maximum.at(top, udoc, ucnt)
    distinct += np.bincount(udoc, minlength=ndocs)
    return top, distinct


class RepetitionStats:
    """Gopher-style repetition signals, vectorized (see module docstring).

    Output columns per input row: ``n_words``, ``top_word_milli``,
    ``top_bigram_milli``, ``dup_5gram_milli`` (all int64, floor-divided
    milli fractions) and ``keep`` (bool: passes the repetition filter).
    """

    def __init__(self, column: str = "text", keep_source: bool = False):
        self.column = column
        self.keep_source = keep_source

    def __call__(self, batch: pa.Table) -> pa.Table:
        ndocs = batch.num_rows
        doc_idx, tok, vocab = _token_ids(batch.column(self.column))
        V = np.int64(max(len(vocab), 1))
        n_words = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)

        top_w, _ = _top_count_per_doc(ndocs, doc_idx, tok, int(V))

        # bigrams: adjacent positions within the same document
        adj = doc_idx[:-1] == doc_idx[1:]
        b_doc = doc_idx[:-1][adj]
        b_key = tok[:-1][adj] * V + tok[1:][adj]
        n_bigrams = np.bincount(b_doc, minlength=ndocs).astype(np.int64)
        top_b, _ = _top_count_per_doc(ndocs, b_doc, b_key, int(V) * int(V))

        # 5-grams via dense re-encoding (ids stay < #positions, no overflow):
        # pair(i) -> dense; 4gram(i) = (pair(i), pair(i+2)) -> dense;
        # 5gram(i) = (4gram(i), tok(i+4)).  Cross-document positions pollute
        # the dense id spaces but are masked out before counting.
        n5 = np.zeros(ndocs, np.int64)
        d5 = np.zeros(ndocs, np.int64)
        if len(tok) >= 5:
            pair = tok[:-1] * V + tok[1:]
            _, pair_d = np.unique(pair, return_inverse=True)
            u2 = np.int64(pair_d.max() + 1)
            four = pair_d[:-2] * u2 + pair_d[2:]
            _, four_d = np.unique(four, return_inverse=True)
            five = four_d[:-1] * V + tok[4:]
            valid = doc_idx[:-4] == doc_idx[4:]
            g_doc = doc_idx[:-4][valid]
            g_key = five[valid]
            if len(g_key):
                _, g_dense = np.unique(g_key, return_inverse=True)
                span = np.int64(g_dense.max() + 1)
                n5 += np.bincount(g_doc, minlength=ndocs)
                _, d5_part = _top_count_per_doc(ndocs, g_doc, g_dense, int(span))
                d5 += d5_part

        nw = np.maximum(n_words, 1)
        top_word_milli = np.where(n_words > 0, 1000 * top_w // nw, 0)
        nb = np.maximum(n_bigrams, 1)
        top_bigram_milli = np.where(n_bigrams > 0, 1000 * top_b // nb, 0)
        n5m = np.maximum(n5, 1)
        dup5_milli = np.where(n5 > 0, 1000 * (n5 - d5) // n5m, 0)
        keep = (top_word_milli <= TOP_WORD_KEEP_MILLI) & (
            dup5_milli <= DUP_5GRAM_KEEP_MILLI
        )
        out = batch if self.keep_source else batch.select(
            [c for c in batch.column_names if c != self.column]
        )
        out = out.append_column("n_words", pa.array(n_words))
        out = out.append_column("top_word_milli", pa.array(top_word_milli.astype(np.int64)))
        out = out.append_column("top_bigram_milli", pa.array(top_bigram_milli.astype(np.int64)))
        out = out.append_column("dup_5gram_milli", pa.array(dup5_milli.astype(np.int64)))
        return out.append_column("keep", pa.array(keep, pa.bool_()))


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------
def _vocab_hashes(vocab: pa.Array) -> np.ndarray:
    """64-bit md5-derived hash per UNIQUE vocab word (loop runs per unique,
    not per token — same trick as sketch._hash64)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
            for w in vocab.to_pylist()
        ),
        dtype=np.uint64,
        count=len(vocab),
    )


def _doc_gram_hashes(
    col: pa.ChunkedArray | pa.Array, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct word-``n``-gram hashes per document.

    Gram semantics match the repo's trigram convention (ngram_jaccard):
    documents with fewer than ``n`` words contribute ONE gram — the whole
    token list (possibly empty).  Hashes combine per-token md5-64 values
    with a wraparound polynomial: batch-independent, uniform, collisions
    negligible (~m^2/2^65; the parity argument the MinHash verify already
    documents).  Returns ``(doc_idx, gram_hash)`` with per-doc duplicates
    removed.
    """
    doc_idx, tok, vocab = _token_ids(col)
    ndocs = 0 if len(doc_idx) == 0 else int(doc_idx.max()) + 1
    h = _vocab_hashes(vocab)[tok] if len(tok) else np.empty(0, np.uint64)
    counts = np.bincount(doc_idx, minlength=ndocs) if ndocs else np.zeros(0, np.int64)

    with np.errstate(over="ignore"):
        # rolling polynomial over n consecutive token hashes
        acc = np.full(len(h) - n + 1 if len(h) >= n else 0, _GRAM_SEED, np.uint64)
        for j in range(n):
            acc = acc * _GRAM_MULT + h[j : len(h) - n + 1 + j]
        valid = doc_idx[: len(acc)] == doc_idx[n - 1 :] if len(acc) else np.empty(0, bool)
        g_doc = doc_idx[: len(acc)][valid]
        g_hash = acc[valid]

        # short docs (< n tokens): one gram over the whole token list
        short_docs = np.flatnonzero(counts < n)
        if len(short_docs):
            short_set = np.zeros(ndocs, bool)
            short_set[short_docs] = True
            s_acc = np.full(len(short_docs), _GRAM_SEED, np.uint64)
            doc_to_slot = np.full(ndocs, -1, np.int64)
            doc_to_slot[short_docs] = np.arange(len(short_docs))
            sel = short_set[doc_idx] if len(doc_idx) else np.empty(0, bool)
            # ordered fold: tokens of short docs arrive in document order,
            # and short docs have < n tokens each, so this loop is bounded
            # by n * #short_docs — not corpus size
            for i in np.flatnonzero(sel):
                slot = doc_to_slot[doc_idx[i]]
                s_acc[slot] = s_acc[slot] * _GRAM_MULT + h[i]
            g_doc = np.concatenate([g_doc, short_docs])
            g_hash = np.concatenate([g_hash, s_acc])

    if len(g_doc) == 0:
        return g_doc.astype(np.int64), g_hash
    # per-doc distinct: lexsort then drop adjacent duplicates
    order = np.lexsort((g_hash, g_doc))
    g_doc, g_hash = g_doc[order], g_hash[order]
    first = np.ones(len(g_doc), bool)
    first[1:] = (g_doc[1:] != g_doc[:-1]) | (g_hash[1:] != g_hash[:-1])
    return g_doc[first].astype(np.int64), g_hash[first]


def benchmark_ngram_hashes(texts: pa.ChunkedArray | pa.Array, n: int = 3) -> np.ndarray:
    """Sorted distinct gram-hash array of the benchmark corpus (the small
    side: build once, ``ray.put`` once, probe everywhere)."""
    _, g = _doc_gram_hashes(texts, n)
    return np.unique(g)


class Decontaminator:
    """Per-document n-gram overlap vs a broadcast benchmark gram set.

    ``bench_ref`` is a ``ray.put`` handle to the sorted hash array —
    resolved ONCE per actor/task in ``__init__`` (state-loaded-once rule),
    probed per batch with a binary search.  Emits ``n_grams``, ``n_overlap``
    (distinct grams also in the benchmark) and ``contam_milli``.
    """

    def __init__(self, bench_ref, column: str = "text", n: int = 3, keep_source: bool = False):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        )
        self.column = column
        self.n = n
        self.keep_source = keep_source

    def __call__(self, batch: pa.Table) -> pa.Table:
        ndocs = batch.num_rows
        g_doc, g_hash = _doc_gram_hashes(batch.column(self.column), self.n)
        n_grams = np.bincount(g_doc, minlength=ndocs).astype(np.int64)
        if len(self.bench) and len(g_hash):
            pos = np.searchsorted(self.bench, g_hash)
            pos[pos == len(self.bench)] = 0
            hit = self.bench[pos] == g_hash
        else:
            hit = np.zeros(len(g_hash), bool)
        n_overlap = np.bincount(g_doc[hit], minlength=ndocs).astype(np.int64)
        contam = 1000 * n_overlap // np.maximum(n_grams, 1)
        out = batch if self.keep_source else batch.select(
            [c for c in batch.column_names if c != self.column]
        )
        out = out.append_column("n_grams", pa.array(n_grams))
        out = out.append_column("n_overlap", pa.array(n_overlap))
        return out.append_column("contam_milli", pa.array(contam.astype(np.int64)))


# ---------------------------------------------------------------------------
# normalization + PII redaction (RE2 kernels — identical in DuckDB)
# ---------------------------------------------------------------------------
def clean_text_table(
    batch: pa.Table, column: str = "text", keep_source: bool = False
) -> pa.Table:
    """lower → collapse whitespace runs → trim → md5; the normalized-content
    fingerprint used for cross-crawl exact dedup."""
    col = pc.fill_null(batch.column(column), "")
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(col), pattern=r"\s+", replacement=" ")
    )
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    md5 = pa.array(
        [hashlib.md5(v.encode("utf-8")).hexdigest() for v in norm.to_pylist()],
        pa.string(),
    )
    out = batch if keep_source else batch.select(
        [c for c in batch.column_names if c != column]
    )
    return out.append_column("clean_md5", md5)


def redact_pii_table(batch: pa.Table, column: str = "props") -> pa.Table:
    """Counts + redaction of emails then digit runs (counts are measured on
    the ORIGINAL string; emails are replaced first so their digits don't
    double-count into ``<NUM>`` replacements)."""
    col = pc.fill_null(batch.column(column), "")
    n_emails = pc.cast(pc.count_substring_regex(col, pattern=EMAIL_PATTERN), pa.int64())
    n_nums = pc.cast(pc.count_substring_regex(col, pattern=NUMBER_PATTERN), pa.int64())
    red = pc.replace_substring_regex(col, pattern=EMAIL_PATTERN, replacement="<EMAIL>")
    red = pc.replace_substring_regex(red, pattern=NUMBER_PATTERN, replacement="<NUM>")
    out = batch.select([c for c in batch.column_names if c != column])
    out = out.append_column("n_emails", n_emails)
    out = out.append_column("n_nums", n_nums)
    return out.append_column("redacted", red)


# ---------------------------------------------------------------------------
# BPE pair statistics (one merge iteration's counts)
# ---------------------------------------------------------------------------
def bpe_pair_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-block (pair, n) partials: adjacent character pairs inside each
    whitespace token.  Pairs are extracted once per UNIQUE word and weighted
    by the word's occurrence count — the block-level combiner that keeps the
    shuffle at vocabulary size, not token count."""
    _, tok, vocab = _token_ids(batch.column(column))
    if len(tok) == 0:
        return pa.table({"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    word_counts = np.bincount(tok, minlength=len(vocab))
    agg: dict[str, int] = {}
    for wid, cnt in enumerate(word_counts):
        if cnt == 0:
            continue
        w = vocab[wid].as_py()
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            agg[p] = agg.get(p, 0) + int(cnt)
    return pa.table(
        {
            "pair": pa.array(list(agg.keys()), pa.string()),
            "n": pa.array(list(agg.values()), pa.int64()),
        }
    )


def doc_frequency_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-block (word, df) partials: each document counts a word ONCE.
    Documents never span blocks, so per-block distinct-(doc, word) counts
    sum to the exact global document frequency."""
    doc_idx, tok, vocab = _token_ids(batch.column(column), lowercase=True)
    if len(tok) == 0:
        return pa.table({"word": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())})
    V = np.int64(len(vocab))
    ukeys = np.unique(doc_idx * V + tok)
    df = np.bincount((ukeys % V).astype(np.int64), minlength=int(V))
    present = np.flatnonzero(df)
    return pa.table(
        {
            "word": vocab.take(pa.array(present, pa.int64())),
            "n_docs": pa.array(df[present].astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# document chunking (fixed token windows — the embedding/indexing prep step)
# ---------------------------------------------------------------------------
def chunk_documents(
    batch: pa.Table,
    column: str = "text",
    id_column: str = "doc_id",
    chunk_tokens: int = 256,
) -> pa.Table:
    """Split each document into fixed ``chunk_tokens`` windows of whitespace
    tokens.  Vectorized: the batch's tokens become ONE rebuilt ListArray and
    each chunk level is a single Arrow C++ ``list_slice`` + ``binary_join``
    over all documents at once (the loop runs max-chunks-per-doc times, not
    once per document).  Zero-token documents produce no chunks.  Output:
    (doc_id, chunk_id, n_tok, chunk_md5) — md5 of the space-joined window,
    byte-equal to the DuckDB oracle's array_to_string slice."""
    doc_idx, tok, vocab = _token_ids(batch.column(column))
    ndocs = batch.num_rows
    counts = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
    flat = vocab.take(pa.array(tok, pa.int64()))
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    ids = batch.column(id_column).combine_chunks()

    out: list[pa.Table] = []
    max_chunks = int((counts.max() + chunk_tokens - 1) // chunk_tokens) if ndocs else 0
    for c in range(max_chunks):
        sel = counts > c * chunk_tokens
        joined = pc.binary_join(
            pc.list_slice(lists, c * chunk_tokens, (c + 1) * chunk_tokens), " "
        )
        sel_arr = pa.array(sel)
        texts = joined.filter(sel_arr)
        md5 = pa.array(
            [hashlib.md5(v.encode("utf-8")).hexdigest() for v in texts.to_pylist()],
            pa.string(),
        )
        n_tok = np.minimum(chunk_tokens, counts[sel] - c * chunk_tokens)
        out.append(
            pa.table(
                {
                    id_column: ids.filter(sel_arr),
                    "chunk_id": pa.array(np.full(int(sel.sum()), c, np.int64)),
                    "n_tok": pa.array(n_tok.astype(np.int64)),
                    "chunk_md5": md5,
                }
            )
        )
    if not out:
        return pa.table(
            {
                id_column: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "chunk_md5": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(out)
