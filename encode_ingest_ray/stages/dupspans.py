"""Duplicated-substring detection over a document corpus.

The substring-level training-data dedup shape (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022): instead of whole-doc
near-dup, find word-``L``-gram POSITIONS whose gram occurs more than once
corpus-wide — the spans a suffix-array dedup would cut.  Expressed
Ray-Data-first as two bucketed exchanges of pre-combined partials:

1. per block (``map_batches``): tokenize in Arrow C++, build every gram
   string with ONE vectorized ``binary_join_element_wise`` over L shifted
   slices of the flat token array (no per-doc loop), pre-combine to
   ``(gram, doc_id, cnt)`` rows — within-doc repeats collapse here;
2. exchange on ``gram`` (stages/aggregate.bucketed_groupby_apply): each
   bucket holds every occurrence of its grams, so the global per-gram total
   is local; reduce straight to per-doc partials ``(doc_id, n_grams,
   n_dup)`` — gram strings never leave this stage;
3. one tiny exchange on ``doc_id`` sums the partials.

Raw grams cross the wire once (stage 1→2), already block-deduplicated; the
doc-keyed rows that cross stage 2→3 are bounded by docs x buckets.  Docs
shorter than ``L`` words contribute one whole-doc gram (the repo's
``_GRAMS`` convention, stages/quality.py), so ``n_grams >= 1`` always.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.quality import _token_ids


def gram_position_partials(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", L: int = 8
) -> pa.Table:
    """Per-block ``(gram, doc_id, cnt)`` partials — see module docstring."""
    ndocs = batch.num_rows
    ids = batch.column(id_col).combine_chunks()
    doc_idx, tok_id, vocab = _token_ids(batch.column(text_col))
    flat = vocab.take(pa.array(tok_id, pa.int64()))
    T = len(doc_idx)
    n_tok = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)

    grams: list[pa.Array] = []
    gram_docs: list[np.ndarray] = []
    if T >= L:
        m = T - L + 1
        # position i starts a gram iff all L tokens are in the same doc
        valid = doc_idx[:m] == doc_idx[L - 1 :]
        joined = pc.binary_join_element_wise(
            *(flat.slice(j, m) for j in range(L)), " "
        )
        grams.append(joined.filter(pa.array(valid)))
        gram_docs.append(doc_idx[:m][valid])
    short = np.flatnonzero(n_tok < L)
    if len(short):
        offsets = np.zeros(ndocs + 1, np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32() if T < 2**31 else pa.int64()).cast(pa.int32()),
            flat,
        )
        whole = pc.binary_join(lists, " ")
        grams.append(whole.take(pa.array(short, pa.int64())))
        gram_docs.append(short)
    gram_col = pa.concat_arrays([g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g for g in grams])
    doc_col = ids.take(pa.array(np.concatenate(gram_docs), pa.int64()))
    t = pa.table(
        {
            "gram": gram_col,
            "doc_id": doc_col,
            "cnt": pa.array(np.ones(len(gram_col), np.int64)),
        }
    )
    g = t.group_by(["gram", "doc_id"]).aggregate([("cnt", "sum")])
    return g.rename_columns(["gram", "doc_id", "cnt"])


def dup_doc_partials(t: pa.Table) -> pa.Table:
    """Per gram-bucket reduce: global per-gram totals are local to the
    bucket; emit ``(doc_id, n_grams, n_dup)`` partials."""
    codes_arr = t.column("gram").combine_chunks().dictionary_encode()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").combine_chunks().to_numpy(zero_copy_only=False)
    totals = np.bincount(codes, weights=cnt).astype(np.int64)
    dup = totals[codes] >= 2
    part = pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_grams": pa.array(cnt, pa.int64()),
            "n_dup": pa.array(np.where(dup, cnt, 0).astype(np.int64)),
        }
    )
    g = part.group_by(["doc_id"]).aggregate([("n_grams", "sum"), ("n_dup", "sum")])
    return g.rename_columns(["doc_id", "n_grams", "n_dup"])
