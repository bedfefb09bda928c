"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Beyond the reference (it has only exact ``distinctBy`` dedup,
ExtractionPipelineBuilder.scala:90-91); these are the training-data-pipeline
additions the task brief requires, built on the canonical public algorithms
(Broder 1997 MinHash; Charikar 2002 SimHash; Leskovec et al., "Mining of
Massive Datasets" ch.3 for banding LSH).

Scale shape: shingle→minhash is per-batch (stateless, vectorized numpy);
banding explodes each doc into (band_id, band_hash) rows; the ONLY shuffle is
the groupby on band buckets; candidate pairs are verified with exact n-gram
Jaccard inside the group task.  Connected-component style final clustering is
left to the caller (pairs output), since candidate sets are tiny relative to
input.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 31) - 1)  # Mersenne-31: keeps all uint64 products overflow-free
_MAXH = np.uint64((1 << 32) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the k-char (byte) shingles — vectorized numpy rolling
    polynomial hash (Rabin-Karp, mod 2^31-1): k vector ops instead of one
    Python hash call per shingle."""
    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    B = np.uint64(1000003)  # < 2^20: products with 31-bit operands never wrap uint64
    if n < k:
        h = np.uint64(0)
        for b in data:
            h = (h * B + b) % _MERSENNE
        return np.array([h], np.uint64)
    pows = np.empty(k, np.uint64)
    pows[0] = 1
    for j in range(1, k):
        pows[j] = (pows[j - 1] * B) % _MERSENNE
    acc = np.zeros(n - k + 1, np.uint64)
    for j in range(k):
        acc = (acc + data[j : n - k + 1 + j] * pows[k - 1 - j]) % _MERSENNE
    return np.unique(acc)


def _word_ngrams(text: str, n: int) -> set:
    words = (text or "").split()
    if len(words) < n:
        return {" ".join(words)}
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


class MinHasher:
    """Per-actor state: the (a, b) coefficient vectors for ``num_perm``
    universal hash functions, built once (seeded → identical on every actor).
    __call__ emits one minhash signature column per batch."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, column: str = "text", seed: int = 13):
        rng = np.random.default_rng(seed)
        # coefficients < 2^31 so a*shingle stays < 2^62 (no uint64 wrap)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.column = column

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (P, S) universal hashing then min over shingles — vectorized
        hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1).astype(np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        if not texts:
            sigs = np.empty((0, self.num_perm), np.uint32)
        else:
            # batch-vectorized: concat every doc's shingle hashes, one
            # (P x total_shingles) universal-hash matrix, per-doc min via
            # np.minimum.reduceat — no per-doc Python matrix work
            shingle_lists = [_shingle_hashes(t, self.k) for t in texts]
            offsets = np.cumsum([0] + [len(s) for s in shingle_lists[:-1]])
            all_sh = np.concatenate(shingle_lists)
            hv = (self.a[:, None] * all_sh[None, :] + self.b[:, None]) % _MERSENNE
            sigs = np.minimum.reduceat(hv, offsets, axis=1).T.astype(np.uint32)
        return batch.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel(), type=pa.uint32()), self.num_perm)
        )


def band_explode(batch: pa.Table, id_column: str, num_bands: int) -> pa.Table:
    """Explode signatures into (band_id, band_hash, doc id) rows for LSH
    bucketing; band_hash folds the band's rows into one uint64."""
    sig_col = batch.column("minhash").combine_chunks()
    n = len(sig_col)
    num_perm = sig_col.type.list_size
    rows_per_band = num_perm // num_bands
    sigs = np.asarray(sig_col.values).reshape(n, num_perm).astype(np.uint64)
    ids = batch.column(id_column).to_numpy(zero_copy_only=False)
    band_ids = np.repeat(np.arange(num_bands, dtype=np.int32), n)
    doc_ids = np.tile(ids, num_bands)
    hashes = np.empty(n * num_bands, np.uint64)
    for b in range(num_bands):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        h = np.zeros(n, np.uint64)
        for j in range(rows_per_band):
            h = (h * np.uint64(1000003) + chunk[:, j]) % _MERSENNE
        hashes[b * n : (b + 1) * n] = h
    return pa.table(
        {
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(hashes.astype(np.int64), type=pa.int64()),
            id_column: pa.array(doc_ids),
        }
    )


def candidate_pairs_from_bucket(group: pa.Table, id_column: str) -> pa.Table:
    """All unordered id pairs sharing an LSH bucket (doc_a < doc_b)."""
    ids = np.unique(group.column(id_column).to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})


def candidate_pairs_bulk(table: pa.Table, id_column: str) -> pa.Table:
    """Pair generation over MANY (band_id, band_hash) groups at once: sort by
    (band, hash) in numpy, scan run boundaries, emit pairs only for the few
    multi-member buckets — most LSH buckets are singletons, so per-bucket
    map_groups calls would dominate 100x."""
    band = table.column("band_id").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    bh = table.column("band_hash").combine_chunks().to_numpy(zero_copy_only=False)
    ids = table.column(id_column).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    n = len(ids)
    boundaries = np.concatenate(
        ([0], np.flatnonzero((np.diff(band) != 0) | (np.diff(bh) != 0)) + 1, [n])
    )
    runs = np.diff(boundaries)
    out_a, out_b = [], []
    for i in np.flatnonzero(runs >= 2):
        lo, hi = int(boundaries[i]), int(boundaries[i + 1])
        uniq = np.unique(ids[lo:hi])
        if len(uniq) < 2:
            continue
        a, b = np.triu_indices(len(uniq), k=1)
        out_a.append(uniq[a])
        out_b.append(uniq[b])
    if not out_a:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    return pa.table(
        {"doc_a": pa.array(np.concatenate(out_a)), "doc_b": pa.array(np.concatenate(out_b))}
    )


def minhash_lsh_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    num_bands: int = 16,
    batch_size: int = 128,
    concurrency: int | None = None,
):
    """Full MinHash-LSH candidate-pair pipeline over a documents Dataset.

    shingle→minhash (actor pool, stateless math but per-actor coefficient
    tables) → band explode → groupby(band bucket) [the one shuffle] →
    pairs → exact dedup of pairs.
    """
    from encode_ingest_ray.stages.dedup import dedup_exact

    # stateless tasks, not an actor pool: the hasher's init cost is
    # microseconds (seeded coefficient vectors), so pool spin-up would cost
    # more than it amortizes; the pickled instance ships once per task
    hasher = MinHasher(num_perm=num_perm, column=text_column)
    sigs = ds.map_batches(
        hasher,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    bands = sigs.map_batches(
        lambda t: band_explode(t, id_column, num_bands),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    pairs = bucketed_groupby_apply(
        bands,
        ["band_id", "band_hash"],
        lambda t: candidate_pairs_bulk(t, id_column),
        num_buckets=32,
    )
    # same pair may surface from several bands → exact dedup on the pair key
    return dedup_exact(pairs, ["doc_a", "doc_b"], "doc_a", keep_max=False)


class SimHasher:
    """64-bit SimHash over word tokens (Charikar 2002): per-token blake2b
    hash, ±1 per bit weighted by term frequency, sign → bit."""

    def __init__(self, column: str = "text"):
        self.column = column
        self._cache: dict[str, int] = {}

    def _token_hash(self, w: str) -> int:
        h = self._cache.get(w)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little")
            if len(self._cache) < 1_000_000:
                self._cache[w] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        out = np.empty(len(texts), np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            acc = np.zeros(64, np.int64)
            for w in (t or "").split():
                h = np.uint64(self._token_hash(w))
                bits = ((h >> bit_idx) & np.uint64(1)).astype(np.int64)
                acc += 2 * bits - 1
            val = np.uint64(0)
            for j in range(64):
                if acc[j] > 0:
                    val |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(val.astype(np.int64))
        return batch.append_column("simhash", pa.array(out, type=pa.int64()))


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity of two texts."""
    sa, sb = _word_ngrams(text_a, n), _word_ngrams(text_b, n)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(
    pairs_ds, docs_table: pa.Table, id_column: str = "doc_id",
    text_column: str = "text", n: int = 3, threshold: float = 0.8
):
    """Verify LSH candidate pairs with exact n-gram Jaccard.  The documents
    table is broadcast once (ray.put) — pairs are few, docs lookups random."""
    import ray

    ref = ray.put(docs_table.select([id_column, text_column]))

    def _verify(batch: pa.Table) -> pa.Table:
        docs = ray.get(ref)
        lookup = dict(
            zip(
                docs.column(id_column).to_pylist(),
                docs.column(text_column).to_pylist(),
            )
        )
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
            j = ngram_jaccard(lookup.get(a, ""), lookup.get(b, ""), n)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(int(round(j * 1000)))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard_milli": pa.array(sims, pa.int64()),
            }
        )

    return pairs_ds.map_batches(_verify, batch_format="pyarrow", batch_size=None)
