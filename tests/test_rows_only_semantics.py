"""Correctness tests for the rows-only (non-SQL-oracle) operators: the
driver only row-counts these, so their semantics are pinned here instead."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.ann import brute_force_topk, ivf_topk, lsh_bucketed_topk
from encode_ingest_ray.stages.neardup import (
    MinHasher,
    SimHasher,
    minhash_lsh_pairs,
    ngram_jaccard,
    verify_pairs_jaccard,
)


def _embeddings(n=200, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), dim
            ),
        }
    ), vecs


def test_brute_force_topk_matches_duckdb_ranking():
    t, vecs = _embeddings()
    q = t.slice(0, 4)
    got = (
        brute_force_topk(ray.data.from_arrow(t), q, k=5)
        .to_pandas()
        .sort_values(["query_id", "cos_milli", "neighbor_id"], ascending=[True, False, True])
    )
    con = duckdb.connect()
    con.register("emb", t.to_pandas())
    want = con.execute(
        """
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding, e.embedding) AS sim
        FROM emb q CROSS JOIN emb e WHERE q.vec_id < 4
        QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY sim DESC, e.vec_id) <= 5
        """
    ).fetchdf()
    for qid in range(4):
        g = set(got[got["query_id"] == qid]["neighbor_id"])
        w = set(want[want["query_id"] == qid]["neighbor_id"])
        # identical up to FP ties at the k-boundary
        assert len(g & w) >= 4, (qid, g, w)


def test_approximate_ann_recall_vs_exact():
    t, vecs = _embeddings(n=400)
    q = t.slice(0, 8)
    exact = brute_force_topk(ray.data.from_arrow(t), q, k=5).to_pandas()
    for approx_ds in (
        lsh_bucketed_topk(ray.data.from_arrow(t), q, dim=16, k=5, num_planes=4),
        ivf_topk(ray.data.from_arrow(t), q, k=5, n_centroids=8, nprobe=3),
    ):
        approx = approx_ds.to_pandas()
        hits = total = 0
        for qid in exact["query_id"].unique():
            e = set(exact[exact["query_id"] == qid]["neighbor_id"])
            a = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(e & a)
            total += len(e)
        # every query finds itself, and recall is well above chance (5/400)
        assert hits / total > 0.3, hits / total


def _near_dup_docs():
    base = (
        "the quick brown fox jumps over the lazy dog while the rain in spain "
        "falls mainly on the plain and the cat sat on the mat near the door"
    )
    rows = []
    for i in range(40):
        rows.append((2 * i, base + f" tail {i}"))          # near-dups of base
        rows.append((2 * i + 1, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(30))))
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )


def test_minhash_lsh_finds_true_near_dups_and_verify_is_exact():
    docs = _near_dup_docs()
    pairs = minhash_lsh_pairs(ray.data.from_arrow(docs), num_perm=64, num_bands=16)
    verified = verify_pairs_jaccard(
        pairs, ray.data.from_arrow(docs), threshold=0.6
    ).to_pandas()
    # the exchange-based large-candidate path must agree exactly with the
    # broadcast small-candidate path
    verified_ex = (
        verify_pairs_jaccard(
            pairs, ray.data.from_arrow(docs), threshold=0.6, broadcast_max_docs=0
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert verified_ex.equals(
        verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert len(verified) > 100  # the 40 base variants pair up heavily
    text = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    from encode_ingest_ray.stages.neardup import _word_ngrams, jac_milli

    for _, r in verified.head(50).iterrows():
        sa = _word_ngrams(text[r["doc_a"]], 3)
        sb = _word_ngrams(text[r["doc_b"]], 3)
        j = ngram_jaccard(text[r["doc_a"]], text[r["doc_b"]], 3)
        assert jac_milli(len(sa & sb), len(sa | sb)) == r["jaccard_milli"]
        assert j >= 0.6
        # near-dup pairs are base variants: even ids
        assert r["doc_a"] % 2 == 0 and r["doc_b"] % 2 == 0


def test_embedding_near_dup_multiband_recall_and_bucket_cap():
    """Planted near-dup vector pairs must all surface; every reported pair's
    cosine must be exact; a tiny max_bucket (forcing re-splits) must still
    recover the planted high-cosine pairs and never go quadratic."""
    from encode_ingest_ray.stages.ann import _normalize, embedding_near_dup_pairs

    rng = np.random.default_rng(5)
    n, dim = 400, 16
    vecs = rng.standard_normal((n, dim))
    # plant 20 near-dups: vec[i+n] = vec[i] + tiny noise (cos > 0.99)
    planted = [(i, n + j) for j, i in enumerate(range(0, 200, 10))]
    dups = np.stack([vecs[i] + 0.01 * rng.standard_normal(dim) for i, _ in planted])
    allv = np.concatenate([vecs, dups])
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(len(allv)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(allv.ravel().astype(np.float32), pa.float32()), dim
            ),
        }
    )
    ds = ray.data.from_arrow(table)
    out = embedding_near_dup_pairs(ds, dim, threshold_milli=900).to_pandas()
    got = set(zip(out["vec_a"], out["vec_b"]))
    assert set(planted) <= got, set(planted) - got
    # exact cosine check on every reported pair
    m = _normalize(allv)
    for _, r in out.iterrows():
        true_milli = int(round((m[int(r["vec_a"])] @ m[int(r["vec_b"])]) * 1000))
        assert true_milli == r["cos_milli"]
    # force re-splits: every run is over the cap; planted pairs still found
    capped = embedding_near_dup_pairs(
        ds, dim, threshold_milli=900, max_bucket=8
    ).to_pandas()
    got_capped = set(zip(capped["vec_a"], capped["vec_b"]))
    found = sum(1 for p in planted if p in got_capped)
    assert found >= len(planted) * 0.8, f"{found}/{len(planted)} under cap"


def test_simhash_hamming_separates_similar_from_different():
    docs = _near_dup_docs()
    out = SimHasher()(docs)
    sims = dict(zip(out.column("doc_id").to_pylist(), out.column("simhash").to_pylist()))

    def ham(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")

    near = ham(sims[0], sims[2])      # two base variants
    far = ham(sims[0], sims[1])       # base vs unrelated
    assert near < far
    assert near <= 8


def test_minhash_signature_estimates_jaccard():
    mh = MinHasher(num_perm=128)
    a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    b = "alpha beta gamma delta epsilon zeta omega psi " * 4
    est = (mh.signature(a) == mh.signature(b)).mean()
    true = ngram_jaccard(a, b, 1)  # rough scale check only
    assert 0.2 < est < 0.95 and abs(est - true) < 0.35


def test_hll_sketch_accuracy_and_mergeability():
    import pyarrow as pa

    from encode_ingest_ray.stages.sketch import (
        block_sketch,
        estimate,
        merge_sketches,
    )

    rng = np.random.default_rng(7)
    values = [f"u{v}" for v in rng.integers(0, 50_000, 200_000)]
    true = len(set(values))
    arr = pa.array(values)
    # split into 8 blocks, sketch each, merge — same answer as one sketch
    blocks = [arr.slice(i * 25_000, 25_000) for i in range(8)]
    merged = merge_sketches([block_sketch(b) for b in blocks])
    single = block_sketch(arr)
    assert (merged == single).all()
    est = estimate(merged)
    assert abs(est - true) / true < 0.05  # p=12 -> ~1.6% std error


def test_hll_million_distinct():
    # full-entropy 64-bit hash: at p=12 (std err ~1.6%) the estimate must stay
    # within 2% at 10^6 distinct — the crc32-based hash drifted well past this
    import pyarrow as pa

    from encode_ingest_ray.stages.sketch import block_sketch, estimate, merge_sketches

    vals = [f"user-{i}" for i in range(1_000_000)]
    merged = merge_sketches(
        [block_sketch(pa.array(vals[i::10]), 12) for i in range(10)]
    )
    est = estimate(merged)
    assert abs(est - 1_000_000) / 1_000_000 < 0.02


def test_hll_clz_boundaries():
    from encode_ingest_ray.stages.sketch import _clz64

    x = np.array([1, 2, 3, (1 << 63), (1 << 63) - 1, 1 << 32, (1 << 64) - 1], np.uint64)
    assert _clz64(x).tolist() == [63, 62, 62, 0, 1, 31, 0]


def test_hll_small_range():
    import pyarrow as pa

    from encode_ingest_ray.stages.sketch import block_sketch, estimate

    est = estimate(block_sketch(pa.array([f"x{i}" for i in range(10)])))
    assert abs(est - 10) < 2


def test_grouped_quantile_sketch_accuracy():
    """Merged per-block summaries stay within 1% rank error of the exact
    quantiles, and the distributed grouped form agrees with DuckDB within
    that bound."""
    import os

    from encode_ingest_ray.stages.sketch import (
        merge_quantile_summaries,
        quantile_summary,
        summary_quantile,
    )

    rng = np.random.default_rng(3)
    vals = rng.exponential(10, 100_000)
    blocks = [quantile_summary(vals[i::16], 256) for i in range(16)]
    merged = merge_quantile_summaries(blocks, 256)
    for phi in (0.5, 0.9, 0.95, 0.99):
        got = summary_quantile(merged, phi)
        assert abs((vals <= got).mean() - phi) < 0.01

    sf = "/root/testdata/sf0.001"
    if os.path.exists(os.path.join(sf, "events.parquet")):
        from encode_ingest_ray.pipelines.training import grouped_quantiles

        got_df = grouped_quantiles(sf).to_pandas().set_index("event_type")
        con = duckdb.connect()
        want = con.execute(
            f"""SELECT event_type, quantile_cont(value, 0.95) AS p95
                FROM read_parquet('{sf}/events.parquet') GROUP BY event_type"""
        ).fetchdf().set_index("event_type")
        for et in want.index:
            approx = got_df.loc[et]["p95_milli"] / 1000
            exact = want.loc[et]["p95"]
            assert abs(approx - exact) / max(exact, 1e-9) < 0.1, (et, approx, exact)


def test_quantile_summary_merge_properties():
    """Property: any block split of the same values yields summaries whose
    merge stays within the q-bounded rank error, and quantiles are monotone
    in phi."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from encode_ingest_ray.stages.sketch import (
        merge_quantile_summaries,
        quantile_summary,
        summary_quantile,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(10, 3000),
        splits=st.integers(1, 7),
        seed=st.integers(0, 10_000),
    )
    def check(n, splits, seed):
        rng = np.random.default_rng(seed)
        vals = rng.normal(0, 100, n)
        merged = merge_quantile_summaries(
            [quantile_summary(vals[i::splits], 128) for i in range(splits)], 128
        )
        # total weight is preserved exactly
        assert int(merged[:, 1].sum()) == n
        last = -np.inf
        for phi in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            q = summary_quantile(merged, phi)
            assert q >= last  # monotone
            last = q
            rank_err = abs((vals <= q).mean() - phi)
            assert rank_err <= max(2 * splits * 1.0 / 128, 2.0 / n) + 1e-9, (
                phi,
                rank_err,
            )

    check()


# ---------------------------------------------------------------------------
# hashed-ngram wire form: parity with the string-set Jaccard
# ---------------------------------------------------------------------------
def test_ngram_hash_jaccard_matches_string_jaccard():
    from hypothesis import given, settings, strategies as st

    from encode_ingest_ray.stages.neardup import _ngram_hashes

    words = st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=25
    )

    @settings(max_examples=300, deadline=None)
    @given(words, words, st.integers(min_value=1, max_value=4))
    def check(wa, wb, n):
        ta, tb = " ".join(wa), " ".join(wb)
        sa, sb = _ngram_hashes(ta, n), _ngram_hashes(tb, n)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        got = (inter / union) if union else 1.0
        assert abs(got - ngram_jaccard(ta, tb, n)) < 1e-12

    check()


def test_verify_fused_dedup_matches_separate_dedup():
    """dedup=False + dedup_pairs=True (the fused fast path) must equal
    dedup=True + plain verify on BOTH verify paths."""
    docs = _near_dup_docs()

    def run(dedup_in_lsh, dedup_in_verify, bmax):
        pairs = minhash_lsh_pairs(
            ray.data.from_arrow(docs), num_perm=64, num_bands=16, dedup=dedup_in_lsh
        )
        return (
            verify_pairs_jaccard(
                pairs,
                ray.data.from_arrow(docs),
                threshold=0.6,
                dedup_pairs=dedup_in_verify,
                broadcast_max_docs=bmax,
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    want = run(True, False, 100_000)
    assert run(False, True, 100_000).equals(want)  # small path
    assert run(False, True, 0).equals(want)  # exchange path


def test_ngram_jaccard_pairs_exact_vs_brute_force():
    """The prefix-filtered set-similarity join must equal brute-force
    all-pairs string-set Jaccard EXACTLY (no false negatives, no false
    positives, identical milli values) — including <n-word docs, empty
    docs, and identical docs."""
    import itertools

    from encode_ingest_ray.stages.neardup import (
        _word_ngrams,
        jac_milli,
        ngram_jaccard_pairs,
    )

    texts = {}
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(30):
        texts[i] = base + f" lambda{i}"          # heavy near-dups of base
    for i in range(30, 60):
        texts[i] = " ".join(f"w{i}_{j}" for j in range(12))  # unrelated
    texts[60] = texts[61] = base                  # identical pair
    texts[62] = "two words"                       # < n words
    texts[63] = ""                                # empty
    texts[64] = ""                                # empty pair (jac == 1)
    docs = pa.table(
        {"doc_id": pa.array(sorted(texts), pa.int64()),
         "text": pa.array([texts[i] for i in sorted(texts)])}
    )
    t_milli = 800
    expected = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = _word_ngrams(texts[a], 3), _word_ngrams(texts[b], 3)
        inter, union = len(sa & sb), len(sa | sb)
        if union == 0 or 1000 * inter >= t_milli * union:
            expected[(a, b)] = jac_milli(inter, union)
    assert expected, "fixture must plant qualifying pairs"

    got_df = ngram_jaccard_pairs(
        ray.data.from_arrow(docs), ray.data.from_arrow(docs),
        n=3, threshold_milli=t_milli,
    ).to_pandas()
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): int(r["jaccard_milli"])
        for _, r in got_df.iterrows()
    }
    assert got == expected


def test_hash_split_deterministic_and_balanced(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from encode_ingest_ray.stages.packing import hash_split, split_column

    ids = pa.array(np.arange(20_000, dtype=np.int64))
    a = split_column(ids).to_pylist()
    b = split_column(ids).to_pylist()
    assert a == b  # deterministic
    frac = a.count("val") / len(a)
    assert 0.08 < frac < 0.12  # ~10% val
    # distributed assignment matches the local kernel regardless of blocks
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(7)
    rows = {r["doc_id"]: r["split"] for r in hash_split(ds, "doc_id").take_all()}
    assert [rows[i] for i in range(20_000)] == a


def test_pack_sequences_scan_crosses_blocks(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from encode_ingest_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(5)
    n = 3_000
    counts = rng.integers(1, 400, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n)), "n_tokens": pa.array(counts)})
    ).random_shuffle(seed=3).repartition(11)
    out = sorted(
        pack_sequences(ds, "doc_id", "n_tokens", budget=512).take_all(),
        key=lambda r: r["doc_id"],
    )
    # the global scan must equal the single-stream cumulative bin layout
    before = np.cumsum(counts) - counts
    assert [r["bin_id"] for r in out] == list(before // 512)
    bins = np.array([r["bin_id"] for r in out])
    assert (np.diff(bins) >= 0).all()  # bins non-decreasing in stream order


def test_candidate_pairs_bulk_star_cap():
    """Oversized identical-signature buckets emit star pairs (min id hub)
    instead of the quadratic all-pairs set; small buckets are unaffected."""
    import numpy as np

    from encode_ingest_ray.stages.neardup import candidate_pairs_bulk

    t = pa.table(
        {
            "band_id": pa.array([0] * 6 + [1] * 2, pa.int32()),
            "band_hash": pa.array([7] * 6 + [9] * 2, pa.int64()),
            "doc_id": pa.array([5, 3, 9, 1, 7, 11, 2, 4], pa.int64()),
        }
    )
    assert candidate_pairs_bulk(t, "doc_id").num_rows == 15 + 1  # exact default
    capped = candidate_pairs_bulk(t, "doc_id", max_bucket=4).to_pydict()
    assert capped == {"doc_a": [1, 1, 1, 1, 1, 2], "doc_b": [3, 5, 7, 9, 11, 4]}


def test_ivf_integer_anchor_path_finds_self():
    from encode_ingest_ray.stages.ann import IntegerAnchors

    t, vecs = _embeddings(n=200)
    q = t.slice(0, 6)
    out = ivf_topk(
        ray.data.from_arrow(t), q, k=5, nprobe=2, anchors=IntegerAnchors(16, 8)
    ).to_pandas()
    # a query's own assigned anchor is its top probe, so it always finds itself
    for qid in range(6):
        mine = out[out["query_id"] == qid]
        assert qid in set(mine["neighbor_id"]), qid
        assert mine["cos_milli"].max() == 1000
