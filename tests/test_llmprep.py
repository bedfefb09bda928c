"""Kernel-level semantics for the LLM-prep operators (stages/quality.py).

Oracle parity (engine vs DuckDB) is covered by tools/check_oracles.py; these
tests pin the kernel semantics directly — vectorized-vs-naive equivalence,
edge cases (empty/null/short docs), broadcast-probe correctness and the
exact-quantile rank selection — so a refactor can't silently drift while the
synthetic corpus happens not to exercise a branch.
"""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from encode_ingest_ray.stages.quality import (
    Decontaminator,
    RepetitionStats,
    _doc_gram_hashes,
    benchmark_ngram_hashes,
    bpe_pair_partial,
    clean_text_table,
    doc_frequency_partial,
    redact_pii_table,
)

TEXTS = [
    "a b a b a",
    "",
    "x",
    "a a a a a a",
    "p q r s t u p q r s t u",
    None,
    "one two",
    "w1 w2 w3 w4",
    "  leading   and\ttrailing  ",
]


def _table(texts=TEXTS):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _naive_repetition(txt):
    ws = (txt or "").split()
    n = len(ws)
    topw = max(Counter(ws).values()) if n else 0
    bgs = [tuple(ws[j : j + 2]) for j in range(n - 1)]
    topb = max(Counter(bgs).values()) if bgs else 0
    g5 = [tuple(ws[j : j + 5]) for j in range(n - 4)] if n >= 5 else []
    dup5 = (1000 * (len(g5) - len(set(g5))) // len(g5)) if g5 else 0
    return (
        n,
        1000 * topw // n if n else 0,
        1000 * topb // len(bgs) if bgs else 0,
        dup5,
    )


def test_repetition_stats_matches_naive():
    out = RepetitionStats()(_table())
    for i, txt in enumerate(TEXTS):
        got = (
            out["n_words"][i].as_py(),
            out["top_word_milli"][i].as_py(),
            out["top_bigram_milli"][i].as_py(),
            out["dup_5gram_milli"][i].as_py(),
        )
        assert got == _naive_repetition(txt), (i, txt)


def test_repetition_stats_randomized_vs_naive():
    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd"], size=rng.integers(0, 40)))
        for _ in range(200)
    ]
    out = RepetitionStats()(_table(texts))
    for i, txt in enumerate(texts):
        got = (
            out["n_words"][i].as_py(),
            out["top_word_milli"][i].as_py(),
            out["top_bigram_milli"][i].as_py(),
            out["dup_5gram_milli"][i].as_py(),
        )
        assert got == _naive_repetition(txt), (i, txt)


def test_doc_gram_hashes_distinct_counts():
    gd, _ = _doc_gram_hashes(_table().column("text"), 3)
    for i, txt in enumerate(TEXTS):
        ws = (txt or "").split()
        exp = (
            1
            if len(ws) < 3
            else len({tuple(ws[j : j + 3]) for j in range(len(ws) - 2)})
        )
        assert int((gd == i).sum()) == exp, (i, txt)


def test_gram_hash_batch_independence():
    """The same document must hash identically regardless of batch company
    (the property the broadcast probe relies on)."""
    alone = _doc_gram_hashes(pa.array(["p q r s t u"]))[1]
    together = _doc_gram_hashes(pa.array(["x y z", "p q r s t u"]))
    assert set(alone.tolist()) == set(together[1][together[0] == 1].tolist())


def test_decontaminator_overlap():
    bench = benchmark_ngram_hashes(pa.array(["a b a b x", "p q r"]))
    out = Decontaminator(bench)(_table())
    d = {r["doc_id"]: r for r in out.to_pylist()}
    # 'a b a b a' -> grams {aba, bab}; bench has both
    assert d[0]["n_overlap"] == 2 and d[0]["contam_milli"] == 1000
    # 'p q r s t u p q r s t u' -> 6 distinct grams, only 'p q r' in bench
    assert d[4]["n_grams"] == 6 and d[4]["n_overlap"] == 1
    assert d[4]["contam_milli"] == 1000 * 1 // 6
    # short/empty docs: exactly one gram, no overlap
    assert d[1]["n_grams"] == 1 and d[1]["n_overlap"] == 0
    assert d[6]["n_grams"] == 1


def test_decontaminator_empty_benchmark():
    out = Decontaminator(np.empty(0, np.uint64))(_table())
    assert all(r["n_overlap"] == 0 for r in out.to_pylist())


def test_clean_text_normalizes():
    out = clean_text_table(
        pa.table({"doc_id": [1, 2], "text": ["  A  b\tc ", "a b c"]})
    )
    # both normalize to 'a b c' -> identical fingerprints
    assert out["clean_md5"][0].as_py() == out["clean_md5"][1].as_py()


def test_redact_pii():
    out = redact_pii_table(
        pa.table(
            {
                "event_id": [1, 2, 3],
                "props": ['{"k": 69, "m": 123}', "mail: a.b+c@ex-1.org end", None],
            }
        )
    )
    rows = out.to_pylist()
    assert rows[0] == {
        "event_id": 1, "n_emails": 0, "n_nums": 2,
        "redacted": '{"k": <NUM>, "m": <NUM>}',
    }
    assert rows[1]["n_emails"] == 1 and rows[1]["redacted"] == "mail: <EMAIL> end"
    assert rows[2] == {"event_id": 3, "n_emails": 0, "n_nums": 0, "redacted": ""}


def test_bpe_pair_partial_weights_by_word_count():
    out = bpe_pair_partial(pa.table({"text": ["abc abc ab", ""]}))
    d = dict(zip(out["pair"].to_pylist(), out["n"].to_pylist()))
    assert d == {"ab": 3, "bc": 2}


def test_doc_frequency_counts_docs_once():
    out = doc_frequency_partial(pa.table({"text": ["a a b", "A c", None]}))
    d = dict(zip(out["word"].to_pylist(), out["n_docs"].to_pylist()))
    assert d == {"a": 2, "b": 1, "c": 1}  # lowercased; 'a a' counts once


def test_grouped_quantiles_exact_ranks(sf_dir):
    """Engine result equals the numpy rank-selection on the same data."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from encode_ingest_ray.pipelines.llmprep import grouped_quantiles_exact_q

    got = grouped_quantiles_exact_q(sf_dir)
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    vm = pc.cast(
        pc.round(pc.multiply(t.column("value"), 1000.0), 0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_numpy()
    et = np.asarray(t.column("event_type"))
    rows = {r["event_type"]: r for r in got.to_pylist()}
    for g in np.unique(et):
        vals = np.sort(vm[et == g])
        n = len(vals)
        for p, col in ((500, "p50_milli"), (950, "p95_milli"), (990, "p99_milli")):
            assert rows[g][col] == vals[(p * n + 999) // 1000 - 1], (g, col)


def test_shuffle_order_is_permutation(sf_dir):
    from encode_ingest_ray.pipelines.llmprep import shuffle_order_q

    rows = shuffle_order_q(sf_dir).take_all()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(len(rows)))
    # deterministic across runs
    rows2 = shuffle_order_q(sf_dir).take_all()
    assert {r["doc_id"]: r["rank"] for r in rows} == {
        r["doc_id"]: r["rank"] for r in rows2
    }


def test_corpus_prep_invariants(sf_dir):
    """The composed pipeline's output respects every stage's contract."""
    import pyarrow.parquet as pq

    from encode_ingest_ray.pipelines.llmprep import corpus_prep_q

    rows = corpus_prep_q(sf_dir).take_all()
    all_ids = set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pylist()
    )
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # dedup: no doc twice
    for r in rows:
        assert r["doc_id"] in all_ids
        assert r["doc_id"] % 97 != 0  # benchmark docs never in the corpus
        assert r["split"] in ("train", "val")
        assert r["n_tokens"] >= 0
    # deterministic: identical membership on a second run
    rows2 = corpus_prep_q(sf_dir).take_all()
    assert sorted(ids) == sorted(r["doc_id"] for r in rows2)


def test_repetition_keep_flag_has_both_classes(sf_dir):
    from encode_ingest_ray.pipelines.llmprep import repetition_stats_q

    keeps = [r["keep"] for r in repetition_stats_q(sf_dir).take_all()]
    assert any(keeps) and not all(keeps)


def test_chunk_documents_windows():
    from encode_ingest_ray.stages.quality import chunk_documents

    import hashlib

    texts = ["a b c d e", "", None, "x", " ".join(f"t{i}" for i in range(7))]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = chunk_documents(t, chunk_tokens=3)
    rows = out.to_pylist()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc  # empty/null docs: no chunks
    assert [r["n_tok"] for r in by_doc[0]] == [3, 2]
    assert by_doc[0][1]["chunk_md5"] == hashlib.md5(b"d e").hexdigest()
    assert [r["n_tok"] for r in by_doc[3]] == [1]
    assert [r["n_tok"] for r in by_doc[4]] == [3, 3, 1]
    assert by_doc[4][2]["chunk_md5"] == hashlib.md5(b"t6").hexdigest()


def test_run_corpus_prep_sink_and_resume(sf_dir, tmp_path):
    import os

    import pyarrow.dataset as pads

    from encode_ingest_ray.pipelines.llmprep import run_corpus_prep

    out = str(tmp_path / "prep")
    s1 = run_corpus_prep(sf_dir, out)
    assert "skipped" not in s1 and set(s1["rows"]) == {"train", "val"}
    total = s1["rows"]["train"] + s1["rows"]["val"]
    on_disk = sum(
        pads.dataset(os.path.join(out, sp)).count_rows() for sp in ("train", "val")
    )
    assert on_disk == total and total > 0
    # resume: second run is a no-op
    s2 = run_corpus_prep(sf_dir, out)
    assert s2.get("skipped") is True and s2["rows"] == s1["rows"]
    # overwrite forces a rewrite with identical membership (determinism)
    s3 = run_corpus_prep(sf_dir, out, overwrite=True)
    assert s3["rows"] == s1["rows"]


@pytest.mark.parametrize("driver_max_edges", [5_000_000, 0])
def test_connected_components_chain_and_clique(sf_dir, driver_max_edges):
    """A 6-node path graph needs several propagation rounds (diameter 5) —
    exercises the loop beyond the clique-ish near-dup case — plus a
    separate triangle and an isolated pair.  Runs BOTH the driver fast
    path and (driver_max_edges=0) the distributed loop."""
    import ray.data

    from encode_ingest_ray.stages.components import connected_components

    pairs = pa.table(
        {
            "doc_a": pa.array([10, 11, 12, 13, 14, 20, 21, 20, 30], pa.int64()),
            "doc_b": pa.array([11, 12, 13, 14, 15, 21, 22, 22, 31], pa.int64()),
        }
    )
    out = connected_components(
        ray.data.from_arrow(pairs), driver_max_edges=driver_max_edges
    ).take_all()
    lbl = {r["node"]: r["lbl"] for r in out}
    assert all(lbl[n] == 10 for n in range(10, 16))
    assert all(lbl[n] == 20 for n in (20, 21, 22))
    assert lbl[30] == 30 and lbl[31] == 30


def test_connected_components_empty(sf_dir):
    import ray.data

    from encode_ingest_ray.stages.components import connected_components

    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    assert connected_components(ray.data.from_arrow(empty)).count() == 0


def test_tf_idf_topk_matches_naive(sf_dir):
    """Engine top-3 TF-IDF equals a single-process python computation using
    the identical float expression (scalar math.log, floor-then-rank)."""
    import math

    import pyarrow.parquet as pq

    from encode_ingest_ray.pipelines.llmprep import tf_idf_topk_q

    got = {}
    for r in tf_idf_topk_q(sf_dir).take_all():
        got.setdefault(r["doc_id"], []).append((r["word"], r["score_micro"]))
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        i: (txt or "").lower().split()
        for i, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    n = len(docs)
    df = Counter()
    for ws in docs.values():
        df.update(set(ws))
    for i, ws in docs.items():
        if not ws:
            assert i not in got
            continue
        tf = Counter(ws)
        scored = sorted(
            ((math.floor((1e6 * c) * math.log(n / df[w])), w) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        assert sorted(got[i], key=lambda x: (-x[1], x[0])) == [
            (w, s) for s, w in scored
        ], i
