"""Unit tests for the stateless operator library (tiny Arrow tables)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from encode_ingest_ray.stages.explode import explode_list
from encode_ingest_ray.stages.dedup import dedup_exact, distinct_values
from encode_ingest_ray.stages.joins import broadcast_join, cohash_join, semi_join_filter
from encode_ingest_ray.stages.normalize import (
    dict_lookup,
    extract_id,
    parse_age_bounds,
    remove_unknowns,
    url_prefix,
)
from encode_ingest_ray.stages.neardup import MinHasher, ngram_jaccard
from encode_ingest_ray.stages.ann import brute_force_topk
from encode_ingest_ray.stages.text import LangId, TextStats


def test_remove_unknowns():
    t = pa.table({"a": ["x", "unknown", None], "b": [1, 2, 3]})
    out = remove_unknowns(t)
    assert out.column("a").to_pylist() == ["x", None, None]
    assert out.column("b").to_pylist() == [1, 2, 3]


def test_extract_id_reference_shape():
    # the reference's /type/accession/ id shape (CommonTransformations.scala:31-44)
    t = pa.table({"at_id": ["/human-donors/ABC123/", "/files/F1/"]})
    out = extract_id(t, "at_id", "id")
    assert out.column("id").to_pylist() == ["ABC123", "F1"]


def test_url_prefix_null_preserving():
    t = pa.table({"p": ["/a/b/", None]})
    out = url_prefix(t, "p", "u")
    assert out.column("u").to_pylist() == ["https://www.encodeproject.org/a/b/", None]


def test_parse_age_bounds_reference_cases():
    # DonorTransformationsSpec cases: "30-33", "90 or above", "5"
    t = pa.table({"age": ["30-33", "90 or above", "5", "garbage"]})
    out = parse_age_bounds(t, "age")
    assert out.column("age_lower").to_pylist() == [30.0, 90.0, 5.0, None]
    assert out.column("age_upper").to_pylist() == [33.0, None, 5.0, None]


def test_dict_lookup_sentinel():
    t = pa.table({"k": ["a", "zz", None]})
    out = dict_lookup(t, "k", "v", {"a": "1"})
    assert out.column("v").to_pylist() == ["1", "!zz", None]


def test_explode_list_with_ordinality():
    t = pa.table({"id": [1, 2, 3], "xs": [[10, 11], [], [12]]})
    out = explode_list(t, "xs", "x", index_out="pos")
    assert out.column("id").to_pylist() == [1, 1, 3]
    assert out.column("x").to_pylist() == [10, 11, 12]
    assert out.column("pos").to_pylist() == [0, 1, 0]


def test_dedup_exact_deterministic():
    ds = ray.data.from_arrow(
        pa.table({"k": ["a", "a", "b"], "o": [3, 1, 2], "v": ["x", "y", "z"]})
    )
    out = dedup_exact(ds, ["k"], "o").to_pandas().sort_values("k")
    assert out["v"].tolist() == ["y", "z"]  # min o per key
    out2 = dedup_exact(ds, ["k"], "o", keep_max=True).to_pandas().sort_values("k")
    assert out2["v"].tolist() == ["x", "z"]


def test_distinct_values():
    ds = ray.data.from_arrow(pa.table({"c": ["p", "q", "p", None, "q"]}))
    vals = sorted(
        v for v in distinct_values(ds, "c").to_pandas()["c"].tolist() if v is not None
    )
    assert vals == ["p", "q"]


def test_broadcast_join_left_and_inner():
    ds = ray.data.from_arrow(pa.table({"k": [1, 2, 9], "v": ["a", "b", "c"]}))
    dim = pa.table({"dk": [1, 2], "name": ["one", "two"]})
    left = broadcast_join(ds, dim, "k", "dk").to_pandas().sort_values("k")
    assert left["name"].fillna("-").tolist() == ["one", "two", "-"]
    inner = broadcast_join(ds, dim, "k", "dk", how="inner").to_pandas()
    assert len(inner) == 2


def test_cohash_join_matches_pandas():
    import pandas as pd

    rng = np.random.default_rng(3)
    left = pa.table({"k": rng.integers(0, 50, 500), "l": rng.integers(0, 9, 500)})
    right = pa.table({"rk": np.arange(50), "r": np.arange(50) * 10})
    got = (
        cohash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), "k", "rk", num_buckets=8
        )
        .to_pandas()
        .sort_values(["k", "l"])
        .reset_index(drop=True)
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")
        .sort_values(["k", "l"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "l", "r"]], want[["k", "l", "r"]], check_dtype=False)


def test_semi_join_filter_and_anti():
    ds = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 4]}))
    assert sorted(semi_join_filter(ds, [2, 4], "k").to_pandas()["k"]) == [2, 4]
    assert sorted(semi_join_filter(ds, [2, 4], "k", anti=True).to_pandas()["k"]) == [1, 3]


def test_minhash_similar_docs_share_signature_bits():
    mh = MinHasher(num_perm=64)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5
    c = "completely different content about databases and shuffles"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.5 > sim_ac


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0


def test_brute_force_topk_self_nearest():
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(30), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), 8
            ),
        }
    )
    q = t.slice(0, 3)
    out = brute_force_topk(ray.data.from_arrow(t), q, k=1).to_pandas()
    # each query's top-1 is itself (cosine 1.0)
    self_rows = out[out["query_id"] == out["neighbor_id"]]
    assert len(self_rows) == 3
    assert (self_rows["cos_milli"] == 1000).all()


def test_text_stats_and_langid():
    t = pa.table({"doc_id": [1, 2], "text": ["the cat and the dog", "der hund und die katze ist"]})
    stats = TextStats()(t)
    assert stats.column("n_words").to_pylist() == [5, 6]
    assert stats.column("n_stop").to_pylist() == [3, 0]  # the, and, the
    lang = LangId()(t)
    assert lang.column("pred_lang").to_pylist() == ["en", "de"]


def test_wire_pack_roundtrip_property():
    """zstd-IPC wire format: pack/unpack is identity for arbitrary tables,
    including slices (non-zero offset buffers) and nulls."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from encode_ingest_ray.state.wire import pack_table, unpack_table

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(0, 50),
        off=st.integers(0, 10),
        data=st.data(),
    )
    def check(n, off, data):
        texts = data.draw(
            st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=n + off, max_size=n + off)
        )
        nums = data.draw(
            st.lists(st.one_of(st.none(), st.integers(-2**60, 2**60)), min_size=n + off, max_size=n + off)
        )
        t = pa.table({"s": pa.array(texts, pa.string()), "i": pa.array(nums, pa.int64())})
        sl = t.slice(off, n)
        assert unpack_table(pack_table(sl)) == sl

    check()


def test_melt_table_roundtrips_pivot():
    from encode_ingest_ray.stages.explode import melt_table

    wide = pa.table(
        {
            "k": [1, 2],
            "n_a": pa.array([3, 0], pa.int64()),
            "n_b": pa.array([0, 7], pa.int64()),
        }
    )
    out = melt_table(wide, ["k"], {"n_a": "a", "n_b": "b"}, "cat", "n")
    rows = sorted(zip(*[out.column(c).to_pylist() for c in ["k", "cat", "n"]]))
    assert rows == [(1, "a", 3), (1, "b", 0), (2, "a", 0), (2, "b", 7)]


def test_filtered_ann_search_subset_of_allowed(ray_session, sf_dir):
    import duckdb

    from encode_ingest_ray.pipelines import registry

    registry.load_all()
    out = registry.QUERIES["filtered_ann_search"](sf_dir)
    if isinstance(out, pa.Table):
        t = out
    else:
        blocks = [
            b for b in __import__("ray").get(out.to_arrow_refs()) if b.num_rows
        ]
        t = pa.concat_tables(blocks)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    allowed = {
        r[0] for r in con.execute(
            "SELECT doc_id FROM documents WHERE lang = 'de'"
        ).fetchall()
    }
    neigh = set(t.column("neighbor_id").to_pylist())
    assert neigh and neigh <= allowed
    # every query returns exactly k=5 ranked neighbors
    import collections

    c = collections.Counter(t.column("query_id").to_pylist())
    assert set(c) == set(range(8)) and all(v == 5 for v in c.values())
