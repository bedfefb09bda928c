"""Bloom-filtered semi-join (stages/bloomjoin.py) — tiny-table parity."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.bloomjoin import bloom_semi_join, build_bloom


def test_build_bloom_merges_blocks(ray_session):
    b1 = pa.table({"k": pa.array([1, 2], pa.int64())})
    b2 = pa.table({"k": pa.array([3], pa.int64())})
    bf = build_bloom(ray.data.from_arrow([b1, b2]), "k", capacity=1024)
    assert bf.contains_many([1, 2, 3]).all()  # no false negatives, merged


def test_bloom_semi_join_exact_despite_fp(ray_session):
    # fp_rate ~50% at capacity 1: false positives WILL occur in the probe,
    # the verify must erase every one of them
    big = pa.table(
        {
            "k": pa.array(list(range(100)), pa.int64()),
            "val": pa.array([i * 10 for i in range(100)], pa.int64()),
        }
    )
    keys = pa.table({"kk": pa.array([7, 42], pa.int64())})
    out = bloom_semi_join(
        ray.data.from_arrow([big.slice(0, 50), big.slice(50, 50)]),
        "k",
        ray.data.from_arrow(keys),
        "kk",
        capacity=1,
        fp_rate=0.5,
    ).take_all()
    assert sorted((r["k"], r["val"]) for r in out) == [(7, 70), (42, 420)]
