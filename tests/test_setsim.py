"""Tests for the prefix-filtered exact set-similarity self-join
(stages/setsim.py) against a naive all-pairs reference."""

import itertools

import numpy as np
import pyarrow as pa
import ray

from encode_ingest_ray.stages.setsim import _slice_gather, overlap_self_join


def _naive(pairs, threshold):
    baskets = {}
    for i, t in pairs:
        baskets.setdefault(i, set()).add(t)
    out = {}
    for a, b in itertools.combinations(sorted(baskets), 2):
        ov = len(baskets[a] & baskets[b])
        if ov >= threshold:
            out[(a, b)] = ov
    return out


def _ds(pairs, blocks=5):
    ids = np.array([p[0] for p in pairs], np.int64)
    toks = np.array([p[1] for p in pairs], np.int64)
    tables = [
        pa.table({"id": ids[c::blocks], "tok": toks[c::blocks]})
        for c in range(blocks)
        if len(ids[c::blocks])
    ]
    return ray.data.from_arrow(tables)


def _run(pairs, threshold, blocks=5):
    got = overlap_self_join(
        _ds(pairs, blocks), "id", "tok", threshold, num_buckets=4
    ).take_all()
    return {(r["o1"], r["o2"]): r["overlap"] for r in got}


def test_overlap_join_matches_naive_random():
    rng = np.random.default_rng(5)
    # zipf-ish token popularity: hot tokens exercise the prefix filter
    pairs = list(
        {
            (int(i), int(t))
            for i, t in zip(
                rng.integers(0, 60, 800), (rng.zipf(1.5, 800) % 40).astype(int)
            )
        }
    )
    for threshold in (2, 3):
        assert _run(pairs, threshold) == _naive(pairs, threshold)


def test_overlap_join_duplicate_input_rows_are_set_semantics():
    pairs = [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8), (2, 7)]
    assert _run(pairs, 2, blocks=2) == {(1, 2): 2}


def test_overlap_join_threshold_one_and_no_pairs():
    pairs = [(1, 1), (2, 2), (3, 3)]
    assert _run(pairs, 1) == {}
    pairs = [(1, 1), (2, 1)]
    assert _run(pairs, 1, blocks=1) == {(1, 2): 1}


def test_overlap_join_small_baskets_dropped():
    # a basket smaller than the threshold can never qualify
    pairs = [(1, 5), (2, 5), (2, 6), (3, 5), (3, 6)]
    assert _run(pairs, 2, blocks=2) == {(2, 3): 2}


def test_slice_gather():
    values = np.arange(10, dtype=np.int64)
    offsets = np.array([0, 3, 3, 7, 10], np.int64)
    v, lens = _slice_gather(values, offsets, np.array([2, 0, 1], np.int64))
    assert v.tolist() == [3, 4, 5, 6, 0, 1, 2]
    assert lens.tolist() == [4, 3, 0]
    v, lens = _slice_gather(values, offsets, np.array([1], np.int64))
    assert v.tolist() == [] and lens.tolist() == [0]
