"""Tests for the two-sample nonparametric test family
(stages/hypothesis.py): distributed KS + Mann-Whitney CDF scan vs a naive
single-process reference, including tie handling and partition-boundary
behavior."""

import numpy as np
import pyarrow as pa
import ray

from encode_ingest_ray.stages.hypothesis import two_sample_scan


def _naive(a_vals, b_vals):
    """Single-process KS numerator + 2*U_A with midrank ties."""
    n_a, n_b = len(a_vals), len(b_vals)
    vs = sorted(set(a_vals) | set(b_vals))
    cum_a = cum_b = 0
    d = 0
    r2 = 0
    cum_all = 0
    for v in vs:
        ca = a_vals.count(v)
        cb = b_vals.count(v)
        cum_a += ca
        cum_b += cb
        d = max(d, abs(cum_a * n_b - cum_b * n_a))
        r2 += ca * (2 * cum_all + (ca + cb) + 1)
        cum_all += ca + cb
    return n_a, n_b, d, r2 - n_a * (n_a + 1)


def _counts_ds(a_vals, b_vals, blocks=7):
    """Per-block partial (v, ca, cb) rows with values deliberately repeated
    across blocks (exercises the cross-block run collapse)."""
    rows = [(v, 1, 0) for v in a_vals] + [(v, 0, 1) for v in b_vals]
    rng = np.random.default_rng(3)
    rng.shuffle(rows)
    tables = []
    for c in range(blocks):
        chunk = rows[c::blocks]
        if not chunk:
            continue
        v, ca, cb = (np.array(x, np.int64) for x in zip(*chunk))
        t = pa.table({"v": v, "ca": ca, "cb": cb})
        g = t.group_by(["v"]).aggregate([("ca", "sum"), ("cb", "sum")])
        tables.append(g.rename_columns(["v", "ca", "cb"]))
    return ray.data.from_arrow(tables)


def test_two_sample_scan_matches_naive():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 80, 500).tolist()   # heavy ties
    b = (rng.integers(0, 80, 400) + 10).tolist()
    n_a, n_b, d, u2 = _naive(a, b)
    got = two_sample_scan(_counts_ds(a, b), num_partitions=5).to_pylist()[0]
    assert got == {"n_a": n_a, "n_b": n_b, "d_num": d, "u2_a": u2}


def test_two_sample_scan_identical_distributions():
    vals = list(range(50)) * 3
    n_a, n_b, d, u2 = _naive(vals, vals)
    got = two_sample_scan(_counts_ds(vals, vals), num_partitions=4).to_pylist()[0]
    assert got["d_num"] == 0 == d
    # identical samples: U_A == n_a*n_b/2, so u2_a == n_a*n_b
    assert got["u2_a"] == got["n_a"] * got["n_b"] == u2


def test_two_sample_scan_disjoint_and_tiny():
    a, b = [1, 2, 3], [10, 11]
    n_a, n_b, d, u2 = _naive(a, b)
    got = two_sample_scan(_counts_ds(a, b, blocks=2), num_partitions=3).to_pylist()[0]
    # total separation: D = 1 -> numerator n_a*n_b; every b outranks every a
    assert got["d_num"] == n_a * n_b == d
    assert got["u2_a"] == 0 == u2


def test_two_sample_scan_single_distinct_value():
    a, b = [5] * 4, [5] * 6
    n_a, n_b, d, u2 = _naive(a, b)
    got = two_sample_scan(_counts_ds(a, b, blocks=3), num_partitions=4).to_pylist()[0]
    assert got == {"n_a": n_a, "n_b": n_b, "d_num": d, "u2_a": u2}
