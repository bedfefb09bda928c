"""Count-Min sketch (stages/cms.py) — merge + estimate properties."""

import numpy as np
import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.cms import cms_estimates, cms_partial, cw_params


def test_partial_merge_equals_single_pass():
    params = cw_params(4)
    a = np.array([1, 2, 2, 3], np.int64)
    b = np.array([2, 3, 3, 3], np.int64)
    merged = cms_partial(a, 4, 64, params) + cms_partial(b, 4, 64, params)
    whole = cms_partial(np.concatenate([a, b]), 4, 64, params)
    assert (merged == whole).all()


def test_estimates_never_undercount(ray_session):
    # heavy skew + tiny width forces collisions: estimates must be >= truth
    keys = [7] * 50 + [11] * 20 + list(range(100, 140))
    t = pa.table({"k": pa.array(keys, pa.int64())})
    ds = ray.data.from_arrow([t.slice(0, 55), t.slice(55)])
    out = {r["k"]: r["est_n"] for r in cms_estimates(ds, "k", d=4, w=16).take_all()}
    import collections

    truth = collections.Counter(keys)
    assert set(out) == set(truth)
    assert all(out[k] >= n for k, n in truth.items())
    # with d=4 rows the heavy keys should still be close
    assert out[7] >= 50 and out[11] >= 20
