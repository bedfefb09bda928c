"""Distributed Lloyd's k-means (stages/kmeans.py) — tiny-corpus parity."""

import numpy as np
import pyarrow as pa
import ray.data

from encode_ingest_ray.stages.kmeans import _assign, _half_away, kmeans_milli


def _ds(vecs):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    return ray.data.from_arrow([t.slice(0, len(vecs) // 2), t.slice(len(vecs) // 2)])


def test_half_away_rounding():
    x = np.array([0.0005, -0.0005, 0.0014, -0.0026]) * 1000
    assert _half_away(x).tolist() == [1, -1, 1, -3]  # away from zero on .5


def test_assign_tie_breaks_to_lowest():
    vq = np.array([[0, 0]], np.int64)
    cents = np.array([[1, 0], [-1, 0]], np.int64)  # equidistant
    assert _assign(vq, cents).tolist() == [0]


def test_kmeans_two_round_clusters(ray_session):
    # ids 0,1 seed the centroids; two obvious blobs around them, plus
    # negative coordinates so the trunc-toward-zero mean is exercised
    vecs = [
        [-1.0, -1.0], [1.0, 1.0],           # seeds
        [-1.1, -0.9], [-0.9, -1.2], [-1.0, -1.1],
        [1.1, 0.9], [0.9, 1.2], [1.0, 1.1],
    ]
    out = kmeans_milli(_ds(vecs), "vec_id", "embedding", k=2, rounds=2).take_all()
    got = {r["vec_id"]: r["cluster"] for r in out}
    assert got[0] == got[2] == got[3] == got[4]
    assert got[1] == got[5] == got[6] == got[7]
    assert got[0] != got[1]
