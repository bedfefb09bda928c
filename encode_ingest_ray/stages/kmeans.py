"""Distributed Lloyd's k-means over an embedding column — the iterative
ML-training loop shape (companion to the PageRank supersteps).

Per round: centroids broadcast once (``ray.put``), every block computes a
vectorized (n×K) squared-distance matrix + argmin, and emits ONE partial row
per (cluster) — the per-dim coordinate sums and a count.  The reduce is a
K×dim integer fold on the driver (the textbook k-means allreduce; at any
scale the partials are K·dim ints per block, never data-sized).  No
exchange at all — the only data-sized pass is the embarrassingly-parallel
assignment scan.

Exactness: coordinates quantize to int64 milli-units, distances are integer
sums of squares, new centroids are integer divisions truncated toward zero
(DuckDB's integer ``//`` TRUNCATES: -7//2 == -3 — numpy floor_divide would
floor to -4), argmin ties break to the lowest cluster id (numpy first-min
== SQL ``ORDER BY d2, cid``) — so an unrolled SQL CTE chain reproduces
every round bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _half_away(x: np.ndarray) -> np.ndarray:
    """ROUND half away from zero (DuckDB ROUND) — np.round is half-to-even."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _quantize(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column -> (n, dim) int64 milli matrix (ROUND half away
    from zero — matches DuckDB ROUND)."""
    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    dim = len(flat) // max(n, 1) if n else 0
    return _half_away(1000.0 * flat).reshape(n, dim)


def _assign(vq: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin cluster index per row (ties -> lowest index), integer math."""
    # (n,K) squared distances without materializing (n,K,dim)
    x2 = (vq * vq).sum(axis=1, keepdims=True)
    c2 = (cents * cents).sum(axis=1)
    d2 = x2 + c2[None, :] - 2 * (vq @ cents.T)
    return np.argmin(d2, axis=1)


def kmeans_milli(
    ds,
    id_col: str,
    vec_col: str,
    k: int = 4,
    rounds: int = 2,
):
    """Run ``rounds`` Lloyd iterations; centroids init from the k lowest
    ``id_col`` rows (deterministic).  Returns a Dataset of (id, cluster).

    ``cids`` tracks surviving cluster ids so an emptied cluster simply
    drops out of the centroid matrix (same as its CTE having no rows).
    """
    import ray

    import pyarrow.compute as pc

    seed_rows = sorted(
        ds.map_batches(
            lambda t: t.filter(pc.less(t.column(id_col), k)),
            batch_format="pyarrow",
            batch_size=None,
        ).take_all(),
        key=lambda r: r[id_col],
    )
    cents = np.array(
        [
            _half_away(1000.0 * np.asarray(r[vec_col], np.float64))
            for r in seed_rows
        ],
        np.int64,
    )
    cids = np.arange(len(cents), dtype=np.int64)

    for _ in range(rounds - 1):
        cents_ref = ray.put((cents, cids))

        def partial(t: pa.Table) -> pa.Table:
            c, ids_ = ray.get(cents_ref)
            if t.num_rows == 0:  # empty block: no partials
                return pa.table(
                    {"cid": pa.array([], pa.int64()),
                     "vsum": pa.array([], pa.list_(pa.int64())),
                     "n": pa.array([], pa.int64())}
                )
            vq = _quantize(t.column(vec_col))
            a = _assign(vq, c)
            out_cid, out_sum, out_n = [], [], []
            for ci in range(len(c)):
                m = a == ci
                if m.any():
                    out_cid.append(ids_[ci])
                    out_sum.append(vq[m].sum(axis=0))
                    out_n.append(int(m.sum()))
            if not out_cid:
                return pa.table(
                    {"cid": pa.array([], pa.int64()),
                     "vsum": pa.array([], pa.list_(pa.int64())),
                     "n": pa.array([], pa.int64())}
                )
            return pa.table(
                {
                    "cid": pa.array(out_cid, pa.int64()),
                    "vsum": pa.array([s.tolist() for s in out_sum]),
                    "n": pa.array(out_n, pa.int64()),
                }
            )

        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for row in ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).take_all():  # ≤ K rows per block — the k-means allreduce
            c = row["cid"]
            v = np.asarray(row["vsum"], np.int64)
            sums[c] = sums.get(c, 0) + v
            counts[c] = counts.get(c, 0) + row["n"]
        cids = np.array(sorted(counts), np.int64)
        # DuckDB integer // TRUNCATES toward zero (-7//2 == -3); numpy
        # floor_divide floors (-4) — emulate the trunc explicitly
        cents = np.stack(
            [
                np.sign(sums[c]) * (np.abs(sums[c]) // counts[c])
                for c in cids
            ]
        )

    cents_ref = ray.put((cents, cids))

    def final_assign(t: pa.Table) -> pa.Table:
        c, ids_ = ray.get(cents_ref)
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64())}
            )
        vq = _quantize(t.column(vec_col))
        a = _assign(vq, c)
        return pa.table(
            {id_col: t.column(id_col), "cluster": pa.array(ids_[a])}
        )

    return ds.map_batches(
        final_assign, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
