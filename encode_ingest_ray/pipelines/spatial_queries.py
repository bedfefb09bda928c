"""Spatial distance-join queries (stages/spatial.py — grid-cell bucketing).

The synthetic tables carry no coordinates, so the query derives a
deterministic integer point per customer from a salted md5 of its key
(the repo's established exact-in-SQL hash: first 16 hex digits as a
uint64) mod the grid extent — a LINEAR hash (k * prime % extent) looks
tempting but puts consecutive keys on a sparse lattice whose minimum pair
distance exceeds any useful d, i.e. zero pairs at small scale.  The oracle
is the brute-force quadratic self-join; the engine path is the
linear-in-points grid join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from encode_ingest_ray.pipelines.analogs import _read
from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.spatial import grid_pairs_within

_EXTENT = 10_000
_D = 200

SPATIAL_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 16)
              AS UBIGINT) % {_EXTENT} AS BIGINT) AS x,
         CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 16)
              AS UBIGINT) % {_EXTENT} AS BIGINT) AS y
  FROM customer
)
SELECT a.id AS c_custkey_a, b.id AS c_custkey_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_D * _D}
"""


@register("spatial_pairs_customers", SPATIAL_SQL)
def spatial_pairs_customers(sf_dir: str):
    """All customer pairs within Euclidean distance {_D} on the derived
    {_EXTENT}x{_EXTENT} integer grid.  The oracle pays the O(n^2) self-join;
    the engine pays one cell-key exchange over a 10-row stencil projection
    and a vectorized searchsorted expand-join per bucket — the shape that
    stays linear in points (times local density) at 100 TB."""
    ds = _read(sf_dir, "customer", ["c_custkey"])

    def coords(t: pa.Table) -> pa.Table:
        # per-row md5 is fine here: coords are derived once from the keys of
        # a DIM-sized table (the 10-row stencil and the exchange dominate)
        k = t.column("c_custkey").combine_chunks().to_numpy(zero_copy_only=False)

        def h(salt: str) -> np.ndarray:
            return np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(f"{v}:{salt}".encode()).digest()[:8], "big"
                    )
                    % _EXTENT
                    for v in k
                ),
                np.int64,
                len(k),
            )

        return pa.table(
            {"c_custkey": t.column("c_custkey"), "x": pa.array(h("x")), "y": pa.array(h("y"))}
        )

    pts = ds.map_batches(
        coords, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return grid_pairs_within(pts, id_col="c_custkey", x_col="x", y_col="y", d=_D)
