"""Count-Min sketch — the third mergeable sketch (with HLL and the
quantile CDF summaries in stages/sketch.py).

Cormode & Muthukrishnan 2005: a (d × w) counter matrix; each key increments
one counter per row via d pairwise-independent hashes, the estimate is the
MIN over rows (always ≥ truth; over-estimate bounded by εN with probability
1-δ).  Merge is element-wise addition, so the distributed shape is the
k-means allreduce: every block emits its own (d × w) partial matrix —
16 KB at the default geometry, regardless of block size — and the driver
folds them.  Nothing data-sized ever moves.

Hashes are Carter-Wegman ``(a·x + b) mod p mod w`` with literal 61-bit
Mersenne-prime arithmetic — pure integer math, so a SQL oracle can rebuild
the IDENTICAL matrix from the same VALUES-inlined (a, b) rows and the
estimates match bit-for-bit (the same promotion trick as ann_lsh's integer
hyperplanes and k-means' milli quantization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P = (1 << 61) - 1  # Mersenne prime: (a*x+b) % P is computable in uint128-free numpy via object? -- see _hash


def cw_params(d: int, seed: int = 41) -> list[tuple[int, int]]:
    """Deterministic Carter-Wegman (a, b) pairs — a odd, both < 2^31 so the
    products stay inside int128-free exact float/int paths in BOTH numpy
    (object-free int64 overflow-safe via Python ints per unique) and SQL."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(d):
        a = int(rng.randint(1, 1 << 30)) * 2 + 1
        b = int(rng.randint(0, 1 << 30))
        out.append((a, b))
    return out


def _hash_row(keys: np.ndarray, a: int, b: int, w: int) -> np.ndarray:
    """(a*key + b) % P % w — exact via Python-int object math on the UNIQUE
    keys only (a*key can exceed 2^63; uniques keep the loop tiny)."""
    uniq, inv = np.unique(keys, return_inverse=True)
    cols = np.fromiter(
        (((a * int(k) + b) % _P) % w for k in uniq),
        dtype=np.int64,
        count=len(uniq),
    )
    return cols[inv]


def cms_partial(keys: np.ndarray, d: int, w: int, params) -> np.ndarray:
    """One block's (d, w) partial counter matrix."""
    m = np.zeros((d, w), np.int64)
    for i, (a, b) in enumerate(params):
        np.add.at(m[i], _hash_row(keys, a, b, w), 1)
    return m


def cms_estimates(
    ds,
    key_col: str,
    d: int = 4,
    w: int = 512,
    seed: int = 41,
    num_buckets: int | None = None,
):
    """Estimated count per DISTINCT key: per-block (d×w) partials fold on
    the driver (the sketch allreduce), the distinct key set comes from one
    bucketed exchange of per-block distincts, and each key's estimate is
    the row-wise MIN of its d counters via the broadcast matrix."""
    import ray

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    params = cw_params(d, seed)

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        m = cms_partial(keys, d, w, params)
        return pa.table({"m": pa.array([m.ravel().tolist()])})

    matrix = np.zeros(d * w, np.int64)
    for row in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all():  # one 16 KB row per block
        matrix += np.asarray(row["m"], np.int64)
    matrix = matrix.reshape(d, w)
    mref = ray.put((matrix, params))

    def distinct(t: pa.Table) -> pa.Table:
        return (
            t.select([key_col])
            .group_by([key_col])
            .aggregate([(key_col, "count")])
            .select([key_col])
        )

    local = ds.map_batches(
        distinct, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    keys_ds = bucketed_groupby_apply(local, [key_col], distinct, num_buckets)

    def estimate(t: pa.Table) -> pa.Table:
        m, prm = ray.get(mref)
        keys = t.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        est = np.full(len(keys), np.iinfo(np.int64).max)
        for i, (a, b) in enumerate(prm):
            est = np.minimum(est, m[i][_hash_row(keys, a, b, w)])
        return pa.table({key_col: t.column(key_col), "est_n": pa.array(est)})

    return keys_ds.map_batches(
        estimate, batch_format="pyarrow", batch_size=None
    )


def cms_oracle_sql(key_col: str, table: str, d: int = 4, w: int = 512,
                   seed: int = 41) -> str:
    """DuckDB reproduction: identical (a, b) rows inlined, counters built by
    GROUP BY hash column, estimate = MIN over the d rows."""
    params = cw_params(d, seed)
    vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    return f"""
WITH prm(i, a, b) AS (VALUES {vals}),
counters AS (
  SELECT prm.i, ((prm.a * {key_col} + prm.b) % {_P}) % {w} AS col,
         COUNT(*) AS c
  FROM {table} CROSS JOIN prm
  GROUP BY prm.i, col
),
keys AS (SELECT DISTINCT {key_col} FROM {table})
SELECT k.{key_col}, CAST(MIN(c.c) AS BIGINT) AS est_n
FROM keys k
JOIN prm ON TRUE
JOIN counters c
  ON c.i = prm.i AND c.col = ((prm.a * k.{key_col} + prm.b) % {_P}) % {w}
GROUP BY k.{key_col}
"""
