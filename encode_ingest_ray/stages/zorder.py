"""Z-order (Morton) layout keys — multidimensional clustering for scan
pruning.

The lakehouse OPTIMIZE ZORDER primitive: interleaving the bits of two sort
dimensions gives a single key whose ranges are simultaneously selective on
BOTH columns, so range-partitioning output files by z-prefix lets a reader
prune files for predicates on either dimension (Morton 1966; the standard
Delta/Iceberg clustering trick).  Embarrassingly parallel — the key is pure
per-row bit arithmetic, computed vectorized at the scan; the layout itself
is then just a repartition/sort by ``zval`` prefix.

``part1by1`` is the classic magic-number bit spreader (x -> x with a zero
bit between every original bit), exact for 21-bit inputs; the SQL oracle
reproduces the interleave as a Σ over bit positions, so the keys match
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MASK = (1 << 21) - 1


def part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x so bit i lands at position 2i (the 2-D
    magic-number spread — 0x5555… family, NOT the 3-D 0x1249… one)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave: x bits at even positions, y bits at odd (21 bits each)."""
    return (part1by1(x) | (part1by1(y) << np.uint64(1))).astype(np.int64)


def zorder_keys(ds, x_col: str, y_col: str, id_cols: list[str],
                prefix_shift: int = 30):
    """Append the Morton key and its file-partition prefix to every row —
    the layout pass a writer runs before ``write_parquet`` partitioned by
    ``zpart`` (rows sharing a z-prefix co-locate, so either-dimension range
    predicates prune whole partitions)."""

    def add_z(t: pa.Table) -> pa.Table:
        x = t.column(x_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        y = t.column(y_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        z = morton2(x & _MASK, y & _MASK)
        out = {c: t.column(c) for c in id_cols}
        out["zval"] = pa.array(z)
        out["zpart"] = pa.array(z >> prefix_shift)
        return pa.table(out)

    return ds.map_batches(
        add_z, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def zorder_oracle_sql(
    table: str,
    x_expr: str,
    y_expr: str,
    id_cols: list[str],
    prefix_shift: int = 30,
    bits: int = 21,
) -> str:
    """DuckDB reproduction: the interleave as Σ over bit positions."""
    ids = ", ".join(id_cols)
    return f"""
WITH pos(j) AS (SELECT unnest(range(0, {bits}))),
b AS (SELECT {ids}, ({x_expr}) & {_MASK} AS x, ({y_expr}) & {_MASK} AS y
      FROM {table}),
z AS (
  SELECT {ids},
         CAST(SUM(((x >> j) & 1) * (CAST(1 AS BIGINT) << (2 * j))
                + ((y >> j) & 1) * (CAST(1 AS BIGINT) << (2 * j + 1)))
              AS BIGINT) AS zval
  FROM b CROSS JOIN pos GROUP BY {ids})
SELECT {ids}, zval, zval >> {prefix_shift} AS zpart FROM z
"""
