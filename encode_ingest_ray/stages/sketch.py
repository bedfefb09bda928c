"""Mergeable cardinality sketch (HyperLogLog, Flajolet et al. 2007).

The canonical distributed-sketch shape (task brief: "a novel sketch"):
one sketch per block inside ``map_batches`` (vectorized numpy), merged in a
tiny reduce — distinct-count over any data size with O(2^p) state and no
exact-dedup shuffle.  Registers use the standard HLL bias-corrected
estimator with small/large-range corrections.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of a column (crc32 of the utf8 value,
    avalanched — stable across processes, good enough spread for HLL)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.cast(pa.string()).dictionary_encode()
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (zlib.crc32(str(u).encode()) for u in uniq), dtype=np.uint64, count=len(uniq)
    )
    h = uh[d.indices.to_numpy(zero_copy_only=False)]
    h = (h + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def block_sketch(values: pa.ChunkedArray | pa.Array, p: int = 12) -> np.ndarray:
    """HLL registers (uint8[2^p]) for one block's values."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    h = _hash64(values)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining 64-p bits, +1
    lz = np.zeros(len(h), np.uint8)
    probe = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    # vectorized leading-zero count via float log2 (exact for these ranges)
    nz = cur != 0
    lz[nz] = (63 - np.floor(np.log2(cur[nz].astype(np.float64))).astype(np.int64)).astype(np.uint8)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_sketches(sketches: list[np.ndarray]) -> np.ndarray:
    out = sketches[0].copy()
    for s in sketches[1:]:
        np.maximum(out, s, out)
    return out


def estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Distributed approximate COUNT DISTINCT: one sketch row per block,
    merged on the driver (2^p bytes each — trivially small)."""

    def per_block(t: pa.Table) -> pa.Table:
        regs = block_sketch(t.column(column), p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    sketches = [np.frombuffer(r["sketch"], np.uint8) for r in rows]
    return estimate(merge_sketches(sketches))
