"""Mergeable cardinality sketch (HyperLogLog, Flajolet et al. 2007).

The canonical distributed-sketch shape (task brief: "a novel sketch"):
one sketch per block inside ``map_batches`` (vectorized numpy), merged in a
tiny reduce — distinct-count over any data size with O(2^p) state and no
exact-dedup shuffle.  Registers use the standard HLL bias-corrected
estimator with small/large-range corrections.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of a column: blake2b(digest_size=8) over
    the dictionary-encoded uniques — full 64 bits of entropy (a crc32-based
    hash caps at 2^32 and biases HLL above ~10^5 distinct), and the Python
    loop runs once per UNIQUE value, not per row."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.cast(pa.string()).dictionary_encode()
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(str(u).encode(), digest_size=8).digest(), "little"
            )
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return uh[d.indices.to_numpy(zero_copy_only=False)]


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over nonzero uint64s — pure integer
    shifts (float log2 wraps at the 2^64 boundary and is off-by-one near
    powers of two)."""
    lz = np.zeros(x.shape, np.uint8)
    y = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = y < (np.uint64(1) << np.uint64(64 - s))
        lz[mask] += np.uint8(s)
        y[mask] <<= np.uint64(s)
    return lz


def block_sketch(values: pa.ChunkedArray | pa.Array, p: int = 12) -> np.ndarray:
    """HLL registers (uint8[2^p]) for one block's values."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    h = _hash64(values)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s, never 0
    # rank = leading zeros of the remaining 64-p bits, +1
    rank = (_clz64(rest) + np.uint8(1)).astype(np.uint8)
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
