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
    """Deterministic 64-bit hashes of a column: the first 8 bytes (big-endian)
    of md5 over the dictionary-encoded uniques — full 64 bits of entropy (a
    crc32-based hash caps at 2^32 and biases HLL above ~10^5 distinct), the
    Python loop runs once per UNIQUE value, not per row, and the hash is
    exactly ``('0x' || substr(md5(v), 1, 16))::UBIGINT`` in DuckDB so the
    whole register computation is SQL-expressible (an exact oracle)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.cast(pa.string()).dictionary_encode()
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(u).encode()).digest()[:8], "big")
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
    """Bias-corrected HLL estimate, computed so a DuckDB SQL oracle can
    reproduce it BIT-FOR-BIT: the harmonic sum is exact integer arithmetic
    (sum(2^-reg) == S / 2^64 with S an exact Python int / SQL HUGEINT), the
    float expression mirrors the SQL operator order left-to-right, and the
    small-range branch uses scalar libm ``math.log`` (DuckDB's ``ln`` calls
    the same libm symbol — verified bit-identical)."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    cnt = np.bincount(regs.astype(np.int64), minlength=65)
    S = sum(int(c) << (64 - r) for r, c in enumerate(cnt) if c)  # exact
    est = alpha * m * m * 18446744073709551616.0 / float(S)
    zeros = int(cnt[0])
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # small-range (linear-counting) branch
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


# ---------------------------------------------------------------------------
# Mergeable quantile summary (Greenwald-Khanna-lite: weighted compressed
# CDF points — the distributed-percentile shape; deterministic)
# ---------------------------------------------------------------------------
def quantile_summary(values: np.ndarray, q: int = 256) -> np.ndarray:
    """Compress a value array to ≤``q`` (value, weight) CDF points: sort,
    then take q evenly-spaced rank slices, each point carrying its slice's
    row count.  Rank error ≤ n/q by construction."""
    n = len(values)
    out = np.empty((min(q, n), 2), np.float64)
    if n == 0:
        return out
    s = np.sort(values.astype(np.float64))
    if n <= q:
        out[:, 0] = s
        out[:, 1] = 1.0
        return out
    edges = np.linspace(0, n, q + 1).astype(np.int64)
    for i in range(q):
        lo, hi = edges[i], edges[i + 1]
        out[i, 0] = s[hi - 1]  # slice max → never under-reports a quantile
        out[i, 1] = hi - lo
    return out


def merge_quantile_summaries(summaries: list[np.ndarray], q: int = 256) -> np.ndarray:
    """Associative merge: concatenate points, sort by value, re-compress to
    q points by cumulative weight."""
    non_empty = [s for s in summaries if len(s)]
    if not non_empty:
        return np.empty((0, 2), np.float64)
    pts = np.concatenate(non_empty)
    order = np.argsort(pts[:, 0], kind="mergesort")
    pts = pts[order]
    if len(pts) <= q:
        return pts
    cw = np.cumsum(pts[:, 1])
    total = cw[-1]
    targets = np.linspace(total / q, total, q)
    idx = np.searchsorted(cw, targets, side="left").clip(0, len(pts) - 1)
    out = np.empty((q, 2), np.float64)
    out[:, 0] = pts[idx, 0]
    prev = np.concatenate(([0.0], cw[idx][:-1]))
    out[:, 1] = cw[idx] - prev
    keep = out[:, 1] > 0
    return out[keep]


def summary_quantile(summary: np.ndarray, phi: float) -> float:
    """Value at quantile ``phi`` from a (value, weight) summary."""
    if len(summary) == 0:
        return float("nan")
    cw = np.cumsum(summary[:, 1])
    target = phi * cw[-1]
    i = int(np.searchsorted(cw, target, side="left").clip(0, len(summary) - 1))
    return float(summary[i, 0])


def grouped_approx_quantiles(
    ds, key: str, value: str, phis: list[float], q: int = 256
):
    """Distributed grouped quantiles: per-block per-key summaries (the
    combiner — at most q points per key per block cross the exchange), one
    bucketed exchange on the key, weighted merge per key.  Output one row
    per key with a column per phi (``p50``-style names, values as
    milli-units int64 for stable comparison)."""
    import pyarrow.compute as pc

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    # Percent-truncated names collide for phis within the same percent
    # (0.99 vs 0.995); fall back to per-mille names for the whole set then.
    names = [f"p{int(p * 100)}_milli" for p in phis]
    if len(set(names)) != len(names):
        names = [f"p{int(round(p * 1000))}pm_milli" for p in phis]
    if len(set(names)) != len(names):
        raise ValueError(f"phis too close to name distinctly: {phis}")
    col_of = dict(zip(phis, names))

    def per_block(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")])
        g = t.take(idx)
        keys = g.column(key).combine_chunks()
        codes = keys.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        vals = g.column(value).combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        bounds = np.r_[starts, len(codes)]
        out_k, out_s = [], []
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            out_k.append(keys[int(lo)].as_py())
            out_s.append(quantile_summary(vals[lo:hi], q).tobytes())
        return pa.table(
            {key: pa.array(out_k), "summary": pa.array(out_s, pa.binary())}
        )

    partials = ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def merge_bucket(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pylist()
        blobs = t.column("summary").to_pylist()
        by_key: dict = {}
        for k, b in zip(keys, blobs):
            by_key.setdefault(k, []).append(np.frombuffer(b, np.float64).reshape(-1, 2))
        out = {key: [], **{col_of[p]: [] for p in phis}}
        for k in sorted(by_key):
            merged = merge_quantile_summaries(by_key[k], q)
            out[key].append(k)
            for p in phis:
                out[col_of[p]].append(
                    int(round(summary_quantile(merged, p) * 1000))
                )
        return pa.table(
            {key: pa.array(out[key]),
             **{c: pa.array(v, pa.int64()) for c, v in out.items() if c != key}}
        )

    return bucketed_groupby_apply(partials, [key], merge_bucket)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; mergeability per Agarwal
# et al., "Mergeable Summaries", PODS 2012)
# ---------------------------------------------------------------------------
def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Compress a (key, count) frequency vector to at most ``k`` counters by
    subtracting the (k+1)-th largest count from every counter and dropping
    the non-positive ones — the batch form of the Misra-Gries decrement.

    Guarantee: each surviving count under-reports its input by at most the
    subtracted value ``d``, and ``d * (k + 1) <= sum(counts)`` — so across
    blocks the total per-key undercount is at most ``N / (k + 1)``.
    """
    if len(keys) <= k:
        return keys, counts
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    adj = counts - kth
    keep = adj > 0
    return keys[keep], adj[keep]


def mg_block_partial(values: np.ndarray, k: int):
    """One block's Misra-Gries summary: exact ``np.unique`` counts (the block
    fits in the task by construction) compressed to ``k`` counters.  Returns
    ``(keys, counts, n)`` with ``n`` the block's row count — partials are
    merged by plain per-key summation (no re-compression needed: summed
    undercount stays <= N/(k+1), see :func:`mg_compress`), so they ride the
    repo's standard partial-sum exchange."""
    u, c = np.unique(values, return_counts=True)
    ku, kc = mg_compress(u, c, k)
    return ku, kc, len(values)
