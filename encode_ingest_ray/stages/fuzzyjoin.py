"""Fuzzy string self-join (edit distance ≤ 1) via deletion neighborhoods.

The data-cleaning join: find record pairs whose names differ by at most one
edit.  Brute force is O(n²) distance evaluations; the deletion-neighborhood
theorem (Mor & Fraenkel 1982, the FastSS family) reduces it to equality
blocking: lev(s, t) ≤ 1  iff  ({s} ∪ D1(s)) ∩ ({t} ∪ D1(t)) ≠ ∅, where
D1(s) is s with one character deleted.  So each row emits |s|+1 variant
keys, ONE hash exchange groups equal variants, candidate pairs fall out of
a run-scan, and a final distance check erases blocking collisions.

Variants are hashed to int64 ON the emitting worker (crc32 + block-key high
bits) — strings never enter the exchange; hash collisions only create extra
CANDIDATES, which the verify erases, so the result stays exact.  The verify
resolves id→string through a broadcast lookup under ``max_broadcast_ids``
(the candidate-bounded-broadcast discipline of stages/neardup.py's Jaccard
verify; past the bound, route pairs through the same two-hop exchange
resolution documented there).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
from encode_ingest_ray.stages.triangles import pairs_within_groups


def _lev_le1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) <= 1 — O(len) early-exit scan, no DP table."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def edit1_pairs(
    ds,
    id_col: str,
    text_col: str,
    block_col: str,
    max_broadcast_ids: int = 1_000_000,
    num_buckets: int | None = None,
):
    """All id pairs (a < b) sharing ``block_col`` whose ``text_col`` values
    are within edit distance 1.  Exact (collisions verified away)."""
    import ray

    def variants(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        blocks = t.column(block_col).to_pylist()
        out_key, out_id = [], []
        for i, s in enumerate(texts):
            hi = int(blocks[i]) << 40
            seen = {s}
            seen.update(s[:j] + s[j + 1 :] for j in range(len(s)))
            rid = ids[i]
            for v in seen:
                out_key.append(hi | zlib.crc32(v.encode()))
                out_id.append(rid)
        return pa.table(
            {
                "vkey": pa.array(out_key, pa.int64()),
                "rid": pa.array(out_id, pa.int64()),
            }
        )

    exploded = ds.map_batches(
        variants, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def gen(t: pa.Table) -> pa.Table:
        return pairs_within_groups(t, "vkey", "rid")

    raw = bucketed_groupby_apply(exploded, ["vkey"], gen, num_buckets)

    def distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["u", "v"]).aggregate([("u", "count")]).select(["u", "v"])

    cand = bucketed_groupby_apply(
        raw.map_batches(
            distinct, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["u", "v"],
        distinct,
        num_buckets,
    )

    # id -> text lookup for the verify (candidate-bounded broadcast)
    assert ds.count() <= max_broadcast_ids, (
        "corpus exceeds the broadcast bound — route the verify through the "
        "two-hop exchange resolution (stages/neardup.py)"
    )
    id_text = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        id_text.update(zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()))
    lookup_ref = ray.put(id_text)

    class Verify:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            u = t.column("u").to_pylist()
            v = t.column("v").to_pylist()
            lk = self.lookup
            keep = [_lev_le1(lk[a], lk[b]) for a, b in zip(u, v)]
            return t.filter(pa.array(keep))

    return cand.map_batches(
        Verify,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )
