"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

Finds every pair of ids whose token SETS share at least ``threshold``
tokens — the exact overlap join underneath record blocking / basket
analysis — without the all-pairs-per-token blow-up of the naive
``JOIN ... ON same token`` plan (hot tokens are quadratic there).

Prefix-filtering principle (Chaudhuri et al. SSJoin 2006; Xiao et al.
PPJoin 2008, both published): order every basket by a GLOBAL token order
(rarest first).  If ``|A ∩ B| >= t``, then the first ``|A|-t+1`` tokens of
A and the first ``|B|-t+1`` tokens of B must share at least one token —
so candidate pairs only need to be generated inside per-token groups of
the SHORT rarest-first prefixes, never inside a frequent token's full
posting list.

Distributed shape (three bucketed exchanges + one tiny broadcast):
1. token-frequency count (``bucketed_sum_combine``) → driver builds the
   global rarity rank; broadcast once via ``ray.put`` (vocabulary is
   dim-table-sized here — partkeys; for open vocabularies swap in a
   frequency-rank cohash join);
2. basket build — one exchange keyed on id; per bucket: distinct
   (id, token), map tokens → rank, per-id sorted rank list, emit one row
   per PREFIX rank ``(ptok, id, ranks)``; baskets smaller than
   ``threshold`` are dropped (they cannot reach the overlap);
3. candidate + verify — one exchange keyed on prefix token; per bucket:
   run-scan pair generation over (ptok, id) runs (pairs only among
   prefix entries), then a fully vectorized overlap count: both baskets'
   ranks tagged with the pair index, composite ``pair*V + rank`` sorted,
   adjacent-equal composites counted per pair (ranks are unique within a
   basket, so count==2 ⟺ token in both);
4. cross-token pair dedup — the same pair is found once per SHARED prefix
   token; identical ``(o1, o2, overlap)`` rows collapse through one
   ``dedup_exact`` exchange.

The reference's nearest shape is the M:N link explode + join
(/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
encode/transformation/AntibodyTransformations.scala:20-60), cited for
semantics only — it joins on single FKs; the overlap-threshold join is a
training-data addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["overlap_self_join"]


def _np(col) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False)


def _slice_gather(values: np.ndarray, offsets: np.ndarray, rows: np.ndarray):
    """Concatenate ``values[offsets[r]:offsets[r+1]]`` for each r in rows.
    Returns (gathered values, per-row lengths)."""
    lens = (offsets[rows + 1] - offsets[rows]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, values.dtype), lens
    cum_excl = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(cum_excl, lens)
        + np.repeat(offsets[rows].astype(np.int64), lens)
    )
    return values[idx], lens


def overlap_self_join(
    ds,
    id_col: str,
    token_col: str,
    threshold: int,
    num_buckets: int | None = None,
):
    """All id pairs (o1 < o2) with ``|tokens(o1) ∩ tokens(o2)| >= threshold``.

    ``ds`` holds (id, token) rows — duplicates allowed (set semantics
    applied).  Returns a Dataset of ``(o1, o2, overlap)``.
    """
    import ray
    import pyarrow.compute as pc

    from encode_ingest_ray.stages.aggregate import (
        bucketed_groupby_apply,
        bucketed_sum_combine,
    )
    from encode_ingest_ray.stages.dedup import dedup_exact

    if threshold < 1:
        raise ValueError("threshold must be >= 1")

    # --- 1. global token rarity rank (tiny result, broadcast once) --------
    def tok_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({token_col: t.column(token_col)})
            .append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
            .group_by([token_col])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns([token_col, "n"])

    freq_rows = bucketed_sum_combine(
        ds.map_batches(
            tok_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        [token_col],
        ["n"],
        num_buckets,
    ).take_all()  # vocabulary-sized (dim cardinality)
    toks = np.array([r[token_col] for r in freq_rows], dtype=np.int64)
    freqs = np.array([r["n"] for r in freq_rows], dtype=np.int64)
    order = np.lexsort((toks, freqs))  # rarity rank: freq asc, token asc
    sorted_toks = toks[np.argsort(toks)]
    rank_of_sorted = np.empty(len(toks), np.int64)
    rank_of_sorted[np.searchsorted(sorted_toks, toks[order])] = np.arange(
        len(toks), dtype=np.int64
    )
    vocab = int(len(toks))
    lookup_ref = ray.put((sorted_toks, rank_of_sorted))

    # --- 2. basket build + prefix explode (one exchange on id) ------------
    def baskets(t: pa.Table) -> pa.Table:
        stoks, srank = ray.get(lookup_ref)
        d = (
            pa.table({id_col: t.column(id_col), token_col: t.column(token_col)})
            .group_by([id_col, token_col])
            .aggregate([])
        )  # distinct (id, token)
        ids = _np(d.column(id_col)).astype(np.int64)
        rk = srank[np.searchsorted(stoks, _np(d.column(token_col)).astype(np.int64))]
        o = np.lexsort((rk, ids))
        ids, rk = ids[o], rk[o]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(ids) != 0) + 1, [len(ids)])
        )
        sizes = np.diff(bounds)
        keep = sizes >= threshold
        if not keep.any():
            return pa.table(
                {
                    "ptok": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "ranks": pa.array([], pa.list_(pa.int64())),
                }
            )
        starts = bounds[:-1][keep]
        sizes = sizes[keep]
        plens = sizes - threshold + 1
        basket_ids = ids[starts]
        # per-basket prefix token rows: rank positions starts..starts+plen
        tot = int(plens.sum())
        cum_excl = np.concatenate(([0], np.cumsum(plens)[:-1]))
        pidx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(cum_excl, plens)
            + np.repeat(starts.astype(np.int64), plens)
        )
        row_of = np.repeat(np.arange(len(starts)), plens)
        # basket rank lists as a ListArray (shared across this basket's rows)
        basket_offsets = np.concatenate(([0], np.cumsum(sizes))).astype(np.int64)
        values, _ = _slice_gather(
            rk, bounds.astype(np.int64), np.flatnonzero(keep).astype(np.int64)
        )
        lists = pa.ListArray.from_arrays(pa.array(basket_offsets), pa.array(values))
        return pa.table(
            {
                "ptok": pa.array(rk[pidx]),
                id_col: pa.array(basket_ids[row_of]),
                "ranks": lists.take(pa.array(row_of)),
            }
        )

    prefix_ds = bucketed_groupby_apply(ds, [id_col], baskets, num_buckets)

    # --- 3. per-prefix-token candidates + vectorized verify ---------------
    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o1": pa.array([], pa.int64()),
                "o2": pa.array([], pa.int64()),
                "overlap": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ptok = _np(t.column("ptok")).astype(np.int64)
        ids = _np(t.column(id_col)).astype(np.int64)
        lists = t.column("ranks").combine_chunks()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = lists.values.to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ids, ptok))
        ptok, ids = ptok[o], ids[o]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(ptok) != 0) + 1, [len(ptok)])
        )
        runs = np.diff(bounds)
        li, lj = [], []  # pair row indices (into the sorted order)
        for r in np.flatnonzero(runs >= 2):
            lo, hi = int(bounds[r]), int(bounds[r + 1])
            k = hi - lo
            iu, ju = np.triu_indices(k, 1)
            li.append(iu + lo)
            lj.append(ju + lo)
        if not li:
            return empty
        li = np.concatenate(li)
        lj = np.concatenate(lj)
        rows_sorted = o  # original row index of sorted position
        p = len(li)
        pair_idx = np.arange(p, dtype=np.int64)
        va, la = _slice_gather(values, offsets, rows_sorted[li])
        vb, lb = _slice_gather(values, offsets, rows_sorted[lj])
        comp = np.concatenate(
            (
                np.repeat(pair_idx, la) * vocab + va,
                np.repeat(pair_idx, lb) * vocab + vb,
            )
        )
        comp.sort(kind="stable")
        dup = comp[1:] == comp[:-1]
        ov = np.bincount((comp[1:][dup] // vocab), minlength=p)
        keep = ov >= threshold
        if not keep.any():
            return empty
        a = ids[li[keep]]
        b = ids[lj[keep]]
        o1 = np.minimum(a, b)
        o2 = np.maximum(a, b)
        return pa.table(
            {
                "o1": pa.array(o1),
                "o2": pa.array(o2),
                "overlap": pa.array(ov[keep].astype(np.int64)),
            }
        )

    pairs = bucketed_groupby_apply(prefix_ds, ["ptok"], verify, num_buckets)
    # --- 4. cross-prefix-token dedup (identical rows collapse) ------------
    return dedup_exact(pairs, ["o1", "o2"], "overlap", keep_max=True)
