"""Spatial distance join via grid-cell bucketing — the scale-safe way to
find all point pairs within Euclidean distance d without an all-pairs pass.

Standard published shape (spatial hash / cell lists, and the MapReduce
spatial-join literature e.g. SJMR, Zhang et al. ICDE 2009 — public): snap
points to a grid of cell size >= d; a qualifying pair's cells then differ by
at most 1 in each axis, so replicating every point to its 3x3 stencil and
joining natives-to-copies inside each cell finds every pair EXACTLY once
under the rule (native.id < copy.id, pair emitted in the native's home
cell).  One exchange on the cell key; per-bucket work is a fully-vectorized
searchsorted expand-join (no per-cell Python loop).  At 100 TB the cell
size is the density knob: cells hold O(rho * d^2) points and the 10-row
stencil fan-out only touches the (id, x, y) projection, never payload
columns.
Pathologically hot cells would re-split by an extra seeded axis the same
way embedding_near_dup caps its LSH buckets (stages/ann.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

#: stencil cell key — cx can go to -1 for border copies; the affine shift
#: keeps keys unique and non-overlapping for any grid up to 2**20 cells/axis
_CELL_STRIDE = 1 << 21


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cx + 1) * _CELL_STRIDE + (cy + 1)


def grid_pairs_within(ds, *, id_col: str, x_col: str, y_col: str, d: int):
    """All (a, b, dist2) with a < b and (xa-xb)^2 + (ya-yb)^2 <= d^2.

    ``ds`` must carry integer coordinate columns.  Returns a Dataset with
    columns (``{id}_a``, ``{id}_b``, ``dist2``).
    """
    d2 = d * d

    def stencil(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        x = t.column(x_col).combine_chunks().to_numpy(zero_copy_only=False)
        y = t.column(y_col).combine_chunks().to_numpy(zero_copy_only=False)
        cx, cy = x // d, y // d
        n = len(ids)
        # one native row in the home cell + a COPY in every stencil cell
        # (including home — same-cell pairs must see the partner as a copy,
        # or the (native < copy) rule would silently drop them)
        cells = [_cell_key(cx, cy)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cells.append(_cell_key(cx + dx, cy + dy))
        cell = np.concatenate(cells)
        native = np.zeros(10 * n, np.int8)
        native[:n] = 1
        tile = lambda a: np.tile(a, 10)  # noqa: E731
        return pa.table(
            {
                "cell": pa.array(cell.astype(np.int64)),
                "id": pa.array(tile(ids).astype(np.int64)),
                "x": pa.array(tile(x).astype(np.int64)),
                "y": pa.array(tile(y).astype(np.int64)),
                "native": pa.array(native),
            }
        )

    def join_bucket(t: pa.Table) -> pa.Table:
        cell = t.column("cell").combine_chunks().to_numpy(zero_copy_only=False)
        ids = t.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        x = t.column("x").combine_chunks().to_numpy(zero_copy_only=False)
        y = t.column("y").combine_chunks().to_numpy(zero_copy_only=False)
        nat = t.column("native").combine_chunks().to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                f"{id_col}_a": pa.array([], pa.int64()),
                f"{id_col}_b": pa.array([], pa.int64()),
                "dist2": pa.array([], pa.int64()),
            }
        )
        nm, cm = nat == 1, nat == 0
        if not nm.any() or not cm.any():
            return empty
        ncell, nid, nx, ny = cell[nm], ids[nm], x[nm], y[nm]
        ccell, cid, cx_, cy_ = cell[cm], ids[cm], x[cm], y[cm]
        co = np.argsort(ccell, kind="stable")
        ccell, cid, cx_, cy_ = ccell[co], cid[co], cx_[co], cy_[co]
        start = np.searchsorted(ccell, ncell, "left")
        cnt = np.searchsorted(ccell, ncell, "right") - start
        total = int(cnt.sum())
        if total == 0:
            return empty
        nrep = np.repeat(np.arange(len(nid)), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        cidx = np.repeat(start, cnt) + offs
        a, b = nid[nrep], cid[cidx]
        dx, dy = nx[nrep] - cx_[cidx], ny[nrep] - cy_[cidx]
        dist2 = dx * dx + dy * dy
        keep = (a < b) & (dist2 <= d2)
        return pa.table(
            {
                f"{id_col}_a": pa.array(a[keep].astype(np.int64)),
                f"{id_col}_b": pa.array(b[keep].astype(np.int64)),
                "dist2": pa.array(dist2[keep].astype(np.int64)),
            }
        )

    pre = ds.map_batches(
        stencil, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed_groupby_apply(pre, ["cell"], join_bucket)
