"""Vectorized last-writer-wins merge kernel.

Semantics (the whole-table analog of the reference's diff→soft-delete→append
sync, /root/reference/orchestration/templates/ingest-processed-data.yaml:85-172):
for each key ``(conv_id, turn_idx)`` the winner is the row with the maximal
``(ts, lsn)``; a winning ``op == 'delete'`` is a tombstone (the key is absent
from the live table, but the tombstone is *retained* in durable state so a
late-arriving older event cannot resurrect it).

Everything here is pure Arrow + numpy — one sort + one boundary scan per call,
no Python per-row loops — so it is safe to run inside ``map_batches`` /
``map_groups`` over zero-copy Arrow blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.schema import BASE_COLUMNS, unify_schemas, align_to_schema

_SORT_KEYS = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("ts", "ascending"),
    ("lsn", "ascending"),
]


def _last_per_key_mask(table: pa.Table) -> np.ndarray:
    """Boolean mask of the last row of every (conv_id, turn_idx) run.

    ``table`` must already be sorted by (conv_id, turn_idx, ...).
    """
    n = table.num_rows
    conv = table.column("conv_id").combine_chunks().dictionary_encode()
    codes = conv.indices.to_numpy(zero_copy_only=False)
    turns = table.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
    mask = np.empty(n, dtype=bool)
    mask[-1] = True
    np.not_equal(codes[1:], codes[:-1], out=mask[:-1])
    mask[:-1] |= turns[1:] != turns[:-1]
    return mask


def lww_reduce(table: pa.Table) -> pa.Table:
    """Reduce an event/state table to one winner row per (conv_id, turn_idx).

    Input columns: at least conv_id, turn_idx, ts, lsn (op + payload ride
    along).  Output keeps winning rows bit-for-bit, including tombstones.
    Deterministic for exact (ts, lsn) duplicates because payloads of a
    duplicated LSN are identical by construction (a replayed event is the same
    event).
    """
    if table.num_rows <= 1:
        return table
    idx = pc.sort_indices(table, sort_keys=_SORT_KEYS)
    t = table.take(idx)
    mask = _last_per_key_mask(t)
    if mask.all():
        return t
    return t.filter(pa.array(mask))


def merge_state(state: pa.Table | None, events: pa.Table) -> pa.Table:
    """Merge new events into an existing winners table (both schemas may
    differ additively; output is the unified schema)."""
    if state is None or state.num_rows == 0:
        return lww_reduce(events)
    if events.num_rows == 0:
        return state
    schema = unify_schemas(state.schema, events.schema)
    state = align_to_schema(state, schema)
    events = align_to_schema(events, schema)
    return lww_reduce(pa.concat_tables([state, events]))


def live_view(state: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Project durable state to the live table: drop tombstones and merge
    metadata, keep base + evolved payload columns."""
    live = state.filter(pc.not_equal(state.column("op"), pa.scalar("delete")))
    if columns is None:
        columns = [c for c in live.column_names if c not in ("op", "lsn", "part")]
        # stable order: base columns first, evolved extras after
        columns = [c for c in BASE_COLUMNS if c in columns] + [
            c for c in columns if c not in BASE_COLUMNS
        ]
    return live.select(columns)
