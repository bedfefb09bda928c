"""Property-based tests (hypothesis) for the LWW merge kernel — the algebra
the whole engine's exactly-once story rests on:

* permutation invariance: any delivery order yields the same winners
* duplication invariance: replaying any subset of events changes nothing
* associativity: incremental merges in any split equal the one-shot reduce
"""

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from encode_ingest_ray.state.lww import live_view, lww_reduce, merge_state

KEYS = [("a", 0), ("a", 1), ("b", 0), ("c", 5)]


@st.composite
def event_lists(draw):
    n = draw(st.integers(1, 40))
    events = []
    for i in range(n):
        conv, turn = draw(st.sampled_from(KEYS))
        ts = draw(st.integers(0, 50))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        events.append((conv, turn, ts, i, op))
    return events


def to_table(events):
    # payload is a pure function of (key, ts, lsn, op): replays are verbatim
    return pa.table(
        {
            "conv_id": pa.array([e[0] for e in events]),
            "turn_idx": pa.array([e[1] for e in events], pa.int32()),
            "role": pa.array(["user"] * len(events)),
            "text": pa.array([f"{e[0]}/{e[1]}@{e[2]}:{e[3]}:{e[4]}" for e in events]),
            "tool": pa.array([None] * len(events), pa.string()),
            "ts": pa.array([e[2] for e in events], pa.timestamp("us")),
            "op": pa.array([e[4] for e in events]),
            "lsn": pa.array([e[3] for e in events], pa.int64()),
        }
    )


def canon(table: pa.Table):
    t = live_view(table) if "op" in table.column_names else table
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(idx).to_pylist()


@settings(max_examples=60, deadline=None)
@given(events=event_lists(), seed=st.integers(0, 2**16))
def test_permutation_invariance(events, seed):
    import random

    shuffled = list(events)
    random.Random(seed).shuffle(shuffled)
    assert canon(lww_reduce(to_table(events))) == canon(lww_reduce(to_table(shuffled)))


@settings(max_examples=60, deadline=None)
@given(events=event_lists(), dup_mask=st.lists(st.booleans(), min_size=0, max_size=40))
def test_duplication_invariance(events, dup_mask):
    dups = [e for e, m in zip(events, dup_mask) if m]
    assert canon(lww_reduce(to_table(events))) == canon(
        lww_reduce(to_table(events + dups))
    )


@settings(max_examples=60, deadline=None)
@given(events=event_lists(), split=st.integers(0, 40))
def test_incremental_merge_associativity(events, split):
    split = min(split, len(events))
    one_shot = lww_reduce(to_table(events))
    left = to_table(events[:split]) if split else None
    state = lww_reduce(left) if left is not None and left.num_rows else None
    if len(events) > split:
        state = merge_state(state, to_table(events[split:]))
    assert state is not None
    assert canon(state) == canon(one_shot)
