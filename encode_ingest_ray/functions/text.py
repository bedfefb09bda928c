"""Shared vectorized text kernels.

``split_whitespace`` exists because pyarrow 16.1.0's
``pc.utf8_split_whitespace`` is NONDETERMINISTICALLY WRONG: depending on
allocator state it occasionally fails to split a trailing token from its
following whitespace (``"... y z "`` tokenizes as ``[..., "y", "z ", ...]``
— note the space retained inside the token).  Found root-causing the
one-off ``test_dupspans_split_blocks_equal_single_block`` failure
(VERDICT r4 item 4); minimal repro: loop
``pc.utf8_split_whitespace(pa.array(["w x y z " * 4] * 2)).flatten()``
in one process with interleaved string allocations — 200-700 corrupt
results per 2000 iterations, rate varying with layout, while
``pc.split_pattern_regex(col, r"\\s+")`` stayed at 0 across every run.

The RE2 splitter is ~3x slower (8.7 → 27.4 ms for 270k tokens — still
vectorized C++, negligible against the stages it feeds) and is EXACTLY the
oracles' ``string_split_regex(text, '\\s+')`` semantics (RE2 ``\\s`` is
ASCII, like DuckDB's), so engine/oracle token parity is now by
construction rather than by coincidence of the corpus being ASCII.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def split_whitespace(col: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Whitespace-tokenize a string column — the safe replacement for
    ``pc.utf8_split_whitespace`` (see module docstring).  Like the buggy
    kernel it yields ``""`` elements at string edges; callers filter
    empties exactly as before."""
    out = pc.split_pattern_regex(col, r"\s+")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out
