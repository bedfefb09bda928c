"""Single-process reference oracle for replay-equivalence tests.

SURVEY.md §5: "apply the event log naively in a single process sorted by
(conv_id, turn_idx, ts, lsn) ... assert row-for-row equality".  Implemented
with DuckDB over the generated event files so it shares no code with the
engine under test.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa

FINAL_STATE_SQL = """
WITH ev AS (SELECT * FROM read_parquet({files})),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY conv_id, turn_idx
           ORDER BY ts DESC, lsn DESC
         ) AS rn
  FROM ev
)
SELECT * EXCLUDE (rn, op, lsn)
FROM ranked
WHERE rn = 1 AND op <> 'delete'
ORDER BY conv_id, turn_idx
"""


def expected_final_state(event_files: list[str], lsn_hi: int | None = None) -> pa.Table:
    """Final transcript table after applying all events with LWW-by-(ts,lsn),
    delete-wins-if-latest, sorted by (conv_id, turn_idx)."""
    files = "[" + ", ".join(f"'{f}'" for f in event_files) + "]"
    sql = FINAL_STATE_SQL.format(files=files)
    if lsn_hi is not None:
        sql = sql.replace("FROM ev", f"FROM ev WHERE lsn <= {lsn_hi}", 1)
    con = duckdb.connect()
    try:
        return con.execute(sql).fetch_arrow_table()
    finally:
        con.close()
