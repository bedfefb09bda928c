"""encode_ingest_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimagining of DataBiosphere/encode-ingest's
extract→transform→diff-and-sync loop (see /root/reference, SURVEY.md) as a
change-log tailer over Parquet tables of multi-turn conversation transcripts:

* input: CDC events ``(op, lsn, conv_id, turn_idx, role, text, tool, ts, ...)``
* merge: last-writer-wins by ``(ts, lsn)`` per ``(conv_id, turn_idx)`` with a
  per-partition LSN watermark dedup (reference analog: the idempotent
  diff→soft-delete→append sync, orchestration/templates/ingest-processed-data.yaml)
* sink: exactly-once Parquet via staged files + an atomic two-phase manifest
  commit log, resumable with per-partition lineage + metrics.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, one wide exchange (hash partition by salted conv key)
per epoch, and an actor-pool stage holding the only mutable state.

No module in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, tests, bench.py).
"""

from encode_ingest_ray.schema import (
    BASE_COLUMNS,
    EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from encode_ingest_ray.state.lww import lww_reduce, live_view
from encode_ingest_ray.state.partition import assign_partition_column

__all__ = [
    "BASE_COLUMNS",
    "EVENT_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "lww_reduce",
    "live_view",
    "assign_partition_column",
]
