"""Wire format for the push exchange: Arrow IPC + zstd.

Every routed slice crosses the object store once per push.  On a single
node the plasma store's memory bandwidth is the non-scaling resource
(BASELINE.md: routing-only legs scale ~2x from 8->32 cpus while the
plasma-put leg caps the pipeline), and on a real cluster the inter-node
network plays the same role.  Packing each slice as a zstd-compressed
Arrow IPC stream trades scalable CPU (compression runs inside the routing
tasks, decompression once per blob at flush — never per push) for the
non-scalable byte path; transcript text compresses ~3-6x.

The pack returns a ``pyarrow.Buffer`` — Ray serializes buffers out-of-band
(zero extra copy into the task result / actor argument).
"""

from __future__ import annotations

import pyarrow as pa

_WRITE_OPTS = pa.ipc.IpcWriteOptions(compression="zstd")


def pack_table(table: pa.Table) -> pa.Buffer:
    """One compressed IPC stream per routed slice (single batch: the slice
    is already contiguous after the router's take)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema, options=_WRITE_OPTS) as w:
        w.write_table(table, max_chunksize=table.num_rows or 1)
    return sink.getvalue()


def unpack_table(buf) -> pa.Table:
    return pa.ipc.open_stream(buf).read_all()
