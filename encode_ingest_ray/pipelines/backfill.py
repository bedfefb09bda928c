"""Explorer file-backfill — the reference's last standalone entry point.

Reference: FileBackfillGenerator (/root/reference/explorer/file-backfill/src/
main/scala/org/broadinstitute/monster/encode/backfill/
FileBackfillGenerator.scala:16-74): one JDBC SELECT of available files, a
row mapper deriving the ingest target path
``/{data_type cleaned}/{format}/{md5}/{basename}``, JSON-list output.

Here: the partitioned DB-API source (sources/dbapi.py) replaces JDBC, the
row mapper is Arrow-vectorized, and the sink is ``write_json`` shard files —
each leg streams and scales with the cluster.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def build_requests(batch: pa.Table) -> pa.Table:
    """Vectorized row mapper (FileBackfillGenerator.scala:62-74):
    cleaned_type = data_type, whitespace runs → '-', lowercased;
    basename = path after the last '/'; target =
    /cleaned_type/format/md5/basename."""
    cleaned = pc.utf8_lower(
        pc.replace_substring_regex(batch.column("data_type"), r"\s+", "-")
    )
    path = batch.column("file_gs_path")
    basename = pc.struct_field(pc.extract_regex(path, r"(?P<b>[^/]*)$"), [0])
    target = pc.binary_join_element_wise(
        pa.scalar("/"),
        cleaned,
        pa.scalar("/"),
        batch.column("file_format"),
        pa.scalar("/"),
        batch.column("md5sum"),
        pa.scalar("/"),
        basename,
        "",
    )
    return pa.table({"sourcePath": path, "targetPath": target})


def file_backfill(
    connection_factory,
    *,
    table: str = "files",
    key: str = "file_id",
    predicate: str = "file_available_in_gcs",
    num_partitions: int = 16,
    output_dir: str | None = None,
):
    """DB scan → ingest-request rows; written as JSON shards when
    ``output_dir`` is given, else returned as a Dataset."""
    from encode_ingest_ray.sources.dbapi import read_dbapi

    ds = read_dbapi(
        connection_factory,
        table,
        key=key,
        columns=[key, "file_format", "data_type", "md5sum", "file_gs_path"],
        predicate=predicate,
        num_partitions=num_partitions,
    ).map_batches(build_requests, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    if output_dir is not None:
        ds.write_json(output_dir)
        return None
    return ds
