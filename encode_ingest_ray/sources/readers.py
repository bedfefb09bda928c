"""Input sources (SURVEY.md §2.1).

* ``read_json_entities`` — S2: the reference reads raw entity dumps as JSON
  lists and null-normalizes every record on read
  (``StorageIO.readJsonLists`` + ``removeUnknowns``,
  /root/reference/transformation/src/main/scala/org/broadinstitute/monster/
  encode/transformation/TransformationPipelineBuilder.scala:23-32).
* ``seed_items`` — S5/S6: single-element seeds
  (``ctx.parallelize(List(args.initialQuery))``,
  ExtractionPipelineBuilder.scala:130-134; ``Create.of[Dataset]``,
  TransformationPipelineBuilder.scala:43-50).
* S1 (the ENCODE HTTP crawler) is out of scope by design: this engine's
  source is a Parquet/JSON change-log, not a REST API.
"""

from __future__ import annotations

import ray.data

from encode_ingest_ray.stages.normalize import remove_unknowns


def read_json_entities(paths, *, normalize_unknowns: bool = True, **kwargs):
    """Read JSON-lines entity dumps; optionally strip the 'unknown' literal
    from every string column (the reference does this unconditionally)."""
    ds = ray.data.read_json(paths, **kwargs)
    if normalize_unknowns:
        ds = ds.map_batches(
            remove_unknowns, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return ds


def seed_items(items: list[dict]):
    """Tiny driver-side seed dataset (initial query / singleton rows)."""
    return ray.data.from_items(items)
