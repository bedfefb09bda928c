"""Donor transform — reference-parity demonstration pipeline.

Re-expresses ``DonorTransformations.transformDonor``
(/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
encode/transformation/DonorTransformations.scala:13-54) over a *flat Arrow
table* of raw donor records (FIXTURES.md §3.1) as one stateless
``map_batches`` stage composing the operator library:

* id extraction        — ``extract_id``        (CommonTransformations.scala:31-44)
* URL prefixing        — ``url_prefix``        (CommonTransformations.scala:49-56)
* age range parsing    — ``parse_age_bounds``  (CommonTransformations.scala:58-72)
* 'unknown' nulling    — ``remove_unknowns``   (CommonTransformations.scala:11-25)
* organism lookup      — broadcast dict        (TransformationPipelineBuilder.scala:351-367)

Output columns mirror the Jade ``donor`` table spec's shape (donor_id, xref,
age bounds, reported_ethnicity, organism_type, award/lab/submitted_by URLs,
parent/sibling donor ids).  Golden-tested against the values asserted in
DonorTransformationsSpec.scala:8-61.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.normalize import (
    ENCODE_URL_PREFIX,
    extract_id,
    parse_age_bounds,
    remove_unknowns,
)

_ID_RX = r"/[^/]+/(?P<id>[^/]+)/?$"


def _strip_id(value: str | None) -> str | None:
    import re

    if value is None:
        return None
    m = re.search(_ID_RX, value)
    return m.group("id") if m else value


def transform_donor_batch(batch: pa.Table, organisms: dict[str, str] | None = None) -> pa.Table:
    """One donor row in → one output row; pure, stateless, vectorized for
    scalar columns; list-valued columns (xref, ethnicity, parents, siblings)
    are assembled per batch in Python, mirroring the reference's in-record
    list logic (sorted-set sibling merge, DonorTransformations.scala:47)."""
    batch = remove_unknowns(batch)
    batch = extract_id(batch, "at_id", "donor_id", _ID_RX)
    batch = parse_age_bounds(batch, "age", "age_lower_bound", "age_upper_bound")

    url = lambda col: pc.binary_join_element_wise(pa.scalar(ENCODE_URL_PREFIX), col, "")  # noqa: E731
    award = url(batch.column("award"))
    lab = url(batch.column("lab"))
    submitted_by = url(batch.column("submitted_by"))
    at_url = url(batch.column("at_id"))

    n = batch.num_rows
    dbx = batch.column("dbxrefs").to_pylist() if "dbxrefs" in batch.column_names else [None] * n
    xref = [
        ([u] + (d or []))
        for u, d in zip(at_url.to_pylist(), dbx)
    ]
    eth = (
        batch.column("ethnicity").to_pylist()
        if "ethnicity" in batch.column_names
        else [None] * n
    )
    parents = (
        batch.column("parents").to_pylist() if "parents" in batch.column_names else [None] * n
    )
    twins = batch.column("twin").to_pylist() if "twin" in batch.column_names else [None] * n
    sibs = (
        batch.column("siblings").to_pylist() if "siblings" in batch.column_names else [None] * n
    )
    organism_col = batch.column("organism").to_pylist()
    organism_type = [
        (organisms or {}).get(o, o) for o in organism_col
    ]
    sibling_ids = [
        sorted({_strip_id(s) for s in (([t] if t else []) + (ss or []))})
        for t, ss in zip(twins, sibs)
    ]
    parent_ids = [[_strip_id(p) for p in (ps or [])] for ps in parents]

    return pa.table(
        {
            "donor_id": batch.column("donor_id"),
            "label": batch.column("donor_id"),
            "xref": pa.array(xref, pa.list_(pa.string())),
            "date_created": batch.column("date_created"),
            "age_lower_bound": batch.column("age_lower_bound"),
            "age_upper_bound": batch.column("age_upper_bound"),
            "reported_ethnicity": pa.array(
                [e or [] for e in eth], pa.list_(pa.string())
            ),
            "organism_type": pa.array(organism_type, pa.string()),
            "part_of_dataset_id": pa.array(["ENCODE"] * n),
            "award": award,
            "lab": lab,
            "parent_donor_id": pa.array(parent_ids, pa.list_(pa.string())),
            "sibling_donor_id": pa.array(sibling_ids, pa.list_(pa.string())),
            "submitted_by": submitted_by,
        }
    )


def transform_donors(ds, organisms: pa.Table | None = None):
    """Dataset version: broadcast the (tiny) organisms dim once via ray.put,
    look it up inside map_batches — the reference's organisms side-input
    join (TransformationPipelineBuilder.scala:351-367)."""
    import ray

    lookup: dict[str, str] = {}
    if organisms is not None:
        lookup = dict(
            zip(
                organisms.column("at_id").to_pylist(),
                organisms.column("scientific_name").to_pylist(),
            )
        )
    ref = ray.put(lookup)

    def fn(batch: pa.Table) -> pa.Table:
        return transform_donor_batch(batch, ray.get(ref))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
