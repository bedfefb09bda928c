"""Biosample transform — the reference's deepest join-tree, re-expressed.

Mirrors ``BiosampleTransformations.transformBiosample``
(/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
encode/transformation/BiosampleTransformations.scala:15-197) and its join
wiring (TransformationPipelineBuilder.scala:66-91,178-210):

* biosample ⟕ biosampleType — small dim side, broadcast (J1);
* biosample ⟕ libraries-by-biosample — tagged-union single-shuffle grouped
  join (J2), with the reference's multiplicity rule: >1 distinct
  product_id/lot_id across a biosample's libraries → null (+warn)
  (BiosampleTransformations.scala:115-128);
* classification-dependent anatomical-site / apriori-cell-type / cell-line
  logic (BiosampleTransformations.scala:55-95);
* left-outer semantics: a biosample with no type keeps flowing with null
  type fields (the reference logs a warning, :42-44).

List outputs are sorted for determinism (the reference's ``toSet.toList``
plus explicit sorts elsewhere).
"""

from __future__ import annotations

import logging
import re

import pyarrow as pa
import ray

from encode_ingest_ray.stages.groupjoin import multi_stream_group_join
from encode_ingest_ray.stages.normalize import ENCODE_URL_PREFIX

logger = logging.getLogger(__name__)

_ID_RX = re.compile(r"/[^/]+/(?P<id>[^/]+)/?$")


def _strip_id(v: str | None) -> str | None:
    if v is None:
        return None
    m = _ID_RX.search(v)
    return m.group("id") if m else v


def _url(v: str | None) -> str | None:
    return None if v is None else ENCODE_URL_PREFIX + v


def transform_biosamples(biosamples, libraries, types_table: pa.Table):
    """biosamples/libraries: Datasets; types_table: small Arrow dim table
    (at_id, classification, term_id, organ_slims, cell_slims) — broadcast."""
    type_lookup = {
        r["at_id"]: r for r in types_table.to_pylist()
    }
    tref = ray.put(type_lookup)

    def assemble(key: str, tables: dict) -> pa.Table:
        bio = tables["bio"]
        libs = tables["lib"]
        if bio.num_rows == 0:
            # libraries referencing an unknown biosample: dropped (inner on
            # the driving side, as in the reference's keyed leftOuterJoin)
            return pa.table({"biosample_id": pa.array([], pa.string())}).select([])
        row = bio.slice(0, 1).to_pylist()[0]
        row["at_id"] = key  # the join key column (stripped from payloads)
        types = ray.get(tref)
        typ = types.get(row.get("biosample_ontology"))
        if typ is None:
            logger.warning("Biosample %r has no associated type!", key)

        bid = _strip_id(row["at_id"])
        lib_rows = libs.to_pylist()
        part_numbers = {l["product_id"] for l in lib_rows if l.get("product_id")}
        lot_ids = {l["lot_id"] for l in lib_rows if l.get("lot_id")}
        if len(part_numbers) > 1:
            logger.warning("Biosample %r has multiple product ids: %s", bid, part_numbers)
        if len(lot_ids) > 1:
            logger.warning("Biosample %r has multiple lot ids: %s", bid, lot_ids)

        classification = typ.get("classification") if typ else None
        term_id = typ.get("term_id") if typ else None
        organ_slims = list(typ.get("organ_slims") or []) if typ else []
        cell_slims = list(typ.get("cell_slims") or []) if typ else []
        if classification in ("tissue", "organoid"):
            anatomical = [term_id] if term_id else []
        elif classification in ("cell line", "primary cell", "in vitro differentiated cells"):
            anatomical = organ_slims
        else:
            anatomical = []
        if classification in ("tissue", "organoid", "cell line"):
            apriori = cell_slims
        elif classification in ("primary cell", "in vitro differentiated cells"):
            apriori = [term_id] if term_id else []
        else:
            apriori = []
        cell_line = term_id if classification == "cell line" else None

        return pa.table(
            {
                "biosample_id": pa.array([bid], pa.string()),
                "label": pa.array([bid], pa.string()),
                "xref": pa.array(
                    [[_url(row["at_id"])] + list(row.get("dbxrefs") or [])],
                    pa.list_(pa.string()),
                ),
                "biosample_type": pa.array([classification], pa.string()),
                "anatomical_site": pa.array(
                    [anatomical[0] if anatomical else None], pa.string()
                ),
                "apriori_cell_type": pa.array([sorted(apriori)], pa.list_(pa.string())),
                "cell_line": pa.array([cell_line], pa.string()),
                "donor_id": pa.array(
                    [[_strip_id(row["donor"])] if row.get("donor") else []],
                    pa.list_(pa.string()),
                ),
                "part_number": pa.array(
                    [next(iter(part_numbers)) if len(part_numbers) == 1 else None],
                    pa.string(),
                ),
                # jade column names: lot / library_prep_id
                # (biosample.table.json; BiosampleTransformations.scala:104-117)
                "lot": pa.array(
                    [next(iter(lot_ids)) if len(lot_ids) == 1 else None], pa.string()
                ),
                "library_prep_id": pa.array(
                    [sorted(_strip_id(l["at_id"]) for l in lib_rows)],
                    pa.list_(pa.string()),
                ),
                "award": pa.array([_url(row.get("award"))], pa.string()),
                "date_created": pa.array(
                    [row.get("date_created")], pa.timestamp("us", "UTC")
                ),
                "lab": pa.array([_url(row.get("lab"))], pa.string()),
                "submitted_by": pa.array([_url(row.get("submitted_by"))], pa.string()),
                "was_perturbed": pa.array(
                    [row.get("perturbed")], pa.bool_()
                ),
            }
        )

    return multi_stream_group_join(
        {"bio": (biosamples, "at_id"), "lib": (libraries, "biosample")},
        assemble,
        key_out="__key",
    )
