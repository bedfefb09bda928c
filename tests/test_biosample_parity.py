"""Join-graph parity test (FIXTURES.md §3.2): biosample ⟕ type ⟕ libraries
with the reference's edge cases — missing type (left-outer), >1 product_id
(multiplicity → null + warn, BiosampleTransformations.scala:115-128),
classification-dependent site/cell-type logic (:55-95)."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.pipelines.biosample import transform_biosamples


def test_biosample_join_tree_reference_semantics():
    biosamples = pa.table(
        {
            "at_id": ["/biosamples/B1/", "/biosamples/B2/", "/biosamples/B3/"],
            "biosample_ontology": ["/types/T1/", "/types/T2/", None],
            "donor": ["/human-donors/D1/", None, "/human-donors/D3/"],
            "dbxrefs": [["x1"], None, None],
            "award": ["/awards/a1", "/awards/a2", None],
        }
    )
    types = pa.table(
        {
            "at_id": ["/types/T1/", "/types/T2/"],
            "classification": ["tissue", "primary cell"],
            "term_id": ["UBERON:1", "CL:7"],
            "organ_slims": [["lung"], ["blood", "arm"]],
            "cell_slims": [["epithelial"], ["t-cell"]],
        }
    )
    libraries = pa.table(
        {
            "at_id": ["/libraries/L1/", "/libraries/L2/", "/libraries/L3/"],
            "biosample": ["/biosamples/B1/", "/biosamples/B1/", "/biosamples/B2/"],
            "product_id": ["p1", "p2", "p9"],  # B1 has TWO product ids -> null
            "lot_id": ["lot1", "lot1", None],  # B1 has ONE lot id -> kept
        }
    )
    out = (
        transform_biosamples(
            ray.data.from_arrow(biosamples), ray.data.from_arrow(libraries), types
        )
        .to_pandas()
        .set_index("biosample_id")
        .sort_index()
    )
    assert list(out.index) == ["B1", "B2", "B3"]

    b1 = out.loc["B1"]
    assert b1["biosample_type"] == "tissue"
    assert b1["anatomical_site"] == "UBERON:1"  # tissue -> term_id
    assert list(b1["apriori_cell_type"]) == ["epithelial"]
    assert b1["part_number"] is None  # multiplicity -> null
    assert b1["lot"] == "lot1"  # single distinct -> kept
    assert list(b1["library_prep_id"]) == ["L1", "L2"]
    assert list(b1["xref"]) == ["https://www.encodeproject.org/biosamples/B1/", "x1"]
    assert list(b1["donor_id"]) == ["D1"]

    b2 = out.loc["B2"]
    assert b2["biosample_type"] == "primary cell"
    assert b2["anatomical_site"] == "blood"  # primary cell -> organ_slims head
    assert list(b2["apriori_cell_type"]) == ["CL:7"]
    assert b2["part_number"] == "p9"

    b3 = out.loc["B3"]  # left-outer: no type, no libraries
    assert b3["biosample_type"] is None
    assert b3["anatomical_site"] is None
    assert list(b3["library_prep_id"]) == []
