"""Golden-assertion parity tests mirroring the reference's
DonorTransformationsSpec (/root/reference/transformation/src/test/scala/...
DonorTransformationsSpec.scala:8-61) — same inputs, same expected values,
flat-table form."""

import datetime

import pyarrow as pa
import ray.data

from encode_ingest_ray.pipelines.donor import transform_donor_batch, transform_donors


def donor_row(**over):
    row = {
        "at_id": "/human-donors/ABC123/",
        "dbxrefs": [],
        "date_created": datetime.datetime(2020, 12, 24, 18, 0, 0, 111222),
        "organism": "/organisms/human",
        "award": "/awards/xyz_award",
        "lab": "/labs/example-lab",
        "parents": [],
        "submitted_by": "/users/123-abc",
        "age": "30-33",
        "ethnicity": None,
        "twin": None,
        "siblings": None,
    }
    row.update(over)
    return row


def to_table(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    t = pa.table(cols)
    i = t.schema.get_field_index("dbxrefs")
    return t


def test_well_formed_donor_matches_reference_spec():
    out = transform_donor_batch(to_table([donor_row()])).to_pylist()[0]
    # assertions copied from DonorTransformationsSpec.scala:28-36
    assert out["donor_id"] == "ABC123"
    assert out["award"] == "https://www.encodeproject.org/awards/xyz_award"
    assert out["submitted_by"] == "https://www.encodeproject.org/users/123-abc"
    assert out["lab"] == "https://www.encodeproject.org/labs/example-lab"
    assert out["age_upper_bound"] == 33.0
    assert out["age_lower_bound"] == 30.0
    assert out["reported_ethnicity"] == []
    assert out["xref"][0] == "https://www.encodeproject.org/human-donors/ABC123/"


def test_age_90_or_above_matches_reference_spec():
    out = transform_donor_batch(
        to_table([donor_row(age="90 or above", ethnicity=["ethn1", "ethn2"])])
    ).to_pylist()[0]
    # DonorTransformationsSpec.scala:55-59
    assert out["age_lower_bound"] == 90.0
    assert out["age_upper_bound"] is None
    assert out["reported_ethnicity"] == ["ethn1", "ethn2"]


def test_sibling_twin_merge_and_organism_broadcast():
    rows = [
        donor_row(
            at_id="/human-donors/D1/",
            twin="/human-donors/T9/",
            siblings=["/human-donors/S2/", "/human-donors/T9/"],
        )
    ]
    organisms = pa.table(
        {"at_id": ["/organisms/human"], "scientific_name": ["Homo sapiens"]}
    )
    ds = ray.data.from_arrow(to_table(rows))
    out = transform_donors(ds, organisms).to_pandas().iloc[0]
    # twin+siblings as a sorted set (DonorTransformations.scala:20-24,47)
    assert list(out["sibling_donor_id"]) == ["S2", "T9"]
    assert out["organism_type"] == "Homo sapiens"


def test_unknown_literal_is_nulled():
    out = transform_donor_batch(to_table([donor_row(age="unknown")])).to_pylist()[0]
    assert out["age_lower_bound"] is None and out["age_upper_bound"] is None
