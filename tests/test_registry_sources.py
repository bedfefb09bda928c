"""Schema registry (§2.10) + JSON source (S2) tests."""

import json

import pyarrow as pa
import pytest

from encode_ingest_ray.schema_registry import TRANSCRIPT_SPEC, SchemaRegistry, TableSpec
from encode_ingest_ray.sources.readers import read_json_entities, seed_items


def test_spec_compiles_to_arrow_schema():
    spec = TableSpec(
        {
            "name": "t",
            "primaryKey": ["id"],
            "columns": [
                {"name": "id", "datatype": "string", "required": True},
                {"name": "xs", "datatype": "integer", "array_of": True},
                {"name": "when", "datatype": "timestamp"},
            ],
        }
    )
    assert spec.schema.field("xs").type == pa.list_(pa.int64())
    assert spec.schema.field("when").type == pa.timestamp("us")
    assert not spec.schema.field("id").nullable


def test_validate_aligns_and_enforces():
    spec = TableSpec(TRANSCRIPT_SPEC)
    t = pa.table(
        {
            "turn_idx": pa.array([0, 1], pa.int64()),  # wrong int width -> cast
            "conv_id": ["a", "b"],
            "extra": [1, 2],  # unknown -> dropped
        }
    )
    out = spec.validate(t)
    assert out.column_names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert out.column("turn_idx").type == pa.int32()
    assert out.column("role").null_count == 2  # optional null-filled
    with pytest.raises(ValueError, match="unknown columns"):
        spec.validate(t, ignore_unknown_values=False)
    with pytest.raises(ValueError, match="missing required"):
        spec.validate(pa.table({"conv_id": ["a"]}))
    with pytest.raises(ValueError, match="has nulls"):
        spec.validate(
            pa.table({"conv_id": ["a"], "turn_idx": pa.array([None], pa.int32())})
        )


def test_registry_loads_spec_dir(tmp_path):
    p = tmp_path / "transcript.table.json"
    p.write_text(json.dumps(TRANSCRIPT_SPEC))
    reg = SchemaRegistry(str(tmp_path))
    assert reg["transcript"].primary_key == ["conv_id", "turn_idx"]


def test_read_json_entities_normalizes_unknowns(tmp_path):
    p = tmp_path / "donors.json"
    rows = [
        {"at_id": "/d/A1/", "lab": "unknown", "n": 1},
        {"at_id": "/d/A2/", "lab": "lab9", "n": 2},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_json_entities([str(p)])
    df = ds.to_pandas().sort_values("n")
    assert df["lab"].tolist()[0] is None or df["lab"].isna().tolist()[0]
    assert df["lab"].tolist()[1] == "lab9"


def test_seed_items():
    ds = seed_items([{"query": "Biosample", "n": 64}])
    assert ds.count() == 1
