"""S1 extraction pipeline: pluggable-transport ENCODE client + full DAG.

Mirrors the reference's test strategy (MockEncodeClient.scala) with a
FileTransport mini-ENCODE: API-shaped fixtures (``@id`` keys, ``status``
fields), server-side dotted-path link traversal, deterministic batching —
then chains the extraction output straight into the transformation driver
(the reference's extract -> transform flow, end to end, offline)."""

import io
import json
import os
import urllib.error

import pytest

from encode_ingest_ray.pipelines.extraction import (
    extract_entities,
    group_values,
    run_extraction_pipeline,
)
from encode_ingest_ray.sources.encode_client import (
    FileTransport,
    HttpTransport,
    build_search_url,
    normalize_at_keys,
)

TS = "2020-12-24T18:00:00.111222Z"
FC_E2 = "/functional-characterization-experiments/E2/"


def _api_fixture(root):
    """API-shaped records (@id keys; all released unless testing filters)."""

    def dump(entity, rows):
        with open(os.path.join(root, f"{entity}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps({"status": "released", **r}) + "\n")

    dump("Biosample", [
        {"@id": "/biosamples/B1/", "accession": "B1ACC",
         "biosample_ontology": "/types/T1/", "donor": "/human-donors/D1/",
         "organism": "/organisms/human/", "treatments": ["/treatments/TR1/"],
         "dbxrefs": ["x1"], "award": "/awards/A1/"},
        {"@id": "/biosamples/B2/", "accession": "B2ACC",
         "biosample_ontology": "/types/T2/", "organism": "/organisms/human/",
         "dbxrefs": [], "award": "/awards/A2/"},
        # never extracted: not released (the base status filter)
        {"@id": "/biosamples/B3/", "accession": "B3ACC", "status": "deleted"},
    ])
    dump("Donor", [
        {"@id": "/human-donors/D1/", "dbxrefs": [], "date_created": TS,
         "organism": "/organisms/human/", "award": "/awards/A1/",
         "lab": "/labs/L1/", "submitted_by": "/users/U1/", "age": "30-33",
         "parents": []},
    ])
    dump("BiosampleType", [
        {"@id": "/types/T1/", "classification": "tissue", "term_id": "UBERON:1",
         "organ_slims": ["lung"], "cell_slims": ["epithelial"]},
        {"@id": "/types/T2/", "classification": "primary cell", "term_id": "CL:7",
         "organ_slims": ["blood", "arm"], "cell_slims": ["t-cell"]},
    ])
    dump("Organism", [
        {"@id": "/organisms/human/", "scientific_name": "Homo sapiens"},
    ])
    dump("GeneticModification", [
        {"@id": "/genetic-modifications/GM1/",
         "biosamples_modified": ["/biosamples/B1/"]},
    ])
    dump("Treatment", [
        {"@id": "/treatments/TR1/", "dbxrefs": [], "date_created": TS,
         "treatment_type": "chemical", "treatment_term_id": "CHEBI:1",
         "treatment_term_name": "ethanol", "amount": 10.0, "amount_units": "mM",
         "duration": 2.0, "duration_units": "hour", "purpose": "perturbation"},
    ])
    dump("Library", [
        {"@id": "/libraries/L1/", "accession": "L1ACC",
         "biosample": "/biosamples/B1/", "date_created": TS,
         "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "strand_specificity": "forward",
         "treatments": ["/treatments/TR1/"], "spikeins_used": [],
         "nucleic_acid_term_name": "RNA", "dbxrefs": []},
        {"@id": "/libraries/L2/", "accession": "L2ACC",
         "biosample": "/biosamples/B2/",
         "mixed_biosamples": ["/biosamples/B1/", "/biosamples/B2/"],
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "strand_specificity": "strand-specific",
         "treatments": [], "spikeins_used": ["/references/R1/"], "dbxrefs": []},
        {"@id": "/libraries/L3/", "accession": "L3ACC",
         "biosample": "/biosamples/B2/", "date_created": TS,
         "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "treatments": [], "spikeins_used": [],
         "dbxrefs": []},
    ])
    dump("Replicate", [
        {"@id": "/replicates/R1/", "library": "/libraries/L1/",
         "experiment": "/experiments/E1/", "antibody": "/antibodies/AB1/"},
        {"@id": "/replicates/R2/", "library": "/libraries/L3/",
         "experiment": "/experiments/E1/"},
        {"@id": "/replicates/R3/", "library": "/libraries/L1/",
         "experiment": FC_E2},
    ])
    dump("AntibodyLot", [
        {"@id": "/antibodies/AB1/", "targets": ["/targets/T1/", "/targets/T2/"],
         "dbxrefs": [], "date_created": TS, "source": "/sources/S1/",
         "clonality": "monoclonal", "host_organism": "/organisms/rabbit/",
         "award": "/awards/A1/", "lab": "/labs/L1/", "lot_id": "lot1",
         "product_id": "p1", "purifications": ["affinity"]},
    ])
    dump("Target", [
        {"@id": "/targets/T1/", "organism": "/organisms/mouse/",
         "label": "CTCF-mouse"},
        {"@id": "/targets/T2/", "organism": "/organisms/human/",
         "label": "CTCF"},
    ])
    dump("Experiment", [
        {"@id": "/experiments/E1/", "dbxrefs": ["geo:1"], "date_created": TS,
         "description": "first", "assay_term_name": "ATAC-seq",
         "assay_term_id": "OBI:1", "assay_slims": ["DNA accessibility"],
         "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "contributing_files": ["/files/F9/"],
         "files": ["/files/F1/", "/files/F2/"],
         "audit": [{"category": "c", "level": 40}]},
    ])
    dump("FunctionalCharacterizationExperiment", [
        {"@id": FC_E2, "dbxrefs": [], "date_created": TS,
         "assay_term_name": "mystery assay", "assay_term_id": "OBI:2",
         "assay_slims": [], "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "contributing_files": [],
         "files": ["/files/F3/", "/files/F4/"], "audit": []},
    ])
    dump("File", [
        {"@id": "/files/F1/", "dataset": "/experiments/E1/",
         "step_run": "/analysis-step-runs/SR1/", "output_category": "raw data",
         "assay_term_name": ["ATAC-seq"], "file_format": "fastq",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "platform": "/platforms/P1/",
         "dbxrefs": ["x:1"], "derived_from": [],
         "origin_batches": ["/biosamples/B1/"], "donors": ["/human-donors/D1/"],
         "paired_end": "1", "paired_with": "/files/F2/",
         "run_type": "paired-ended", "read_count": 100, "read_length": 50,
         "quality_metrics": [], "assembly": [], "file_size": 10,
         "md5checksum": "aa",
         "audit": [{"category": "b", "level": 40}, {"category": "a", "level": 60}]},
        {"@id": "/files/F2/", "dataset": "/experiments/E1/",
         "step_run": "/analysis-step-runs/SR1/", "output_category": "alignment",
         "assay_term_name": ["ChIP-seq", "mystery assay"], "file_format": "bam",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "dbxrefs": [],
         "derived_from": ["/files/F1/"],
         "origin_batches": ["/biosamples/B1/", "/biosamples/B2/"], "donors": [],
         "paired_end": "2", "run_type": "single-ended",
         "quality_metrics": ["/qm/Q1/"], "assembly": ["GRCh38"],
         "file_size": 20, "md5checksum": "bb", "audit": []},
        {"@id": "/files/F3/", "dataset": FC_E2,
         "step_run": "/analysis-step-runs/SR2/", "output_category": "reference",
         "assay_term_name": ["WGS"], "file_format": "fasta",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "dbxrefs": [], "derived_from": [],
         "donors": [], "paired_end": "1,2", "quality_metrics": [],
         "assembly": ["GRCh38", "hg19"], "file_size": 30, "md5checksum": "cc",
         "audit": [{"category": "w", "level": 30}]},
        {"@id": "/files/F4/", "dataset": FC_E2,
         "output_category": "raw data", "assay_term_name": [],
         "file_format": "fastq", "date_created": TS, "award": "/awards/A1/",
         "lab": "/labs/L1/", "submitted_by": "/users/U1/",
         "platform": "/platforms/P2/", "dbxrefs": [],
         "derived_from": ["/files/F1/", "/files/F2/"],
         "origin_batches": ["/biosamples/B9/"], "donors": [],
         "paired_end": "x", "read_count": 7, "quality_metrics": [],
         "assembly": [], "audit": [{"category": "z", "level": 50}]},
        # excluded from EVERY file stream by the restricted!=true negative
        {"@id": "/files/F5/", "dataset": "/experiments/E1/",
         "output_category": "signal", "restricted": "true",
         "file_format": "bigWig", "date_created": TS},
    ])
    dump("AnalysisStepRun", [
        {"@id": "/analysis-step-runs/SR1/",
         "analysis_step_version": "/analysis-step-versions/V1/"},
        {"@id": "/analysis-step-runs/SR2/",
         "analysis_step_version": "/analysis-step-versions/V2/"},
    ])
    dump("AnalysisStepVersion", [
        {"@id": "/analysis-step-versions/V1/", "name": "v1.0",
         "analysis_step": "/analysis-steps/S1/"},
        {"@id": "/analysis-step-versions/V2/", "name": "v2.0",
         "analysis_step": "/analysis-steps/S2/"},
    ])
    dump("AnalysisStep", [
        {"@id": "/analysis-steps/S1/", "pipelines": ["/pipelines/P1/"]},
        {"@id": "/analysis-steps/S2/",
         "pipelines": ["/pipelines/P1/", "/pipelines/P2/"]},
    ])
    dump("Pipeline", [
        {"@id": "/pipelines/P1/", "title": "ATAC pipeline",
         "assay_term_names": ["ATAC-seq"]},
        {"@id": "/pipelines/P2/", "title": "other", "assay_term_names": []},
    ])
    dump("Reference", [
        {"@id": "/references/R1/", "dbxrefs": ["ref:1"], "assembly": ["GRCh38"],
         "description": "genome", "organism": "/organisms/human/",
         "lab": "/labs/L1/", "reference_type": "genome",
         "donor": ["/human-donors/D1/"], "files": ["/files/F3/"],
         "original_files": ["/files/F3/"]},
    ])
    return root


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return _api_fixture(str(tmp_path_factory.mktemp("mini-encode")))


# ---------------------------------------------------------------------------
# client unit semantics
# ---------------------------------------------------------------------------
def test_url_matches_reference_format():
    url = build_search_url(
        "File",
        [("output_category", "raw data"), ("status", "released")],
        [("restricted", "true")],
    )
    assert url == (
        "https://www.encodeproject.org/search/?type=File"
        "&frame=object&status=released&limit=all&format=json"
        "&output_category=raw data&status=released&restricted!=true"
    )


def test_normalize_at_keys():
    assert normalize_at_keys({"@id": "/x/", "@type": ["T"], "plain": 1}) == {
        "at_id": "/x/", "at_type": ["T"], "plain": 1
    }


def test_file_transport_unknown_entity_is_empty_graph(fixture_root):
    t = FileTransport(fixture_root)
    assert t.fetch(build_search_url("NoSuchThing", [], [])) == {"@graph": []}


def test_file_transport_filters(fixture_root):
    t = FileTransport(fixture_root)
    # base status=released drops B3
    ids = [r["@id"] for r in t.fetch(build_search_url("Biosample", [], []))["@graph"]]
    assert ids == ["/biosamples/B1/", "/biosamples/B2/"]
    # dotted path crosses the @id link server-side
    got = t.fetch(
        build_search_url("Library", [("biosample.accession", "B2ACC")], [])
    )["@graph"]
    assert sorted(r["@id"] for r in got) == ["/libraries/L2/", "/libraries/L3/"]
    # negative filter excludes matches
    got = t.fetch(
        build_search_url("File", [], [("output_category", "raw data"),
                                      ("restricted", "true")])
    )["@graph"]
    assert sorted(r["@id"] for r in got) == ["/files/F2/", "/files/F3/"]


def test_http_transport_retries_then_raises_and_404_is_empty():
    calls = []

    def failing_opener(req, timeout):
        calls.append(req.full_url)
        raise urllib.error.HTTPError(req.full_url, 500, "boom", {}, io.BytesIO())

    t = HttpTransport(max_retries=2, backoff_s=0.0, opener=failing_opener)
    with pytest.raises(RuntimeError):
        t.fetch("https://x/search/?type=File")
    assert len(calls) == 3  # initial + 2 retries

    def opener_404(req, timeout):
        raise urllib.error.HTTPError(req.full_url, 404, "nope", {}, io.BytesIO())

    t = HttpTransport(opener=opener_404)
    assert t.fetch("https://x/search/?type=File") == {"@graph": []}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    flaky = {"n": 0}

    def flaky_opener(req, timeout):
        flaky["n"] += 1
        if flaky["n"] == 1:
            raise urllib.error.URLError("reset")
        return _Resp(json.dumps({"@graph": [{"@id": "/x/"}]}).encode())

    t = HttpTransport(max_retries=2, backoff_s=0.0, opener=flaky_opener)
    assert t.fetch("https://x/search/?type=File")["@graph"] == [{"@id": "/x/"}]


def test_group_values_is_deterministic_64_batches():
    vals = [f"/ids/{i:03d}/" for i in range(130)][::-1]  # shuffled order in
    batches = group_values(vals)
    assert [len(b) for b in batches] == [64, 64, 2]
    assert batches[0][0] == "/ids/000/"  # sorted before chunking
    assert batches == group_values(sorted(vals))  # order-insensitive


# ---------------------------------------------------------------------------
# pipeline pieces over Ray (session fixture from conftest)
# ---------------------------------------------------------------------------
def test_extract_entities_distinct_by_id(ray_session, fixture_root):
    # the same entity surfaces from two different query batches -> one row
    ds = extract_entities(
        "Organism",
        [[("@id", "/organisms/human/")], [("scientific_name", "Homo sapiens")]],
        [],
        lambda: FileTransport(fixture_root),
    )
    rows = ds.take_all()
    assert len(rows) == 1 and rows[0]["at_id"] == "/organisms/human/"


@pytest.fixture(scope="module")
def extraction_out(ray_session, fixture_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extraction-out"))
    counts = run_extraction_pipeline(lambda: FileTransport(fixture_root), out)
    return out, counts


def test_full_extraction_dag_counts(extraction_out):
    _, counts = extraction_out
    assert counts == {
        "Biosample": 2, "Reference": 1,
        "SequenceFiles": 2, "AlignmentFiles": 1, "SignalFiles": 0,
        "AnnotationFootprintFiles": 0, "AnnotationNonFootprintFiles": 0,
        "OtherFiles": 1,
        "Donor": 1, "BiosampleType": 2, "Organism": 1,
        "GeneticModification": 1, "Treatment": 1,
        "Library": 3, "Replicate": 3, "Antibody": 1, "Target": 2,
        "Experiment": 1, "FunctionalCharacterizationExperiment": 1,
        "AnalysisStepRun": 2, "AnalysisStepVersion": 2, "AnalysisStep": 2,
        "Pipeline": 2,
    }


def test_extraction_output_layout(extraction_out):
    out, _ = extraction_out
    # JSON-lines part files under <out>/<Name>/, at_-normalized keys
    parts = os.listdir(os.path.join(out, "Biosample"))
    assert parts and all(p.endswith(".json") for p in parts)
    with open(os.path.join(out, "Biosample", parts[0])) as f:
        rec = json.loads(f.readline())
    assert "at_id" in rec and "@id" not in rec
    # empty streams write no parts (directory absent or empty both fine)
    signal = os.path.join(out, "SignalFiles")
    assert not os.path.exists(signal) or os.listdir(signal) == []


def test_extraction_feeds_transformation_driver(extraction_out, tmp_path_factory):
    from encode_ingest_ray.pipelines.transform_driver import (
        OUTPUT_TABLES,
        read_output_table,
        run_transformation_pipeline,
    )

    out, _ = extraction_out
    tables = str(tmp_path_factory.mktemp("tables-from-extraction"))
    summary = run_transformation_pipeline(out, tables)
    assert set(summary) == set(OUTPUT_TABLES)
    assert summary["donor"]["rows"] == 1
    assert summary["antibody"]["rows"] == 1
    assert summary["library"]["rows"] == 3
    assert summary["biosample"]["rows"] == 2
    assert summary["file"]["rows"] == 4
    files = read_output_table(tables, "file")
    # file_id is the reference's readId short form (transformId semantics)
    assert sorted(r["file_id"] for r in files.take_all()) == ["F1", "F2", "F3", "F4"]
