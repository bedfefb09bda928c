"""End-to-end test of the unified transformation driver: raw entity JSON
dumps (reference layout: <input>/<EntityName>/*.json) → all 15 tables,
manifest-committed, resume-safe.  Fixture values mirror tests/test_entities
goldens so the per-tree semantics stay pinned through the full DAG."""

import json
import os

import pytest

from encode_ingest_ray.pipelines.transform_driver import (
    OUTPUT_TABLES,
    read_output_table,
    run_transformation_pipeline,
)

TS = "2020-12-24T18:00:00.111222Z"


def _dump(root, name, rows):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{name}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def raw_dumps(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw-dumps"))
    _dump(root, "Organism", [
        {"at_id": "/organisms/human/", "scientific_name": "Homo sapiens"},
    ])
    _dump(root, "Donor", [
        {"at_id": "/human-donors/D1/", "dbxrefs": [], "date_created": TS,
         "organism": "/organisms/human/", "award": "/awards/A1/",
         "lab": "/labs/L1/", "submitted_by": "/users/U1/", "age": "30-33",
         "parents": []},
    ])
    _dump(root, "Target", [
        {"at_id": "/targets/T1/", "organism": "/organisms/mouse/", "label": "CTCF-mouse"},
        {"at_id": "/targets/T2/", "organism": "/organisms/human/", "label": "CTCF"},
    ])
    _dump(root, "Antibody", [
        {"at_id": "/antibodies/AB1/", "targets": ["/targets/T1/", "/targets/T2/"],
         "dbxrefs": [], "date_created": TS, "source": "/sources/S1/",
         "clonality": "monoclonal", "host_organism": "/organisms/rabbit/",
         "award": "/awards/A1/", "lab": "/labs/L1/", "lot_id": "lot1",
         "product_id": "p1", "purifications": ["affinity"]},
    ])
    _dump(root, "Library", [
        {"at_id": "/libraries/L1/", "biosample": "/biosamples/B1/",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "strand_specificity": "forward",
         "treatments": ["/treatments/T1/"], "spikeins_used": [],
         "nucleic_acid_term_name": "RNA", "dbxrefs": []},
        {"at_id": "/libraries/L2/",
         "mixed_biosamples": ["/biosamples/B1/", "/biosamples/B2/"],
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "strand_specificity": "strand-specific",
         "treatments": [], "spikeins_used": ["/references/R1/"], "dbxrefs": []},
        {"at_id": "/libraries/L3/", "biosample": "/biosamples/B2/",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "treatments": [], "spikeins_used": [],
         "dbxrefs": []},
    ])
    _dump(root, "Biosample", [
        {"at_id": "/biosamples/B1/", "biosample_ontology": "/types/T1/",
         "donor": "/human-donors/D1/", "dbxrefs": ["x1"], "award": "/awards/A1/"},
        {"at_id": "/biosamples/B2/", "biosample_ontology": "/types/T2/",
         "dbxrefs": [], "award": "/awards/A2/"},
    ])
    _dump(root, "BiosampleType", [
        {"at_id": "/types/T1/", "classification": "tissue", "term_id": "UBERON:1",
         "organ_slims": ["lung"], "cell_slims": ["epithelial"]},
        {"at_id": "/types/T2/", "classification": "primary cell", "term_id": "CL:7",
         "organ_slims": ["blood", "arm"], "cell_slims": ["t-cell"]},
    ])
    _dump(root, "Treatment", [
        {"at_id": "/treatments/T1/", "dbxrefs": [], "date_created": TS,
         "treatment_type": "chemical", "treatment_term_id": "CHEBI:1",
         "treatment_term_name": "ethanol", "amount": 10.0, "amount_units": "mM",
         "duration": 2.0, "duration_units": "hour", "purpose": "perturbation"},
    ])
    _dump(root, "Experiment", [
        {"at_id": "/experiments/E1/", "dbxrefs": ["geo:1"], "date_created": TS,
         "description": "first", "assay_term_name": "ATAC-seq",
         "assay_term_id": "OBI:1", "assay_slims": ["DNA accessibility"],
         "award": "/awards/A1/", "lab": "/labs/L1/", "submitted_by": "/users/U1/",
         "status": "released", "contributing_files": ["/files/F9/"],
         "files": ["/files/F1/", "/files/F2/"],
         "audit": [{"category": "c", "level": 40}]},
    ])
    _dump(root, "FunctionalCharacterizationExperiment", [
        {"at_id": "/experiments/E2/", "dbxrefs": [], "date_created": TS,
         "assay_term_name": "mystery assay", "assay_term_id": "OBI:2",
         "assay_slims": [], "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "status": "released",
         "contributing_files": [], "files": ["/files/F3/", "/files/F4/"],
         "audit": []},
    ])
    _dump(root, "Replicate", [
        {"at_id": "/replicates/R1/", "library": "/libraries/L1/",
         "experiment": "/experiments/E1/", "antibody": "/antibodies/AB1/"},
        {"at_id": "/replicates/R2/", "library": "/libraries/L3/",
         "experiment": "/experiments/E1/"},
        {"at_id": "/replicates/R3/", "library": "/libraries/L1/",
         "experiment": "/experiments/E2/"},
    ])
    # file streams pre-split by category, as the reference's extraction emits
    _dump(root, "SequenceFiles", [
        {"at_id": "/files/F1/", "dataset": "/experiments/E1/",
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
        {"at_id": "/files/F4/", "dataset": "/experiments/E2/",
         "output_category": "raw data", "assay_term_name": [],
         "file_format": "fastq", "date_created": TS, "award": "/awards/A1/",
         "lab": "/labs/L1/", "submitted_by": "/users/U1/",
         "platform": "/platforms/P2/", "dbxrefs": [],
         "derived_from": ["/files/F1/", "/files/F2/"],
         "origin_batches": ["/biosamples/B9/"], "donors": [],
         "paired_end": "x", "read_count": 7, "quality_metrics": [],
         "assembly": [], "audit": [{"category": "z", "level": 50}]},
    ])
    _dump(root, "AlignmentFiles", [
        {"at_id": "/files/F2/", "dataset": "/experiments/E1/",
         "step_run": "/analysis-step-runs/SR1/", "output_category": "alignment",
         "assay_term_name": ["ChIP-seq", "mystery assay"], "file_format": "bam",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "dbxrefs": [],
         "derived_from": ["/files/F1/"],
         "origin_batches": ["/biosamples/B1/", "/biosamples/B2/"], "donors": [],
         "paired_end": "2", "run_type": "single-ended",
         "quality_metrics": ["/qm/Q1/"], "assembly": ["GRCh38"],
         "file_size": 20, "md5checksum": "bb", "audit": []},
    ])
    _dump(root, "OtherFiles", [
        {"at_id": "/files/F3/", "dataset": "/experiments/E2/",
         "step_run": "/analysis-step-runs/SR2/", "output_category": "reference",
         "assay_term_name": ["WGS"], "file_format": "fasta",
         "date_created": TS, "award": "/awards/A1/", "lab": "/labs/L1/",
         "submitted_by": "/users/U1/", "dbxrefs": [], "derived_from": [],
         "donors": [], "paired_end": "1,2", "quality_metrics": [],
         "assembly": ["GRCh38", "hg19"], "file_size": 30, "md5checksum": "cc",
         "audit": [{"category": "w", "level": 30}]},
    ])
    _dump(root, "AnalysisStepRun", [
        {"at_id": "/analysis-step-runs/SR1/",
         "analysis_step_version": "/analysis-step-versions/V1/"},
        {"at_id": "/analysis-step-runs/SR2/",
         "analysis_step_version": "/analysis-step-versions/V2/"},
    ])
    _dump(root, "AnalysisStepVersion", [
        {"at_id": "/analysis-step-versions/V1/", "name": "v1.0",
         "analysis_step": "/analysis-steps/S1/"},
        {"at_id": "/analysis-step-versions/V2/", "name": "v2.0",
         "analysis_step": "/analysis-steps/S2/"},
    ])
    _dump(root, "AnalysisStep", [
        {"at_id": "/analysis-steps/S1/", "pipelines": ["/pipelines/P1/"]},
        {"at_id": "/analysis-steps/S2/",
         "pipelines": ["/pipelines/P1/", "/pipelines/P2/"]},
    ])
    _dump(root, "Pipeline", [
        {"at_id": "/pipelines/P1/", "title": "ATAC pipeline",
         "assay_term_names": ["ATAC-seq"]},
        {"at_id": "/pipelines/P2/", "title": "other", "assay_term_names": []},
    ])
    _dump(root, "Reference", [
        {"at_id": "/references/R1/", "dbxrefs": ["ref:1"], "assembly": ["GRCh38"],
         "description": "genome", "organism": "/organisms/human/",
         "lab": "/labs/L1/", "reference_type": "genome",
         "donor": ["/human-donors/D1/"], "files": ["/files/F3/"],
         "original_files": ["/files/F3/"]},
    ])
    return root


@pytest.fixture(scope="module")
def run_result(raw_dumps, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tables"))
    summary = run_transformation_pipeline(raw_dumps, out)
    return out, summary


def test_all_15_tables_committed(run_result):
    out, summary = run_result
    assert sorted(summary) == sorted(OUTPUT_TABLES)
    assert all(not s["skipped"] for s in summary.values())
    for name in OUTPUT_TABLES:
        assert os.path.isdir(os.path.join(out, name, "_manifest"))


def _rows(out, name, key):
    t = read_output_table(out, name).to_pandas()
    return t.set_index(key).sort_index()


def test_file_tree_through_driver(run_result):
    out, _ = run_result
    f = _rows(out, "file", "file_id")
    assert list(f.index) == ["F1", "F2", "F3", "F4"]
    assert f.loc["F1"]["file_type"] == "Sequence"
    assert sorted(f.loc["F2"]["library_id"]) == ["L1", "L2", "L3"]
    assert f.loc["F1"]["max_audit_flag"] == "red"
    assert list(f.loc["F3"]["data_modality"]) == ["Genomic_Assembly"]


def test_joined_trees_through_driver(run_result):
    out, _ = run_result
    ab = _rows(out, "antibody", "antibody_id")
    assert ab.loc["AB1"]["target"] == "CTCF"  # human target wins

    e = _rows(out, "experimentactivity", "experimentactivity_id")
    assert sorted(e.index) == ["E1", "E2"]
    assert list(e.loc["E1"]["library_id"]) == ["L1", "L3"]
    assert list(e.loc["E1"]["antibody_id"]) == ["AB1"]

    aa = _rows(out, "assayactivity", "assayactivity_id")
    # generated files resolved from the FILES stream keyed by dataset
    assert list(aa.loc["E1"]["generated_file_id"]) == ["F1", "F2"]

    sa = _rows(out, "stepactivity", "stepactivity_id")
    assert list(sa.loc["SR1"]["generated_file_id"]) == ["F1", "F2"]
    assert sa.loc["SR1"]["analysisactivity_id"] == "P1_E1"

    an = _rows(out, "analysisactivity", "analysisactivity_id")
    assert list(an.index) == ["P1_E1"]
    assert an.loc["P1_E1"]["analysis_type"] == "ATAC pipeline"

    b = _rows(out, "biosample", "biosample_id")
    assert b.loc["B1"]["biosample_type"] == "tissue"
    # L2 references B1 only via mixed_biosamples, which the reference's
    # librariesByBiosample keying ignores (its own TODO) — L1 only
    assert list(b.loc["B1"]["library_prep_id"]) == ["L1"]

    d = _rows(out, "donor", "donor_id")
    assert d.loc["D1"]["organism_type"] == "Homo sapiens"
    assert d.loc["D1"]["age_upper_bound"] == 33.0

    r = _rows(out, "referencefileset", "referencefileset_id")
    assert r.loc["R1"]["organism"] == "Homo sapiens"

    seq = _rows(out, "sequencingactivity", "sequencingactivity_id")
    assert sorted(seq.index) == ["F1_E1", "F4_E2"]
    al = _rows(out, "alignmentactivity", "alignmentactivity_id")
    assert list(al.index) == ["F2_E1"]

    ds = read_output_table(out, "dataset").to_pandas()
    assert ds.iloc[0]["dataset_id"] == "ENCODE"


def test_rerun_skips_committed_tables(run_result, raw_dumps):
    out, _ = run_result
    again = run_transformation_pipeline(raw_dumps, out)
    assert all(s["skipped"] for s in again.values())
    # row counts preserved through the skip
    assert again["file"]["rows"] == 4
