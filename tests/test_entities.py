"""Golden tests for the per-entity transforms (SURVEY §2 M9) against
reference-shaped fixtures (FIXTURES.md §3.2).  Semantics pinned from the
Scala sources cited in pipelines/entities.py."""

import pandas as pd
import pyarrow as pa
import ray.data

from encode_ingest_ray.pipelines import entities as E

TS = pa.scalar(1608832800111222, pa.timestamp("us", "UTC"))
AUDIT_T = pa.list_(pa.struct([("category", pa.string()), ("level", pa.int64())]))


def _files_table():
    return pa.table(
        {
            "at_id": pa.array(
                ["/files/F1/", "/files/F2/", "/files/F3/", "/files/F4/"]
            ),
            "dataset": pa.array(
                ["/experiments/E1/", "/experiments/E1/", "/experiments/E2/", "/experiments/E2/"]
            ),
            "step_run": pa.array(["/analysis-step-runs/SR1/", "/analysis-step-runs/SR1/", "/analysis-step-runs/SR2/", None]),
            "output_category": pa.array(["raw data", "alignment", "reference", "raw data"]),
            "assay_term_name": pa.array(
                [["ATAC-seq"], ["ChIP-seq", "mystery assay"], ["WGS"], []],
                pa.list_(pa.string()),
            ),
            "file_format": pa.array(["fastq", "bam", "fasta", "fastq"]),
            "file_format_type": pa.array([None, None, None, None], pa.string()),
            "date_created": pa.array([TS.as_py()] * 4, pa.timestamp("us", "UTC")),
            "award": pa.array(["/awards/A1/"] * 4),
            "lab": pa.array(["/labs/L1/"] * 4),
            "submitted_by": pa.array(["/users/U1/"] * 4),
            "platform": pa.array(["/platforms/P1/", None, None, "/platforms/P2/"]),
            "dbxrefs": pa.array([["x:1"], [], [], []], pa.list_(pa.string())),
            "derived_from": pa.array(
                [[], ["/files/F1/"], [], ["/files/F1/", "/files/F2/"]],
                pa.list_(pa.string()),
            ),
            "origin_batches": pa.array(
                [["/biosamples/B1/"], ["/biosamples/B1/", "/biosamples/B2/"], None, ["/biosamples/B9/"]],
                pa.list_(pa.string()),
            ),
            "donors": pa.array(
                [["/human-donors/D1/"], [], [], []], pa.list_(pa.string())
            ),
            "paired_end": pa.array(["1", "2", "1,2", "x"]),
            "paired_with": pa.array(["/files/F2/", None, None, None]),
            "run_type": pa.array(["paired-ended", "single-ended", None, None]),
            "read_count": pa.array([100, None, None, 7], pa.int64()),
            "read_length": pa.array([50, None, None, None], pa.int64()),
            "genome_annotation": pa.array([None, "V29", None, None]),
            "quality_metrics": pa.array([[], ["/qm/Q1/"], [], []], pa.list_(pa.string())),
            "assembly": pa.array([[], ["GRCh38"], ["GRCh38", "hg19"], []], pa.list_(pa.string())),
            "file_size": pa.array([10, 20, 30, None], pa.int64()),
            "md5checksum": pa.array(["aa", "bb", "cc", None]),
            "audit": pa.array(
                [
                    [{"category": "b", "level": 40}, {"category": "a", "level": 60}],
                    [],
                    None,
                    [{"category": "z", "level": 50}],
                ],
                AUDIT_T,
            ),
        }
    )


def _libraries_table():
    return pa.table(
        {
            "at_id": pa.array(["/libraries/L1/", "/libraries/L2/", "/libraries/L3/"]),
            "biosample": pa.array(["/biosamples/B1/", None, "/biosamples/B2/"]),
            "mixed_biosamples": pa.array(
                [None, ["/biosamples/B1/", "/biosamples/B2/"], None],
                pa.list_(pa.string()),
            ),
            "date_created": pa.array([TS.as_py()] * 3, pa.timestamp("us", "UTC")),
            "award": pa.array(["/awards/A1/"] * 3),
            "lab": pa.array(["/labs/L1/"] * 3),
            "submitted_by": pa.array(["/users/U1/"] * 3),
            "strand_specificity": pa.array(["forward", "strand-specific", None]),
            "treatments": pa.array([["/treatments/T1/"], [], []], pa.list_(pa.string())),
            "spikeins_used": pa.array([[], ["/references/R1/"], []], pa.list_(pa.string())),
            "nucleic_acid_term_id": pa.array(["SO:1", "SO:2", None]),
            "nucleic_acid_term_name": pa.array(["RNA", "DNA", None]),
            "size_range": pa.array([">200", None, None]),
            "rna_integrity_number": pa.array([9.5, None, None], pa.float64()),
            "queried_RNP_size_range": pa.array([None, None, None], pa.string()),
            "dbxrefs": pa.array([[], [], []], pa.list_(pa.string())),
        }
    )


def test_file_transform_golden():
    files = _files_table()
    out = (
        E.transform_files(ray.data.from_arrow(files), _libraries_table())
        .to_pandas()
        .set_index("file_id")
        .sort_index()
    )
    assert list(out.index) == ["F1", "F2", "F3", "F4"]
    f1 = out.loc["F1"]
    assert f1["file_type"] == "Sequence"
    assert f1["data_modality"] == ["Epigenomic_DNAChromatinAccessibility"]
    assert f1["paired_end_identifier"] == 1
    assert f1["library_layout"] == True  # noqa: E712 — paired-ended
    assert f1["paired_with_file_id"] == "F2"
    # B1 is in L1.biosample and L2.mixed_biosamples
    assert list(f1["library_id"]) == ["L1", "L2"]
    assert list(f1["xref"]) == ["https://www.encodeproject.org/files/F1/", "x:1"]
    assert f1["max_audit_flag"] == "red" and list(f1["audit_labels"]) == ["a", "b"]
    f2 = out.loc["F2"]
    assert f2["file_type"] == "Alignment"
    # unknown assay term gets the '!' sentinel
    assert list(f2["data_modality"]) == ["Epigenomic_DNABinding", "!mystery assay"]
    assert f2["paired_end_identifier"] == 2
    assert f2["library_layout"] == False  # noqa: E712 — single-ended
    assert sorted(f2["library_id"]) == ["L1", "L2", "L3"]
    f3 = out.loc["F3"]
    # output_category == reference overrides assay terms
    assert list(f3["data_modality"]) == ["Genomic_Assembly"]
    assert pd.isna(f3["paired_end_identifier"])  # "1,2" -> None
    assert list(f3["library_id"]) == []  # origin_batches None -> empty
    f4 = out.loc["F4"]
    assert pd.isna(f4["paired_end_identifier"])  # unknown "x" -> None
    assert list(f4["library_id"]) == []  # no library has B9
    assert list(f4["derived_from_file_id"]) == ["F1", "F2"]


def test_antibody_m2n_distributed():
    antibodies = pa.table(
        {
            "at_id": pa.array(["/antibodies/AB1/", "/antibodies/AB2/", "/antibodies/AB3/"]),
            "targets": pa.array(
                [
                    ["/targets/T1/", "/targets/T2/"],  # mouse + human -> human label
                    ["/targets/T3/", "/targets/T4/"],  # two human -> sorted-first
                    [],  # no targets -> None
                ],
                pa.list_(pa.string()),
            ),
            "dbxrefs": pa.array([[], [], []], pa.list_(pa.string())),
            "date_created": pa.array([TS.as_py()] * 3, pa.timestamp("us", "UTC")),
            "source": pa.array(["/sources/S1/"] * 3),
            "clonality": pa.array(["monoclonal", None, None]),
            "host_organism": pa.array(["/organisms/rabbit/"] * 3),
            "award": pa.array(["/awards/A1/"] * 3),
            "isotype": pa.array([None, "IgG", None]),
            "lab": pa.array(["/labs/L1/"] * 3),
            "lot_id": pa.array(["lot1", None, None]),
            "product_id": pa.array(["p1", "p2", "p3"]),
            "purifications": pa.array([["affinity"], [], []], pa.list_(pa.string())),
        }
    )
    targets = pa.table(
        {
            "at_id": pa.array(
                ["/targets/T1/", "/targets/T2/", "/targets/T3/", "/targets/T4/"]
            ),
            "organism": pa.array(
                ["/organisms/mouse/", "/organisms/human/", "/organisms/human/", "/organisms/human/"]
            ),
            "label": pa.array(["CTCF-mouse", "CTCF", "ZZTOP", "AAA"]),
        }
    )
    out = (
        E.transform_antibodies(
            ray.data.from_arrow(antibodies), ray.data.from_arrow(targets)
        )
        .to_pandas()
        .set_index("antibody_id")
        .sort_index()
    )
    assert out.loc["AB1"]["target"] == "CTCF"  # only the human target counts
    assert out.loc["AB2"]["target"] == "AAA"  # deterministic sorted-first
    assert out.loc["AB3"]["target"] is None
    assert out.loc["AB1"]["part_number"] == "p1"
    assert out.loc["AB1"]["host_organism"] == "https://www.encodeproject.org/organisms/rabbit/"


def test_library_transform():
    out = (
        E.transform_libraries(ray.data.from_arrow(_libraries_table()))
        .to_pandas()
        .set_index("library_id")
        .sort_index()
    )
    assert out.loc["L1"]["library_layout"] == True  # noqa: E712
    assert out.loc["L1"]["paired_end_type"] == "forward"
    # the pre-forward/reverse placeholder nulls the type but keeps layout=True
    assert out.loc["L2"]["library_layout"] == True  # noqa: E712
    assert out.loc["L2"]["paired_end_type"] is None
    assert out.loc["L3"]["library_layout"] == False  # noqa: E712
    assert out.loc["L1"]["uses_sample_biosample_id"] == "B1"
    assert list(out.loc["L2"]["used_by"]) == ["R1"]


def _replicates_table():
    return pa.table(
        {
            "at_id": pa.array(["/replicates/R1/", "/replicates/R2/", "/replicates/R3/"]),
            "library": pa.array(["/libraries/L1/", "/libraries/L3/", "/libraries/L1/"]),
            "experiment": pa.array(
                ["/experiments/E1/", "/experiments/E1/", "/experiments/E2/"]
            ),
            "antibody": pa.array(["/antibodies/AB1/", None, "/antibodies/AB2/"]),
        }
    )


def _experiments_table():
    return pa.table(
        {
            "at_id": pa.array(["/experiments/E1/", "/experiments/E2/"]),
            "dbxrefs": pa.array([["geo:1"], []], pa.list_(pa.string())),
            "date_created": pa.array([TS.as_py()] * 2, pa.timestamp("us", "UTC")),
            "date_submitted": pa.array([None, None], pa.timestamp("us", "UTC")),
            "description": pa.array(["first", None]),
            "assay_term_name": pa.array(["ATAC-seq", "mystery assay"]),
            "assay_term_id": pa.array(["OBI:1", "OBI:2"]),
            "assay_slims": pa.array([["DNA accessibility"], []], pa.list_(pa.string())),
            "award": pa.array(["/awards/A1/"] * 2),
            "lab": pa.array(["/labs/L1/"] * 2),
            "submitted_by": pa.array(["/users/U1/"] * 2),
            "status": pa.array(["released", "released"]),
            "contributing_files": pa.array([["/files/F9/"], []], pa.list_(pa.string())),
            "files": pa.array(
                [["/files/F1/", "/files/F2/"], ["/files/F3/", "/files/F4/"]],
                pa.list_(pa.string()),
            ),
            "audit": pa.array([[], [{"category": "c", "level": 40}]], AUDIT_T),
        }
    )


def test_experiment_and_assay_activity():
    exps = _experiments_table()
    out = (
        E.transform_experiments(
            ray.data.from_arrow(exps), _replicates_table(), _libraries_table()
        )
        .to_pandas()
        .set_index("experimentactivity_id")
        .sort_index()
    )
    e1 = out.loc["E1"]
    assert list(e1["library_id"]) == ["L1", "L3"]
    assert list(e1["uses_sample_biosample_id"]) == ["B1", "B2"]
    assert list(e1["antibody_id"]) == ["AB1"]
    assert list(e1["generated_file_id"]) == ["F1", "F2"]
    assert list(e1["used_file_id"]) == ["F9"]
    assert list(e1["data_modality"]) == ["Epigenomic_DNAChromatinAccessibility"]
    e2 = out.loc["E2"]
    assert list(e2["data_modality"]) == ["!mystery assay"]
    assert e2["max_audit_flag"] == "yellow"

    aa = (
        E.transform_assay_activities(
            ray.data.from_arrow(exps), _files_table(), _replicates_table(), _libraries_table()
        )
        .to_pandas()
        .set_index("assayactivity_id")
        .sort_index()
    )
    a1 = aa.loc["E1"]
    assert a1["assay_category"] == "DNA accessibility"
    assert a1["assay_type"] == "OBI:1"
    # generated files come from the FILES table keyed by dataset, not the list
    assert list(a1["generated_file_id"]) == ["F1", "F2"]
    assert aa.loc["E2"]["assay_category"] is None
    assert list(aa.loc["E2"]["generated_file_id"]) == ["F3", "F4"]


def _step_fixture():
    step_runs = pa.table(
        {
            "at_id": pa.array(["/analysis-step-runs/SR1/", "/analysis-step-runs/SR2/", "/analysis-step-runs/SR3/"]),
            "analysis_step_version": pa.array(
                ["/analysis-step-versions/V1/", "/analysis-step-versions/V2/", "/analysis-step-versions/V1/"]
            ),
        }
    )
    versions = pa.table(
        {
            "at_id": pa.array(["/analysis-step-versions/V1/", "/analysis-step-versions/V2/"]),
            "name": pa.array(["v1.0", "v2.0"]),
            "analysis_step": pa.array(["/analysis-steps/S1/", "/analysis-steps/S2/"]),
        }
    )
    steps = pa.table(
        {
            "at_id": pa.array(["/analysis-steps/S1/", "/analysis-steps/S2/"]),
            "pipelines": pa.array(
                [["/pipelines/P1/"], ["/pipelines/P1/", "/pipelines/P2/"]],
                pa.list_(pa.string()),
            ),
        }
    )
    return step_runs, versions, steps


def test_step_and_analysis_activities():
    step_runs, versions, steps = _step_fixture()
    infos = E.step_run_info(step_runs, versions, steps, _files_table())
    by_run = {i["run_at"]: i for i in infos}
    # SR1 generated F1+F2 (both dataset E1), step S1 has exactly one pipeline
    sa = E.transform_step_activities(infos).to_pandas().set_index("stepactivity_id")
    assert list(sa.loc["SR1"]["generated_file_id"]) == ["F1", "F2"]
    assert list(sa.loc["SR1"]["used_file_id"]) == ["F1"]  # F2 derived_from F1
    assert sa.loc["SR1"]["analysisactivity_id"] == "P1_E1"
    assert sa.loc["SR1"]["version"] == "v1.0"
    # SR2's step S2 has TWO pipelines -> no pipeline-run id
    assert sa.loc["SR2"]["analysisactivity_id"] is None
    # SR3 has no files -> zero datasets -> no pipeline-run id
    assert sa.loc["SR3"]["analysisactivity_id"] is None
    assert by_run["/analysis-step-runs/SR3/"]["files"] == []

    pipelines = pa.table(
        {
            "at_id": pa.array(["/pipelines/P1/", "/pipelines/P2/"]),
            "title": pa.array(["ATAC pipeline", "other"]),
            "assay_term_names": pa.array([["ATAC-seq"], []], pa.list_(pa.string())),
        }
    )
    an = (
        E.transform_analysis_activities(infos, pipelines)
        .to_pandas()
        .set_index("analysisactivity_id")
    )
    assert list(an.index) == ["P1_E1"]
    row = an.loc["P1_E1"]
    assert list(row["generated_file_id"]) == ["F1", "F2"]
    assert list(row["used_file_id"]) == []  # F1 is generated by the same run
    assert row["analysis_type"] == "ATAC pipeline"
    assert row["assayactivity_id"] == "E1"
    assert list(row["data_modality"]) == ["Epigenomic_DNAChromatinAccessibility"]


def test_sequencing_and_alignment_activities():
    files = _files_table()
    seq = (
        E.transform_sequencing_activities(ray.data.from_arrow(files), _libraries_table())
        .to_pandas()
        .set_index("sequencingactivity_id")
        .sort_index()
    )
    # only 'raw data' files
    assert list(seq.index) == ["F1_E1", "F4_E2"]
    assert list(seq.loc["F1_E1"]["library_id"]) == ["L1", "L2"]
    assert list(seq.loc["F1_E1"]["generated_file_id"]) == ["F1"]
    assert list(seq.loc["F1_E1"]["associated_with"]) == ["E1"]

    al = (
        E.transform_alignment_activities(ray.data.from_arrow(files))
        .to_pandas()
        .set_index("alignmentactivity_id")
    )
    assert list(al.index) == ["F2_E1"]
    assert list(al.loc["F2_E1"]["used_file_id"]) == ["F1"]
    assert list(al.loc["F2_E1"]["reference_assembly"]) == ["GRCh38"]


def test_sample_treatment_and_library_prep_and_refset_and_dataset():
    treatments = pa.table(
        {
            "at_id": pa.array(["/treatments/T1/"]),
            "dbxrefs": pa.array([[]], pa.list_(pa.string())),
            "date_created": pa.array([TS.as_py()], pa.timestamp("us", "UTC")),
            "treatment_type": pa.array(["chemical"]),
            "treatment_term_id": pa.array(["CHEBI:1"]),
            "treatment_term_name": pa.array(["ethanol"]),
            "amount": pa.array([10.0], pa.float64()),
            "amount_units": pa.array(["mM"]),
            "duration": pa.array([2.0], pa.float64()),
            "duration_units": pa.array(["hour"]),
            "purpose": pa.array(["perturbation"]),
        }
    )
    st = E.transform_sample_treatments(ray.data.from_arrow(treatments)).to_pandas()
    assert st.iloc[0]["sampletreatmentactivity_id"] == "T1"
    assert st.iloc[0]["sample_treatment_method"] == "chemical"
    assert st.iloc[0]["amount"] == 10.0

    lp = (
        E.transform_library_preparations(
            ray.data.from_arrow(_libraries_table()),
            _replicates_table(),
            _experiments_table(),
        )
        .to_pandas()
        .set_index("librarypreparationactivity_id")
        .sort_index()
    )
    # L1 replicates into E1 (ATAC-seq) and E2; sorted-first pairing -> E1
    assert list(lp.loc["L1"]["data_modality"]) == ["Epigenomic_DNAChromatinAccessibility"]
    assert list(lp.loc["L2"]["data_modality"]) == []  # no replicate uses L2
    assert list(lp.loc["L1"]["generated_library_id"]) == ["L1"]

    refs = pa.table(
        {
            "at_id": pa.array(["/references/R1/"]),
            "dbxrefs": pa.array([["ref:1"]], pa.list_(pa.string())),
            "assembly": pa.array([["GRCh38"]], pa.list_(pa.string())),
            "description": pa.array(["genome"]),
            "organism": pa.array(["/organisms/human/"]),
            "lab": pa.array(["/labs/L1/"]),
            "reference_type": pa.array(["genome"]),
            "donor": pa.array([["/human-donors/D1/"]], pa.list_(pa.string())),
            "files": pa.array([["/files/F3/"]], pa.list_(pa.string())),
            "derived_from_": pa.array([[]], pa.list_(pa.string())),
            "original_files": pa.array([["/files/F3/"]], pa.list_(pa.string())),
            "related_files": pa.array([[]], pa.list_(pa.string())),
            "related_pipelines": pa.array([[]], pa.list_(pa.string())),
        }
    )
    organisms = pa.table(
        {
            "at_id": pa.array(["/organisms/human/"]),
            "scientific_name": pa.array(["Homo sapiens"]),
        }
    )
    rf = E.transform_reference_file_sets(
        ray.data.from_arrow(refs), organisms
    ).to_pandas()
    assert rf.iloc[0]["referencefileset_id"] == "R1"
    assert rf.iloc[0]["organism"] == "Homo sapiens"
    assert list(rf.iloc[0]["generated_file_id"]) == ["F3"]

    d = E.dataset_singleton()
    assert d.num_rows == 1 and d.column("dataset_id")[0].as_py() == "ENCODE"


def test_file_transform_distributed_large_side_parity():
    """The size-guarded fallback (no driver dict, exchange-based library
    linkage) must match the broadcast path row-for-row, including the
    first-seen library ordering."""
    files = _files_table()
    libs = _libraries_table()
    broadcast = (
        E.transform_files(ray.data.from_arrow(files), libs)
        .to_pandas().set_index("file_id").sort_index()
    )
    distributed = (
        E.transform_files(ray.data.from_arrow(files), libs, broadcast_max_rows=0)
        .to_pandas().set_index("file_id").sort_index()
    )
    assert list(broadcast.index) == list(distributed.index)
    for fid in broadcast.index:
        assert list(broadcast.loc[fid]["library_id"]) == list(
            distributed.loc[fid]["library_id"]
        ), fid
    # full-row parity on the shared column set
    for col in broadcast.columns:
        for fid in broadcast.index:
            a, b = broadcast.loc[fid][col], distributed.loc[fid][col]
            if isinstance(a, (list,)) or hasattr(a, "__len__") and not isinstance(a, str):
                assert list(a) == list(b), (col, fid)
            else:
                assert (a == b) or (a != a and b != b), (col, fid)


def test_experiment_and_assay_distributed_parity():
    """Size-guarded fallbacks for the experiment side index, the assay
    files_by_dataset fact dict, and the library-prep assay pairing must all
    match their broadcast paths row-for-row (incl. appearance order of
    antibody/library lists and the null-assay-claims-the-slot rule)."""
    exps = _experiments_table()
    reps = _replicates_table()
    libs = _libraries_table()
    files = _files_table()

    for maker, kwargs in [
        (E.transform_experiments, dict(replicates=reps, libraries=libs)),
        (E.transform_assay_activities, dict(files=files, replicates=reps, libraries=libs)),
    ]:
        a = maker(ray.data.from_arrow(exps), **kwargs).to_pandas()
        b = (
            maker(ray.data.from_arrow(exps), broadcast_max_rows=0, **kwargs)
            .to_pandas()
        )
        key = "experimentactivity_id" if "experimentactivity_id" in a.columns else "assayactivity_id"
        a = a.set_index(key).sort_index()
        b = b.set_index(key).sort_index()
        assert list(a.index) == list(b.index)
        for col in a.columns:
            for k in a.index:
                va, vb = a.loc[k][col], b.loc[k][col]
                if hasattr(va, "__len__") and not isinstance(va, str):
                    assert list(va) == list(vb), (maker.__name__, col, k)
                else:
                    assert (va == vb) or (va != va and vb != vb), (maker.__name__, col, k)

    lp_a = (
        E.transform_library_preparations(ray.data.from_arrow(libs), reps, exps)
        .to_pandas().set_index("librarypreparationactivity_id").sort_index()
    )
    lp_b = (
        E.transform_library_preparations(
            ray.data.from_arrow(libs), reps, exps, broadcast_max_rows=0
        )
        .to_pandas().set_index("librarypreparationactivity_id").sort_index()
    )
    assert list(lp_a.index) == list(lp_b.index)
    for k in lp_a.index:
        assert list(lp_a.loc[k]["data_modality"]) == list(lp_b.loc[k]["data_modality"]), k


def test_library_prep_null_assay_claims_slot():
    """A library whose sorted-first experiment has a NULL assay must keep
    modality [] in BOTH paths (the null match claims the slot; a later
    non-null experiment must not override) — the distinctBy subtlety."""
    libs = pa.table({
        "at_id": ["/libraries/LX/"],
        "biosample": ["/biosamples/B1/"],
        "date_created": pa.array([TS.as_py()], pa.timestamp("us", "UTC")),
        "award": ["/awards/A1/"], "lab": ["/labs/L1/"],
        "submitted_by": ["/users/U1/"],
        "treatments": pa.array([[]], pa.list_(pa.string())),
        "spikeins_used": pa.array([[]], pa.list_(pa.string())),
        "dbxrefs": pa.array([[]], pa.list_(pa.string())),
    })
    reps = pa.table({
        "at_id": ["/replicates/R1/", "/replicates/R2/"],
        "library": ["/libraries/LX/", "/libraries/LX/"],
        "experiment": ["/experiments/E1/", "/experiments/E2/"],
    })
    exps = pa.table({
        "at_id": ["/experiments/E1/", "/experiments/E2/"],
        # E1 sorts first and has a NULL assay
        "assay_term_name": pa.array([None, "ATAC-seq"], pa.string()),
    })
    for kw in ({}, {"broadcast_max_rows": 0}):
        out = (
            E.transform_library_preparations(ray.data.from_arrow(libs), reps, exps, **kw)
            .to_pandas()
        )
        assert list(out.iloc[0]["data_modality"]) == [], kw
