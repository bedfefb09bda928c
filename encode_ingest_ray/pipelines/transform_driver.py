"""The unified transformation driver: raw entity JSON dumps → all 15
processing trees → manifest-committed per-table Parquet, in ONE invocation.

Reference analog: ``TransformationPipelineBuilder.buildPipeline``
(/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
encode/transformation/TransformationPipelineBuilder.scala:40-174) schedules
every tree against one Scio context.  Here each tree is a lazy Ray Dataset
pipeline; trees share the raw side tables (read once, broadcast) and the
streaming executor pipelines the per-tree stages.  Sinks follow the repo's
two-phase rule: data files land under ``<out>/<table>/data/``, then one
atomic manifest commit publishes the table (state/manifest.py), so a killed
driver resumes by skipping committed tables (the reference's idempotent
weekly sync, ingest-processed-data.yaml:7-12).

Input layout (the reference's extraction output):
``<input>/<EntityName>/*.json`` (or flat ``<input>/<EntityName>.json``),
JSON-lines per file.  The six pre-split file streams (SequenceFiles,
AlignmentFiles, ..., OtherFiles — TransformationPipelineBuilder.scala:
112-125) are unioned; a single ``Files`` dump is accepted as an
alternative.  Missing optional entity dumps yield empty (but committed)
output tables, so a partial corpus still produces the full 15-table shape.

Scale note: ``libraries``/``replicates``/``experiments``/``files`` act as
side inputs to several trees, mirroring the reference's
``asListSideInput`` (scala:131) — entities.py guards the library index by
size; the remaining collected tables are dimension-sized by schema design
(SURVEY.md §2.10).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from encode_ingest_ray.state.manifest import Manifest

#: the 6 pre-split raw file streams the reference unions (scala:112-125)
RAW_FILE_STREAMS = [
    "SequenceFiles",
    "AlignmentFiles",
    "SignalFiles",
    "AnnotationFootprintFiles",
    "AnnotationNonFootprintFiles",
    "OtherFiles",
]

#: output table name -> short description (the 15 sinks)
OUTPUT_TABLES = [
    "dataset",
    "referencefileset",
    "donor",
    "antibody",
    "library",
    "biosample",
    "sampletreatmentactivity",
    "file",
    "sequencingactivity",
    "alignmentactivity",
    "librarypreparationactivity",
    "stepactivity",
    "analysisactivity",
    "assayactivity",
    "experimentactivity",
]


def _entity_paths(input_dir: str, name: str) -> list[str]:
    hits = sorted(glob.glob(os.path.join(input_dir, name, "*.json")))
    flat = os.path.join(input_dir, f"{name}.json")
    if os.path.exists(flat):
        hits.append(flat)
    return hits


def _read_entity(input_dir: str, name: str):
    """Dataset of one raw entity type (unknown-normalized), or None if the
    dump is absent."""
    from encode_ingest_ray.sources.readers import read_json_entities

    paths = _entity_paths(input_dir, name)
    if not paths:
        return None
    return read_json_entities(paths)


def _collect(ds) -> pa.Table:
    """Materialize a SIDE table driver-side (dimension-sized inputs only)."""
    import ray

    if ds is None:
        return pa.table({})
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _typed(table: pa.Table, **cols) -> pa.Table:
    """A transform's side table must carry its join columns even when the
    dump is absent/empty — return a typed empty table in that case."""
    if table.num_rows:
        return table
    return pa.table({k: pa.array([], t) for k, t in cols.items()})


def _read_files(input_dir: str):
    """Union of the six pre-split file streams (or a single ``Files`` dump)."""
    streams = [s for s in RAW_FILE_STREAMS if _entity_paths(input_dir, s)]
    if streams:
        ds = _read_entity(input_dir, streams[0])
        for s in streams[1:]:
            ds = ds.union(_read_entity(input_dir, s))
        return ds
    return _read_entity(input_dir, "Files")


def _commit_table(out_dir: str, name: str, result, overwrite: bool) -> dict:
    """Two-phase table sink: write data files, then one atomic manifest
    commit.  Committed tables are skipped on re-run unless ``overwrite``."""
    import ray.data

    tdir = os.path.join(out_dir, name)
    man = Manifest(tdir)
    if man.committed_epochs() and not overwrite:
        ptr = man.pointers()
        return {"table": name, "skipped": True,
                "rows": sum(p["rows"] for p in ptr.values())}
    data_dir = os.path.join(tdir, "data")
    shutil.rmtree(data_dir, ignore_errors=True)
    os.makedirs(data_dir, exist_ok=True)
    if isinstance(result, pa.Table):
        tmp = os.path.join(data_dir, ".part-00000.tmp")
        pq.write_table(result, tmp, compression="zstd", compression_level=3,
                       row_group_size=131_072)
        os.replace(tmp, os.path.join(data_dir, "part-00000.parquet"))
    else:
        result.write_parquet(data_dir)
    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    man.commit(
        0,
        {"0": {"files": files, "rows": rows}},
        metrics={"rows": rows, "files": len(files)},
    )
    return {"table": name, "skipped": False, "rows": rows}


def read_output_table(out_dir: str, name: str):
    """Streaming read of a committed output table."""
    import ray.data

    ptr = Manifest(os.path.join(out_dir, name)).pointers()
    files = [f for p in ptr.values() for f in p["files"]]
    if not files:
        raise FileNotFoundError(f"table {name!r} not committed under {out_dir!r}")
    return ray.data.read_parquet(files)


def run_transformation_pipeline(
    input_dir: str, out_dir: str, *, overwrite: bool = False
) -> dict:
    """Run all 15 trees; returns {table: {rows, skipped}} summary."""
    from encode_ingest_ray.pipelines import entities as E
    from encode_ingest_ray.pipelines.biosample import transform_biosamples
    from encode_ingest_ray.pipelines.donor import transform_donors

    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, dict] = {}

    def emit(name: str, result) -> None:
        results[name] = _commit_table(out_dir, name, result, overwrite)

    import ray.data

    def _empty_ds():
        return ray.data.from_arrow(pa.table({"at_id": pa.array([], pa.string())}))

    # --- shared side tables (read once) --------------------------------
    organisms = _typed(
        _collect(_read_entity(input_dir, "Organism")),
        at_id=pa.string(), scientific_name=pa.string(),
    )
    libraries_ds = _read_entity(input_dir, "Library") or _empty_ds()
    libraries = _typed(
        _collect(libraries_ds),
        at_id=pa.string(), biosample=pa.string(),
        mixed_biosamples=pa.list_(pa.string()),
    )
    replicates = _typed(
        _collect(_read_entity(input_dir, "Replicate")),
        at_id=pa.string(), library=pa.string(),
        experiment=pa.string(), antibody=pa.string(),
    )
    files_ds = _read_files(input_dir)

    # --- independent trees ---------------------------------------------
    emit("dataset", E.dataset_singleton())

    refs = _read_entity(input_dir, "Reference")
    emit(
        "referencefileset",
        E.transform_reference_file_sets(refs, organisms) if refs is not None
        else pa.table({"referencefileset_id": pa.array([], pa.string())}),
    )

    donors = _read_entity(input_dir, "Donor")
    emit(
        "donor",
        transform_donors(donors, organisms if organisms.num_rows else None)
        if donors is not None
        else pa.table({"donor_id": pa.array([], pa.string())}),
    )

    antibodies = _read_entity(input_dir, "Antibody")
    targets = _read_entity(input_dir, "Target")
    emit(
        "antibody",
        E.transform_antibodies(antibodies, targets or _empty_ds())
        if antibodies is not None
        else pa.table({"antibody_id": pa.array([], pa.string())}),
    )

    emit("library", E.transform_libraries(libraries_ds))

    biosamples = _read_entity(input_dir, "Biosample")
    types_table = _collect(_read_entity(input_dir, "BiosampleType"))
    emit(
        "biosample",
        transform_biosamples(biosamples, libraries_ds, types_table)
        if biosamples is not None
        else pa.table({"biosample_id": pa.array([], pa.string())}),
    )

    treatments = _read_entity(input_dir, "Treatment")
    emit(
        "sampletreatmentactivity",
        E.transform_sample_treatments(treatments) if treatments is not None
        else pa.table({"sampletreatmentactivity_id": pa.array([], pa.string())}),
    )

    # --- the file fan-out ----------------------------------------------
    if files_ds is not None:
        emit("file", E.transform_files(files_ds, libraries))
        emit("sequencingactivity",
             E.transform_sequencing_activities(files_ds, libraries))
        emit("alignmentactivity", E.transform_alignment_activities(files_ds))
        files_table = _collect(files_ds)
    else:
        for t in ("file", "sequencingactivity", "alignmentactivity"):
            emit(t, pa.table({f"{t}_id": pa.array([], pa.string())}))
        files_table = pa.table({})
    files_table = _typed(
        files_table,
        at_id=pa.string(), dataset=pa.string(), step_run=pa.string(),
        derived_from=pa.list_(pa.string()),
    )

    # --- experiment fan-out (Experiment ∪ FunctionalCharacterization) ---
    exp_ds = _read_entity(input_dir, "Experiment")
    fc_ds = _read_entity(input_dir, "FunctionalCharacterizationExperiment")
    if exp_ds is not None and fc_ds is not None:
        exp_ds = exp_ds.union(fc_ds)
    elif exp_ds is None:
        exp_ds = fc_ds
    experiments = _typed(
        _collect(exp_ds) if exp_ds is not None else pa.table({}),
        at_id=pa.string(), assay_term_name=pa.string(),
    )

    if exp_ds is not None:
        emit("experimentactivity",
             E.transform_experiments(exp_ds, replicates, libraries))
        emit("assayactivity",
             E.transform_assay_activities(exp_ds, files_table, replicates, libraries))
    else:
        emit("experimentactivity",
             pa.table({"experimentactivity_id": pa.array([], pa.string())}))
        emit("assayactivity",
             pa.table({"assayactivity_id": pa.array([], pa.string())}))

    emit(
        "librarypreparationactivity",
        E.transform_library_preparations(libraries_ds, replicates, experiments),
    )

    # --- step/analysis chain -------------------------------------------
    step_runs = _collect(_read_entity(input_dir, "AnalysisStepRun"))
    versions = _collect(_read_entity(input_dir, "AnalysisStepVersion"))
    steps = _collect(_read_entity(input_dir, "AnalysisStep"))
    pipelines = _collect(_read_entity(input_dir, "Pipeline"))
    if step_runs.num_rows and versions.num_rows and steps.num_rows:
        infos = E.step_run_info(step_runs, versions, steps, files_table)
    else:
        infos = []
    emit("stepactivity", E.transform_step_activities(infos))
    emit(
        "analysisactivity",
        E.transform_analysis_activities(
            infos,
            pipelines
            if pipelines.num_rows
            else pa.table(
                {
                    "at_id": pa.array([], pa.string()),
                    "title": pa.array([], pa.string()),
                    "assay_term_names": pa.array([], pa.list_(pa.string())),
                }
            ),
        ),
    )

    return results
