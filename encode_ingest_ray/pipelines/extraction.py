"""The ENCODE metadata-extraction pipeline (S1) — the reference's
ExtractionPipelineBuilder re-expressed Ray-Data-first over the pluggable
search client (sources/encode_client.py).

Reference: extraction/src/main/scala/org/broadinstitute/monster/encode/
extraction/ExtractionPipelineBuilder.scala:

* ``extract_entities``  == extractEntities: query batches -> actor-pool
  fetch (≤8 in flight) -> distinct by id -> JSON-list part files (:46-101);
* ``extract_linked_entities`` == extractLinkedEntities: read a link field
  off the source stream (scalar or list), batch 64 values per request,
  query ``targetField=v1&targetField=v2&...`` (:108-131, batchSize :45);
* ``run_extraction_pipeline`` == buildPipeline's full DAG (:133-330):
  biosamples seed -> donors / types / organisms / genetic modifications /
  treatments / libraries -> replicates -> antibodies -> targets, the
  replicate split into Experiment vs FunctionalCharacterizationExperiment
  (prefix test, :345-349), the six category-partitioned File streams with
  their negative filters (:148-230), and the step-run -> step-version ->
  step -> pipeline chain (:282-320).

Differences, by design:

* value batches are SORTED before chunking — the reference documents its
  batch composition as nondeterministic (:351-358); sorting makes the whole
  extraction replayable byte-for-byte;
* ``filesWithStepRun`` unions each stream once (the reference unions
  sequenceFiles twice, :232-239 — harmless there because downstream
  queries dedup by id; harmless to fix here for the same reason);
* the output stream for AntibodyLot is written under ``Antibody`` — the
  dump-dialect name the transformation driver reads
  (pipelines/transform_driver.py), matching its ``@``->``at_`` key rename.

At real-API scale each stage stays bounded: filter values cross the driver
only as compact id lists (the linked-field value sets, ~10^6 strings max),
fetched entities stream through the actor pool into per-block JSON part
files, and the only exchange is the distinct-by-id dedup.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import ray.data

from encode_ingest_ray.sources.encode_client import (
    ENCODE_BASE_URL,
    MAX_IN_FLIGHT,
    ExtractionFetcher,
)
from encode_ingest_ray.stages.dedup import dedup_exact

#: values per search request (ExtractionPipelineBuilder.scala:45)
BATCH_SIZE = 64

_FC_PREFIX = "/functional-characterization-experiments/"


def _queries_ds(query_batches, neg):
    return ray.data.from_items(
        [
            {"pos": json.dumps(list(pos)), "neg": json.dumps(list(neg))}
            for pos in query_batches
        ]
    )


def _write_json_lists(ds, out_dir: str, name: str) -> int:
    """JSON-lines part files, one per block (writeJsonListsGeneric analog);
    the part name is a content hash, so re-runs overwrite identically
    instead of accumulating."""
    dest = os.path.join(out_dir, name)
    os.makedirs(dest, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows:
            payloads = t.column("payload").to_pylist()
            body = "\n".join(payloads) + "\n"
            tag = hashlib.md5(body.encode()).hexdigest()[:16]
            with open(os.path.join(dest, f"part-{tag}.json"), "w") as f:
                f.write(body)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    counts = ds.map_batches(
        write_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    return int(sum(r["rows"] for r in counts))


def extract_entities(
    entity: str,
    query_batches,
    negative_filters,
    transport_factory,
    out_dir: str | None = None,
    name: str | None = None,
    base_url: str = ENCODE_BASE_URL,
):
    """Query batches -> fetch -> distinct by at_id -> (optional) JSON sink.

    Returns the deduped Dataset of {at_id, payload} rows, materialized so
    downstream linked extractions and the sink don't re-fetch."""
    ds = _queries_ds(query_batches, negative_filters)
    fetched = ds.map_batches(
        ExtractionFetcher,
        fn_constructor_args=(transport_factory, entity, base_url),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, MAX_IN_FLIGHT),
    )
    out = dedup_exact(fetched, ["at_id"], "payload", keep_max=False).materialize()
    if out_dir is not None:
        _write_json_lists(out, out_dir, name or entity)
    return out


def read_link_field(ds, field: str):
    """All values of a link field across a fetched stream — scalar fields
    yield one value, list fields all elements, missing fields none (the
    reference's tryRead[Array[String]] ... getOrElse(empty))."""

    def per_block(t: pa.Table) -> pa.Table:
        vals: list[str] = []
        for p in t.column("payload").to_pylist():
            v = json.loads(p).get(field)
            if v is None:
                continue
            vals.extend(v if isinstance(v, list) else [v])
        return pa.table({"v": pa.array(vals, pa.string())})

    return ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def group_values(values: list[str], batch_size: int = BATCH_SIZE) -> list[list[str]]:
    """Fixed-size batches (groupValues, scala:351-368) — deterministic here:
    sorted before chunking."""
    ordered = sorted(values)
    return [
        ordered[i : i + batch_size] for i in range(0, len(ordered), batch_size)
    ]


def extract_linked_entities(
    source_ds,
    source_field: str,
    target_entity: str,
    target_field: str,
    transport_factory,
    out_dir: str | None = None,
    name: str | None = None,
    base_url: str = ENCODE_BASE_URL,
):
    values = [r["v"] for r in read_link_field(source_ds, source_field).take_all()]
    batches = [
        [(target_field, v) for v in chunk] for chunk in group_values(values)
    ]
    return extract_entities(
        target_entity, batches, [], transport_factory, out_dir, name, base_url
    )


def _split_replicates(replicates):
    """Partition replicates on the experiment prefix
    (isFunctionalCharacterizationReplicate, scala:345-349)."""

    def keep(fc: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = [
                json.loads(p).get("experiment", "").startswith(_FC_PREFIX) == fc
                for p in t.column("payload").to_pylist()
            ]
            return t.filter(pa.array(mask, pa.bool_()))

        return f

    fc = replicates.map_batches(keep(True), batch_format="pyarrow", batch_size=None)
    exp = replicates.map_batches(keep(False), batch_format="pyarrow", batch_size=None)
    return fc, exp


def run_extraction_pipeline(
    transport_factory,
    out_dir: str,
    initial_query=(),
    base_url: str = ENCODE_BASE_URL,
) -> dict[str, int]:
    """The full extraction DAG; returns {output name: distinct rows}."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}

    def run(entity, batches, neg, name=None):
        ds = extract_entities(
            entity, batches, list(neg), transport_factory, out_dir, name, base_url
        )
        counts[name or entity] = ds.count()
        return ds

    def run_linked(src, field, entity, target_field, name=None):
        ds = extract_linked_entities(
            src, field, entity, target_field, transport_factory, out_dir, name,
            base_url,
        )
        counts[name or entity] = ds.count()
        return ds

    released = [("status", "released")]
    restricted_neg = [("restricted", "true")]

    biosamples = run("Biosample", [list(initial_query)], [])
    run("Reference", [released], [])

    # --- the six category-partitioned File streams (scala:148-230) -----
    seq = run("File", [[("output_category", "raw data")] + released],
              restricted_neg, name="SequenceFiles")
    aln = run("File", [[("output_category", "alignment")] + released],
              restricted_neg, name="AlignmentFiles")
    sig = run("File", [[("output_category", "signal")] + released],
              restricted_neg, name="SignalFiles")
    foot = run(
        "File",
        [[("output_category", "annotation"), ("output_type", "footprints")] + released],
        restricted_neg, name="AnnotationFootprintFiles",
    )
    nonfoot = run(
        "File", [[("output_category", "annotation")] + released],
        [("output_type", "footprints")] + restricted_neg,
        name="AnnotationNonFootprintFiles",
    )
    other = run(
        "File", [released],
        [("output_category", "alignment"), ("output_category", "raw data"),
         ("output_category", "signal"), ("output_category", "annotation")]
        + restricted_neg,
        name="OtherFiles",
    )

    def with_step_run(ds):
        def f(t: pa.Table) -> pa.Table:
            mask = [
                bool(json.loads(p).get("step_run"))
                for p in t.column("payload").to_pylist()
            ]
            return t.filter(pa.array(mask, pa.bool_()))

        return ds.map_batches(f, batch_format="pyarrow", batch_size=None)

    files_with_step_run = with_step_run(seq)
    for s in (aln, sig, foot, nonfoot, other):
        files_with_step_run = files_with_step_run.union(with_step_run(s))

    # --- biosample-linked entities (scala:241-280) ---------------------
    run_linked(biosamples, "donor", "Donor", "@id")
    run_linked(biosamples, "biosample_ontology", "BiosampleType", "@id")
    run_linked(biosamples, "organism", "Organism", "@id")
    run_linked(biosamples, "at_id", "GeneticModification", "biosamples_modified")
    run_linked(biosamples, "treatments", "Treatment", "@id")
    libraries = run_linked(
        biosamples, "accession", "Library", "biosample.accession"
    )
    replicates = run_linked(
        libraries, "accession", "Replicate", "library.accession"
    )
    antibodies = run_linked(
        replicates, "antibody", "AntibodyLot", "@id", name="Antibody"
    )
    run_linked(antibodies, "targets", "Target", "@id")

    fc_reps, exp_reps = _split_replicates(replicates)
    run_linked(exp_reps, "experiment", "Experiment", "@id")
    run_linked(
        fc_reps, "experiment", "FunctionalCharacterizationExperiment", "@id"
    )

    # --- analysis chain (scala:282-320) --------------------------------
    step_runs = run_linked(
        files_with_step_run, "step_run", "AnalysisStepRun", "@id"
    )
    versions = run_linked(
        step_runs, "analysis_step_version", "AnalysisStepVersion", "@id"
    )
    steps = run_linked(versions, "analysis_step", "AnalysisStep", "@id")
    run_linked(steps, "pipelines", "Pipeline", "@id")

    return counts
