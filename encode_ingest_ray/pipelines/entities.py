"""Per-entity transforms (SURVEY.md §2 M9) — the reference's transformation
stage re-expressed over flat Arrow tables of raw records.

Each entity has a pure batch transform (vectorized Arrow for scalar columns,
per-batch Python only over short in-record lists — the donor.py precedent)
plus a Dataset wrapper that wires its side inputs the Ray-Data way:

* tiny dims (targets, steps, pipelines, organisms) — broadcast once via
  ``ray.put`` and look up inside ``map_batches`` (no shuffle);
* the antibody⟷target M:N — the one real explode-group-rejoin in the
  reference (TransformationPipelineBuilder.scala:271-319) — runs as tagged
  union + ONE bucketed exchange, fully distributed;
* per-experiment groupings (replicates/libraries/files) are pre-grouped
  side tables at dim scale, or exchange-joined at fact scale.

Reference files (all under /root/reference/transformation/src/main/scala/
org/broadinstitute/monster/encode/transformation/):
  FileTransformations.scala:91-152, AntibodyTransformations.scala:11-40,
  ExperimentActivityTransformations.scala:11-59,
  AssayActivityTransformations.scala:11-54,
  StepActivityTransformations.scala:11-50,
  AnalysisActivityTransformations.scala:13-53,
  SequencingActivityTransformations.scala:15-47,
  AlignmentActivityTransformations.scala:14-39,
  LibraryTransformations.scala:19-52,
  LibraryPreparationActivityTransformations.scala:13-33,
  SampleTreatmentActivityTransformations.scala:13-36,
  ReferenceFileSetTransformations.scala:11-62, DatasetTransformations.scala
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from encode_ingest_ray.stages.modality import (
    assay_term_to_modality,
)
from encode_ingest_ray.stages.normalize import ENCODE_URL_PREFIX, summarize_audits

_ID_RX = re.compile(r"/[^/]+/(?P<id>[^/]+)/?$")


def transform_id(value: str | None) -> str | None:
    """CommonTransformations.transformId (CommonTransformations.scala:31-44)."""
    if value is None:
        return None
    m = _ID_RX.search(value)
    return m.group("id") if m else value


def _url(col) -> pa.Array:
    return pc.binary_join_element_wise(pa.scalar(ENCODE_URL_PREFIX), col, "")


def _get_list(batch: pa.Table, name: str) -> list[list]:
    """Column of lists → python lists with null→[] (tryRead ... getOrElse(List()))."""
    if name not in batch.column_names:
        return [[] for _ in range(batch.num_rows)]
    return [v or [] for v in batch.column(name).to_pylist()]


def _get_str(batch: pa.Table, name: str) -> list:
    if name not in batch.column_names:
        return [None] * batch.num_rows
    return batch.column(name).to_pylist()


def _xref(batch: pa.Table) -> pa.Array:
    """xref = encode-url(@id) :: dbxrefs (every entity's first column trio)."""
    at_url = _url(batch.column("at_id")).to_pylist()
    dbx = _get_list(batch, "dbxrefs")
    return pa.array([[u] + list(d) for u, d in zip(at_url, dbx)], pa.list_(pa.string()))


def _ids(values: list[list]) -> pa.Array:
    return pa.array(
        [[transform_id(v) for v in vs] for vs in values], pa.list_(pa.string())
    )


# ---------------------------------------------------------------------------
# File (FileTransformations.scala:91-152)
# ---------------------------------------------------------------------------
SEQUENCING_CATEGORY = "raw data"
ALIGNMENT_CATEGORY = "alignment"


def file_type_of(category: str | None) -> str:
    if category == SEQUENCING_CATEGORY:
        return "Sequence"
    if category == ALIGNMENT_CATEGORY:
        return "Alignment"
    return "Other"


def biosamples_of_library(biosample: str | None, mixed: list | None) -> list[str]:
    """getBiosamplesFromLibrary (FileTransformations.scala:50-57)."""
    if biosample is not None:
        return [biosample]
    return list(mixed or [])


def library_index(libraries: pa.Table) -> dict[str, list[str]]:
    """Inverted biosample-@id → [library accession] index (the small side of
    computeLibrariesForBiosamples, broadcast once)."""
    idx: dict[str, list[str]] = {}
    bios = _get_str(libraries, "biosample")
    mixed = _get_list(libraries, "mixed_biosamples")
    ats = libraries.column("at_id").to_pylist()
    for at, b, m in zip(ats, bios, mixed):
        lib_id = transform_id(at)
        for bs in biosamples_of_library(b, m):
            idx.setdefault(bs, []).append(lib_id)
    return idx


def libraries_for_biosamples(
    origin_batches: list[str] | None, idx: dict[str, list[str]]
) -> list[str] | None:
    """computeLibrariesForBiosamples (FileTransformations.scala:74-87):
    None origin_batches → None; else libraries whose biosample set intersects,
    preserving library order and multiplicity semantics (a library appears
    once even if several of its biosamples match)."""
    if origin_batches is None:
        return None
    seen: dict[str, None] = {}
    for bs in origin_batches:
        for lib in idx.get(bs, []):
            seen.setdefault(lib, None)
    return list(seen)


def transform_file_batch(batch: pa.Table, lib_idx: dict[str, list[str]]) -> pa.Table:
    """One stateless pass over a file batch.  Library linkage comes from
    ``lib_idx`` (the broadcast inverted index) — unless the batch carries a
    precomputed ``__lib_ids`` column (the distributed large-side path), which
    then wins."""
    precomputed = None
    if "__lib_ids" in batch.column_names:
        precomputed = [
            v if v is not None else [] for v in batch.column("__lib_ids").to_pylist()
        ]
        batch = batch.drop_columns(["__lib_ids"])
    batch = summarize_audits(batch)
    n = batch.num_rows
    ids = [transform_id(v) for v in batch.column("at_id").to_pylist()]
    category = _get_str(batch, "output_category")
    assay_terms = _get_list(batch, "assay_term_name")
    modality = [
        ["Genomic_Assembly"]
        if c == "reference"
        else [assay_term_to_modality(t) for t in terms]
        for c, terms in zip(category, assay_terms)
    ]
    paired = _get_str(batch, "paired_end")
    paired_end_id = [
        1 if p == "1" else 2 if p == "2" else None for p in paired
    ]
    run_type = _get_str(batch, "run_type")
    library_layout = pa.array(
        [None if r is None else (r == "paired-ended") for r in run_type], pa.bool_()
    )
    origin = (
        batch.column("origin_batches").to_pylist()
        if "origin_batches" in batch.column_names
        else [None] * n
    )
    return pa.table(
        {
            "file_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "date_created": batch.column("date_created"),
            "data_modality": pa.array(modality, pa.list_(pa.string())),
            "audit_labels": batch.column("audit_labels"),
            "max_audit_flag": batch.column("max_audit_flag"),
            "award": _url(batch.column("award")),
            "file_format": batch.column("file_format")
            if "file_format" in batch.column_names
            else pa.nulls(n, pa.string()),
            "file_format_type": batch.column("file_format_type")
            if "file_format_type" in batch.column_names
            else pa.nulls(n, pa.string()),
            "file_type": pa.array([file_type_of(c) for c in category], pa.string()),
            "lab": _url(batch.column("lab")),
            "platform": _url(batch.column("platform"))
            if "platform" in batch.column_names
            else pa.nulls(n, pa.string()),
            "quality_metrics": pa.array(_get_list(batch, "quality_metrics"), pa.list_(pa.string())),
            "submitted_by": _url(batch.column("submitted_by")),
            "read_count": batch.column("read_count")
            if "read_count" in batch.column_names
            else pa.nulls(n, pa.int64()),
            "read_length": batch.column("read_length")
            if "read_length" in batch.column_names
            else pa.nulls(n, pa.int64()),
            "genome_annotation": batch.column("genome_annotation")
            if "genome_annotation" in batch.column_names
            else pa.nulls(n, pa.string()),
            "library_id": pa.array(
                precomputed
                if precomputed is not None
                else [libraries_for_biosamples(o, lib_idx) or [] for o in origin],
                pa.list_(pa.string()),
            ),
            "uses_sample_biosample_id": pa.array(
                [[transform_id(b) for b in (o or [])] for o in origin],
                pa.list_(pa.string()),
            ),
            "donor_id": _ids(_get_list(batch, "donors")),
            "derived_from_file_id": _ids(_get_list(batch, "derived_from")),
            "reference_assembly": pa.array(_get_list(batch, "assembly"), pa.list_(pa.string())),
            "file_ref": pa.nulls(n, pa.string()),  # fileRef = None in the reference
            "library_layout": library_layout,
            "paired_end_identifier": pa.array(paired_end_id, pa.int64()),
            "paired_with_file_id": pa.array(
                [transform_id(p) for p in _get_str(batch, "paired_with")], pa.string()
            ),
            "file_size": batch.column("file_size")
            if "file_size" in batch.column_names
            else pa.nulls(n, pa.int64()),
            "file_md5sum": batch.column("md5checksum")
            if "md5checksum" in batch.column_names
            else pa.nulls(n, pa.string()),
        }
    )


#: side-input guard (VERDICT r2 wrong#3): a Python dict built from a table
#: above this row count must not be assembled on the driver and shipped into
#: map_batches — route through the exchange-based fallback instead.  The
#: reference broadcasts unconditionally (asListSideInput,
#: TransformationPipelineBuilder.scala:131) and documents the resulting
#: hazard (ARCHITECTURE.md:27-33); this engine degrades to joins instead.
SIDE_INPUT_BROADCAST_MAX_ROWS = 500_000


def transform_files(
    files_ds, libraries: pa.Table, *, broadcast_max_rows: int | None = None
):
    """Files are the FACT side.  Small ``libraries`` dim → inverted index
    broadcast once (the reference's shape); past the size guard → the
    distributed path: explode both sides on biosample, ONE grouped exchange,
    per-file fold, cohash re-join — identical output including the
    first-seen library ordering."""
    import ray

    limit = (
        SIDE_INPUT_BROADCAST_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    )
    if libraries.num_rows > limit:
        return _transform_files_distributed(files_ds, libraries)

    ref = ray.put(library_index(libraries))

    def fn(batch: pa.Table) -> pa.Table:
        return transform_file_batch(batch, ray.get(ref))

    return files_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _compute_file_libs(files_ds, libraries: pa.Table):
    """Distributed computeLibrariesForBiosamples: (biosample → libraries)
    resolved by ONE grouped exchange instead of a driver dict.

    Ordering parity with the broadcast index: the output list is first-seen
    over (position of the biosample in the file's origin_batches) × (library
    row order), exactly what ``libraries_for_biosamples`` produces — pair
    rows carry (bs_pos, lib_order) and the per-file fold sorts on them.

    Returns a Dataset of (at_id, __lib_ids list<string>).
    """
    import numpy as np
    import ray.data

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
    from encode_ingest_ray.stages.groupjoin import multi_stream_group_join

    lib_src = ray.data.from_arrow(
        pa.table(
            {
                "at_id": libraries.column("at_id"),
                "biosample": libraries.column("biosample")
                if "biosample" in libraries.column_names
                else pa.nulls(libraries.num_rows, pa.string()),
                "mixed_biosamples": libraries.column("mixed_biosamples")
                if "mixed_biosamples" in libraries.column_names
                else pa.nulls(libraries.num_rows, pa.list_(pa.string())),
                "__lib_order": pa.array(
                    np.arange(libraries.num_rows, dtype=np.int64)
                ),
            }
        )
    )

    def explode_libs(t: pa.Table) -> pa.Table:
        ats = t.column("at_id").to_pylist()
        bios = t.column("biosample").to_pylist()
        mixed = t.column("mixed_biosamples").to_pylist()
        order = t.column("__lib_order").to_pylist()
        bs_out, lib_out, ord_out = [], [], []
        for at, b, m, o in zip(ats, bios, mixed, order):
            lid = transform_id(at)
            for bs in biosamples_of_library(b, m):
                bs_out.append(bs)
                lib_out.append(lid)
                ord_out.append(o)
        return pa.table(
            {
                "biosample": pa.array(bs_out, pa.string()),
                "lib_id": pa.array(lib_out, pa.string()),
                "lib_order": pa.array(ord_out, pa.int64()),
            }
        )

    lib_pairs = lib_src.map_batches(
        explode_libs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def explode_files(t: pa.Table) -> pa.Table:
        ats = t.column("at_id").to_pylist()
        origin = (
            t.column("origin_batches").to_pylist()
            if "origin_batches" in t.column_names
            else [None] * t.num_rows
        )
        bs_out, f_out, pos_out = [], [], []
        for at, o in zip(ats, origin):
            for pos, bs in enumerate(o or []):
                bs_out.append(bs)
                f_out.append(at)
                pos_out.append(pos)
        return pa.table(
            {
                "biosample": pa.array(bs_out, pa.string()),
                "file_at": pa.array(f_out, pa.string()),
                "bs_pos": pa.array(pos_out, pa.int64()),
            }
        )

    file_pairs = files_ds.map_batches(
        explode_files, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def per_biosample(key, tables: dict) -> pa.Table:
        libs = tables["lib"]
        fl = tables["file"]
        if libs.num_rows == 0 or fl.num_rows == 0:
            return pa.table(
                {
                    "file_at": pa.array([], pa.string()),
                    "bs_pos": pa.array([], pa.int64()),
                    "lib_order": pa.array([], pa.int64()),
                    "lib_id": pa.array([], pa.string()),
                }
            )
        nl, nf = libs.num_rows, fl.num_rows
        # cross product: every probing file position × every library here
        return pa.table(
            {
                "file_at": pa.chunked_array(
                    [pa.array(fl.column("file_at").to_pylist() * nl, pa.string())]
                ),
                "bs_pos": pa.array(fl.column("bs_pos").to_pylist() * nl, pa.int64()),
                "lib_order": pa.array(
                    [o for o in libs.column("lib_order").to_pylist() for _ in range(nf)],
                    pa.int64(),
                ),
                "lib_id": pa.array(
                    [l for l in libs.column("lib_id").to_pylist() for _ in range(nf)],
                    pa.string(),
                ),
            }
        )

    matches = multi_stream_group_join(
        {"lib": (lib_pairs, "biosample"), "file": (file_pairs, "biosample")},
        per_biosample,
        key_out="biosample",
    )

    def fold_files(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("file_at", "ascending"),
                ("bs_pos", "ascending"),
                ("lib_order", "ascending"),
            ],
        )
        g = t.take(idx)
        ats = g.column("file_at").to_pylist()
        libs = g.column("lib_id").to_pylist()
        out_at, out_libs = [], []
        seen: dict = {}
        cur = None
        for at, lid in zip(ats, libs):
            if at != cur:
                if cur is not None:
                    out_at.append(cur)
                    out_libs.append(list(seen))
                cur, seen = at, {}
            seen.setdefault(lid, None)
        if cur is not None:
            out_at.append(cur)
            out_libs.append(list(seen))
        return pa.table(
            {
                "at_id": pa.array(out_at, pa.string()),
                "__lib_ids": pa.array(out_libs, pa.list_(pa.string())),
            }
        )

    return bucketed_groupby_apply(matches, ["file_at"], fold_files)


def append_side_column(left_ds, right_ds, key: str, value_name: str, value_type):
    """Left-join ONE value column onto an arbitrarily wide left stream by
    key, via a single bucketed exchange and a per-bucket dict probe.  Unlike
    ``cohash_join`` (pyarrow C++ join) this supports list/struct payload
    columns on the left — the join itself only touches (key, value)."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    left_schema = left_ds.schema().base_schema
    unified = pa.schema(
        list(left_schema)
        + [pa.field(value_name, value_type), pa.field("__side", pa.int8())]
    )

    def prep_left(t: pa.Table) -> pa.Table:
        cols = [
            t.column(f.name)
            if f.name in t.column_names
            else pa.nulls(t.num_rows, f.type)
            for f in left_schema
        ]
        cols.append(pa.nulls(t.num_rows, value_type))
        cols.append(pa.array(np.zeros(t.num_rows, np.int8)))
        return pa.Table.from_arrays(cols, schema=unified)

    def prep_right(t: pa.Table) -> pa.Table:
        cols = []
        for f in left_schema:
            if f.name == key:
                cols.append(t.column(key).cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        cols.append(t.column(value_name).cast(value_type))
        cols.append(pa.array(np.ones(t.num_rows, np.int8)))
        return pa.Table.from_arrays(cols, schema=unified)

    lt = left_ds.map_batches(
        prep_left, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    rt = right_ds.map_batches(
        prep_right, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def probe_bucket(t: pa.Table) -> pa.Table:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        right = t.filter(pa.array(side == 1))
        left = t.filter(pa.array(side == 0))
        lookup = dict(
            zip(right.column(key).to_pylist(), right.column(value_name).to_pylist())
        )
        keys = left.column(key).to_pylist()
        vals = pa.array([lookup.get(k) for k in keys], value_type)
        return left.drop_columns([value_name, "__side"]).append_column(
            value_name, vals
        )

    return bucketed_groupby_apply(lt.union(rt), [key], probe_bucket)


def _transform_files_distributed(files_ds, libraries: pa.Table):
    """Large-libraries path: no driver dict, no broadcast — the library
    linkage travels through grouped exchanges and re-joins the file stream
    by at_id (left: files without matches keep an empty list)."""
    per_file = _compute_file_libs(files_ds, libraries)
    joined = append_side_column(
        files_ds, per_file, "at_id", "__lib_ids", pa.list_(pa.string())
    )
    return joined.map_batches(
        lambda t: transform_file_batch(t, {}),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# Antibody — the M:N explode-group-rejoin
# (AntibodyTransformations.scala:11-40, TransformationPipelineBuilder.scala:271-319)
# ---------------------------------------------------------------------------
def transform_antibody_batch(batch: pa.Table, target_name: list) -> pa.Table:
    ids = [transform_id(v) for v in batch.column("at_id").to_pylist()]
    n = batch.num_rows
    return pa.table(
        {
            "antibody_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "date_created": batch.column("date_created"),
            "source": _url(batch.column("source")),
            "clonality": batch.column("clonality")
            if "clonality" in batch.column_names
            else pa.nulls(n, pa.string()),
            "host_organism": _url(batch.column("host_organism")),
            "target": pa.array(target_name, pa.string()),
            "award": _url(batch.column("award")),
            "isotype": batch.column("isotype")
            if "isotype" in batch.column_names
            else pa.nulls(n, pa.string()),
            "lab": _url(batch.column("lab")),
            "lot": batch.column("lot_id")
            if "lot_id" in batch.column_names
            else pa.nulls(n, pa.string()),
            "part_number": batch.column("product_id"),
            "purification_methods": pa.array(
                _get_list(batch, "purifications"), pa.list_(pa.string())
            ),
        }
    )


def transform_antibodies(antibodies_ds, targets_ds):
    """Distributed M:N resolution, two keyed exchanges and no broadcast of
    either side:

      1. antibodies explode to (target_at_id, antibody_at_id) pairs; union
         with targets tagged rows; bucketed exchange on target id resolves
         each pair's (organism, label);
      2. resolved pairs union with the antibody rows; bucketed exchange on
         antibody id groups the targets back and emits the transformed row.

    ``target`` = lexicographically-first label among human-organism targets
    (the reference takes Iterable.headOption, whose order Scio leaves
    unspecified; sorted-first pins a deterministic representative).
    """
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    # ---- pass 1: resolve pair → target (organism, label)
    def explode_pairs(t: pa.Table) -> pa.Table:
        ab = t.column("at_id").to_pylist()
        targets = _get_list(t, "targets")
        pa_ab, pa_tg = [], []
        for a, ts in zip(ab, targets):
            for tg in ts:
                pa_ab.append(a)
                pa_tg.append(tg)
        return pa.table(
            {
                "key": pa.array(pa_tg, pa.string()),
                "antibody": pa.array(pa_ab, pa.string()),
                "organism": pa.nulls(len(pa_ab), pa.string()),
                "lbl": pa.nulls(len(pa_ab), pa.string()),
            }
        )

    def tag_targets(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("at_id").cast(pa.string()),
                "antibody": pa.nulls(t.num_rows, pa.string()),
                "organism": t.column("organism").cast(pa.string()),
                "lbl": t.column("label").cast(pa.string()),
            }
        )

    pairs = antibodies_ds.map_batches(
        explode_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tgt = targets_ds.map_batches(
        tag_targets, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def resolve_bucket(t: pa.Table) -> pa.Table:
        is_target = pc.is_null(t.column("antibody"))
        targets = t.filter(is_target)
        pairs_rows = t.filter(pc.invert(is_target))
        lookup = {
            k: (o, l)
            for k, o, l in zip(
                targets.column("key").to_pylist(),
                targets.column("organism").to_pylist(),
                targets.column("lbl").to_pylist(),
            )
        }
        ab, orgs, lbls = [], [], []
        for k, a in zip(
            pairs_rows.column("key").to_pylist(), pairs_rows.column("antibody").to_pylist()
        ):
            hit = lookup.get(k)
            if hit is not None:  # inner join, like the reference's .join
                ab.append(a)
                orgs.append(hit[0])
                lbls.append(hit[1])
        return pa.table(
            {
                "antibody": pa.array(ab, pa.string()),
                "organism": pa.array(orgs, pa.string()),
                "lbl": pa.array(lbls, pa.string()),
            }
        )

    resolved = bucketed_groupby_apply(tgt.union(pairs), ["key"], resolve_bucket)

    # ---- pass 2: group targets back onto antibody rows
    ab_schema = antibodies_ds.schema().base_schema

    def tag_antibody(t: pa.Table) -> pa.Table:
        return t.append_column("__trg_organism", pa.nulls(t.num_rows, pa.string())) \
                .append_column("__trg_label", pa.nulls(t.num_rows, pa.string())) \
                .append_column("__is_pair", pa.array([False] * t.num_rows, pa.bool_()))

    def widen_resolved(t: pa.Table) -> pa.Table:
        cols = {}
        for f in ab_schema:
            if f.name == "at_id":
                cols[f.name] = t.column("antibody").cast(pa.string())
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        cols["__trg_organism"] = t.column("organism")
        cols["__trg_label"] = t.column("lbl")
        cols["__is_pair"] = pa.array([True] * t.num_rows, pa.bool_())
        return pa.table(cols)

    left = antibodies_ds.map_batches(
        tag_antibody, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    right = resolved.map_batches(
        widen_resolved, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def assemble_bucket(t: pa.Table) -> pa.Table:
        is_pair = t.column("__is_pair").to_pylist()
        rows = t.filter(pa.array([not p for p in is_pair]))
        prs = t.filter(pa.array(is_pair))
        best: dict[str, str] = {}
        for a, o, l in zip(
            prs.column("at_id").to_pylist(),
            prs.column("__trg_organism").to_pylist(),
            prs.column("__trg_label").to_pylist(),
        ):
            if o == "/organisms/human/" and l is not None:
                if a not in best or l < best[a]:
                    best[a] = l
        names = [best.get(a) for a in rows.column("at_id").to_pylist()]
        return transform_antibody_batch(
            rows.drop_columns(["__trg_organism", "__trg_label", "__is_pair"]), names
        )

    return bucketed_groupby_apply(left.union(right), ["at_id"], assemble_bucket)


# ---------------------------------------------------------------------------
# Library (LibraryTransformations.scala:19-52)
# ---------------------------------------------------------------------------
STRAND_PLACEHOLDER = "strand-specific"


def transform_library_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    ids = [transform_id(v) for v in batch.column("at_id").to_pylist()]
    strand = _get_str(batch, "strand_specificity")
    treatments = _get_list(batch, "treatments")
    return pa.table(
        {
            "library_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "date_created": batch.column("date_created"),
            "award": _url(batch.column("award")),
            "lab": _url(batch.column("lab")),
            "queried_rnp_size_range": batch.column("queried_RNP_size_range")
            if "queried_RNP_size_range" in batch.column_names
            else pa.nulls(n, pa.string()),
            "rna_integrity_number": batch.column("rna_integrity_number")
            if "rna_integrity_number" in batch.column_names
            else pa.nulls(n, pa.float64()),
            "size_range": batch.column("size_range")
            if "size_range" in batch.column_names
            else pa.nulls(n, pa.string()),
            "library_layout": pa.array([s is not None for s in strand], pa.bool_()),
            "paired_end_type": pa.array(
                [None if (s is None or s == STRAND_PLACEHOLDER) else s for s in strand],
                pa.string(),
            ),
            "sample_treatment": pa.array(
                [[ENCODE_URL_PREFIX + t for t in ts] for ts in treatments],
                pa.list_(pa.string()),
            ),
            "submitted_by": _url(batch.column("submitted_by")),
            "used_by": _ids(_get_list(batch, "spikeins_used")),
            "uses_sample_biosample_id": pa.array(
                [transform_id(b) for b in batch.column("biosample").to_pylist()],
                pa.string(),
            ),
            "prep_material": batch.column("nucleic_acid_term_id")
            if "nucleic_acid_term_id" in batch.column_names
            else pa.nulls(n, pa.string()),
            "prep_material_name": batch.column("nucleic_acid_term_name")
            if "nucleic_acid_term_name" in batch.column_names
            else pa.nulls(n, pa.string()),
        }
    )


def transform_libraries(ds):
    return ds.map_batches(
        transform_library_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Experiment + AssayActivity (ExperimentActivityTransformations.scala:11-59,
# AssayActivityTransformations.scala:11-54)
# ---------------------------------------------------------------------------
def experiment_side_index(replicates: pa.Table, libraries: pa.Table) -> dict:
    """Per experiment @id: {antibodies: [...], libraries: [(lib_id, biosample_id)]}
    — getLibrariesByExperiment (TransformationPipelineBuilder.scala:464-486):
    replicates keyed by library, joined to libraries, grouped by experiment."""
    lib_by_at = {
        at: (transform_id(at), transform_id(b))
        for at, b in zip(
            libraries.column("at_id").to_pylist(), libraries.column("biosample").to_pylist()
        )
    }
    out: dict[str, dict] = {}
    for exp, lib_at, antibody in zip(
        replicates.column("experiment").to_pylist(),
        replicates.column("library").to_pylist(),
        _get_str(replicates, "antibody"),
    ):
        e = out.setdefault(exp, {"antibodies": [], "libraries": []})
        if antibody is not None:
            e["antibodies"].append(transform_id(antibody))
        hit = lib_by_at.get(lib_at)
        if hit is not None:
            e["libraries"].append(hit)
    return out


def _pop_exp_side(batch: pa.Table):
    """Injected per-row side info (the distributed large-side path): returns
    (batch-without-column, libraries-per-row, antibodies-per-row) or
    (batch, None, None) when absent."""
    if "__exp_side" not in batch.column_names:
        return batch, None, None
    rows = [r or {} for r in batch.column("__exp_side").to_pylist()]
    libs = [
        [(p["lib_id"], p["bio_id"]) for p in (r.get("library_pairs") or [])]
        for r in rows
    ]
    antibodies = [list(r.get("antibody_id") or []) for r in rows]
    return batch.drop_columns(["__exp_side"]), libs, antibodies


def transform_experiment_batch(batch: pa.Table, side: dict) -> pa.Table:
    batch, libs, antibodies = _pop_exp_side(batch)
    batch = summarize_audits(batch)
    ats = batch.column("at_id").to_pylist()
    ids = [transform_id(v) for v in ats]
    assay = _get_str(batch, "assay_term_name")
    if libs is None:
        libs = [side.get(a, {}).get("libraries", []) for a in ats]
        antibodies = [side.get(a, {}).get("antibodies", []) for a in ats]
    return pa.table(
        {
            "experimentactivity_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "date_created": batch.column("date_created"),
            "date_submitted": batch.column("date_submitted")
            if "date_submitted" in batch.column_names
            else pa.nulls(batch.num_rows, pa.timestamp("us", "UTC")),
            "description": _get_col_or_null(batch, "description"),
            "activity_type": pa.array(["Experiment"] * batch.num_rows),
            "data_modality": pa.array(
                [[assay_term_to_modality(a)] if a is not None else [] for a in assay],
                pa.list_(pa.string()),
            ),
            "award": _url(batch.column("award")),
            "audit_labels": batch.column("audit_labels"),
            "max_audit_flag": batch.column("max_audit_flag"),
            "lab": _url(batch.column("lab")),
            "submitted_by": _url(batch.column("submitted_by")),
            "status": batch.column("status"),
            "used_file_id": _ids(_get_list(batch, "contributing_files")),
            "generated_file_id": _ids(_get_list(batch, "files")),
            "uses_sample_biosample_id": pa.array(
                # a library with no biosample (mixed_biosamples case) yields
                # None — drop it, as transform_library_batch does
                [sorted({b for _, b in l if b is not None}) for l in libs],
                pa.list_(pa.string()),
            ),
            "antibody_id": pa.array(antibodies, pa.list_(pa.string())),
            "library_id": pa.array(
                [sorted(i for i, _ in l) for l in libs], pa.list_(pa.string())
            ),
        }
    )


def _get_col_or_null(batch: pa.Table, name: str, typ=pa.string()):
    return batch.column(name) if name in batch.column_names else pa.nulls(batch.num_rows, typ)


_LIB_PAIR_T = pa.struct([("lib_id", pa.string()), ("bio_id", pa.string())])
_EXP_SIDE_T = pa.struct(
    [
        ("antibody_id", pa.list_(pa.string())),
        ("library_pairs", pa.list_(_LIB_PAIR_T)),
    ]
)


def _experiment_side_ds(replicates: pa.Table, libraries: pa.Table):
    """Distributed experiment_side_index: replicate→library resolution via
    one keyed exchange, per-experiment fold via another — no driver dict.
    Row-order parity: antibodies and library pairs keep replicate ROW order
    (__rep_order), exactly what the broadcast index produces."""
    import numpy as np
    import ray.data

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    n = replicates.num_rows
    rep_ds = ray.data.from_arrow(
        pa.table(
            {
                "library": replicates.column("library"),
                "experiment": replicates.column("experiment"),
                "antibody": replicates.column("antibody")
                if "antibody" in replicates.column_names
                else pa.nulls(n, pa.string()),
                "__rep_order": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    )
    lib_ds = ray.data.from_arrow(
        pa.table(
            {
                "library": libraries.column("at_id"),
                "__lib_pair": pa.array(
                    [
                        {"lib_id": transform_id(at), "bio_id": transform_id(b)}
                        for at, b in zip(
                            libraries.column("at_id").to_pylist(),
                            libraries.column("biosample").to_pylist()
                            if "biosample" in libraries.column_names
                            else [None] * libraries.num_rows,
                        )
                    ],
                    _LIB_PAIR_T,
                ),
            }
        )
    )
    rep_with_lib = append_side_column(
        rep_ds, lib_ds, "library", "__lib_pair", _LIB_PAIR_T
    )

    def fold_exp(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[("experiment", "ascending"), ("__rep_order", "ascending")],
        )
        g = t.take(idx)
        exps = g.column("experiment").to_pylist()
        abs_ = g.column("antibody").to_pylist()
        pairs = g.column("__lib_pair").to_pylist()
        out_at, out_side = [], []
        cur, cur_ab, cur_pairs = None, [], []
        for e, a, p in zip(exps, abs_, pairs):
            if e != cur:
                if cur is not None:
                    out_at.append(cur)
                    out_side.append(
                        {"antibody_id": cur_ab, "library_pairs": cur_pairs}
                    )
                cur, cur_ab, cur_pairs = e, [], []
            if a is not None:
                cur_ab.append(transform_id(a))
            if p is not None:
                cur_pairs.append(p)
        if cur is not None:
            out_at.append(cur)
            out_side.append({"antibody_id": cur_ab, "library_pairs": cur_pairs})
        return pa.table(
            {
                "at_id": pa.array(out_at, pa.string()),
                "__exp_side": pa.array(out_side, _EXP_SIDE_T),
            }
        )

    return bucketed_groupby_apply(rep_with_lib, ["experiment"], fold_exp)


def transform_experiments(
    experiments_ds,
    replicates: pa.Table,
    libraries: pa.Table,
    *,
    broadcast_max_rows: int | None = None,
):
    import ray

    limit = (
        SIDE_INPUT_BROADCAST_MAX_ROWS
        if broadcast_max_rows is None
        else broadcast_max_rows
    )
    if replicates.num_rows + libraries.num_rows > limit:
        side_ds = _experiment_side_ds(replicates, libraries)
        joined = append_side_column(
            experiments_ds, side_ds, "at_id", "__exp_side", _EXP_SIDE_T
        )
        return joined.map_batches(
            lambda t: transform_experiment_batch(t, {}),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )

    ref = ray.put(experiment_side_index(replicates, libraries))

    def fn(batch: pa.Table) -> pa.Table:
        return transform_experiment_batch(batch, ray.get(ref))

    return experiments_ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def transform_assay_activity_batch(
    batch: pa.Table, side: dict, files_by_dataset: dict
) -> pa.Table:
    batch, libs, antibodies = _pop_exp_side(batch)
    gen_files = None
    if "__gen_files" in batch.column_names:
        gen_files = [
            sorted(set(v or [])) for v in batch.column("__gen_files").to_pylist()
        ]
        batch = batch.drop_columns(["__gen_files"])
    ats = batch.column("at_id").to_pylist()
    ids = [transform_id(v) for v in ats]
    assay_name = _get_str(batch, "assay_term_name")
    slims = _get_list(batch, "assay_slims")
    if libs is None:
        libs = [side.get(a, {}).get("libraries", []) for a in ats]
        antibodies = [side.get(a, {}).get("antibodies", []) for a in ats]
    if gen_files is None:
        gen_files = [sorted(set(files_by_dataset.get(a, []))) for a in ats]
    return pa.table(
        {
            "assayactivity_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "date_created": batch.column("date_created"),
            "assay_category": pa.array(
                [s[0] if s else None for s in slims], pa.string()
            ),
            "assay_type": batch.column("assay_term_id"),
            "data_modality": pa.array(
                [[assay_term_to_modality(a)] if a is not None else [] for a in assay_name],
                pa.list_(pa.string()),
            ),
            "antibody_id": pa.array(antibodies, pa.list_(pa.string())),
            "activity_type": pa.array(["Assay"] * batch.num_rows),
            "generated_file_id": pa.array(gen_files, pa.list_(pa.string())),
            "used_biosample_id": pa.array(
                [sorted({b for _, b in l if b is not None}) for l in libs],
                pa.list_(pa.string()),
            ),
            "library_id": pa.array(
                [[i for i, _ in l] for l in libs], pa.list_(pa.string())
            ),
        }
    )


def _gen_files_ds(files: pa.Table):
    """Distributed files_by_dataset: (dataset → generated file ids) via one
    grouped exchange.  The consumer sorts the set, so row order is free."""
    import ray.data

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    src = ray.data.from_arrow(
        pa.table(
            {
                "dataset": files.column("dataset"),
                "file_id": pa.array(
                    [transform_id(v) for v in files.column("at_id").to_pylist()],
                    pa.string(),
                ),
            }
        )
    )

    def fold(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("dataset", "ascending")])
        g = t.take(idx)
        ds_col = g.column("dataset").to_pylist()
        fids = g.column("file_id").to_pylist()
        out_at, out_files = [], []
        cur, acc = None, []
        for d, f in zip(ds_col, fids):
            if d != cur:
                if cur is not None:
                    out_at.append(cur)
                    out_files.append(acc)
                cur, acc = d, []
            acc.append(f)
        if cur is not None:
            out_at.append(cur)
            out_files.append(acc)
        return pa.table(
            {
                "at_id": pa.array(out_at, pa.string()),
                "__gen_files": pa.array(out_files, pa.list_(pa.string())),
            }
        )

    return bucketed_groupby_apply(src, ["dataset"], fold)


def transform_assay_activities(
    experiments_ds,
    files: pa.Table,
    replicates: pa.Table,
    libraries: pa.Table,
    *,
    broadcast_max_rows: int | None = None,
):
    import ray

    limit = (
        SIDE_INPUT_BROADCAST_MAX_ROWS
        if broadcast_max_rows is None
        else broadcast_max_rows
    )
    if files.num_rows + replicates.num_rows + libraries.num_rows > limit:
        # files are the FACT side — never a driver dict at scale
        joined = append_side_column(
            experiments_ds,
            _experiment_side_ds(replicates, libraries),
            "at_id",
            "__exp_side",
            _EXP_SIDE_T,
        )
        joined = append_side_column(
            joined, _gen_files_ds(files), "at_id", "__gen_files",
            pa.list_(pa.string()),
        )
        return joined.map_batches(
            lambda t: transform_assay_activity_batch(t, {}, {}),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )

    files_by_dataset: dict[str, list[str]] = {}
    for ds_at, f_at in zip(
        files.column("dataset").to_pylist(), files.column("at_id").to_pylist()
    ):
        files_by_dataset.setdefault(ds_at, []).append(transform_id(f_at))
    ref = ray.put((experiment_side_index(replicates, libraries), files_by_dataset))

    def fn(batch: pa.Table) -> pa.Table:
        side, fbd = ray.get(ref)
        return transform_assay_activity_batch(batch, side, fbd)

    return experiments_ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# StepActivity + AnalysisActivity (the J8 stepRun chain)
# ---------------------------------------------------------------------------
def step_run_info(
    step_runs: pa.Table, step_versions: pa.Table, steps: pa.Table, files: pa.Table
) -> list[dict]:
    """getStepRunInfo (TransformationPipelineBuilder.scala:488-525): step runs
    joined to versions to steps (small chained joins) plus generated files
    grouped by step_run."""
    ver_by_at = {
        at: {"name": nm, "analysis_step": st}
        for at, nm, st in zip(
            step_versions.column("at_id").to_pylist(),
            step_versions.column("name").to_pylist(),
            step_versions.column("analysis_step").to_pylist(),
        )
    }
    step_by_at = {
        at: {"pipelines": ps or []}
        for at, ps in zip(
            steps.column("at_id").to_pylist(), _get_list(steps, "pipelines")
        )
    }
    files_by_run: dict[str, list[dict]] = {}
    for run_at, f_at, dataset, derived in zip(
        _get_str(files, "step_run"),
        files.column("at_id").to_pylist(),
        files.column("dataset").to_pylist(),
        _get_list(files, "derived_from"),
    ):
        if run_at is not None:
            files_by_run.setdefault(run_at, []).append(
                {"at_id": f_at, "dataset": dataset, "derived_from": derived}
            )
    out = []
    for run_at, ver_at in zip(
        step_runs.column("at_id").to_pylist(),
        step_runs.column("analysis_step_version").to_pylist(),
    ):
        ver = ver_by_at.get(ver_at)
        if ver is None:
            continue
        step = step_by_at.get(ver["analysis_step"])
        if step is None:
            continue
        out.append(
            {
                "run_at": run_at,
                "version": ver["name"],
                "pipelines": step["pipelines"],
                "files": files_by_run.get(run_at, []),
            }
        )
    return out


def _pipeline_experiment_pair(info: dict) -> tuple[str, str] | None:
    """getPipelineExperimentIdPair (AnalysisActivityTransformations.scala:
    55-99): exactly one pipeline on the step AND one dataset across the
    generated files, else None."""
    pipelines = set(info["pipelines"])
    if len(pipelines) != 1:
        return None
    datasets = {f["dataset"] for f in info["files"]}
    if len(datasets) != 1:
        return None
    return next(iter(pipelines)), next(iter(datasets))


def transform_step_activities(infos: list[dict]) -> pa.Table:
    rows = {
        "stepactivity_id": [],
        "label": [],
        "version": [],
        "analysisactivity_id": [],
        "used_file_id": [],
        "generated_file_id": [],
        "activity_type": [],
        "data_modality": [],
    }
    for info in infos:
        run_id = transform_id(info["run_at"])
        pair = _pipeline_experiment_pair(info)
        run_pipeline_id = (
            f"{transform_id(pair[0])}_{transform_id(pair[1])}" if pair else None
        )
        used, seen = [], set()
        for f in info["files"]:
            for d in f["derived_from"]:
                di = transform_id(d)
                if di not in seen:
                    seen.add(di)
                    used.append(di)
        rows["stepactivity_id"].append(run_id)
        rows["label"].append(run_id)
        rows["version"].append(info["version"])
        rows["analysisactivity_id"].append(run_pipeline_id)
        rows["used_file_id"].append(used)
        rows["generated_file_id"].append([transform_id(f["at_id"]) for f in info["files"]])
        rows["activity_type"].append("Step")
        rows["data_modality"].append([])
    return pa.table(
        {
            "stepactivity_id": pa.array(rows["stepactivity_id"], pa.string()),
            "label": pa.array(rows["label"], pa.string()),
            "version": pa.array(rows["version"], pa.string()),
            "analysisactivity_id": pa.array(rows["analysisactivity_id"], pa.string()),
            "used_file_id": pa.array(rows["used_file_id"], pa.list_(pa.string())),
            "generated_file_id": pa.array(rows["generated_file_id"], pa.list_(pa.string())),
            "activity_type": pa.array(rows["activity_type"], pa.string()),
            "data_modality": pa.array(rows["data_modality"], pa.list_(pa.string())),
        }
    )


def transform_analysis_activities(infos: list[dict], pipelines: pa.Table) -> pa.Table:
    """Group step-run infos by (pipeline, experiment); one analysis-activity
    row per group (TransformationPipelineBuilder.scala:552-587)."""
    pipe_by_at = {
        at: {"title": t, "assay_term_names": a}
        for at, t, a in zip(
            pipelines.column("at_id").to_pylist(),
            _get_str(pipelines, "title"),
            _get_list(pipelines, "assay_term_names"),
        )
    }
    grouped: dict[tuple[str, str], list[dict]] = {}
    for info in infos:
        pair = _pipeline_experiment_pair(info)
        if pair is not None:
            grouped.setdefault(pair, []).extend(info["files"])
    rows = {k: [] for k in [
        "analysisactivity_id", "label", "xref", "activity_type", "data_modality",
        "analysis_type", "assayactivity_id", "used_file_id", "generated_file_id"]}
    for (pipe_at, exp_at), files in sorted(grouped.items()):
        pipe = pipe_by_at.get(pipe_at)
        if pipe is None:
            continue
        run_id = f"{transform_id(pipe_at)}_{transform_id(exp_at)}"
        generated = sorted({transform_id(f["at_id"]) for f in files})
        gen_set = set(generated)
        used = sorted(
            {
                transform_id(d)
                for f in files
                for d in f["derived_from"]
                if transform_id(d) not in gen_set
            }
        )
        rows["analysisactivity_id"].append(run_id)
        rows["label"].append(run_id)
        rows["xref"].append([ENCODE_URL_PREFIX + pipe_at])
        rows["activity_type"].append("Analysis")
        rows["data_modality"].append(
            [assay_term_to_modality(t) for t in pipe["assay_term_names"]]
        )
        rows["analysis_type"].append(pipe["title"])
        rows["assayactivity_id"].append(transform_id(exp_at))
        rows["used_file_id"].append(used)
        rows["generated_file_id"].append(generated)
    return pa.table(
        {
            "analysisactivity_id": pa.array(rows["analysisactivity_id"], pa.string()),
            "label": pa.array(rows["label"], pa.string()),
            "xref": pa.array(rows["xref"], pa.list_(pa.string())),
            "activity_type": pa.array(rows["activity_type"], pa.string()),
            "data_modality": pa.array(rows["data_modality"], pa.list_(pa.string())),
            "analysis_type": pa.array(rows["analysis_type"], pa.string()),
            "assayactivity_id": pa.array(rows["assayactivity_id"], pa.string()),
            "used_file_id": pa.array(rows["used_file_id"], pa.list_(pa.string())),
            "generated_file_id": pa.array(rows["generated_file_id"], pa.list_(pa.string())),
        }
    )


# ---------------------------------------------------------------------------
# SequencingActivity / AlignmentActivity (file-derived activities)
# ---------------------------------------------------------------------------
def transform_sequencing_activity_batch(
    batch: pa.Table, lib_idx: dict[str, list[str]]
) -> pa.Table:
    """Sequencing activities come from 'raw data' files
    (SequencingActivityTransformations.scala:15-47)."""
    keep = pc.equal(
        batch.column("output_category"), pa.scalar(SEQUENCING_CATEGORY)
    )
    b = batch.filter(pc.fill_null(keep, False))
    file_ids = [transform_id(v) for v in b.column("at_id").to_pylist()]
    datasets = [transform_id(d) or "" for d in _get_str(b, "dataset")]
    ids = [f"{f}_{d}" for f, d in zip(file_ids, datasets)]
    assay_terms = _get_list(b, "assay_term_name")
    origin = (
        b.column("origin_batches").to_pylist()
        if "origin_batches" in b.column_names
        else [None] * b.num_rows
    )
    return pa.table(
        {
            "sequencingactivity_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": pa.array(
                [[u] for u in _url(b.column("at_id")).to_pylist()], pa.list_(pa.string())
            ),
            "date_created": b.column("date_created"),
            "activity_type": pa.array(["Sequencing"] * b.num_rows),
            "data_modality": pa.array(
                [[assay_term_to_modality(t) for t in ts] for ts in assay_terms],
                pa.list_(pa.string()),
            ),
            "generated_file_id": pa.array([[f] for f in file_ids], pa.list_(pa.string())),
            "associated_with": pa.array([[d] for d in datasets], pa.list_(pa.string())),
            "used_biosample_id": pa.array(
                [[transform_id(x) for x in (o or [])] for o in origin],
                pa.list_(pa.string()),
            ),
            "lab": _url(b.column("lab")),
            "library_id": pa.array(
                [libraries_for_biosamples(o, lib_idx) or [] for o in origin],
                pa.list_(pa.string()),
            ),
            "platform": _url(b.column("platform"))
            if "platform" in b.column_names
            else pa.nulls(b.num_rows, pa.string()),
            "assay_type": pa.array([[]] * b.num_rows, pa.list_(pa.string())),
        }
    )


def transform_alignment_activity_batch(batch: pa.Table) -> pa.Table:
    """Alignment activities come from 'alignment' files
    (AlignmentActivityTransformations.scala:14-39)."""
    keep = pc.equal(batch.column("output_category"), pa.scalar(ALIGNMENT_CATEGORY))
    b = batch.filter(pc.fill_null(keep, False))
    file_ids = [transform_id(v) for v in b.column("at_id").to_pylist()]
    datasets = [transform_id(d) for d in _get_str(b, "dataset")]
    ids = [f"{f}_{d}" for f, d in zip(file_ids, datasets)]
    assay_terms = _get_list(b, "assay_term_name")
    assembly = _get_list(b, "assembly")
    return pa.table(
        {
            "alignmentactivity_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": pa.array(
                [[u] for u in _url(b.column("at_id")).to_pylist()], pa.list_(pa.string())
            ),
            "date_created": b.column("date_created"),
            "activity_type": pa.array(["Alignment"] * b.num_rows),
            "data_modality": pa.array(
                [[assay_term_to_modality(t) for t in ts] for ts in assay_terms],
                pa.list_(pa.string()),
            ),
            "generated_file_id": pa.array([[f] for f in file_ids], pa.list_(pa.string())),
            "reference_assembly": pa.array(
                [list(a)[:1] if isinstance(a, list) else [] for a in assembly],
                pa.list_(pa.string()),
            ),
            "used_file_id": _ids(_get_list(b, "derived_from")),
            "lab": _url(b.column("lab")),
        }
    )


def transform_sequencing_activities(files_ds, libraries: pa.Table):
    import ray

    ref = ray.put(library_index(libraries))

    def fn(batch: pa.Table) -> pa.Table:
        return transform_sequencing_activity_batch(batch, ray.get(ref))

    return files_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def transform_alignment_activities(files_ds):
    return files_ds.map_batches(
        transform_alignment_activity_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# SampleTreatmentActivity (SampleTreatmentActivityTransformations.scala:13-36)
# ---------------------------------------------------------------------------
def transform_sample_treatment_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    ids = [transform_id(v) for v in batch.column("at_id").to_pylist()]
    return pa.table(
        {
            "sampletreatmentactivity_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "date_created": batch.column("date_created"),
            "activity_type": pa.array(["SampleTreatment"] * n),
            "data_modality": pa.array([[]] * n, pa.list_(pa.string())),
            "sample_treatment_method": _get_col_or_null(batch, "treatment_type"),
            "treatment_term_id": _get_col_or_null(batch, "treatment_term_id"),
            "treatment_term_name": _get_col_or_null(batch, "treatment_term_name"),
            "amount": _get_col_or_null(batch, "amount", pa.float64()),
            "amount_units": _get_col_or_null(batch, "amount_units"),
            "duration": _get_col_or_null(batch, "duration", pa.float64()),
            "duration_units": _get_col_or_null(batch, "duration_units"),
            "sample_treatment_type": _get_col_or_null(batch, "purpose"),
        }
    )


def transform_sample_treatments(ds):
    return ds.map_batches(
        transform_sample_treatment_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# LibraryPreparationActivity (LibraryPreparationActivityTransformations.scala:13-33)
# ---------------------------------------------------------------------------
def transform_library_preparation_batch(
    batch: pa.Table, experiment_assay_by_library: dict[str, str]
) -> pa.Table:
    """Library-prep activity rows; modality comes from the experiment the
    library replicates into (the distinctBy'd library→experiment pairing,
    TransformationPipelineBuilder.scala:443-462)."""
    assay = None
    if "__assay" in batch.column_names:
        assay = batch.column("__assay").to_pylist()
        batch = batch.drop_columns(["__assay"])
    n = batch.num_rows
    ats = batch.column("at_id").to_pylist()
    ids = [transform_id(v) for v in ats]
    if assay is None:
        assay = [experiment_assay_by_library.get(a) for a in ats]
    return pa.table(
        {
            "librarypreparationactivity_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "date_created": batch.column("date_created"),
            "lab": _url(batch.column("lab")),
            "generated_library_id": pa.array([[i] for i in ids], pa.list_(pa.string())),
            "uses_sample_biosample_id": pa.array(
                [[transform_id(b)] for b in batch.column("biosample").to_pylist()],
                pa.list_(pa.string()),
            ),
            "activity_type": pa.array(["LibraryPreparation"] * n),
            "data_modality": pa.array(
                [[assay_term_to_modality(a)] if a is not None else [] for a in assay],
                pa.list_(pa.string()),
            ),
        }
    )


def experiment_assay_by_library(replicates: pa.Table, experiments: pa.Table) -> dict:
    """library @id → assay_term_name of ONE experiment (first by sorted
    experiment id — the reference's distinctBy keeps an arbitrary one)."""
    assay_by_exp = dict(
        zip(
            experiments.column("at_id").to_pylist(),
            _get_str(experiments, "assay_term_name"),
        )
    )
    pairs: dict[str, str] = {}
    rep = sorted(
        zip(
            replicates.column("library").to_pylist(),
            replicates.column("experiment").to_pylist(),
        )
    )
    for lib, exp in rep:
        if lib not in pairs and exp in assay_by_exp:
            pairs[lib] = assay_by_exp[exp]
    return pairs


def _assay_by_library_ds(replicates: pa.Table, experiments: pa.Table):
    """Distributed experiment_assay_by_library: resolve each replicate's
    experiment assay by one keyed exchange, then per library keep the pair
    with the SMALLEST experiment id among those whose experiment EXISTS —
    the broadcast dict's sorted-first-membership rule, including the case
    where the winning experiment's assay is null (it still claims the
    library; a later non-null assay must NOT override)."""
    import ray.data

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    hit_t = pa.struct([("assay", pa.string()), ("matched", pa.bool_())])
    rep_ds = ray.data.from_arrow(
        pa.table(
            {
                "library": replicates.column("library"),
                "experiment": replicates.column("experiment"),
            }
        )
    )
    exp_ds = ray.data.from_arrow(
        pa.table(
            {
                "experiment": experiments.column("at_id"),
                "__hit": pa.array(
                    [
                        {"assay": a, "matched": True}
                        for a in _get_str(experiments, "assay_term_name")
                    ],
                    hit_t,
                ),
            }
        )
    )
    resolved = append_side_column(rep_ds, exp_ds, "experiment", "__hit", hit_t)

    def fold_lib(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("library", "ascending"), ("experiment", "ascending")]
        )
        g = t.take(idx)
        libs = g.column("library").to_pylist()
        hits = g.column("__hit").to_pylist()
        out_at, out_assay = [], []
        cur, claimed = None, False
        for l, h in zip(libs, hits):
            if l != cur:
                cur, claimed = l, False
            if not claimed and h is not None and h.get("matched"):
                out_at.append(l)
                out_assay.append(h.get("assay"))
                claimed = True
        return pa.table(
            {
                "at_id": pa.array(out_at, pa.string()),
                "__assay": pa.array(out_assay, pa.string()),
            }
        )

    return bucketed_groupby_apply(resolved, ["library"], fold_lib)


def transform_library_preparations(
    libraries_ds,
    replicates: pa.Table,
    experiments: pa.Table,
    *,
    broadcast_max_rows: int | None = None,
):
    import ray

    limit = (
        SIDE_INPUT_BROADCAST_MAX_ROWS
        if broadcast_max_rows is None
        else broadcast_max_rows
    )
    if replicates.num_rows + experiments.num_rows > limit:
        joined = append_side_column(
            libraries_ds,
            _assay_by_library_ds(replicates, experiments),
            "at_id",
            "__assay",
            pa.string(),
        )
        return joined.map_batches(
            lambda t: transform_library_preparation_batch(t, {}),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )

    ref = ray.put(experiment_assay_by_library(replicates, experiments))

    def fn(batch: pa.Table) -> pa.Table:
        return transform_library_preparation_batch(batch, ray.get(ref))

    return libraries_ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# ReferenceFileSet (ReferenceFileSetTransformations.scala:11-62)
# ---------------------------------------------------------------------------
def transform_reference_file_set_batch(
    batch: pa.Table, organisms: dict[str, str]
) -> pa.Table:
    n = batch.num_rows
    ids = [transform_id(v) for v in batch.column("at_id").to_pylist()]
    org = [organisms.get(o) for o in _get_str(batch, "organism")]
    return pa.table(
        {
            "referencefileset_id": pa.array(ids, pa.string()),
            "label": pa.array(ids, pa.string()),
            "xref": _xref(batch),
            "reference_assembly": pa.array(_get_list(batch, "assembly"), pa.list_(pa.string())),
            "description": _get_col_or_null(batch, "description"),
            "organism": pa.array(org, pa.string()),
            "lab": _url(batch.column("lab")) if "lab" in batch.column_names else pa.nulls(n, pa.string()),
            "reference_type": _get_col_or_null(batch, "reference_type"),
            "donor_id": _ids(_get_list(batch, "donor")),
            "generated_file_id": _ids(_get_list(batch, "files")),
            "derived_from_file_id": _ids(_get_list(batch, "derived_from_")),
            "original_file_id": _ids(_get_list(batch, "original_files")),
            "related_file_id": _ids(_get_list(batch, "related_files")),
            "related_pipeline_id": _ids(_get_list(batch, "related_pipelines")),
        }
    )


def transform_reference_file_sets(refs_ds, organisms: pa.Table):
    import ray

    lookup = dict(
        zip(
            organisms.column("at_id").to_pylist(),
            organisms.column("scientific_name").to_pylist(),
        )
    )
    ref = ray.put(lookup)

    def fn(batch: pa.Table) -> pa.Table:
        return transform_reference_file_set_batch(batch, ray.get(ref))

    return refs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# Dataset singleton (DatasetTransformations.scala:9-39)
# ---------------------------------------------------------------------------
def dataset_singleton() -> pa.Table:
    """The one constant dataset row (timestamps pinned; the reference's
    OffsetDateTime.now() is nondeterministic and excluded by design)."""
    return pa.table(
        {
            "dataset_id": pa.array(["ENCODE"], pa.string()),
            "label": pa.array(["ENCODE 4 (Pre-release)"], pa.string()),
            "xref": pa.array([["https://www.encodeproject.org/"]], pa.list_(pa.string())),
            "title": pa.array(["AnVIL ENCODE Pre-Release Dataset"], pa.string()),
            "version": pa.array(["ENCODE 4"], pa.string()),
            "conforms_to": pa.array(["Terra Interoperability Model"], pa.string()),
            "data_modality": pa.array([["Epigenomics"]], pa.list_(pa.string())),
            "part_of_datacollection_id": pa.array([["AnVIL"]], pa.list_(pa.string())),
        }
    )
