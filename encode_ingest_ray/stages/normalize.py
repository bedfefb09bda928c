"""Normalization / projection / parsing operators.

Each function mirrors a reference transform (file:line cited per function) but
is a vectorized Arrow kernel, not a per-record loop.  All are pure and
shuffle-free — safe anywhere in a streaming pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ENCODE_URL_PREFIX = "https://www.encodeproject.org"


def remove_unknowns(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Null out the literal string 'unknown' in every (or the given) string
    column.  Reference: ``CommonTransformations.removeUnknowns``
    (/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
    encode/transformation/CommonTransformations.scala:11-25), applied to every
    raw record on read (TransformationPipelineBuilder.scala:30-31)."""
    for i, field in enumerate(batch.schema):
        if columns is not None and field.name not in columns:
            continue
        if pa.types.is_string(field.type) or pa.types.is_large_string(field.type):
            col = batch.column(i)
            batch = batch.set_column(
                i,
                field.name,
                pc.if_else(pc.equal(col, "unknown"), pa.nulls(len(col), field.type), col),
            )
    return batch


def extract_id(
    batch: pa.Table, column: str, out: str, pattern: str = r"/[^/]+/(?P<id>[^/]+)/"
) -> pa.Table:
    """Regex-capture an accession id out of a path-shaped string column.
    Reference: ``CommonTransformations.transformId`` / ``readId``
    (CommonTransformations.scala:31-44)."""
    m = pc.extract_regex(batch.column(column), pattern)
    ids = pc.struct_field(m, [0])
    return batch.append_column(out, ids)


def url_prefix(
    batch: pa.Table, column: str, out: str, prefix: str = ENCODE_URL_PREFIX
) -> pa.Table:
    """Prepend a base URL to a path column (null-preserving).
    Reference: ``CommonTransformations.convertToEncodeUrl``
    (CommonTransformations.scala:49-56)."""
    col = batch.column(column)
    joined = pc.binary_join_element_wise(pa.scalar(prefix), col, "")
    return batch.append_column(out, joined)


def parse_age_bounds(
    batch: pa.Table, column: str, lower_out: str = "age_lower", upper_out: str = "age_upper"
) -> pa.Table:
    """Parse age strings: '30-33' → (30.0, 33.0); '90 or above' → (90.0, null);
    '5' → (5.0, 5.0).  Reference:
    ``CommonTransformations.computeAgeLowerAndUpperbounds``
    (CommonTransformations.scala:58-72)."""
    col = batch.column(column)
    range_m = pc.extract_regex(col, r"^(?P<lo>\d+(?:\.\d+)?)-(?P<hi>\d+(?:\.\d+)?)$")
    above_m = pc.extract_regex(col, r"^(?P<lo>\d+(?:\.\d+)?) or above$")
    plain_m = pc.extract_regex(col, r"^(?P<lo>\d+(?:\.\d+)?)$")
    f64 = pa.float64()
    lo = pc.coalesce(
        pc.cast(pc.struct_field(range_m, [0]), f64),
        pc.cast(pc.struct_field(above_m, [0]), f64),
        pc.cast(pc.struct_field(plain_m, [0]), f64),
    )
    hi = pc.coalesce(
        pc.cast(pc.struct_field(range_m, [1]), f64),
        # "or above" has no upper bound → null; plain value upper == lower
        pc.if_else(pc.is_valid(pc.struct_field(above_m, [0])),
                   pa.nulls(len(col), f64),
                   pc.cast(pc.struct_field(plain_m, [0]), f64)),
    )
    return batch.append_column(lower_out, lo).append_column(upper_out, hi)


def dict_lookup(
    batch: pa.Table,
    column: str,
    out: str,
    mapping: dict[str, str],
    unknown_sentinel_prefix: str = "!",
) -> pa.Table:
    """Large static string→string lookup with '!'+term sentinel for unmapped
    values.  Reference: the ~100-arm assay-term → data-modality match
    (``AssayActivityTransformations.transformAssayTermToDataModality``,
    AssayActivityTransformations.scala:56-164).

    Implemented as ``pc.index_in`` + ``take`` against Arrow arrays of the
    mapping — no Python per row; the mapping arrays are built once per call
    (wrap in functools.partial at pipeline build; for per-actor reuse put it
    in an actor's __init__).
    """
    keys = pa.array(list(mapping.keys()), type=pa.string())
    vals = pa.array(list(mapping.values()), type=pa.string())
    col = batch.column(column)
    idx = pc.index_in(col, keys)
    mapped = pc.take(vals, idx)
    sentinel = pc.binary_join_element_wise(unknown_sentinel_prefix, col, "")
    result = pc.if_else(pc.is_valid(idx), mapped, sentinel)
    result = pc.if_else(pc.is_valid(col), result, pa.nulls(batch.num_rows, pa.string()))
    return batch.append_column(out, result)


def case_when(
    batch: pa.Table, column: str, out: str, cases: list[tuple[str, str]], default: str
) -> pa.Table:
    """Small CASE WHEN chain on a string column (equality arms).
    Reference: ``FileTransformations.getFileType`` — output_category →
    {raw data→Sequence, alignment→Alignment, else Other}
    (FileTransformations.scala:20-25)."""
    col = batch.column(column)
    result = pa.array([default] * batch.num_rows, type=pa.string())
    for match, value in reversed(cases):
        result = pc.if_else(pc.equal(col, match), value, result)
    return batch.append_column(out, result)


def parse_paired_end(batch: pa.Table, column: str, out: str) -> pa.Table:
    """'1'/'2' → int, '1,2' and unknown → null (reference warns on unknown;
    we null them — FileTransformations.scala:101-109)."""
    col = batch.column(column)
    m = pc.extract_regex(col, r"^(?P<pe>[12])$")
    pe = pc.cast(pc.struct_field(m, [0]), pa.int64())
    return batch.append_column(out, pe)


def json_int_field(batch: pa.Table, column: str, key: str, out: str) -> pa.Table:
    """Extract an integer field out of a small JSON-object string column via
    regex (the raw side of the reference is schemaless JSON; this mirrors
    try-read with fallback, FileTransformations.scala:51-56)."""
    m = pc.extract_regex(batch.column(column), rf'"{key}":\s*(?P<v>-?\d+)')
    return batch.append_column(out, pc.cast(pc.struct_field(m, [0]), pa.int64()))


def audit_color(batch: pa.Table, level_col: str, out: str = "audit_color") -> pa.Table:
    """Max-audit-level → color label {40:yellow, 50:orange, 60:red, else white}.
    Reference: ``CommonTransformations.summarizeAudits``
    (CommonTransformations.scala:79-102)."""
    lvl = batch.column(level_col)
    color = pa.array(["white"] * batch.num_rows, type=pa.string())
    for level, name in [(40, "yellow"), (50, "orange"), (60, "red")]:
        color = pc.if_else(pc.equal(lvl, level), name, color)
    return batch.append_column(out, color)


def summarize_audits(
    batch: pa.Table,
    audit_col: str = "audit",
    color_out: str = "max_audit_flag",
    labels_out: str = "audit_labels",
) -> pa.Table:
    """The FULL audit fold: per record, max audit level → color label AND the
    distinct audit categories, sorted.  Reference:
    ``CommonTransformations.summarizeAudits`` (CommonTransformations.scala:
    79-102) — ENCODE groups audits by severity but each record repeats its
    level, so the fixture flattens the map-of-arrays to one
    ``list<struct<category: string, level: int64>>`` column.

    Vectorized: one ``list_flatten`` + parent-index segmented max for levels;
    labels via one sort over (parent, label) pairs + run-boundary dedup —
    no per-record Python.
    """
    import numpy as np

    col = batch.column(audit_col) if audit_col in batch.column_names else None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = batch.num_rows
    # JSON-read inputs where every audit list is empty/absent infer a
    # null-typed column — no struct kernels apply; no audits anywhere
    if (
        col is None
        or pa.types.is_null(col.type)
        or pa.types.is_null(col.type.value_type)
    ):
        return batch.append_column(
            color_out, pa.nulls(n, pa.string())
        ).append_column(
            labels_out, pa.array([[] for _ in range(n)], pa.list_(pa.string()))
        )
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    levels = pc.struct_field(flat, "level").to_numpy(zero_copy_only=False)
    labels = pc.struct_field(flat, "category")

    # --- max level per record (records with no audits keep level 0 → None)
    max_level = np.zeros(n, np.int64)
    has_audit = np.zeros(n, bool)
    if len(parents):
        np.maximum.at(max_level, parents, levels.astype(np.int64))
        has_audit[np.unique(parents)] = True
    color_map = {40: "yellow", 50: "orange", 60: "red"}
    colors = pa.array(
        [color_map.get(int(l), "white") if h else None for l, h in zip(max_level, has_audit)],
        pa.string(),
    )

    # --- distinct sorted categories per record
    if len(parents):
        codes = labels.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        uniq = labels.dictionary_encode().dictionary.to_pylist()
        # sort by (parent, label text) so per-record runs are label-sorted
        label_rank = np.argsort(np.argsort(np.array(uniq, dtype=object)))
        order = np.lexsort((label_rank[codes], parents))
        sp, sc = parents[order], codes[order]
        keep = np.ones(len(sp), bool)
        keep[1:] = (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1])
        sp, sc = sp[keep], sc[keep]
        counts = np.zeros(n, np.int64)
        np.add.at(counts, sp, 1)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        values = pa.DictionaryArray.from_arrays(
            pa.array(sc.astype(np.int32), pa.int32()), pa.array(uniq, pa.string())
        ).cast(pa.string())
        label_lists = pa.ListArray.from_arrays(pa.array(offsets), values)
    else:
        label_lists = pa.array([[] for _ in range(n)], pa.list_(pa.string()))

    batch = batch.append_column(color_out, colors)
    return batch.append_column(labels_out, label_lists)
