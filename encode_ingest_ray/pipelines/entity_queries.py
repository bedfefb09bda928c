"""Driver queries + exact DuckDB oracles for the entity-transform families
(SURVEY.md §2 M9, M5, M6) and the referential-integrity sweep.

The raw entity tables are DERIVED deterministically from the sf parquet
tables (the cdc_queries._DERIVE_SQL trick): both the Ray pipeline and the
oracle build the same raw records, so the comparison checks the TRANSFORM
semantics exactly.  List-valued outputs are encoded as sorted
comma-joined strings on both sides (the driver hash compares scalars).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from encode_ingest_ray.pipelines.registry import register
from encode_ingest_ray.stages.modality import ASSAY_TERM_TO_MODALITY
from encode_ingest_ray.stages.normalize import ENCODE_URL_PREFIX


def _read(sf_dir: str, table: str, columns=None):
    """Query-table read with size-aware parallelism: Ray's default heuristic
    targets 2 blocks per cpu, which shreds a single small parquet file into
    64+ tiny blocks and makes every later bucketed exchange pay ~50ms of
    per-block scheduling (measured 9s of a 15k-row join).  Target ~8MB per
    block instead, bounded to [1, 64]."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    blocks = max(1, min(64, os.path.getsize(path) // (8 << 20)))
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=blocks)


# ---------------------------------------------------------------------------
# M6 full ~100-arm modality table (AssayActivityTransformations.scala:56-164)
# ---------------------------------------------------------------------------
_TERMS = sorted(ASSAY_TERM_TO_MODALITY) + ["made-up assay", "another unknown"]
_N_TERMS = len(_TERMS)

_TERM_CASE = "CASE e.event_id % {n} {arms} END".format(
    n=_N_TERMS,
    arms=" ".join(
        "WHEN {i} THEN '{t}'".format(i=i, t=t.replace("'", "''"))
        for i, t in enumerate(_TERMS)
    ),
)
_MODALITY_CASE = "CASE term {arms} ELSE '!' || term END".format(
    arms=" ".join(
        "WHEN '{t}' THEN '{m}'".format(
            t=t.replace("'", "''"), m=m.replace("'", "''")
        )
        for t, m in ASSAY_TERM_TO_MODALITY.items()
    )
)

MODALITY_SQL = f"""
WITH terms AS (
  SELECT e.event_id, {_TERM_CASE} AS term FROM events e
)
SELECT event_id, term, {_MODALITY_CASE} AS modality FROM terms
"""


@register("modality_classify", MODALITY_SQL)
def modality_classify(sf_dir: str):
    """Every arm of the assay→modality table exercised over the events ids
    (unknown terms included → '!'-sentinel)."""
    import numpy as np

    from encode_ingest_ray.stages.modality import modality_lookup

    ds = _read(sf_dir, "events", ["event_id"])
    terms = np.array(_TERMS, dtype=object)

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        term = pa.array(terms[eid % _N_TERMS], pa.string())
        out = pa.table({"event_id": t.column("event_id"), "term": term})
        return modality_lookup(out, "term", "modality")

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# ---------------------------------------------------------------------------
# M5 FULL summarizeAudits (CommonTransformations.scala:79-102)
# ---------------------------------------------------------------------------
AUDIT_SUMMARY_SQL = """
WITH audits AS (
  SELECT user_id,
         event_type AS category,
         CASE WHEN value < 25 THEN 30
              WHEN value < 50 THEN 40
              WHEN value < 75 THEN 50
              ELSE 60 END AS level
  FROM events
)
SELECT user_id,
       CASE MAX(level) WHEN 40 THEN 'yellow' WHEN 50 THEN 'orange'
                       WHEN 60 THEN 'red' ELSE 'white' END AS max_audit_flag,
       string_agg(DISTINCT category, ',' ORDER BY category) AS audit_labels
FROM audits GROUP BY user_id
"""


@register("summarize_audits_full", AUDIT_SUMMARY_SQL)
def summarize_audits_full(sf_dir: str):
    """The full audit fold — max level → color AND distinct sorted category
    labels — with each user's events acting as that record's audit entries.
    One bucketed exchange assembles per-user audit lists; the vectorized
    ``summarize_audits`` kernel folds a whole bucket at once."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply
    from encode_ingest_ray.stages.normalize import summarize_audits

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = t.column("value")
        level = pc.if_else(
            pc.less(v, 25),
            pa.scalar(30, pa.int64()),
            pc.if_else(
                pc.less(v, 50),
                pa.scalar(40, pa.int64()),
                pc.if_else(pc.less(v, 75), pa.scalar(50, pa.int64()), pa.scalar(60, pa.int64())),
            ),
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "category": t.column("event_type"),
                "level": level,
            }
        )

    rows = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def fold_bucket(t: pa.Table) -> pa.Table:
        # assemble per-user list<struct<category,level>> then run the kernel
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending")])
        g = t.take(idx)
        uid = g.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        offsets = pa.array(np.r_[starts, len(uid)].astype(np.int32))
        entries = pa.StructArray.from_arrays(
            [g.column("category").combine_chunks(), g.column("level").combine_chunks()],
            names=["category", "level"],
        )
        audits = pa.ListArray.from_arrays(offsets, entries)
        per_user = pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "audit": audits,
            }
        )
        out = summarize_audits(per_user)
        return pa.table(
            {
                "user_id": out.column("user_id"),
                "max_audit_flag": out.column("max_audit_flag"),
                "audit_labels": pc.binary_join(out.column("audit_labels"), ","),
            }
        )

    return bucketed_groupby_apply(rows, ["user_id"], fold_bucket)


# ---------------------------------------------------------------------------
# M9 File transform (scalar arms) — FileTransformations.scala:91-152
# ---------------------------------------------------------------------------
FILE_ENTITY_SQL = f"""
WITH raw AS (
  SELECT '/files/F' || CAST(o_orderkey AS VARCHAR) || '/' AS at_id,
         CASE o_orderkey % 4 WHEN 0 THEN 'raw data' WHEN 1 THEN 'alignment'
                             WHEN 2 THEN 'reference' ELSE 'analysis' END AS output_category,
         CASE o_orderkey % 5 WHEN 0 THEN '1' WHEN 1 THEN '2'
                             WHEN 2 THEN '1,2' WHEN 3 THEN NULL ELSE 'x' END AS paired_end,
         CASE o_orderkey % 3 WHEN 0 THEN 'paired-ended'
                             WHEN 1 THEN 'single-ended' ELSE NULL END AS run_type,
         '/awards/' || o_orderpriority || '/' AS award,
         '/labs/' || o_orderstatus || '/' AS lab
  FROM orders
)
SELECT regexp_extract(at_id, '/[^/]+/([^/]+)/?$', 1) AS file_id,
       CASE output_category WHEN 'raw data' THEN 'Sequence'
                            WHEN 'alignment' THEN 'Alignment'
                            ELSE 'Other' END AS file_type,
       CASE paired_end WHEN '1' THEN 1 WHEN '2' THEN 2 ELSE NULL END AS paired_end_identifier,
       CASE WHEN run_type IS NULL THEN NULL
            ELSE CAST(run_type = 'paired-ended' AS BOOLEAN) END AS library_layout,
       '{ENCODE_URL_PREFIX}' || award AS award,
       '{ENCODE_URL_PREFIX}' || lab AS lab
FROM raw
"""


@register("entity_file_transform", FILE_ENTITY_SQL)
def entity_file_transform(sf_dir: str):
    """File-entity scalar arms (file-type classification, paired-end parse,
    run-type layout, URL prefixing) over file records derived from orders.
    List-valued arms (libraries, donors, xref) are pinned in
    tests/test_entities.py goldens."""
    import numpy as np

    from encode_ingest_ray.pipelines.entities import transform_file_batch

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderstatus"])
    cat = np.array(["raw data", "alignment", "reference", "analysis"], object)
    pe = np.array(["1", "2", "1,2", None, "x"], object)
    rt = np.array(["paired-ended", "single-ended", None], object)

    def derive_and_transform(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(k)
        raw = pa.table(
            {
                "at_id": pa.array([f"/files/F{v}/" for v in k], pa.string()),
                "output_category": pa.array(cat[k % 4], pa.string()),
                "paired_end": pa.array(pe[k % 5], pa.string()),
                "run_type": pa.array(rt[k % 3], pa.string()),
                "award": pc.binary_join_element_wise(
                    pa.scalar("/awards/"), t.column("o_orderpriority").combine_chunks(), pa.scalar("/"), ""
                ),
                "lab": pc.binary_join_element_wise(
                    pa.scalar("/labs/"), t.column("o_orderstatus").combine_chunks(), pa.scalar("/"), ""
                ),
                "submitted_by": pa.array(["/users/U/"] * n, pa.string()),
                "date_created": pa.nulls(n, pa.timestamp("us", "UTC")),
                "audit": pa.nulls(
                    n, pa.list_(pa.struct([("category", pa.string()), ("level", pa.int64())]))
                ),
            }
        )
        out = transform_file_batch(raw, {})
        return out.select(
            ["file_id", "file_type", "paired_end_identifier", "library_layout", "award", "lab"]
        )

    return ds.map_batches(
        derive_and_transform, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


UNIFIED_FILE_SQL = FILE_ENTITY_SQL.replace(
    "FROM orders", "FROM orders WHERE o_orderkey % 7 = 0"
)


@register("unified_transform_files", UNIFIED_FILE_SQL)
def unified_transform_files(sf_dir: str):
    """The UNIFIED transformation driver end-to-end
    (TransformationPipelineBuilder.scala:40-174): file records derived from
    orders are written as raw JSON-lines dumps (the reference's extraction
    layout), ``run_transformation_pipeline`` runs ALL 15 trees from those
    dumps to manifest-committed Parquet, and the committed ``file`` table is
    read back — same oracle as entity_file_transform, but the path under
    test is dumps → DAG → two-phase sink → read."""
    import hashlib
    import json as _json
    import shutil
    import tempfile

    import numpy as np

    from encode_ingest_ray.pipelines.transform_driver import (
        read_output_table,
        run_transformation_pipeline,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        "graft_unified_" + hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10],
    )
    shutil.rmtree(base, ignore_errors=True)
    files_dir = os.path.join(base, "raw", "Files")
    os.makedirs(files_dir, exist_ok=True)

    cat = np.array(["raw data", "alignment", "reference", "analysis"], object)
    pe = np.array(["1", "2", "1,2", None, "x"], object)
    rt = np.array(["paired-ended", "single-ended", None], object)

    def write_dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        k = t.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        pri = t.column("o_orderpriority").to_pylist()
        st = t.column("o_orderstatus").to_pylist()
        path = os.path.join(files_dir, f"part-{int(k.min()):010d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for kk, p, s in zip(k, pri, st):
                f.write(
                    _json.dumps(
                        {
                            "at_id": f"/files/F{kk}/",
                            "output_category": cat[kk % 4],
                            "paired_end": pe[kk % 5],
                            "run_type": rt[kk % 3],
                            "award": f"/awards/{p}/",
                            "lab": f"/labs/{s}/",
                            "submitted_by": "/users/U/",
                            "date_created": "2020-01-01T00:00:00Z",
                        }
                    )
                    + "\n"
                )
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderstatus"])
    # a 1-in-7 systematic subset: the query tests the dumps→DAG→sink PATH,
    # not bulk JSON throughput (entity_file_transform covers the full table)
    def subset(t: pa.Table) -> pa.Table:
        kk = t.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(kk % 7 == 0))

    ds = ds.map_batches(
        subset, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    ds.map_batches(
        write_dump, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()

    run_transformation_pipeline(
        os.path.join(base, "raw"), os.path.join(base, "tables"), overwrite=True
    )
    out = read_output_table(os.path.join(base, "tables"), "file")
    return out.map_batches(
        lambda t: t.select(
            ["file_id", "file_type", "paired_end_identifier", "library_layout",
             "award", "lab"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# M:N antibody-target resolution — AntibodyTransformations.scala:11-40,
# TransformationPipelineBuilder.scala:271-319
# ---------------------------------------------------------------------------
ANTIBODY_SQL = f"""
WITH targets AS (
  SELECT '/targets/T' || CAST(n_nationkey AS VARCHAR) || '/' AS at_id,
         CASE WHEN n_nationkey % 2 = 0 THEN '/organisms/human/'
              ELSE '/organisms/mouse/' END AS organism,
         'TGT-' || n_name AS label
  FROM nation WHERE n_nationkey < 7
),
pairs AS (
  SELECT c_custkey,
         '/targets/T' || CAST(c_custkey % 7 AS VARCHAR) || '/' AS tgt FROM customer
  UNION ALL
  SELECT c_custkey,
         '/targets/T' || CAST((c_custkey * 3) % 7 AS VARCHAR) || '/' AS tgt FROM customer
),
resolved AS (
  SELECT p.c_custkey, t.organism, t.label
  FROM pairs p JOIN targets t ON p.tgt = t.at_id
)
SELECT 'AB' || CAST(c.c_custkey AS VARCHAR) AS antibody_id,
       (SELECT MIN(label) FROM resolved r
        WHERE r.c_custkey = c.c_custkey AND r.organism = '/organisms/human/') AS target,
       '{ENCODE_URL_PREFIX}' || '/sources/S' || CAST(c.c_nationkey AS VARCHAR) || '/' AS source
FROM customer c
"""


@register("antibody_m2n", ANTIBODY_SQL)
def antibody_m2n(sf_dir: str):
    """The M:N explode→exchange-join→group-rejoin, end to end and fully
    distributed (no side broadcast): antibodies derived from customer,
    targets from nation; human-target label resolution."""
    from encode_ingest_ray.pipelines.entities import transform_antibodies

    customers = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nations = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    def derive_antibody(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_pylist()
        nk = t.column("c_nationkey").to_pylist()
        n = len(k)
        return pa.table(
            {
                "at_id": pa.array([f"/antibodies/AB{v}/" for v in k], pa.string()),
                "targets": pa.array(
                    [[f"/targets/T{v % 7}/", f"/targets/T{(v * 3) % 7}/"] for v in k],
                    pa.list_(pa.string()),
                ),
                "date_created": pa.nulls(n, pa.timestamp("us", "UTC")),
                "source": pa.array([f"/sources/S{v}/" for v in nk], pa.string()),
                "host_organism": pa.array(["/organisms/rabbit/"] * n, pa.string()),
                "award": pa.array(["/awards/A/"] * n, pa.string()),
                "lab": pa.array(["/labs/L/"] * n, pa.string()),
                "product_id": pa.array(["p"] * n, pa.string()),
            }
        )

    def derive_targets(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t.column("n_nationkey"), 7))
        nk = keep.column("n_nationkey").to_pylist()
        names = keep.column("n_name").to_pylist()
        return pa.table(
            {
                "at_id": pa.array([f"/targets/T{v}/" for v in nk], pa.string()),
                "organism": pa.array(
                    [
                        "/organisms/human/" if v % 2 == 0 else "/organisms/mouse/"
                        for v in nk
                    ],
                    pa.string(),
                ),
                "label": pa.array([f"TGT-{m}" for m in names], pa.string()),
            }
        )

    ab = customers.map_batches(
        derive_antibody, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tg = nations.map_batches(
        derive_targets, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    out = transform_antibodies(ab, tg)
    return out.map_batches(
        lambda t: t.select(["antibody_id", "target", "source"]),
        batch_format="pyarrow",
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# Referential-integrity sweep (hack/check_for_missing_files.sh:16-30 analog)
# ---------------------------------------------------------------------------
RI_SWEEP_SQL = """
WITH ev AS (
  SELECT 'u' || CAST(user_id AS VARCHAR)                       AS conv_id,
         CASE WHEN event_type = 'signup' AND user_id % 7 <> 0 THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END                                AS op
  FROM events
)
SELECT d.conv_id, COUNT(*) AS n_dangling
FROM (SELECT conv_id FROM ev WHERE op <> 'insert') d
LEFT JOIN (SELECT DISTINCT conv_id FROM ev WHERE op = 'insert') i
  ON d.conv_id = i.conv_id
WHERE i.conv_id IS NULL
GROUP BY d.conv_id
"""


@register("ri_sweep_orphan_refs", RI_SWEEP_SQL)
def ri_sweep_orphan_refs(sf_dir: str):
    """Referential-integrity sweep over the derived CDC stream: updates or
    deletes for conversations that were never inserted (the reference's
    check_for_missing_files cross-check, as an anti-join + count)."""
    import numpy as np

    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        etype = t.column("event_type")
        # users ≡ 0 (mod 7) lose their inserts — simulated dropped parents
        uid = t.column("user_id")
        is_insert = pc.and_(
            pc.equal(etype, "signup"),
            pc.not_equal(pc.subtract(uid, pc.multiply(pc.divide(uid, 7), 7)), 0),
        )
        op = pc.if_else(
            is_insert,
            pa.scalar("insert"),
            pc.if_else(pc.equal(etype, "error"), pa.scalar("delete"), pa.scalar("update")),
        )
        conv = pc.binary_join_element_wise(
            pa.scalar("u"), pc.cast(t.column("user_id"), pa.string()), ""
        )
        return pa.table({"conv_id": conv, "op": op})

    rows = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def sweep_bucket(t: pa.Table) -> pa.Table:
        is_ins = pc.equal(t.column("op"), pa.scalar("insert"))
        inserted = set(t.filter(is_ins).column("conv_id").to_pylist())
        refs = t.filter(pc.invert(is_ins))
        conv = np.array(refs.column("conv_id").to_pylist(), object)
        mask = np.array([c not in inserted for c in conv], bool)
        dangling = conv[mask]
        if not len(dangling):
            return pa.table(
                {"conv_id": pa.array([], pa.string()), "n_dangling": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(dangling, return_counts=True)
        return pa.table(
            {
                "conv_id": pa.array(list(uniq), pa.string()),
                "n_dangling": pa.array(counts, pa.int64()),
            }
        )

    return bucketed_groupby_apply(rows, ["conv_id"], sweep_bucket)


# ---------------------------------------------------------------------------
# J7 getLibrariesByExperiment (TransformationPipelineBuilder.scala:464-486)
# ---------------------------------------------------------------------------
LIBRARIES_BY_EXPERIMENT_SQL = """
WITH replicates AS (
  SELECT '/experiments/E' || CAST(l_orderkey % 500 AS VARCHAR) || '/' AS experiment,
         '/libraries/L' || CAST(l_partkey % 200 AS VARCHAR) || '/' AS library
  FROM lineitem
),
libraries AS (
  SELECT '/libraries/L' || CAST(p_partkey AS VARCHAR) || '/' AS at_id
  FROM part WHERE p_partkey < 150
)
SELECT regexp_extract(r.experiment, '/[^/]+/([^/]+)/?$', 1) AS experiment_id,
       COUNT(*) AS n_libraries,
       string_agg(regexp_extract(l.at_id, '/[^/]+/([^/]+)/?$', 1), ','
                  ORDER BY regexp_extract(l.at_id, '/[^/]+/([^/]+)/?$', 1)) AS library_ids
FROM replicates r JOIN libraries l ON r.library = l.at_id
GROUP BY experiment_id
"""


@register("libraries_by_experiment", LIBRARIES_BY_EXPERIMENT_SQL)
def libraries_by_experiment(sf_dir: str):
    """J7 as a first-class distributed query: replicates keyed by library →
    join libraries (exchange 1 on the library key, inner — missing libraries
    drop, the reference's flatMap-over-Option) → group by experiment
    (exchange 2), keeping multiplicity.  Raw tables derived from
    lineitem/part so DuckDB runs the identical plan."""
    import numpy as np

    from encode_ingest_ray.pipelines.entities import transform_id
    from encode_ingest_ray.stages.aggregate import bucketed_groupby_apply

    replicates = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    parts = _read(sf_dir, "part", ["p_partkey"])

    def derive_replicates(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array([f"/libraries/L{v % 200}/" for v in pk], pa.string()),
                "experiment": pa.array(
                    [f"/experiments/E{v % 500}/" for v in ok], pa.string()
                ),
                "is_lib": pa.array(np.zeros(len(ok), bool)),
            }
        )

    def derive_libraries(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t.column("p_partkey"), 150))
        pk = keep.column("p_partkey").to_pylist()
        return pa.table(
            {
                "key": pa.array([f"/libraries/L{v}/" for v in pk], pa.string()),
                "experiment": pa.nulls(len(pk), pa.string()),
                "is_lib": pa.array(np.ones(len(pk), bool)),
            }
        )

    reps = replicates.map_batches(
        derive_replicates, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    libs = parts.map_batches(
        derive_libraries, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        is_lib = t.column("is_lib")
        present = set(t.filter(is_lib).column("key").to_pylist())
        reps_rows = t.filter(pc.invert(is_lib))
        keys = reps_rows.column("key").to_pylist()
        exps = reps_rows.column("experiment").to_pylist()
        keep_exp, keep_lib = [], []
        for k, e in zip(keys, exps):
            if k in present:  # inner join: replicate rows without a library drop
                keep_exp.append(e)
                keep_lib.append(transform_id(k))
        return pa.table(
            {
                "experiment": pa.array(keep_exp, pa.string()),
                "lib_id": pa.array(keep_lib, pa.string()),
            }
        )

    joined = bucketed_groupby_apply(libs.union(reps), ["key"], join_bucket)

    def group_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("experiment", "ascending"), ("lib_id", "ascending")]
        )
        g = t.take(idx)
        exp = g.column("experiment").combine_chunks()
        codes = exp.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        offsets = pa.array(np.r_[starts, g.num_rows].astype(np.int32))
        lib_lists = pa.ListArray.from_arrays(offsets, g.column("lib_id").combine_chunks())
        return pa.table(
            {
                "experiment_id": pa.array(
                    [transform_id(v) for v in exp.take(pa.array(starts)).to_pylist()],
                    pa.string(),
                ),
                "n_libraries": pa.array(
                    np.diff(np.r_[starts, g.num_rows]), pa.int64()
                ),
                "library_ids": pc.binary_join(lib_lists, ","),
            }
        )

    return bucketed_groupby_apply(joined, ["experiment"], group_bucket)


# ---------------------------------------------------------------------------
# S4 partitioned SQL source (FileBackfillGenerator.scala:16-74 analog)
# ---------------------------------------------------------------------------
DBAPI_SCAN_SQL = """
SELECT event_id, user_id, event_type
FROM events WHERE value >= 50 ORDER BY event_id
"""


def _duck_events_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


@register("dbapi_source_scan", DBAPI_SCAN_SQL)
def dbapi_source_scan(sf_dir: str):
    """S4: the partitioned DB-API source — key-range planning on the driver,
    per-partition range-scan tasks each with their own connection, column
    pruning + predicate pushdown (sources/dbapi.py; DuckDB backend)."""
    from functools import partial

    from encode_ingest_ray.sources.dbapi import read_dbapi

    return read_dbapi(
        partial(_duck_events_connection, sf_dir),
        "events",
        key="event_id",
        columns=["event_id", "user_id", "event_type"],
        predicate="value >= 50",
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# explorer file-backfill (FileBackfillGenerator.scala:16-74)
# ---------------------------------------------------------------------------
FILE_BACKFILL_SQL = """
WITH files AS (
  SELECT doc_id AS file_id,
         CASE doc_id % 3 WHEN 0 THEN 'fastq' WHEN 1 THEN 'bam' ELSE 'bed' END AS file_format,
         CASE doc_id % 2 WHEN 0 THEN 'Raw Data' ELSE 'peak calls' END AS data_type,
         md5(text) AS md5sum,
         'gs://bucket/run' || CAST(doc_id % 10 AS VARCHAR) || '/f' || CAST(doc_id AS VARCHAR) || '.dat' AS file_gs_path,
         doc_id % 4 <> 0 AS file_available_in_gcs
  FROM documents
)
SELECT file_gs_path AS "sourcePath",
       '/' || lower(regexp_replace(data_type, '\\s+', '-', 'g')) || '/' || file_format
           || '/' || md5sum || '/' || regexp_extract(file_gs_path, '([^/]*)$', 1) AS "targetPath"
FROM files WHERE file_available_in_gcs
"""


def _duck_files_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW files AS
            SELECT doc_id AS file_id,
                   CASE doc_id % 3 WHEN 0 THEN 'fastq' WHEN 1 THEN 'bam' ELSE 'bed' END AS file_format,
                   CASE doc_id % 2 WHEN 0 THEN 'Raw Data' ELSE 'peak calls' END AS data_type,
                   md5(text) AS md5sum,
                   'gs://bucket/run' || CAST(doc_id % 10 AS VARCHAR) || '/f' || CAST(doc_id AS VARCHAR) || '.dat' AS file_gs_path,
                   doc_id % 4 <> 0 AS file_available_in_gcs
            FROM read_parquet('{sf_dir}/documents.parquet')"""
    )
    return con


@register("file_backfill_requests", FILE_BACKFILL_SQL)
def file_backfill_requests(sf_dir: str):
    """The explorer backfill end to end: partitioned DB scan (predicate
    pushdown on availability) → vectorized ingest-request mapper."""
    from functools import partial

    from encode_ingest_ray.pipelines.backfill import file_backfill

    return file_backfill(
        partial(_duck_files_connection, sf_dir),
        table="files",
        key="file_id",
        predicate="file_available_in_gcs",
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# S1 crawl reachability as a query (BFS semantics == SQL join closure)
# ---------------------------------------------------------------------------
CRAWL_REACH_SQL = """
WITH seed_orders AS (
  SELECT * FROM orders WHERE o_orderkey % 97 = 0
),
reached_customers AS (
  SELECT DISTINCT c.* FROM customer c JOIN seed_orders o ON c.c_custkey = o.o_custkey
),
reached_nations AS (
  SELECT DISTINCT n.* FROM nation n JOIN reached_customers c ON n.n_nationkey = c.c_nationkey
)
SELECT 'orders' AS tbl, COUNT(*) AS n_reached FROM seed_orders
UNION ALL SELECT 'customer', COUNT(*) FROM reached_customers
UNION ALL SELECT 'nation', COUNT(*) FROM reached_nations
"""


@register("crawl_reachability", CRAWL_REACH_SQL)
def crawl_reachability(sf_dir: str):
    """The extraction BFS crawl (pipelines/crawl.py) over the TPC-H FK graph
    — orders seeds follow o_custkey to customers, then c_nationkey to
    nations; reached-row counts carry an exact join-closure oracle."""
    from encode_ingest_ray.pipelines.crawl import crawl

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    seeds = [
        r["o_orderkey"]
        for t in ray.get(
            orders.map_batches(
                lambda t: t.filter(
                    pc.equal(
                        pc.subtract(
                            t.column("o_orderkey"),
                            pc.multiply(pc.divide(t.column("o_orderkey"), 97), 97),
                        ),
                        0,
                    )
                ).select(["o_orderkey"]),
                batch_format="pyarrow",
                batch_size=None,
            ).to_arrow_refs()
        )
        for r in t.to_pylist()
    ]
    tables = {
        "orders": orders,
        "customer": _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "nation": _read(sf_dir, "nation", ["n_nationkey"]),
    }
    out = crawl(
        tables,
        id_columns={"orders": "o_orderkey", "customer": "c_custkey", "nation": "n_nationkey"},
        links=[
            ("orders", "o_custkey", "customer"),
            ("customer", "c_nationkey", "nation"),
        ],
        seeds={"orders": seeds},
    )
    rows = [(name, out[name].count()) for name in ("orders", "customer", "nation")]
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "tbl": pa.array([r[0] for r in rows], pa.string()),
                "n_reached": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
