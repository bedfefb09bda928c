"""FK-graph crawl — the extraction pipeline's shape, over Parquet tables.

The reference's extraction stage BFS-crawls the entity graph: start from
Biosamples, follow FK link fields outward hop by hop, dedup entities
reachable via multiple links (``ExtractionPipelineBuilder.buildPipeline``,
/root/reference/extraction/src/main/scala/org/broadinstitute/monster/encode/
extraction/ExtractionPipelineBuilder.scala:232-353; dedup :90-91).  The HTTP
client itself is out of scope (our source is already-landed tables); this
operator reproduces the *graph traversal semantics* natively:

* each hop = a broadcast semi-join (collected frontier ids filter the next
  table — reference analog: batched link queries, :111-127);
* link fields may be scalar or list-valued (list FKs are exploded, M11);
* an entity reachable twice is fetched once (D2 exact dedup — id sets).

Scale note: frontier *id sets* live on the driver (ids are tiny relative to
rows — the reference holds them as query batches too); each hop's row
selection is a streaming distributed filter.  Beyond driver RAM,
``frontier_mode="bloom"`` swaps the exact reached-sets for Bloom filters
(state/bloom.py): O(bits) memory, zero duplicate fetches, bounded
under-crawl at the configured false-positive rate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from encode_ingest_ray.stages.joins import semi_join_filter


def crawl(
    tables: dict[str, "ray.data.Dataset"],
    id_columns: dict[str, str],
    links: list[tuple[str, str, str]],
    seeds: dict[str, list],
    max_hops: int = 10,
    frontier_mode: str = "exact",
    bloom_capacity: int = 1_000_000,
    bloom_fp_rate: float = 0.001,
) -> dict[str, "ray.data.Dataset"]:
    """BFS over FK links.

    ``tables``: name -> Dataset; ``id_columns``: name -> its id column;
    ``links``: (src_table, fk_column, dst_table) — fk_column may hold one id
    or a list of ids; ``seeds``: table -> initial id list.

    ``frontier_mode="exact"`` keeps per-table reached-sets (small graphs);
    ``"bloom"`` keeps a BloomFilter per table instead — the per-HOP frontier
    still materializes (bounded by hop fan-out), but the cumulative
    reached-set never does.  Final row selection then filters each table by
    Bloom membership (broadcast once), instead of an id list.  Bloom false
    positives cut BOTH ways: during traversal an FP makes a genuinely-new id
    look already-seen (bounded under-crawl at the configured fp rate), and in
    the final membership filter an FP ADMITS a never-reached row (bounded
    over-report at the same rate).  Use ``"exact"`` when the output must be
    exactly the reachable set.

    Returns name -> Dataset of only the reachable rows (empty-reach tables
    map to a 0-row filter of the original).
    """
    import numpy as np

    from encode_ingest_ray.state.bloom import BloomFilter

    use_bloom = frontier_mode == "bloom"
    if use_bloom:
        reached_bloom: dict[str, BloomFilter] = {}
        touched: set[str] = set()

        def mark_new(dst: str, ids: list) -> list:
            bf = reached_bloom.get(dst)
            if bf is None:
                bf = reached_bloom[dst] = BloomFilter(bloom_capacity, bloom_fp_rate)
            ids = list(ids)
            fresh = [i for i, seen in zip(ids, bf.contains_many(ids)) if not seen]
            bf.add_many(fresh)
            touched.add(dst)
            return fresh

    else:
        reached: dict[str, set] = {}

        def mark_new(dst: str, ids: list) -> list:
            seen = reached.setdefault(dst, set())
            fresh = [i for i in ids if i not in seen]
            seen.update(fresh)
            return fresh

    frontier: dict[str, set] = {}
    for t, ids in seeds.items():
        frontier[t] = set(mark_new(t, list(dict.fromkeys(ids))))

    for _ in range(max_hops):
        next_frontier: dict[str, set] = {}
        for src, fk_col, dst in links:
            ids = frontier.get(src)
            if not ids:
                continue
            src_ds = tables[src]
            # fetch the frontier's rows, project the FK column, collect ids
            rows = semi_join_filter(src_ds, sorted(ids), id_columns[src])
            fk_values: set = set()
            for block in ray.get(rows.select_columns([fk_col]).to_arrow_refs()):
                col = block.column(fk_col)
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    col = pc.list_flatten(col.combine_chunks())
                fk_values.update(v for v in col.to_pylist() if v is not None)
            new = mark_new(dst, sorted(fk_values))
            if new:
                next_frontier.setdefault(dst, set()).update(new)
        if not next_frontier:
            break
        frontier = next_frontier

    out: dict[str, "ray.data.Dataset"] = {}
    for name, ds in tables.items():
        if use_bloom:
            if name not in reached_bloom:
                out[name] = semi_join_filter(ds, [""], id_columns[name])
                continue
            state_ref = ray.put(reached_bloom[name].state())
            id_col = id_columns[name]

            def bloom_filter_rows(t: pa.Table, _ref=state_ref, _col=id_col) -> pa.Table:
                bf = BloomFilter.from_state(ray.get(_ref))
                vals = t.column(_col).to_pylist()
                return t.filter(pa.array(np.asarray(bf.contains_many(vals))))

            out[name] = ds.map_batches(
                bloom_filter_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        else:
            ids = sorted(reached.get(name, set()))
            out[name] = semi_join_filter(ds, ids if ids else [""], id_columns[name])
    return out
