"""Extraction-shape BFS crawl over the FK graph (SURVEY.md §3.1):
Biosample → Donor / Library → Replicate → Experiment, with list-valued FKs
and an entity reachable via two paths fetched once."""

import pyarrow as pa
import ray.data

from encode_ingest_ray.pipelines.crawl import crawl


def _graph_fixture():
    biosamples = pa.table(
        {
            "at_id": ["B1", "B2", "B3"],
            "donor": ["D1", "D1", "D9"],  # D1 reachable twice -> fetched once
            "libraries": [["L1", "L2"], ["L2"], []],  # list-valued FK
        }
    )
    donors = pa.table({"at_id": ["D1", "D9", "Dx"], "name": ["d1", "d9", "unreached"]})
    libraries = pa.table({"at_id": ["L1", "L2", "Lx"], "replicate": ["R1", "R2", "Rx"]})
    replicates = pa.table({"at_id": ["R1", "R2", "Rx"], "experiment": ["E1", "E1", "Ex"]})
    experiments = pa.table({"at_id": ["E1", "Ex"], "assay": ["chip", "nope"]})

    tables = {
        "biosample": ray.data.from_arrow(biosamples),
        "donor": ray.data.from_arrow(donors),
        "library": ray.data.from_arrow(libraries),
        "replicate": ray.data.from_arrow(replicates),
        "experiment": ray.data.from_arrow(experiments),
    }
    id_columns = {t: "at_id" for t in tables}
    links = [
        ("biosample", "donor", "donor"),
        ("biosample", "libraries", "library"),
        ("library", "replicate", "replicate"),
        ("replicate", "experiment", "experiment"),
    ]
    seeds = {"biosample": ["B1", "B2"]}  # B3 not seeded
    return tables, id_columns, links, seeds


def test_bfs_crawl_reaches_linked_entities_once():
    tables, id_columns, links, seeds = _graph_fixture()
    out = crawl(tables, id_columns=id_columns, links=links, seeds=seeds)
    got = {t: sorted(out[t].to_pandas()["at_id"]) for t in out}
    assert got == {
        "biosample": ["B1", "B2"],
        "donor": ["D1"],  # D9 only via unseeded B3; Dx unlinked
        "library": ["L1", "L2"],
        "replicate": ["R1", "R2"],
        "experiment": ["E1"],
    }


def test_bloom_filter_semantics():
    from encode_ingest_ray.state.bloom import BloomFilter

    bf = BloomFilter(10_000, fp_rate=0.001)
    members = [f"id-{i}" for i in range(5000)]
    bf.add_many(members)
    assert bf.contains_many(members).all()  # zero false negatives
    others = [f"other-{i}" for i in range(5000)]
    fp = bf.contains_many(others).mean()
    assert fp < 0.01, fp
    # broadcast round-trip
    bf2 = BloomFilter.from_state(bf.state())
    assert bf2.contains_many(members).all()


def test_crawl_bloom_mode_matches_exact():
    tables, id_columns, links, seeds = _graph_fixture()
    exact = crawl(tables, id_columns, links, seeds)
    bloom = crawl(
        tables, id_columns, links, seeds,
        frontier_mode="bloom", bloom_capacity=10_000, bloom_fp_rate=1e-6,
    )
    for name in tables:
        e = sorted(exact[name].to_pandas()[id_columns[name]])
        b = sorted(bloom[name].to_pandas()[id_columns[name]])
        assert e == b, name
