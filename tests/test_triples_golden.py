"""End-to-end golden test: fixture documents -> exact reference triple sets.

The expectation (FIXTURES.md §5) is derived from the reference's Cypher
semantics, computed independently in plain Python
(``datagen/fixture.golden_triples``) — P/R must be 1.0 at fixture scale.
"""

from __future__ import annotations

import pytest

from sonata_neo4j_loader_spark.datagen import documents as dg
from sonata_neo4j_loader_spark.datagen import fixture
from sonata_neo4j_loader_spark.plans import pipeline


@pytest.fixture(scope="module", params=["arrow", "native"])
def outputs(request, spark):
    docs = dg.fixture_documents(spark)
    cfg = pipeline.PipelineConfig(mention_impl=request.param)
    return pipeline.build_triples(
        spark, docs, dg.fixture_entities(spark), dg.fixture_alias_edges(spark), cfg
    )


def _collect_triples(df):
    return [(r["subj"], r["pred"], r["obj"]) for r in df.collect()]


def test_span_invariant_holds(outputs):
    assert outputs["invariant_violations"].count() == 0


def test_merge_predicates_exact(outputs):
    golden = fixture.golden_triples()
    got = _collect_triples(outputs["attribute_triples"])
    for pred in ["HAS_MTYPE", "HAS_SCLASS", "HAS_ETYPE", "BELONGS_TO", "HAS_MORPHOLOGY"]:
        expected = golden[pred]
        actual = {t for t in got if t[1] == pred}
        assert actual == expected, f"{pred}: {actual ^ expected}"


def test_synapses_multiset_exact(outputs):
    golden = fixture.golden_triples()
    actual = sorted(_collect_triples(outputs["synapse_triples"]))
    assert actual == golden["SYNAPSES_ONTO"]


def test_precision_no_noise_entities(outputs):
    # Noise docs must contribute zero triples ("NodeZ#9" is not in the dict).
    triples = _collect_triples(outputs["attribute_triples"]) + _collect_triples(
        outputs["synapse_triples"]
    )
    assert all("NodeZ" not in s and "NodeQ" not in o for s, _p, o in triples)


def test_canonicalization_folds_aliases(outputs):
    # Alias docs (lowercase surfaces) must land on canonical ids: no
    # lowercase population/neuron entities anywhere in the output.
    for s, _p, o in _collect_triples(outputs["attribute_triples"]):
        assert "nodea" not in s and "nodeb" not in s, s
        assert "nodea" not in o and "nodeb" not in o, o


def test_node_table_labels(outputs):
    rows = {(r["entity_id"], r["label"]) for r in outputs["nodes"].collect()}
    assert ("neuron:NodeA:0", "Neuron") in rows
    assert ("mtype:L4_PC", "MType") in rows
    assert ("pop:NodeA", "Population") in rows
    assert ("sclass:INH", "SClass") in rows
    # canonicalization: variant ids folded away
    assert not any(e.startswith("neuron:nodea") for e, _ in rows)


def test_node_properties_payload(outputs):
    """≙ ``SET n += node`` / ``SET p += population``
    (neo4j_operations.py:339,316): every discovered attribute lands on the
    node — layer/region (plain property spans), morphology, mtype, etype,
    synapse_class, population_name. Runs under both mention impls, so
    arrow/native parity of the node_attrs extraction is covered too."""
    props = {r["entity_id"]: r["properties"] for r in outputs["node_properties"].collect()}
    for pop, nid, mtype, etype, sclass, layer, region, morph in fixture.NEURONS:
        p = props[fixture.neuron_entity(pop, nid)]
        assert p == {
            "layer": layer,
            "region": region,
            "morphology": morph,
            "mtype": mtype,
            "etype": etype,
            "synapse_class": sclass,
            "population_name": pop,
        }
    pop_sizes: dict[str, int] = {}
    for pop, *_ in fixture.NEURONS:
        pop_sizes[pop] = pop_sizes.get(pop, 0) + 1
    for pop, size in pop_sizes.items():
        assert props[f"pop:{pop}"] == {"name": pop, "size": str(size)}
    # the nodes table carries the same map
    node_rows = {r["entity_id"]: r for r in outputs["nodes"].collect()}
    assert node_rows["neuron:NodeA:0"]["properties"]["layer"] == "LA"
    assert node_rows["pop:NodeA"]["properties"]["size"] == "3"


def test_node_properties_on_synthetic_corpus(spark):
    """The properties path must also work on the distributed generator
    (the 10^12-doc shape), not just the fixture: every synthetic neuron
    node carries the full attribute map with the hash-derived values the
    generator grammar promises."""
    from pyspark.sql import functions as F

    docs = dg.synthetic_documents(
        spark, n_node_docs=200, n_edge_docs=50, n_noise_docs=20,
        n_populations=2, neurons_per_pop=50,
    )
    out = pipeline.build_triples(
        spark,
        docs,
        dg.synthetic_entities(spark, n_populations=2, neurons_per_pop=50),
        dg.synthetic_alias_edges(spark, n_populations=2, neurons_per_pop=50),
    )
    rows = out["node_properties"].where(
        F.col("entity_id").startswith("neuron:")
    ).collect()
    assert len(rows) == 100  # 2 pops x 50 neurons, aliases folded
    for r in rows:
        p = r["properties"]
        assert set(p) == {
            "layer", "region", "morphology", "mtype", "etype",
            "synapse_class", "population_name",
        }, r["entity_id"]
        assert p["layer"].startswith("L") and p["region"].startswith("R")
        assert p["population_name"] == r["entity_id"].split(":")[1]


def test_aggregated_synapse_mtype(outputs):
    golden = fixture.golden_aggregates("mtype")
    agg = next(
        df
        for df in outputs["aggregate_triples"]
        if df.select("pred").first()["pred"] == "AGGREGATED_SYNAPSE_MTYPE"
    )
    rows = {(r["subj"], r["obj"]): r for r in agg.collect()}
    assert set(rows) == {
        (f"mtype:{a}", f"mtype:{b}") for a, b in golden
    }
    for (a, b), stats in golden.items():
        r = rows[(f"mtype:{a}", f"mtype:{b}")]
        assert r["n_synapses"] == stats["n_synapses"]
        assert r["avg_conductance"] == pytest.approx(stats["avg_conductance"], abs=1e-9)
        assert r["avg_delay"] == pytest.approx(stats["avg_delay"], abs=1e-9)


def test_aggregated_synapse_sclass(outputs):
    golden = fixture.golden_aggregates("synapse_class")
    agg = next(
        df
        for df in outputs["aggregate_triples"]
        if df.select("pred").first()["pred"] == "AGGREGATED_SYNAPSE_SCLASS"
    )
    rows = {(r["subj"], r["obj"]): r for r in agg.collect()}
    assert set(rows) == {(f"sclass:{a}", f"sclass:{b}") for a, b in golden}
    # FIXTURES.md §5: exactly EXC→INH, INH→EXC, EXC→EXC
    assert len(rows) == 3


def test_rich_aggregates(outputs):
    golden = fixture.golden_aggregates("mtype")
    agg = next(
        df
        for df in outputs["aggregate_triples"]
        if df.select("pred").first()["pred"] == "AGGREGATED_SYNAPSE_RICH_MTYPE"
    )
    rows = {(r["subj"], r["obj"]): r for r in agg.collect()}
    for (a, b), stats in golden.items():
        r = rows[(f"mtype:{a}", f"mtype:{b}")]
        for m in fixture.EDGE_PROPS:
            assert r[f"avg_{m}"] == pytest.approx(stats[f"avg_{m}"], abs=1e-9), m
        dist = r["afferent_distribution"]
        assert dist == pytest.approx(stats["afferent_distribution"])


def test_pair_first_attr_equals_self_join_shape(spark):
    # the pair-first attribute branch (pairing inside the extraction row,
    # zero-shuffle) must be row-identical to the doc_id self-join
    # formulation on a corpus with aliases, media refs, multi-neuron docs
    # and noise — both on fixture docs and a synthetic slice
    from pyspark.sql import functions as F

    from sonata_neo4j_loader_spark.operators import (
        canonicalize, linking, mentions, parse, triples,
    )

    for docs, entities, aliases in [
        (
            dg.fixture_documents(spark),
            dg.fixture_entities(spark),
            dg.fixture_alias_edges(spark),
        ),
        (
            dg.synthetic_documents(spark, 400, 500, 100, n_populations=4,
                                   neurons_per_pop=50),
            dg.synthetic_entities(spark, n_populations=4, neurons_per_pop=50),
            dg.synthetic_alias_edges(spark, n_populations=4, neurons_per_pop=50),
        ),
    ]:
        parsed = parse.parse_documents(docs).where(F.col("spans_valid"))
        ext = mentions.extract_documents(parsed)
        mapping = canonicalize.connected_components(aliases)

        linked = canonicalize.apply_canonical_mapping(
            linking.link_mentions(mentions.mentions_from_extracted(ext), entities),
            mapping, "entity_id",
        )
        old = {(r.subj, r.pred, r.obj)
               for r in triples.neuron_attribute_triples(linked).collect()}

        pairs = mentions.attribute_pairs_from_extracted(ext)
        pairs = linking.link_mentions(
            pairs.withColumnRenamed("subj_surface", "surface"), entities
        ).withColumnRenamed("entity_id", "subj").drop("surface", "entity_type")
        pairs = linking.link_mentions(
            pairs.withColumnRenamed("obj_surface", "surface"), entities
        ).withColumnRenamed("entity_id", "obj").drop("surface", "entity_type")
        pairs = canonicalize.apply_canonical_mapping(pairs, mapping, "subj")
        pairs = canonicalize.apply_canonical_mapping(pairs, mapping, "obj")
        new = {(r.subj, r.pred, r.obj)
               for r in triples.neuron_attribute_triples_from_pairs(pairs).collect()}

        assert new == old
        assert len(new) > 0
