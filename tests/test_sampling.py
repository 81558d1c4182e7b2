"""Sampling semantics: deterministic under any partitioning, config parity
with the reference's NODE_PROPORTION / EDGE_PROPORTION / node-set env knobs
(main.py:16-18), and edge survival = both endpoints sampled.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.datagen import documents as dg
from sonata_neo4j_loader_spark.operators import sampling
from sonata_neo4j_loader_spark.plans import pipeline


def test_hash_sample_deterministic_across_partitioning(spark):
    df = spark.range(100_000).select(
        F.format_string("neuron:P:%d", F.col("id")).alias("neuron_id")
    )
    a = sampling.sample_by_hash(df.repartition(3), "neuron_id", 0.25)
    b = sampling.sample_by_hash(df.repartition(41, "neuron_id"), "neuron_id", 0.25)
    ra = sorted(r.neuron_id for r in a.collect())
    assert ra == sorted(r.neuron_id for r in b.collect())
    # Bernoulli-ish: fraction within 2% absolute of target
    assert abs(len(ra) / 100_000 - 0.25) < 0.02


def test_proportion_edges(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    assert sampling.sample_by_hash(df, "k", 1.0).count() == 100
    assert sampling.sample_by_hash(df, "k", 0.0).count() == 0


def test_node_set_restricts_triples(spark):
    # ≙ reference node_set=Mosaic_A (population NodeA only): every subject
    # belongs to NodeA and cross-population synapses disappear
    docs = dg.fixture_documents(spark)
    cfg = pipeline.PipelineConfig(node_set_pops=["NodeA"])
    out = pipeline.build_triples(
        spark, docs, dg.fixture_entities(spark), dg.fixture_alias_edges(spark), cfg
    )
    attr_subjects = {r.subj for r in out["attribute_triples"].select("subj").collect()}
    assert attr_subjects and all(s.startswith("neuron:NodeA:") for s in attr_subjects)
    syn = out["synapse_triples"].select("subj", "obj").collect()
    assert syn and all(
        r.subj.startswith("neuron:NodeA:") and r.obj.startswith("neuron:NodeA:")
        for r in syn
    )


def test_edge_survival_requires_both_endpoints(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("c", "d")], "subj string, obj string"
    )
    neurons = spark.createDataFrame([("a",), ("b",), ("d",)], "neuron_id string")
    got = {
        (r.subj, r.obj)
        for r in sampling.restrict_edges_to_neurons(edges, neurons).collect()
    }
    assert got == {("a", "b")}
