"""Edge-population name parsing ≙ data_extraction.py:147-159."""

from __future__ import annotations

from sonata_neo4j_loader_spark.operators import parse


def test_parse_edge_population_name(spark):
    df = spark.createDataFrame(
        [
            ("NodeA__NodeB__chemical",),
            ("NodeB__NodeB__chemical",),
            ("default",),
            ("justone",),          # < 3 parts -> skipped (reference `continue`s)
            ("two__parts",),       # < 3 parts -> skipped
        ],
        "edge_population string",
    )
    got = {
        (r["edge_population"], r["source_pop"], r["target_pop"])
        for r in parse.parse_edge_population_name(df).collect()
    }
    assert got == {
        ("NodeA__NodeB__chemical", "NodeA", "NodeB"),
        ("NodeB__NodeB__chemical", "NodeB", "NodeB"),
        ("default", "hippocampus_neurons", "hippocampus_neurons"),
    }
