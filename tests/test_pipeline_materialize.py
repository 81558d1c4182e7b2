"""End-to-end: fixture pipeline -> materialized table family -> resume noop.

Proves the full stage-6 contract on real pipeline outputs: committed
tables round-trip the triple sets exactly, and an immediate re-run of the
materialize step writes nothing (every partition fingerprint-matched).
"""

from __future__ import annotations

import pytest

from sonata_neo4j_loader_spark.datagen import documents as dg
from sonata_neo4j_loader_spark.plans import pipeline
from sonata_neo4j_loader_spark.sinks import materialize as mat


@pytest.fixture(scope="module")
def outputs(spark):
    docs = dg.fixture_documents(spark)
    return pipeline.build_triples(
        spark, docs, dg.fixture_entities(spark), dg.fixture_alias_edges(spark)
    )


def test_materialize_roundtrip_and_resume(spark, outputs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kg_tables"))
    reports = pipeline.materialize_outputs(outputs, root, num_buckets=4)
    assert set(reports) == {
        "nodes",
        "attribute_triples",
        "synapse_triples",
        "aggregate_triples",
    }
    for rep in reports.values():
        assert rep.rows_written > 0

    # round-trip: committed attribute triples == in-memory plan output
    back = mat.read_materialized(spark, f"{root}/attribute_triples")
    want = sorted(map(tuple, outputs["attribute_triples"].collect()))
    assert sorted(map(tuple, back.select(*outputs["attribute_triples"].columns).collect())) == want

    # resume noop: identical input -> zero partitions rewritten anywhere
    reports2 = pipeline.materialize_outputs(outputs, root, num_buckets=4)
    assert all(r.rows_written == 0 for r in reports2.values())

    # lineage audit: manifest row counts match physical data
    for name in reports:
        assert mat.verify_against_manifest(spark, f"{root}/{name}").count() == 0


def test_dry_run_report_counts(outputs):
    # ≙ the reference's interactive edge-import gate
    # (data_extraction.py:125-134) replaced by a batch size report
    rep = pipeline.dry_run_report(outputs)
    assert rep["attribute_triples"] == 25  # 5 neurons × 5 attribute preds
    assert rep["synapse_triples"] == 16    # CREATE multiset survives intact
    assert rep["invariant_violations"] == 0
    assert rep["nodes"] == 18
    assert rep["aggregate_triples"] > 0
