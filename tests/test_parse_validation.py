"""Malformed-document quarantine: bad spans never corrupt good triples.

``parse_documents`` demands offsets dense+unique from 0; documents that
fail are excluded from every triple path and surface in the
``invariant_violations`` audit (they exist in the input but not in the
parsed output — the full-outer fingerprint compare flags exactly them).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.datagen import documents as dg
from sonata_neo4j_loader_spark.plans import pipeline

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text, offset):
    return {"kind": kind, "text": text, "media_ref": "", "offset": offset}


@pytest.fixture(scope="module")
def malformed(spark):
    rows = [
        ("bad-dup-offsets", [_span("text", "neuron NodeA#0", 0), _span("text", "x", 0)]),
        ("bad-gap-offsets", [_span("text", "neuron NodeA#1", 0), _span("text", "y", 2)]),
        ("bad-one-based", [_span("text", "neuron NodeB#0", 1), _span("text", "z", 2)]),
        ("bad-empty", []),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def test_malformed_docs_quarantined(spark, malformed):
    docs = dg.fixture_documents(spark).unionByName(malformed)
    out = pipeline.build_triples(
        spark, docs, dg.fixture_entities(spark), dg.fixture_alias_edges(spark)
    )
    # triples identical to the clean-corpus goldens: the malformed docs
    # mention real entities but must contribute nothing
    assert out["attribute_triples"].count() == 25
    assert out["synapse_triples"].count() == 16
    # ...and the audit names exactly the quarantined docs
    flagged = {r.doc_id for r in out["invariant_violations"].collect()}
    assert flagged == {"bad-dup-offsets", "bad-gap-offsets", "bad-one-based", "bad-empty"}


def test_parse_documents_idempotent_on_parsed_frame(spark):
    # re-parsing an already-parsed frame must replace the derived columns
    # (withColumn semantics), not emit ambiguous duplicates
    from sonata_neo4j_loader_spark.datagen import documents as dg
    from sonata_neo4j_loader_spark.operators import parse

    once = parse.parse_documents(dg.fixture_documents(spark))
    twice = parse.parse_documents(once)
    assert sorted(twice.columns) == sorted(once.columns)
    a = {r.doc_id: r.doc_text for r in once.collect()}
    b = {r.doc_id: r.doc_text for r in twice.collect()}
    assert a == b
