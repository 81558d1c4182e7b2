"""Skew handling: salted dictionary join under a Zipfian surface distribution.

SURVEY.md §4 custom item 1 — hot surface forms (a handful of mtype labels
appearing in a large fraction of documents) skew a plain sort-merge join.
The salted strategy must (a) return exactly the broadcast strategy's rows,
(b) actually spread a hot key over all salt buckets, (c) plan a shuffle
join (not a broadcast) when the dictionary exceeds the broadcast budget.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import linking


@pytest.fixture(scope="module")
def zipf_mentions(spark):
    # ~82% of all mentions hit one hot key (L4_PC), the rest spread thin —
    # the shape that makes one reducer the straggler in an unsalted join
    n = 20_000
    return (
        spark.range(n)
        .select(
            F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
            F.when(F.col("id") % 11 < 9, F.lit("L4_PC"))
            .when(F.col("id") % 11 == 9, F.format_string("L%d_X", F.col("id") % 5))
            .otherwise(F.format_string("Pop%03d#%d", F.col("id") % 4, F.col("id") % 97))
            .alias("surface"),
        )
        .localCheckpoint()
    )


@pytest.fixture(scope="module")
def dictionary(spark):
    rows = [("L4_PC", "mtype:L4_PC", "mtype")]
    rows += [(f"L{i}_X", f"mtype:L{i}_X", "mtype") for i in range(5)]
    rows += [
        (f"Pop{p:03d}#{i}", f"neuron:Pop{p:03d}:{i}", "neuron")
        for p in range(4)
        for i in range(97)
    ]
    return spark.createDataFrame(rows, "surface string, entity_id string, entity_type string")


def _rows(df):
    return sorted((r.doc_id, r.surface, r.entity_id) for r in df.collect())


def test_salted_equals_broadcast(zipf_mentions, dictionary):
    b = linking.link_mentions(zipf_mentions, dictionary, strategy="broadcast")
    s = linking.link_mentions(zipf_mentions, dictionary, strategy="salted")
    assert _rows(b) == _rows(s)


def test_salt_spreads_hot_key(zipf_mentions, dictionary):
    k = 8
    salted = zipf_mentions.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("doc_id"), F.col("surface")), F.lit(k)).cast("int"),
    )
    buckets = (
        salted.where(F.col("surface") == "L4_PC")
        .groupBy("_salt")
        .count()
        .collect()
    )
    counts = {r["_salt"]: r["count"] for r in buckets}
    assert len(counts) == k  # hot key present in every bucket
    # no bucket holds more than 2x the fair share
    fair = sum(counts.values()) / k
    assert max(counts.values()) < 2 * fair


def test_salted_plans_shuffle_join_when_dict_too_big(spark, zipf_mentions, dictionary):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s = linking.link_mentions(zipf_mentions, dictionary, strategy="salted")
        plan = s._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        b = linking.link_mentions(zipf_mentions, dictionary, strategy="broadcast")
        assert _rows(b) == _rows(s)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
