"""Exact-count sampling: size exactness and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import sampling


def test_exact_k_size_and_partition_invariance(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    a = sampling.sample_exact_k(df.repartition(1), 37, "k")
    b = sampling.sample_exact_k(df.repartition(13, "k"), 37, "k")
    ra = sorted(r.k for r in a.collect())
    rb = sorted(r.k for r in b.collect())
    assert len(ra) == 37
    assert ra == rb  # same rows under any partitioning


def test_exact_k_edge_counts(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    assert sampling.sample_exact_k(df, 0, "k").count() == 0
    assert sampling.sample_exact_k(df, 10, "k").count() == 10
    assert sampling.sample_exact_k(df, 99, "k").count() == 10


def test_exact_fraction_count(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    out = sampling.sample_exact_fraction(df, 0.25, "k")
    assert out.count() == 250  # exactly floor(total * p), unlike Bernoulli
    assert sampling.sample_exact_fraction(df, 1.0, "k").count() == 1000
    assert sampling.sample_exact_fraction(df, 0.0, "k").count() == 0


def test_exact_k_seed_changes_selection(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    a = {r.k for r in sampling.sample_exact_k(df, 50, "k", seed=1).collect()}
    b = {r.k for r in sampling.sample_exact_k(df, 50, "k", seed=2).collect()}
    assert a != b
