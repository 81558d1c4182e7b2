"""Word n-gram operator edge cases + plan shape.

The subtle bug class: Spark's ``sequence(a, b)`` counts DOWN when a > b,
so an unguarded index sequence on sub-n-token docs fabricates n-grams.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import text


def test_word_ngrams_short_docs_yield_empty(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one"), (3, "one two"), (4, "a b c")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.g
        for r in df.select("doc_id", text.word_ngrams("text", 2).alias("g")).collect()
    }
    assert rows[0] == [] and rows[1] == [] and rows[2] == []
    assert rows[3] == ["one two"]
    assert rows[4] == ["a b", "b c"]

    # n=1: blank docs must NOT fabricate an empty-string "unigram"
    # (split of an empty trim yields [''] — size 1 passes the >= n guard)
    uni = {
        r.doc_id: r.g
        for r in df.select("doc_id", text.word_ngrams("text", 1).alias("g")).collect()
    }
    assert uni[0] == [] and uni[1] == []
    assert uni[2] == ["one"]
    assert uni[4] == ["a", "b", "c"]


def test_top_ngram_counts_plans_take_ordered(spark):
    df = spark.createDataFrame([(0, "a b a b c")], "doc_id long, text string")
    plan = text.top_ngram_counts(df, n=2, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global sort


def test_top_ngram_counts_values(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran"), (2, "THE  Cat sat")],
        "doc_id long, text string",
    )
    got = [(r.ngram, r.n_occurrences) for r in text.top_ngram_counts(df, 2, 3).collect()]
    assert got == [("the cat", 3), ("cat sat", 2), ("cat ran", 1)]


def test_quality_rule_flags_semantics_and_plan(spark):
    from sonata_neo4j_loader_spark.operators.text import quality_rule_flags

    rows = [
        (1, " ".join(f"word{i}" for i in range(40))),  # clean: 40 distinct
        (2, "spam spam spam spam spam " * 8),       # degenerate repetition
        (3, "a b"),                                  # too short
        (4, ""),                                     # blank
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality_rule_flags(
        df, min_words=5, max_words=100, max_dup_word_frac=0.5,
        max_dup_trigram_frac=0.5, min_mean_word_len=1.0, max_mean_word_len=10.0,
    ).collect()}
    assert out[1].quality_pass
    assert not out[2].ok_dup_words and not out[2].quality_pass
    assert not out[3].ok_word_count
    assert out[4].n_words == 0 and out[4].dup_word_frac == 0.0
    # repetition math: doc 2 has 40 tokens, 1 distinct -> dup 39/40
    assert out[2].dup_word_frac == round(1 - 1 / 40, 6)
    # the whole operator is ONE map-only projection: no shuffle may appear
    plan = (
        quality_rule_flags(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
