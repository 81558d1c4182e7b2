"""Corpus statistics: distributed TF-IDF and vocabulary coverage.

Engine additions beyond the reference: the corpus-analysis primitives a
training-data pipeline runs before filtering decisions — "what are each
document's characteristic terms" (TF-IDF) and "how much of the token
stream does a k-term vocabulary cover" (the Zipf coverage curve that
sizes tokenizer vocabularies). Tokenization reuses
:func:`operators.text.word_ngrams` (lowercased, whitespace, blank-doc
guarded) so the token definition is the one the rest of the text stack
already certifies.

Scale posture:

* ``tfidf_top_terms`` — two map-side-combined shuffles (corpus-scale on
  ``(doc, term)``, vocabulary-scale on ``term``) plus one doc-keyed
  window for the top-k. The document count rides as a broadcast 1-row
  scalar frame (no driver action, the plan stays lazy). The df join is
  keyed on ``term``: vocabulary-sized, near-Zipfian but the JOIN input
  is the already-aggregated (doc, term) frame — the hot term's rows are
  spread across docs, so no reducer sees a single-key pileup. Ranking
  compares the ROUNDED score (ties broken on the term string), so the
  cut at position k is deterministic and cross-engine stable.
* ``vocab_coverage`` — one shuffle on ``term``; the global top-k is
  ``orderBy().limit(k)`` (TakeOrderedAndProject, never a full sort) and
  the cumulative sum then runs over the k-row result only — the
  single-partition window is bounded by ``k``, not the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import text


def term_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, term, tf)`` — per-document term occurrence counts."""
    toks = df.select(
        F.col(id_col), F.explode(text.word_ngrams(text_col, 1)).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    ``score = tf · (ln((N+1)/(df+1)) + 1)`` (the sklearn-style smooth
    idf: the +1s keep corpus-universal terms finite and the score
    positive), rounded to 6 decimals. Output:
    ``(id, term, tf, df, score)``, ≤k rows per document.
    """
    tf = term_counts(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def vocab_coverage(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """The k most frequent terms with their cumulative corpus coverage.

    Output ``(term, n_occurrences, rank, coverage)``: ``coverage`` is
    the fraction of ALL token occurrences a vocabulary of the top
    ``rank`` terms would cover, rounded to 6 decimals — the curve that
    answers "how big must the vocabulary be". Ties rank by term string
    so the cut is deterministic.
    """
    toks = df.select(F.explode(text.word_ngrams(text_col, 1)).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = counts.agg(F.sum("n_occurrences").alias("_total"))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("term")).limit(k)
    w = (
        Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rw = Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "term",
            "n_occurrences",
            F.row_number().over(rw).alias("rank"),
            F.round(
                F.sum("n_occurrences").over(w) / F.col("_total").cast("double"), 6
            ).alias("coverage"),
        )
    )
