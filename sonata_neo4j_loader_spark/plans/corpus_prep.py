"""Composed training-data corpus preparation: filter → dedup → sample.

The canonical pre-training data shape: score documents, drop low-quality
ones, collapse exact duplicates (min-id survivor), then draw a
deterministic partition-invariant sample. Every stage is a pure column
expression / single-shuffle groupBy from the operator library, so the
whole prep composes into ONE plan: Catalyst pushes the quality filter to
the scan, the dedup is the only shuffle, and the hash sample evaluates
scan-local on the survivors.

At 10^12 docs this ordering matters: filtering before dedup shrinks the
shuffle's input by the reject rate, and sampling last keeps the sample
representative of the *deduplicated* corpus (sampling first would
re-weight duplicate clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import text
from ..operators.dedup import dedup_exact
from ..operators.sampling import sample_by_hash


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    sample_proportion: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Quality-filter → exact-dedup (min-id survivor) → hash-sample.

    Returns the surviving rows with ``quality_score`` and ``token_count``
    appended (the metadata a downstream tokenizer/packer stage needs).
    """
    scored = docs.withColumn("quality_score", text.quality_score(text_col)).withColumn(
        "token_count", text.token_count(text_col)
    )
    kept = scored.where(F.col("quality_score") >= min_quality)
    deduped = dedup_exact(kept, id_col, text_col)
    return sample_by_hash(deduped, id_col, sample_proportion, seed)
