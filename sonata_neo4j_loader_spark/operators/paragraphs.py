"""Cross-document duplicated-passage removal (boilerplate dedup).

Engine addition beyond the reference: the corpus-level "remove repeated
paragraphs" pass of a web-scale training-data pipeline — the classic
target is boilerplate (cookie banners, legal footers) that repeats
verbatim across millions of pages. Documents are segmented into
fixed-width word chunks (the corpus carries no newlines, so the chunk
stands in for the paragraph; a newline segmenter is a one-line swap of
``_chunks_expr``), every chunk that occurs anywhere else in the corpus
keeps only its FIRST occurrence (smallest ``(doc_id, chunk_idx)``), and
each document is reassembled from its surviving chunks in order.

Scale posture — the hot key IS the use case, so the plan is built
around it:

* first-occurrence selection is ``groupBy(chunk).agg(min(struct(doc,
  idx)))`` — a map-side-combined shuffle, so a boilerplate chunk
  repeated across the whole corpus partial-aggregates to ONE row per
  map task and no reducer ever sees the hot key's full multiplicity
  (a window ``row_number() over (partition by chunk)`` — the naive
  formulation — would funnel every copy into one reducer);
* the survivor set IS the aggregate's output — there is no join back
  onto the corpus-scale chunk table;
* reassembly groups survivors by ``doc_id`` (high-cardinality,
  naturally balanced) and the per-doc ``collect_list`` is bounded by
  document size — the same bound the parser already assumes;
* the final left join runs doc-keyed against the original frame.

Three shuffles total, none keyed on a skewed column at reduce time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words_expr(text_col: str) -> Column:
    """Whitespace tokens, empty-safe (blank/whitespace-only text → [])."""
    return F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )


def _chunks_expr(words: Column, words_per_chunk: int) -> Column:
    """Fixed-width word chunks as space-joined strings; the trailing
    partial chunk is kept. Empty word lists produce an empty chunk list
    (the ``when`` also guards ``sequence``, which COUNTS DOWN when
    start > stop)."""
    w = words_per_chunk
    n_chunks = F.ceil(F.size(words) / w).cast("int")
    return F.when(
        F.size(words) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(words, i * w + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_chunk: int = 10,
) -> DataFrame:
    """``(id, chunk_idx, chunk)`` — one row per chunk; empty docs vanish."""
    return df.select(
        F.col(id_col),
        F.posexplode(_chunks_expr(_words_expr(text_col), words_per_chunk)).alias(
            "chunk_idx", "chunk"
        ),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_chunk: int = 10,
) -> DataFrame:
    """Corpus-wide exact duplicated-chunk removal, first occurrence wins.

    Returns one row per input document: ``(id, kept_text, n_chunks,
    n_kept, n_dropped)`` with ``kept_text`` the surviving chunks joined
    in original order ('' when everything was dropped or the doc was
    empty). Deterministic under any partitioning: the survivor of a
    duplicated chunk is the globally smallest ``(id, chunk_idx)``, an
    order-free ``min``.
    """
    chunks = doc_chunks(df, id_col, text_col, words_per_chunk)
    firsts = chunks.groupBy("chunk").agg(
        F.min(F.struct(id_col, "chunk_idx")).alias("first")
    )
    survivors = firsts.select(
        F.col(f"first.{id_col}").alias(id_col),
        F.col("first.chunk_idx").alias("chunk_idx"),
        "chunk",
    )
    reassembled = survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    # coalesce: NULL text would otherwise yield n_chunks=NULL (size(split)
    # of NULL) next to kept_text=''/n_kept=0, and the NULL n_dropped would
    # silently drop out of downstream SUM() accounting — a NULL doc is an
    # empty doc here, consistently 0 across all four stat columns
    n_chunks = F.coalesce(
        F.ceil(F.size(_words_expr(text_col)) / words_per_chunk).cast("int"),
        F.lit(0),
    )
    return (
        df.select(F.col(id_col), n_chunks.alias("n_chunks"))
        .join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_dropped"),
        )
    )
