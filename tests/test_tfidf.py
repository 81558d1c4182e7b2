from __future__ import annotations

import math

from sonata_neo4j_loader_spark.operators import tfidf

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "a cat and a dog"),
    (4, ""),  # blank doc: no terms, still counts toward N
    (5, "unique singleton words here"),
]


def _py_tfidf_top(docs, k):
    tf: dict[tuple[int, str], int] = {}
    for doc_id, text in docs:
        for t in text.lower().split():
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(docs)
    rows = [
        (d, t, c, df[t], round(c * (math.log((n + 1) / (df[t] + 1)) + 1), 6))
        for (d, t), c in tf.items()
    ]
    out = []
    for doc_id in {d for d, _ in docs}:
        mine = sorted(
            (r for r in rows if r[0] == doc_id), key=lambda r: (-r[4], r[1])
        )
        out.extend(mine[:k])
    return sorted(out)


def test_tfidf_top_terms_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.term, r.tf, r.df, r.score)
        for r in tfidf.tfidf_top_terms(df, k=2).collect()
    )
    assert got == _py_tfidf_top(DOCS, 2)


def test_tfidf_rank_cut_is_deterministic_on_ties(spark):
    # every term appears once in one doc -> all scores equal; the k-cut
    # must fall on term order
    df = spark.createDataFrame([(1, "b a c")], "doc_id bigint, text string")
    got = [r.term for r in tfidf.tfidf_top_terms(df, k=2).collect()]
    assert sorted(got) == ["a", "b"]


def test_vocab_coverage_curve(spark):
    df = spark.createDataFrame(
        [(1, "x x x y y z"), (2, "x q")], "doc_id bigint, text string"
    )
    rows = {
        r.rank: (r.term, r.n_occurrences, r.coverage)
        for r in tfidf.vocab_coverage(df, k=3).collect()
    }
    # counts: x=4, y=2, q=1, z=1 (8 total); ties rank by term string
    assert rows == {
        1: ("x", 4, round(4 / 8, 6)),
        2: ("y", 2, round(6 / 8, 6)),
        3: ("q", 1, round(7 / 8, 6)),
    }


def test_vocab_coverage_reaches_one_when_k_covers_vocab(spark):
    df = spark.createDataFrame([(1, "a b b")], "doc_id bigint, text string")
    rows = sorted(
        (r.rank, r.term, r.coverage) for r in tfidf.vocab_coverage(df, k=10).collect()
    )
    assert rows == [(1, "b", round(2 / 3, 6)), (2, "a", 1.0)]
