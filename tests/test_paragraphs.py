from __future__ import annotations

from sonata_neo4j_loader_spark.operators import paragraphs


def _dedup(spark, rows, w=3):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = paragraphs.dedup_paragraphs(df, words_per_chunk=w)
    return {r.doc_id: r for r in out.collect()}


def test_first_occurrence_wins_across_docs(spark):
    # chunk width 3: "a b c" repeats in docs 1 and 2 and twice in doc 1
    rows = [
        (1, "a b c x y z a b c"),
        (2, "a b c q r"),
        (3, "q r"),
    ]
    got = _dedup(spark, rows)
    assert got[1].kept_text == "a b c x y z"  # its own later copy dropped
    assert (got[1].n_chunks, got[1].n_kept, got[1].n_dropped) == (3, 2, 1)
    assert got[2].kept_text == "q r"  # leading duplicate dropped, tail kept
    assert (got[2].n_chunks, got[2].n_kept, got[2].n_dropped) == (2, 1, 1)
    # doc 3's "q r" is a DIFFERENT chunk from doc 2's trailing "q r"?
    # no — identical text, and doc 2's (2,1) precedes doc 3's (3,0)
    assert got[3].kept_text == ""
    assert (got[3].n_chunks, got[3].n_kept, got[3].n_dropped) == (1, 0, 1)


def test_blank_and_whitespace_docs(spark):
    got = _dedup(spark, [(1, ""), (2, "   "), (3, "x y")])
    for d in (1, 2):
        assert got[d].kept_text == ""
        assert (got[d].n_chunks, got[d].n_kept, got[d].n_dropped) == (0, 0, 0)
    assert got[3].kept_text == "x y"


def test_multiple_spaces_normalize(spark):
    # runs of whitespace tokenize away: "a  b   c" == "a b c"
    got = _dedup(spark, [(1, "a  b   c"), (2, "a b c")])
    assert got[1].kept_text == "a b c"
    assert got[2].kept_text == ""


def test_partial_trailing_chunk_kept(spark):
    got = _dedup(spark, [(1, "a b c d")])
    assert got[1].kept_text == "a b c d"
    assert got[1].n_chunks == 2  # "a b c" + partial "d"


def test_first_occurrence_plan_is_map_side_combined(spark):
    # the hot-key defense: first-occurrence selection must be a partial-
    # aggregated min (a window row_number over the chunk would funnel a
    # corpus-wide boilerplate chunk into one reducer), and the survivor
    # set must come straight off the aggregate — no join back onto the
    # corpus-scale chunk table (the only SMJ keys on the doc id)
    df = spark.range(100).selectExpr(
        "id AS doc_id", "'legal notice banner text here now ok go on y' AS text"
    )
    plan = (
        paragraphs.dedup_paragraphs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan
    assert "Window" not in plan
    # two aggregation exchanges (chunk-keyed firsts, doc-keyed reassembly);
    # the final doc join may broadcast (small build) or add a third
    assert plan.count("Exchange hashpartitioning") <= 3, plan
