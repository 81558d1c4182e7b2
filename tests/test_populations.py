"""Dynamic per-population schema union (SURVEY.md §2.7 / §7.4)."""

from __future__ import annotations

import pytest

from sonata_neo4j_loader_spark.operators.populations import union_population_frames


def test_union_null_fills_and_widens(spark):
    a = spark.createDataFrame(
        [(0, "L4_PC", 1.5)], "id long, mtype string, u_syn float"
    )
    # different attribute set (no u_syn, extra region) and double-typed x
    b = spark.createDataFrame(
        [(1, "SP_PC", "SLM")], "id long, mtype string, region string"
    )
    out = union_population_frames([a, b])
    assert set(out.columns) == {"id", "mtype", "u_syn", "region"}
    # float32 widened to double regardless of frame order
    assert dict(out.dtypes)["u_syn"] == "double"
    rows = {r["id"]: r for r in out.collect()}
    assert rows[0]["region"] is None and rows[1]["u_syn"] is None
    flipped = union_population_frames([b, a])
    assert dict(flipped.dtypes)["u_syn"] == "double"
    assert flipped.count() == 2


def test_union_empty_list_raises(spark):
    with pytest.raises(ValueError):
        union_population_frames([])
