"""As-of join and binned range join: tie, tolerance, and boundary semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import temporal

T0 = datetime(2024, 1, 1, 0, 0, 0)


def ts(minute, second=0):
    return T0.replace(minute=minute, second=second)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, ts(10), 7), (2, ts(20), 7), (3, ts(5), 8), (4, ts(30), 9)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(7, ts(10), "a"), (7, ts(15), "b"), (8, ts(6), "c")],
        "user_id long, rts timestamp, tag string",
    )
    return left, right


def test_asof_backward_with_ties(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.asof_ts, r.tag)
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "rts", ["tag"]
        ).collect()
    }
    assert out[1] == (ts(10), "a")  # tie at 00:10 is inclusive
    assert out[2] == (ts(15), "b")  # most recent, not first
    assert out[3] == (None, None)  # right row is later than the left row
    assert out[4] == (None, None)  # no right rows for this key


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.asof_ts, r.tag)
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "rts", ["tag"], tolerance_seconds=120.0
        ).collect()
    }
    assert out[1] == (ts(10), "a")  # 0 s old: within tolerance
    assert out[2] == (None, None)  # 5 min old: beyond 120 s tolerance
    assert out[4] == (None, None)


def test_asof_rejects_colliding_payload(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collision"):
        temporal.asof_join(
            left, right.withColumnRenamed("tag", "event_id"),
            "user_id", "ts", "rts", ["event_id"],
        )


def test_range_join_boundaries(spark):
    facts = spark.createDataFrame(
        [(1, ts(0)), (2, ts(59, 59)), (3, ts(0, 1))],
        "fact_id long, t timestamp",
    )
    # one interval exactly [00:00, 01:00) — crosses a 1800 s bin boundary
    iv = spark.createDataFrame(
        [(100, ts(0), T0.replace(hour=1))],
        "iv_id long, s timestamp, e timestamp",
    )
    got = sorted(
        r.fact_id
        for r in temporal.range_join_binned(
            facts, iv, "t", "s", "e", bin_seconds=1800
        ).collect()
    )
    assert got == [1, 2, 3]  # start inclusive, interior rows in both bins

    # end-exclusive: a fact exactly at the end timestamp must not match
    at_end = spark.createDataFrame([(9, T0.replace(hour=1))], "fact_id long, t timestamp")
    assert temporal.range_join_binned(at_end, iv, "t", "s", "e", 1800).count() == 0


def test_asof_tolerance_with_quoted_column_name(spark):
    # left_ts names needing backtick quoting (space) must work end-to-end:
    # the tolerance expression is built from column objects, not an
    # interpolated SQL string
    left = spark.createDataFrame(
        [(1, ts(10), 7), (2, ts(20), 7)],
        ["event_id", "event ts", "user_id"],
    ).select("event_id", F.col("`event ts`").cast("timestamp").alias("event ts"), "user_id")
    right = spark.createDataFrame(
        [(7, ts(10), "a"), (7, ts(15), "b")],
        "user_id long, rts timestamp, tag string",
    )
    out = {
        r.event_id: (r.asof_ts, r.tag)
        for r in temporal.asof_join(
            left, right, "user_id", "event ts", "rts", ["tag"],
            tolerance_seconds=120.0,
        ).collect()
    }
    assert out[1] == (ts(10), "a")
    assert out[2] == (None, None)  # 5 min old right row, beyond tolerance
