"""Stream-stream interval join: batch equivalence, bounds, resume."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.streaming import joins as streaming_joins

T0 = lambda h, m=0: datetime(2024, 3, 1, h, m)  # noqa: E731
SCHEMA = "event_time timestamp, user_id long, event_id long"


def _drain(spark, tmp_path, clicks, purchases, window="1 hours"):
    clicks_dir = str(tmp_path / "clicks")
    purch_dir = str(tmp_path / "purchases")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(clicks, SCHEMA).write.mode("overwrite").parquet(clicks_dir)
    spark.createDataFrame(purchases, SCHEMA).write.mode("overwrite").parquet(purch_dir)
    streaming_joins.run_attribution_to_parquet(
        spark, clicks_dir, purch_dir, sink, ckpt, window=window
    )
    return sink, ckpt, clicks_dir, purch_dir


def test_interval_join_bounds_and_multi_attribution(spark, tmp_path):
    clicks = [
        (T0(9), 1, 100),   # purchase at 9:30 in window; 10:00 boundary in
        (T0(9, 30), 1, 101),  # both purchases in window of this click too
        (T0(12), 1, 102),  # no purchase within (12:00, 13:00]
        (T0(9), 2, 200),   # user 2: purchase EXACTLY at click time -> strict
    ]
    purchases = [
        (T0(9, 30), 1, 900),
        (T0(10), 1, 901),   # exactly click+1h for click 100 -> closed bound
        (T0(9), 2, 902),    # equal times: p.ts > c.ts is strict -> excluded
    ]
    sink, *_ = _drain(spark, tmp_path, clicks, purchases)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(100, 900), (100, 901), (101, 901)}


def test_stream_join_equals_batch_join(spark, tmp_path):
    # pseudo-random two-sided workload; the drained stream must equal the
    # batch interval join row-for-row
    clicks = [
        (T0(8 + (i * 7) % 10, (i * 13) % 60), i % 5, i) for i in range(40)
    ]
    purchases = [
        (T0(8 + (i * 3) % 11, (i * 29) % 60), i % 5, 1000 + i) for i in range(40)
    ]
    sink, *_ = _drain(spark, tmp_path, clicks, purchases, window="2 hours")
    c = spark.createDataFrame(clicks, SCHEMA).select(
        F.col("event_time").alias("click_time"), "user_id",
        F.col("event_id").alias("click_id"),
    )
    p = spark.createDataFrame(purchases, SCHEMA).select(
        F.col("event_time").alias("purchase_time"),
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_time") > F.col("click_time"))
        & (F.col("purchase_time") <= F.col("click_time") + F.expr("INTERVAL 2 hours")),
    ).select("user_id", "click_id", "purchase_id", "click_time", "purchase_time")
    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    exp = sorted(map(tuple, batch.collect()))
    assert got == exp and len(exp) > 0


def test_stream_join_checkpoint_resume_is_idempotent(spark, tmp_path):
    clicks = [(T0(9), 1, 100)]
    purchases = [(T0(9, 30), 1, 900)]
    sink, ckpt, clicks_dir, purch_dir = _drain(spark, tmp_path, clicks, purchases)
    n1 = spark.read.parquet(sink).count()
    # re-drain with nothing new: the checkpoint must prevent re-emission
    streaming_joins.run_attribution_to_parquet(
        spark, clicks_dir, purch_dir, sink, ckpt, window="1 hours"
    )
    assert spark.read.parquet(sink).count() == n1 == 1
