"""Streaming dedup: in-watermark duplicates always dropped, state reaped.

Two drains over a growing delivery directory prove the guaranteed side of
``dropDuplicatesWithinWatermark``: same-batch and cross-batch duplicates
within the delay emit exactly one row, and distinct keys all pass.
"""

from __future__ import annotations

from datetime import datetime

from sonata_neo4j_loader_spark.streaming import dedup as D

T0 = datetime(2024, 1, 1, 0, 0, 0)


def ts(minute):
    return T0.replace(minute=minute)


def _write(spark, path, rows):
    spark.createDataFrame(rows, D.DELIVERY_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, out, ckpt):
    D.run_dedup_to_parquet(spark, src, out, ckpt, watermark_delay="5 minutes")
    try:
        return sorted(
            (r.delivery_key, r.payload) for r in spark.read.parquet(out).collect()
        )
    except Exception:
        return []


def test_in_watermark_duplicates_dropped(spark, tmp_path):
    src = str(tmp_path / "deliveries")
    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: a same-batch duplicate of k1 plus a distinct k2
    _write(
        spark,
        src,
        [(ts(0), "k1", "a"), (ts(1), "k1", "a-dup"), (ts(2), "k2", "b")],
    )
    got = _drain(spark, src, out, ckpt)
    assert [k for k, _ in got] == ["k1", "k2"]

    # batch 2: a cross-batch redelivery of k2 within the delay, plus a new
    # key — only the new key adds a row
    _write(spark, src, [(ts(3), "k2", "b-dup"), (ts(4), "k3", "c")])
    got = _drain(spark, src, out, ckpt)
    assert [k for k, _ in got] == ["k1", "k2", "k3"]
    # the surviving payloads are the FIRST deliveries
    assert dict(got) == {"k1": "a", "k2": "b", "k3": "c"}
