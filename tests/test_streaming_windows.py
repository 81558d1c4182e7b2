"""Watermarked windowed spike rates: finalization and late-data drop.

Three drains over a growing spike directory prove the contract:
1. windows are NOT emitted while the watermark can still admit data;
2. advancing the watermark finalizes them with on-time + tolerably-late
   rows included;
3. data later than the watermark is dropped, not double-counted.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from sonata_neo4j_loader_spark.streaming import windows as W

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, W.SPIKE_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, out, ckpt):
    W.run_spike_rate_to_parquet(
        spark, src, out, ckpt, window_duration="10 minutes", watermark_delay="5 minutes"
    )
    try:
        return {
            (r.window_start, r.neuron_id): r.n_spikes
            for r in spark.read.parquet(out).collect()
        }
    except Exception:  # sink not created yet (nothing finalized)
        return {}


def test_watermark_finalizes_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "spikes")
    out = str(tmp_path / "rates")
    ckpt = str(tmp_path / "ckpt")

    def ts(minute, second=0):
        return T0.replace(minute=minute, second=second)

    # batch 1: two neurons in window [00:00, 00:10); nothing can finalize
    # yet (watermark = 00:09 - 5min = 00:04 < window end)
    _write(spark, src, [(ts(1), 7), (ts(2), 7), (ts(9), 8)])
    got = _drain(spark, src, out, ckpt)
    assert got == {}

    # batch 2: an event at 00:21 pushes the watermark to 00:16 — the first
    # window finalizes with BOTH neurons; a late-but-tolerable row for it
    # arriving in the same batch (00:05, lateness 16min > 5min delay?) no:
    # late rows are judged against the watermark at batch START (00:04),
    # so the 00:05 row still lands in the first window before finalization
    _write(spark, src, [(ts(5), 7), (ts(21), 9)])
    got = _drain(spark, src, out, ckpt)
    assert got[(T0.replace(minute=0), 7)] == 3  # 00:01, 00:02 + late 00:05
    assert got[(T0.replace(minute=0), 8)] == 1
    assert (T0.replace(minute=20), 9) not in got  # its window is still open

    # batch 3: a VERY late row for the finalized first window must be
    # dropped (watermark 00:16 is past that window's end) — counts do not
    # change, no duplicate window rows appear
    _write(spark, src, [(ts(3), 7), (ts(35), 9)])
    got2 = _drain(spark, src, out, ckpt)
    assert got2[(T0.replace(minute=0), 7)] == 3
    rows = spark.read.parquet(out).collect()
    keys = [(r.window_start, r.neuron_id) for r in rows]
    assert len(keys) == len(set(keys)), "windows must finalize exactly once"
    # the 00:20 window finalized in batch 3 (watermark moved to 00:30)
    assert got2[(T0.replace(minute=20), 9)] == 1
