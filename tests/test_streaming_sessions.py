"""Stateful streaming sessionization: gap-close, timeout-close, state reap.

Three drains over a growing event directory prove the contract:
1. a session is emitted as soon as a later event closes it by gap —
   within one batch or across batches;
2. an open session survives in the state store across drains;
3. the event-time timeout (watermark past last_event + gap) finalizes an
   open session with no further events — idle-user state is reaped.
"""

from __future__ import annotations

from datetime import datetime

from sonata_neo4j_loader_spark.streaming import sessions as S

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, S.EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, out, ckpt):
    S.run_sessions_to_parquet(
        spark, src, out, ckpt, gap_seconds=600.0, watermark_delay="5 minutes"
    )
    try:
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
            for r in spark.read.parquet(out).collect()
        )
    except Exception:  # sink not created yet (nothing finalized)
        return []


def ts(minute, hour=0):
    return T0.replace(hour=hour, minute=minute)


def test_gap_and_timeout_sessionization(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # batch 1, user 7: two events 2 min apart, then one 18 min later —
    # the in-batch gap closes the first session immediately; the third
    # event stays open in state
    _write(spark, src, [(ts(0), 7, 1.0), (ts(2), 7, 2.0), (ts(20), 7, 3.0)])
    got = _drain(spark, src, out, ckpt)
    assert got == [(7, ts(0), ts(2), 2, 3.0)]

    # batch 2: an event 30 min after the open session closes it by gap
    # (cross-batch close via state), and itself becomes the open session
    _write(spark, src, [(ts(50), 7, 4.0)])
    got = _drain(spark, src, out, ckpt)
    assert got == [
        (7, ts(0), ts(2), 2, 3.0),
        (7, ts(20), ts(20), 1, 3.0),
    ]

    # batch 3: only an unrelated user arrives, far in the future — the
    # watermark passes 00:50 + gap, so user 7's open session finalizes by
    # TIMEOUT (no further events needed) and its state is removed
    _write(spark, src, [(ts(40, hour=1), 9, 9.0)])
    got = _drain(spark, src, out, ckpt)
    assert (7, ts(50), ts(50), 1, 4.0) in got
    # user 9's session is still open (nothing after it) — not emitted
    assert not any(u == 9 for u, *_ in got)
