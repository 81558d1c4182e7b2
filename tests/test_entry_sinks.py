"""Driver-entry streaming-sink memoization: one drain per session.

The contract queries that drain a stream (or synthesize a campaign dir)
must not grow a fresh temp dir + checkpoint per call in a long-lived
driver session — the second call reuses the first drain's sink, and the
results stay identical.
"""

from __future__ import annotations

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_drained_sink_reused_within_session(spark):
    first = entry.events_dedup_streamed(spark, SF_DIR)
    sink_a = entry._STREAM_SINK_CACHE["events_dedup_streamed"][1]
    again = entry.events_dedup_streamed(spark, SF_DIR)
    sink_b = entry._STREAM_SINK_CACHE["events_dedup_streamed"][1]
    assert sink_a == sink_b  # no second drain, no new temp dir
    assert first.count() == again.count() > 0
    ref = entry._STREAM_SINK_CACHE["events_dedup_streamed"][0]
    assert ref() is spark  # weakref key tracks the LIVE session


def test_minhash_pairs_memo_reused_within_session(spark):
    a = entry.minhash_near_dups(spark, "/root/testdata/sf0.001")
    b = entry.minhash_near_dups(spark, "/root/testdata/sf0.001")
    assert a is b  # same persisted frame, no second LSH build
    assert entry._MINHASH_PAIRS_CACHE[0]() is spark
