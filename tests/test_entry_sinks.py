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
    memo_key = f"events_dedup_streamed|{SF_DIR}"
    first = entry.events_dedup_streamed(spark, SF_DIR)
    sink_a = entry._STREAM_SINK_CACHE[memo_key][1]
    again = entry.events_dedup_streamed(spark, SF_DIR)
    sink_b = entry._STREAM_SINK_CACHE[memo_key][1]
    assert sink_a == sink_b  # no second drain, no new temp dir
    assert first.count() == again.count() > 0
    ref = entry._STREAM_SINK_CACHE[memo_key][0]
    assert ref() is spark  # weakref key tracks the LIVE session


def test_drained_sink_keyed_on_sf_dir(spark):
    # an sf_dir-dependent drain must NOT hand a different scale factor the
    # previous scale's sink: the memo key carries sf_dir
    a = entry.events_dedup_streamed(spark, SF_DIR)
    other = "/root/testdata/sf0.01"
    b = entry.events_dedup_streamed(spark, other)
    sink_a = entry._STREAM_SINK_CACHE[f"events_dedup_streamed|{SF_DIR}"][1]
    sink_b = entry._STREAM_SINK_CACHE[f"events_dedup_streamed|{other}"][1]
    assert sink_a != sink_b
    assert a.count() != b.count()  # different corpora, different rows


def test_minhash_pairs_memo_reused_within_session(spark):
    a = entry.minhash_near_dups(spark, "/root/testdata/sf0.001")
    b = entry.minhash_near_dups(spark, "/root/testdata/sf0.001")
    assert a is b  # same persisted frame, no second LSH build
    assert entry._MINHASH_PAIRS_CACHE[0]() is spark
