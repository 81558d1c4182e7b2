"""Custom stateful streaming operator: gap-based sessionization.

The batch twin is the ``events_sessions`` driver query (30-min-inactivity
sessions via window functions). A live pipeline can't window over "all
events ever" — per-user session state must live in the streaming state
store and be finalized incrementally. Spark has no built-in gap-session
aggregate with this output shape, so this is the designed use case for
``applyInPandasWithState``: grouped Arrow batches + explicit per-group
state + event-time timeouts.

Semantics:

* events are folded per user in event-time order; a gap > ``gap`` closes
  the current session;
* a session is EMITTED (append mode) only when it is provably closed —
  either a later event arrived > gap after it, or the event-time timeout
  fired (watermark passed ``last_event + gap``);
* the trailing open session is held in the state store with an event-time
  timeout, so state is bounded: one open session per active user, and
  idle users' state is reaped by the timeout;
* late events (above the watermark — Spark drops the rest before the
  operator) that sort before the open session's last event merge into it
  (the session start moves back if needed), mirroring what the batch
  twin's full-ordering window would have produced.

The per-batch kernel is vectorized (numpy ``reduceat`` over gap-split
segments) — no per-row Python beyond the segment bookkeeping, which is
O(sessions), not O(events).

Reference tie-in: the reference has no streaming at all (it bulk-loads
finished simulation output, ``base_simulation_loader.py:50-63``); this
extends the engine the same way ``streaming/windows.py`` does, as the
live twin of a batch contract query.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

# open-session state: (start_ns, last_ns, n_events, sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ns", T.LongType(), True),
        T.StructField("last_ns", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

_NS = 1_000_000_000


def _session_frame(user: int, rows: list[tuple[int, int, int, float]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.array([user] * len(rows), dtype="int64"),
            "session_start": pd.to_datetime([r[0] for r in rows], unit="ns"),
            "session_end": pd.to_datetime([r[1] for r in rows], unit="ns"),
            "n_events": pd.array([r[2] for r in rows], dtype="int64"),
            "sum_value": pd.array([r[3] for r in rows], dtype="float64"),
        }
    )


def make_sessionizer(gap_seconds: float):
    """Build the per-group stateful kernel for ``applyInPandasWithState``."""
    gap_ns = int(gap_seconds * _NS)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            start_ns, last_ns, n, total = state.get
            state.remove()
            yield _session_frame(user, [(start_ns, last_ns, n, total)])
            return

        ev = pd.concat(list(pdfs)).sort_values("event_time", kind="mergesort")
        ts = ev["event_time"].to_numpy(dtype="datetime64[ns]").astype("int64")
        vals = ev["value"].to_numpy(dtype="float64")

        closed: list[tuple[int, int, int, float]] = []
        state_last = None
        if state.exists:
            start_ns, last_ns, n, total = state.get
            if ts[0] - last_ns > gap_ns:
                closed.append((start_ns, last_ns, n, total))
                start_ns, last_ns, n, total = ts[0], ts[0], 0, 0.0
            else:
                # batch continues (or, for tolerated-late rows, merges
                # into) the open session — start moves back if a late row
                # predates it, and the state's last event keeps counting
                # for gap/end math even when the late row sorts before it
                state_last = last_ns
            start_ns = min(start_ns, int(ts[0]))
        else:
            start_ns, last_ns, n, total = int(ts[0]), int(ts[0]), 0, 0.0

        # vectorized gap split: the session's "last seen" at step i is
        # max(prev batch event, state's last event) — a late row below the
        # open session's last must not shrink the effective gap anchor.
        # After any split the state anchor is dominated by construction
        # (a split requires ts[i] > state_last + gap), so one maximum is
        # safe for the whole batch.
        prev_eff = ts[:-1]
        if state_last is not None:
            prev_eff = np.maximum(prev_eff, state_last)
        bounds = np.flatnonzero(ts[1:] - prev_eff > gap_ns) + 1
        seg_starts = np.concatenate(([0], bounds))
        seg_counts = np.diff(np.concatenate((seg_starts, [len(ts)])))
        seg_sums = np.add.reduceat(vals, seg_starts)
        seg_first = ts[seg_starts]
        seg_last = ts[np.concatenate((seg_starts[1:], [len(ts)])) - 1]

        def merged_last(i: int) -> int:
            # segment 0 may merge with the open state whose last event can
            # exceed every batch row in it
            if i == 0 and state_last is not None:
                return max(int(seg_last[0]), state_last)
            return int(seg_last[i])

        # every segment except the last is closed by the gap that follows it
        for i in range(len(seg_starts) - 1):
            if i == 0:
                closed.append(
                    (start_ns, merged_last(0), n + int(seg_counts[0]), total + float(seg_sums[0]))
                )
            else:
                closed.append(
                    (int(seg_first[i]), int(seg_last[i]), int(seg_counts[i]), float(seg_sums[i]))
                )
        li = len(seg_starts) - 1
        if li == 0:
            open_state = (
                start_ns,
                merged_last(0),
                n + int(seg_counts[li]),
                total + float(seg_sums[li]),
            )
        else:
            open_state = (
                int(seg_first[li]),
                int(seg_last[li]),
                int(seg_counts[li]),
                float(seg_sums[li]),
            )
        state.update(open_state)
        # event-time timeout at last + gap; must stay above the watermark
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(open_state[1] // 1_000_000 + int(gap_seconds * 1000), wm_ms + 1))

        if closed:
            yield _session_frame(user, closed)

    return fn


_DELAY_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _delay_seconds(delay: str) -> float:
    """Parse a Spark watermark-delay interval string to seconds.

    Accepts the forms Spark's ``withWatermark`` does: an optional leading
    ``interval`` keyword and one or more ``<number> <unit>`` pairs, e.g.
    ``'10 minutes'``, ``'interval 10 minutes'``, ``'1 hour 30 minutes'``.
    """
    toks = delay.strip().lower().split()
    if toks and toks[0] == "interval":
        toks = toks[1:]
    if not toks or len(toks) % 2 != 0:
        raise ValueError(
            f"unsupported watermark delay {delay!r}: expected "
            "'[interval] <n> <unit> [<n> <unit> ...]' with units "
            f"{sorted(_DELAY_UNITS)} (e.g. '10 minutes', '1 hour 30 minutes')"
        )
    total = 0.0
    for n, unit in zip(toks[::2], toks[1::2]):
        # exact singular or plural only: rstrip('s') would also accept
        # spellings Spark rejects ('minutess') — fail here, not at
        # stream start
        base = unit[:-1] if unit.endswith("s") and unit[:-1] in _DELAY_UNITS else unit
        try:
            value = float(n)
        except ValueError:
            value = float("nan")
        if base not in _DELAY_UNITS or not value >= 0:
            raise ValueError(
                f"unsupported watermark delay {delay!r}: bad pair "
                f"({n!r}, {unit!r}); units are {sorted(_DELAY_UNITS)} "
                "(optionally plural) and values must be non-negative"
            )
        total += value * _DELAY_UNITS[base]
    return total


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    gap_seconds: float = 1800.0,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """readStream over an event directory -> closed-session stream.

    Requires ``watermark_delay <= gap_seconds``. Under that bound the
    stream provably equals the batch gap-sessionization: a tolerated-late
    row r satisfies r >= max_seen - delay >= last - gap, so it can never
    be more than one gap below any event it must order against — every
    merge the kernel makes is one the full batch ordering makes too. With
    delay > gap, a late row older than the open session's span minus the
    gap would merge here but split in batch, silently diverging.
    """
    if _delay_seconds(watermark_delay) > gap_seconds:
        raise ValueError(
            f"watermark_delay ({watermark_delay}) must not exceed "
            f"gap_seconds ({gap_seconds}): stream==batch session equality "
            "only holds when late data is bounded by the session gap"
        )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        stream.withWatermark("event_time", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessions_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: float = 1800.0,
    watermark_delay: str = "10 minutes",
):
    """Drain available events into finalized-session parquet (append mode);
    re-invoking resumes from the checkpoint like the other streaming sinks."""
    sessions = sessionize_stream(spark, input_dir, gap_seconds, watermark_delay)
    query = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
