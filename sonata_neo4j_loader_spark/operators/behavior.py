"""Event-behavior analytics: ordered-step funnels and retention cohorts.

Engine additions beyond the reference (which has no event analytics at
all — its closest surface is the spike-time rollup,
base_simulation_loader.py:50-63): the two reports every event pipeline
ships. Both are pure DataFrame compositions with exact ANSI-SQL oracles.

Scale posture: every stage is a per-user aggregation or a user-keyed
join — shuffles key on ``user_id`` (high cardinality, naturally
balanced), aggregations map-side-combine to one row per user, and the
final report is dimension-sized. Nothing corpus-scale is collected,
windowed globally, or cross-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_window: str | None = None,
) -> DataFrame:
    """Ordered-step funnel: users completing each prefix of ``steps``.

    A user completes step k iff they have an event of type ``steps[k]``
    STRICTLY AFTER their completion time of step k-1 (completion time =
    the earliest such event — the standard first-touch funnel). Output:
    one row per step, ``(step_index, step, n_users)``, monotonically
    non-increasing in users.

    ``conversion_window`` (an SQL interval body, e.g. ``"3 days"``)
    bounds each transition: step k must land within that interval of the
    step-k-1 completion time (``prev_t < ts <= prev_t + window``) — the
    "purchase within N days of click" funnel. First-touch stays greedy:
    each step's completion time is the EARLIEST qualifying event, even
    when a later in-window event of step k would leave more room for
    step k+1 (the industry-standard semantics; a backtracking match is a
    different, quadratic operator). ``None`` keeps transitions unbounded.

    Plan shape: one filtered per-user min-aggregation per step, chained
    by an equi join on the user — k steps = k map-side-combined shuffles
    on ``user_id``, no window over the whole event stream and no
    per-user event-list collection (the ``collect_list`` formulation
    holds a user's entire history in one reducer row; this one never
    materializes more than one timestamp per user per step).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    reached = None  # (user_col, _t) completion times of the previous step
    for k, step in enumerate(steps):
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_ev_ts")
        )
        if reached is None:
            hits = ev
        else:
            in_order = F.col("_ev_ts") > F.col("_t")
            if conversion_window is not None:
                in_order = in_order & (
                    F.col("_ev_ts")
                    <= F.col("_t") + F.expr(f"INTERVAL {conversion_window}")
                )
            hits = ev.join(reached, user_col).where(in_order)
        reached = hits.groupBy(user_col).agg(F.min("_ev_ts").alias("_t"))
        # global agg, not a groupBy over literals: a step NO user reaches
        # must still emit its (step, 0) row, and an un-grouped agg returns
        # exactly one row even on an empty input
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(k).cast("int").alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    anchor_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly retention cohort matrix.

    A user's cohort is the Monday-truncated week of their FIRST
    ``anchor_type`` event; for every later activity (any event type) the
    week offset is ``floor(days_between(week(ts), cohort_week) / 7)``.
    Output: ``(cohort_week, week_offset, n_users)`` with DISTINCT users
    per cell (a user active twice in week 2 counts once), offsets ≥ 0
    only (pre-anchor activity is not retention). Users with no anchor
    event contribute nothing.

    Two user-keyed shuffles (anchor min-agg, cell distinct-agg); the
    matrix itself is dimension-sized (weeks × offsets).
    """
    anchors = (
        events.where(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week"))
    )
    activity = events.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("_aw")
    )
    cells = (
        activity.join(anchors, user_col)
        .withColumn(
            "week_offset",
            F.floor(F.datediff(F.col("_aw"), F.col("cohort_week")) / 7).cast("int"),
        )
        .where(F.col("week_offset") >= 0)
    )
    # cohort weeks are calendar DATEs (both Spark's date_trunc and DuckDB's
    # agree on Monday, but DuckDB returns DATE for week-or-coarser truncs —
    # emit DATE so the report type is engine-portable)
    return cells.groupBy(
        F.to_date("cohort_week").alias("cohort_week"), F.col("week_offset")
    ).agg(F.count_distinct(F.col(user_col)).alias("n_users"))
