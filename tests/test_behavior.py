"""Funnel / retention operator semantics on hand-built event sets."""

from __future__ import annotations

from datetime import datetime

from sonata_neo4j_loader_spark.operators import behavior

T = lambda d, h=0: datetime(2024, 1, d, h)  # noqa: E731

SCHEMA = "user_id long, ts timestamp_ntz, event_type string"


def test_funnel_strict_ordering_and_zero_steps(spark):
    rows = [
        # user 1 completes the full funnel in order
        (1, T(1), "signup"), (1, T(2), "click"), (1, T(3), "purchase"),
        # user 2: purchase BEFORE the click -> completes only 2 steps
        (2, T(1), "signup"), (2, T(3), "click"), (2, T(2), "purchase"),
        # user 3: click before signup doesn't count; no click after
        (3, T(2), "signup"), (3, T(1), "click"),
        # user 4: no signup at all -> contributes nothing
        (4, T(1), "click"), (4, T(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.step: r.n_users
        for r in behavior.funnel_counts(
            ev, ["signup", "click", "purchase", "error"]
        ).collect()
    }
    # the never-reached step must still emit its zero row
    assert got == {"signup": 3, "click": 2, "purchase": 1, "error": 0}


def test_retention_cohort_offsets(spark):
    rows = [
        # user 1 signs up in week of Jan 1 (Mon), active weeks 0 and 2
        (1, T(2), "signup"), (1, T(4), "click"), (1, T(16), "view"),
        # user 2 signs up week of Jan 8, active week 0 only; pre-anchor
        # activity (Jan 3) must NOT appear as a negative offset
        (2, T(3), "click"), (2, T(10), "signup"), (2, T(11), "view"),
        # user 5 never signs up -> excluded entirely
        (5, T(2), "view"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in behavior.retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_funnel_conversion_window(spark):
    rows = [
        # user 1: click 1 day after signup (in window), purchase 1 day
        # after click -> full funnel
        (1, T(1), "signup"), (1, T(2), "click"), (1, T(3), "purchase"),
        # user 2: click 5 days after signup -> OUTSIDE the 3-day window,
        # so the later purchase can't count either
        (2, T(1), "signup"), (2, T(6), "click"), (2, T(7), "purchase"),
        # user 3: click in window, purchase 4 days after the click -> out
        (3, T(1), "signup"), (3, T(2), "click"), (3, T(6), "purchase"),
        # user 4: boundary — click EXACTLY 3 days after signup counts
        # (closed upper bound: prev_t < ts <= prev_t + window)
        (4, T(1), "signup"), (4, T(4), "click"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.step: r.n_users
        for r in behavior.funnel_counts(
            ev, ["signup", "click", "purchase"], conversion_window="3 days"
        ).collect()
    }
    assert got == {"signup": 4, "click": 3, "purchase": 1}


def test_funnel_window_first_touch_is_greedy(spark):
    # user has an early in-window click (T2) and a later one (T4); the
    # purchase at T6 is within 3 days of T4 but NOT of T2. First-touch
    # semantics pin completion to the EARLIEST qualifying click, so the
    # purchase must not count — documents the greedy (non-backtracking)
    # contract.
    rows = [
        (1, T(1), "signup"), (1, T(2), "click"), (1, T(4), "click"),
        (1, T(6), "purchase"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.step: r.n_users
        for r in behavior.funnel_counts(
            ev, ["signup", "click", "purchase"], conversion_window="3 days"
        ).collect()
    }
    assert got == {"signup": 1, "click": 1, "purchase": 0}
