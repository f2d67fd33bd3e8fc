"""Funnel / retention operators (round 8): ordering semantics the
registered sf0.01 oracle can't distinguish on random data."""

from __future__ import annotations

import datetime

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.funnel import (
    cohort_retention,
    funnel_conversion,
)


def _ev(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [
        (u, t, base + datetime.timedelta(hours=h)) for (u, t, h) in rows
    ]
    return spark.createDataFrame(
        data, "user_id LONG, event_type STRING, ts TIMESTAMP"
    )


def test_funnel_strict_ordering(spark):
    """A click BEFORE the user's first view does not convert; a click at
    the exact same microsecond does not either (strictly-after)."""
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),   # full
            (2, "click", 0), (2, "view", 1),                        # out of order
            (3, "view", 0), (3, "click", 0),                        # simultaneous
            (4, "view", 0),                                         # view only
        ],
    )
    got = {
        r.step_name: r.n_users
        for r in funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_funnel_reentry_uses_first_qualifying_time(spark):
    """Step entry is the FIRST qualifying event after the previous step —
    a later view must not reset an already-entered funnel."""
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "view", 10),
            (1, "click", 5),          # after first view → converts
            (1, "purchase", 6),
        ],
    )
    got = {
        r.step_name: r.n_users
        for r in funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_retention_offsets_are_user_relative(spark):
    """Week offsets count from each user's OWN first event, and the
    cohort week is the calendar week of that first event."""
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "view", 24 * 8),     # offset 0 and 1
            (2, "view", 24 * 7), (2, "view", 24 * 7),  # single week, offset 0
        ],
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    d0 = datetime.date(2024, 1, 1).toordinal() - datetime.date(1970, 1, 1).toordinal()
    w1, w2 = d0 // 7, (d0 + 7) // 7
    assert got == {(w1, 0): 1, (w1, 1): 1, (w2, 0): 1}
