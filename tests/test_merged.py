"""Plan-shape guards for the tagged multi-op queries (queries/merged.py)."""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE


def test_window_frames_single_exchange(spark):
    """The three frame styles share the user_id partitioning: the plan
    must contain exactly ONE hash exchange (events shuffles once), with
    the window specs stacked on top."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.merged import q_window_frames

    plan = q_window_frames(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_text_metrics_no_shuffle(spark):
    """All four text analyses are map-only column expressions — the plan
    must contain no exchange at all (single scan, no shuffle)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.merged import q_text_metrics

    plan = q_text_metrics(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
