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


import pytest


@pytest.mark.parametrize(
    "name",
    [
        "dedup_simhash",
        "dedup_embedding_cosine",
        "dedup_embedding_cosine_hier",
        "dedup_minhash_lsh",
    ],
)
def test_window_dedup_ann_no_allpairs_plan(spark, name):
    """The 100 TB stress gate for the window's dedup/ANN entries: every
    candidate generator must be banded/bucketed/blocked — a regression to
    an all-pairs product (CartesianProduct or BroadcastNestedLoopJoin in
    the physical plan) fails HERE, not on the cluster. Built through the
    registry so the guard covers exactly what the driver runs."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries

    df = all_queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: all-pairs product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"


def test_sim_ann_only_intentional_bnlj(spark):
    """sim_ann unions three ANN flavors. Exactly ONE
    BroadcastNestedLoopJoin is BY DESIGN and must not grow: the
    brute-force baseline's `nbr != query_id` join (brute force IS the
    all-pairs reference, broadcast query side). The LSH flavor joins on
    bucket, and the trained-IVF flavor assigns cells map-side (round 4) —
    both pure equi-join plans. Any NEW nested-loop/cartesian node is a
    scale regression and fails here."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries

    df = all_queries()["sim_ann"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
