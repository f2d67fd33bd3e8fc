"""Evaluation metrics (round 8): edges the registered oracle pair can't
see — tie handling in the rank AUC, degenerate separations, threshold
boundary inclusivity."""

from __future__ import annotations

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.evaluation import (
    binary_auc,
    confusion_metrics,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "s LONG, label INT")


def test_auc_perfect_and_inverted_and_random(spark):
    perfect = _df(spark, [(10, 1), (11, 1), (1, 0), (2, 0)])
    assert binary_auc(perfect, "s", "label").first().auc_ppm == 1_000_000
    inverted = _df(spark, [(1, 1), (2, 1), (10, 0), (11, 0)])
    assert binary_auc(inverted, "s", "label").first().auc_ppm == 0
    # all scores identical → every pair ties → AUC exactly 1/2
    flat = _df(spark, [(5, 1), (5, 1), (5, 0), (5, 0), (5, 0)])
    r = binary_auc(flat, "s", "label").first()
    assert (r.n_pos, r.n_neg, r.auc_ppm) == (2, 3, 500_000)


def test_auc_ties_count_half(spark):
    # pos scores [2, 1], neg [1]: pairs (2>1)=1, (1==1)=0.5 → AUC=0.75
    df = _df(spark, [(2, 1), (1, 1), (1, 0)])
    assert binary_auc(df, "s", "label").first().auc_ppm == 750_000


def test_auc_over_cap_routes_scalable_and_matches(spark):
    """An unbounded score column (raw floats) would collapse the
    distinct-score prefix-sum window onto one task — over the cap the
    computation reroutes through the range-partitioned prefix sum,
    bit-identical to the one-window spelling at any partitioning."""
    import random

    rnd = random.Random(13)
    rows = [(rnd.randint(0, 10**9), i % 3 == 0) for i in range(500)]
    wide = spark.createDataFrame(
        [(s, int(l)) for s, l in rows], "s LONG, label INT"
    ).repartition(7)
    one_window = binary_auc(wide, "s", "label", max_distinct_scores=None).first()
    scalable = binary_auc(wide, "s", "label", max_distinct_scores=10).first()
    assert tuple(scalable) == tuple(one_window)
    # ties + duplicates across the range boundaries
    tied = _df(spark, [(i % 7, i % 2) for i in range(300)]).repartition(5)
    a = binary_auc(tied, "s", "label", max_distinct_scores=2).first()
    b = binary_auc(tied, "s", "label", max_distinct_scores=None).first()
    assert tuple(a) == tuple(b)
    # at the cap exactly: the fast path still runs
    wide40 = _df(spark, [(i, i % 2) for i in range(40)])
    assert binary_auc(wide40, "s", "label", max_distinct_scores=40).first().n_pos == 20


def test_confusion_threshold_is_inclusive(spark):
    df = _df(spark, [(10, 1), (9, 1), (10, 0), (0, 0)])
    r = confusion_metrics(df, "s", "label", 10).first()
    # score >= 10 predicts positive: tp=1 (10,1), fn=1 (9,1), fp=1 (10,0), tn=1
    assert (r.tp, r.fp, r.tn, r.fn) == (1, 1, 1, 1)
    assert r.precision_ppm == 500_000 and r.recall_ppm == 500_000
    assert r.f1_ppm == 500_000


def test_auc_empty_input_is_null_on_both_paths(spark):
    """Review-found (r10): SUM over zero rows is NULL — the eager
    (guarded) path must agree with the lazy path and the SQL twin
    instead of coercing to 0."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.evaluation import binary_auc

    empty = spark.range(0).selectExpr(
        "CAST(id AS double) AS s", "CAST(id % 2 AS int) AS label"
    )
    guarded = binary_auc(empty, "s", "label").first()
    lazy = binary_auc(empty, "s", "label", max_distinct_scores=None).first()
    assert tuple(guarded) == tuple(lazy) == (None, None, None)
