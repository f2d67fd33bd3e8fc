"""Incremental aggregate maintenance: refresh(state(v0), diff) must be
BIT-IDENTICAL to state(v1) — including group disappearance, groups born
in the delta, NULL group keys, and chained refreshes."""

from __future__ import annotations

from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.incremental import (
    agg_refresh,
    agg_result,
    agg_state,
)

KEYS = ["g"]
MEASURES = {"sum_x": ("x", 2)}


def _diff(spark, da, db):
    """Row-level diff the same way LakeRepo.diff builds it."""
    removed = da.exceptAll(db).withColumn("__change", F.lit("removed"))
    added = db.exceptAll(da).withColumn("__change", F.lit("added"))
    return removed.unionByName(added)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _mk(spark, data):
    return spark.createDataFrame(data, "g STRING, x DOUBLE")


def test_refresh_equals_rebuild(spark):
    v0 = _mk(spark, [("a", 1.25), ("a", 2.50), ("b", 10.00), (None, 7.75)])
    v1 = _mk(
        spark,
        [
            ("a", 1.25),          # unchanged
            ("a", 99.99),         # replaces 2.50
            (None, 7.75),         # NULL group unchanged
            (None, 0.25),         # NULL group grows
            ("c", 5.00),          # group born in delta
        ],                         # group b vanishes entirely
    )
    state0 = agg_state(v0, KEYS, MEASURES)
    refreshed = agg_refresh(state0, _diff(spark, v0, v1), KEYS, MEASURES)
    rebuilt = agg_state(v1, KEYS, MEASURES)
    assert _rows(refreshed) == _rows(rebuilt)
    # vanished group really is gone, born group really is present
    gs = {r[0] for r in refreshed.collect()}
    assert "b" not in gs and "c" in gs and None in gs


def test_chained_refreshes_stay_exact(spark):
    """Three refresh steps end exactly where a from-scratch rebuild of the
    final version lands — no drift accumulates (the float-sum failure
    mode this module exists to avoid)."""
    versions = [
        [("a", 0.01), ("b", 0.02)],
        [("a", 0.01), ("a", 0.03), ("b", 0.02)],
        [("a", 0.03), ("b", 0.04), ("c", 0.05)],
        [("c", 0.05)],
    ]
    dfs = [_mk(spark, v) for v in versions]
    state = agg_state(dfs[0], KEYS, MEASURES)
    for prev, cur in zip(dfs, dfs[1:]):
        state = agg_refresh(state, _diff(spark, prev, cur), KEYS, MEASURES)
    assert _rows(state) == _rows(agg_state(dfs[-1], KEYS, MEASURES))


def test_empty_diff_is_identity(spark):
    v0 = _mk(spark, [("a", 1.0), ("b", 2.0)])
    state0 = agg_state(v0, KEYS, MEASURES)
    refreshed = agg_refresh(state0, _diff(spark, v0, v0), KEYS, MEASURES)
    assert _rows(refreshed) == _rows(state0)


def test_result_rendering(spark):
    v0 = _mk(spark, [("a", 1.25), ("a", 2.50)])
    out = agg_result(agg_state(v0, KEYS, MEASURES), KEYS, MEASURES)
    assert out.columns == ["g", "n_rows", "sum_x"]
    r = out.collect()[0]
    assert (r.g, r.n_rows, r.sum_x) == ("a", 2, 3.75)
