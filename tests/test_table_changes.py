"""Batch change-data-feed (r9): table_changes over a version range.

The streaming CDC feed is chaos-tested in test_streaming.py; here we
pin the batch relation: fold-to-state equivalence across every change
kind (append, overwrite, DV delete, DV update, compaction skip), range
bracketing, the un-delete and mid-range-ALTER refusals, and vacuumed
-history loudness.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.changes import table_changes
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _fold(rows):
    c = Counter()
    for r in rows:
        c[(r.k, r.v)] += 1 if r._change_type == "insert" else -1
    assert all(n in (0, 1) for n in c.values()), c
    return sorted(kv for kv, n in c.items() if n > 0)


def test_changes_fold_to_snapshot_diff(spark, repo):
    repo.write_table("main", "t", _kv(spark, 0, 10).coalesce(1))
    c1 = repo.commit("main", "v1")
    repo.write_table("main", "t", _kv(spark, 10, 14).coalesce(1), mode="append")
    c2 = repo.commit("main", "v2")
    repo.delete_where_dv(spark, "main", "t", "k < 3")
    c3 = repo.head("main")
    repo.update_where_dv(spark, "main", "t", "k = 12", {"v": "v + 100"})
    c4 = repo.head("main")
    repo.write_table("main", "t", _kv(spark, 50, 53))  # overwrite
    c5 = repo.commit("main", "v5")

    # the whole range folds to the head snapshot
    rows = table_changes(repo, spark, "t", c1.version).collect()
    head = sorted((r.k, r.v) for r in repo.read_table(spark, "t", "main").collect())
    assert _fold(rows) == head == [(50, 100), (51, 102), (52, 104)]

    # a sub-range folds to the snapshot DIFF: state(c4) from state(c1)
    sub = table_changes(repo, spark, "t", c2.version, c4.version).collect()
    c = Counter()
    for r in sub:
        c[(r.k, r.v)] += 1 if r._change_type == "insert" else -1
    state1 = {(k, 2 * k) for k in range(10)}
    folded = Counter({kv: 1 for kv in state1})
    folded.update(c)
    alive = sorted(kv for kv, n in folded.items() if n > 0)
    at4 = sorted(
        (r.k, r.v)
        for r in repo.read_table(spark, "t", "main", version_as_of=c4.version).collect()
    )
    assert alive == at4

    # per-commit attribution: the DV delete emits exactly its rows
    dv_rows = sorted((r.k, r._change_type) for r in rows if r._commit_version == c3.version)
    assert dv_rows == [(0, "delete"), (1, "delete"), (2, "delete")]
    up = sorted((r.k, r.v, r._change_type) for r in rows if r._commit_version == c4.version)
    assert up == [(12, 24, "delete"), (12, 124, "insert")]
    assert {r._commit_version for r in rows} == {
        c1.version, c2.version, c3.version, c4.version, c5.version
    }


def test_changes_skip_compaction_and_empty_range_schema(spark, repo):
    repo.write_table("main", "t", _kv(spark, 0, 8).repartition(4))
    c1 = repo.commit("main", "v1")
    c2 = repo.compact(spark, "main", "t", target_files=1)
    rows = table_changes(repo, spark, "t", c2.version, c2.version).collect()
    assert rows == []  # data_change=false emits nothing, schema intact
    df = table_changes(repo, spark, "t", c2.version, c2.version)
    assert df.columns == ["k", "v", "_change_type", "_commit_version"]
    # and the full range still folds to head THROUGH the compaction
    assert _fold(table_changes(repo, spark, "t", c1.version).collect()) == [
        (k, 2 * k) for k in range(8)
    ]


def test_changes_refuses_undelete_and_midrange_alter(spark, repo):
    repo.write_table("main", "t", _kv(spark, 0, 6))
    c1 = repo.commit("main", "v1")
    repo.delete_where_dv(spark, "main", "t", "k = 0")
    repo.restore_table("main", "t", c1.version)  # un-delete
    with pytest.raises(ValueError, match="un-delete"):
        table_changes(repo, spark, "t", c1.version).collect()
    repo.alter_rename_column(spark, "main", "t", "v", "vv")
    with pytest.raises(NotImplementedError, match="schema mapping changed"):
        table_changes(repo, spark, "t", c1.version)
    # a post-ALTER range works, names bound logically
    c_alt = repo.head("main")
    repo.write_table(
        "main", "t",
        spark.range(90, 92).select(
            F.col("id").alias("k"), F.lit(7).cast("long").alias("vv")
        ),
        mode="append",
    )
    repo.commit("main", "append post-alter")
    got = table_changes(repo, spark, "t", c_alt.version + 1).collect()
    assert sorted((r.k, r.vv, r._change_type) for r in got) == [
        (90, 7, "insert"), (91, 7, "insert")
    ]


def test_changes_partitioned_table_keeps_partition_columns(spark, repo):
    """Hive-partitioned entries route through per-group basePath reads,
    so the path-encoded partition column survives into the feed."""
    df = spark.range(0, 12).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    c1 = repo.commit("main", "v1")
    repo.delete_where_dv(spark, "main", "t", "k = 4")
    rows = table_changes(repo, spark, "t", c1.version).collect()
    assert {r.p for r in rows if r._change_type == "insert"} == {0, 1, 2}
    deletes = [(r.k, r.p) for r in rows if r._change_type == "delete"]
    assert deletes == [(4, 1)]
    alive = sorted(r.k for r in rows if r._change_type == "insert")
    assert alive == list(range(12))


def test_changes_feed_sql_tvf(spark, repo):
    """TABLE_CHANGES_FEED(t, v1[, v2]) surfaces the batch feed in SQL,
    side by side with the row-minimal TABLE_CHANGES TVF."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo.write_table("main", "t", _kv(spark, 0, 6).coalesce(1))
    c1 = repo.commit("main", "v1")
    repo.delete_where_dv(spark, "main", "t", "k < 2")
    sql = LakeSQL(spark, repo, "main")
    got = sql.sql(
        f"SELECT _change_type, COUNT(*) AS n "
        f"FROM TABLE_CHANGES_FEED(t, {c1.version}) "
        f"GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    assert [(r._change_type, r.n) for r in got] == [("delete", 2), ("insert", 6)]
    # the row-minimal TVF agrees on this history (no rewrites involved)
    got2 = sql.sql(
        f"SELECT _change_type, COUNT(*) AS n FROM TABLE_CHANGES(t, {c1.version}) "
        f"GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    assert [(r._change_type, r.n) for r in got2] == [("delete", 2), ("insert", 6)]


def test_changes_vacuumed_history_is_loud(spark, repo):
    repo.write_table("main", "t", _kv(spark, 0, 5))
    c1 = repo.commit("main", "v1")
    repo.write_table("main", "t", _kv(spark, 5, 8))  # overwrite drops v1 files
    repo.commit("main", "v2")
    repo.vacuum(keep_history=False, grace_seconds=0)
    with pytest.raises(FileNotFoundError, match="vacuum"):
        table_changes(repo, spark, "t", c1.version).collect()
