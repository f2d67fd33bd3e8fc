"""CREATE TABLE ... PARTITIONED BY + SHOW PARTITIONS (r13, VERDICT r12
#1): the declared-partitioning DDL surface. The spec rides a reserved
TBLPROPERTIES key (branch/merge/clone/push/time-travel for free), every
write path honors it (INSERT / MERGE / COPY INTO / DML rewrites), DML on
the partition column carries untouched partition dirs by reference, and
SHOW PARTITIONS lists live Hive dirs metadata-only."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import (
    PARTITION_PROP,
    LakeRepo,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


@pytest.fixture()
def lsql(spark, repo):
    return LakeSQL(spark, repo, "main")


def _parts(lsql, table):
    return [r.partition for r in lsql.sql(f"SHOW PARTITIONS {table}").collect()]


def test_create_insert_show_partitions_and_pruned_dml(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, v STRING, p INT) PARTITIONED BY (p)")
    assert repo.table_partition_columns("t", "main") == ["p"]
    # empty table: no live partitions yet, but reads carry the schema
    assert _parts(lsql, "t") == []
    assert repo.read_table(spark, "t", "main").columns == ["k", "v", "p"]

    lsql.sql(
        "INSERT INTO t SELECT CAST(id AS INT), CONCAT('v', id), "
        "CAST(id % 3 AS INT) FROM range(300)"
    )
    assert _parts(lsql, "t") == ["p=0", "p=1", "p=2"]

    # partition-column DELETE: untouched partition dirs carried by
    # reference (the pruned-rewrite pin, mirroring versioned_delete_prune)
    res = lsql.sql("DELETE FROM t WHERE p = 1").collect()[0]
    assert res.rows_affected == 100
    carried = [
        f for f in repo.current_files("main", "t") if "=" in f.rsplit("/", 1)[-1]
    ]
    assert sorted(f.rsplit("/", 1)[-1] for f in carried) == ["p=0", "p=2"]
    assert _parts(lsql, "t") == ["p=0", "p=2"]

    # pruned read on the partition column scans fewer files
    pr = repo.read_table(spark, "t", "main", prune_where="p = 2")
    full = repo.read_table(spark, "t", "main")
    assert len(pr.inputFiles()) < len(full.inputFiles())
    assert pr.filter("p = 2").count() == 100
    assert full.count() == 200


def test_every_write_path_honors_the_spec(spark, repo, lsql, tmp_path):
    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql("INSERT INTO t VALUES (1, 0), (2, 1)")
    # MERGE INTO rewrites keep the layout
    lsql.sql(
        "MERGE INTO t USING (SELECT 2 AS k, 7 AS delta) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET k = t.k + s.delta "
        "WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, 2)"
    )
    assert _parts(lsql, "t") == ["p=0", "p=1"]
    # COPY INTO appends partition too
    land = str(tmp_path / "landing")
    spark.createDataFrame([(50, 5)], "k INT, p INT").coalesce(1).write.parquet(
        land
    )
    lsql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    assert _parts(lsql, "t") == ["p=0", "p=1", "p=5"]
    got = sorted(
        tuple(r) for r in repo.read_table(spark, "t", "main").collect()
    )
    assert got == [(1, 0), (9, 1), (50, 5)]
    # every data-bearing snapshot entry is Hive-partitioned
    for rel in repo.current_files("main", "t"):
        full = os.path.join(repo.root, rel)
        pqs = [
            os.path.join(dp, fn)
            for dp, _, fns in os.walk(full)
            for fn in fns
            if fn.endswith(".parquet")
        ]
        sized = [p for p in pqs if os.path.getsize(p) > 0]
        assert all("p=" in p for p in sized) or not sized


def test_ctas_partitioned_and_delete_all_keeps_schema(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t2 PARTITIONED BY (p) AS "
        "SELECT id AS k, CAST(id % 2 AS INT) AS p FROM range(10)"
    )
    assert repo.table_partition_columns("t2", "main") == ["p"]
    assert _parts(lsql, "t2") == ["p=0", "p=1"]
    # a rewrite to 0 rows must still leave a readable, schema-carrying
    # snapshot (0-row partitionBy writes produce no files at all)
    res = lsql.sql("DELETE FROM t2").collect()[0]
    assert res.rows_affected == 10
    t2 = repo.read_table(spark, "t2", "main")
    assert t2.count() == 0 and t2.columns == ["k", "p"]
    assert _parts(lsql, "t2") == []


def test_spec_rides_branches_merges_and_time_travel(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql("INSERT INTO t VALUES (1, 0)")
    repo.create_branch("dev", "main")
    dev = LakeSQL(spark, repo, "dev")
    dev.sql("INSERT INTO t VALUES (2, 9)")
    assert repo.table_partition_columns("t", "dev") == ["p"]
    assert _parts(dev, "t") == ["p=0", "p=9"]
    assert _parts(lsql, "t") == ["p=0"]  # main unaffected pre-merge
    repo.merge(spark, "dev", "main")
    assert _parts(lsql, "t") == ["p=0", "p=9"]
    # time travel: the old snapshot still reads (per-group basePath)
    v_now = repo.head("main").version
    old = repo.read_table(spark, "t", "main", version_as_of=v_now - 1)
    assert sorted(tuple(r) for r in old.collect()) == [(1, 0)]


def test_partitioning_guards(spark, repo, lsql):
    with pytest.raises(ValueError, match="every column"):
        lsql.sql("CREATE TABLE b1 (a INT) PARTITIONED BY (a)")
    with pytest.raises(ValueError, match="not in the table schema"):
        lsql.sql("CREATE TABLE b2 (a INT, b INT) PARTITIONED BY (zz)")
    with pytest.raises(ValueError, match="duplicate"):
        lsql.sql("CREATE TABLE b3 (a INT, b INT, c INT) PARTITIONED BY (b, b)")
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql(
            "CREATE TABLE b4 (a INT GENERATED ALWAYS AS IDENTITY, b INT) "
            "PARTITIONED BY (a)"
        )
    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql("CREATE TABLE flat (k INT)")
    with pytest.raises(ValueError, match="no declared"):
        lsql.sql("SHOW PARTITIONS flat")
    # the partition column is pinned: no rename, no drop, no prop edits
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        repo.alter_rename_column(spark, "main", "t", "p", "q")
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        repo.alter_drop_column(spark, "main", "t", "p")
    with pytest.raises(ValueError, match="reserved"):
        repo.set_table_properties("main", "t", {PARTITION_PROP: "k"})
    with pytest.raises(ValueError, match="reserved"):
        repo.unset_table_properties("main", "t", [PARTITION_PROP])
    # a conflicting explicit partition_by forks the layout -> refused
    df = spark.createDataFrame([(1, 2)], "k INT, p INT")
    with pytest.raises(ValueError, match="conflicts"):
        repo.write_table("main", "t", df, partition_by=["k"])
    # a frame missing the partition column is refused loudly
    with pytest.raises(ValueError, match="absent"):
        repo.write_table("main", "t", df.select("k"), mode="append")


def test_replace_clears_the_spec(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql("CREATE OR REPLACE TABLE t (k INT, p INT)")
    assert repo.table_partition_columns("t", "main") == []
    lsql.sql("INSERT INTO t VALUES (1, 1)")
    with pytest.raises(ValueError, match="no declared"):
        lsql.sql("SHOW PARTITIONS t")


@pytest.mark.slow
def test_insert_replace_where(spark, repo, lsql):
    """r13: INSERT INTO ... REPLACE WHERE — Delta's atomic
    predicate-scoped overwrite. One commit, untouched partition dirs
    carried by reference, inserted rows must satisfy the predicate,
    identity allocation continues through it."""
    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql(
        "INSERT INTO t SELECT CAST(id AS INT), CAST(id % 3 AS INT) "
        "FROM range(300)"
    )
    v0 = repo.head("main").version
    r = lsql.sql(
        "INSERT INTO t REPLACE WHERE p = 1 "
        "SELECT CAST(id + 1000 AS INT), CAST(1 AS INT) FROM range(5)"
    ).first()
    assert (r.num_deleted, r.num_inserted) == (100, 5)
    assert repo.head("main").version == v0 + 1  # ONE commit
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 205
    assert sorted(x.k for x in t.where("p = 1").collect()) == list(
        range(1000, 1005)
    )
    carried = [
        f for f in repo.current_files("main", "t") if "=" in f.rsplit("/", 1)[-1]
    ]
    assert sorted(f.rsplit("/", 1)[-1] for f in carried) == ["p=0", "p=2"]
    # a source row violating the predicate rejects the whole statement
    with pytest.raises(ValueError, match="do NOT satisfy"):
        lsql.sql("INSERT INTO t REPLACE WHERE p = 1 SELECT 1, 2")
    assert repo.head("main").version == v0 + 1  # nothing landed
    # time travel reads the pre-replace rows
    old = repo.read_table(spark, "t", "main", version_as_of=v0)
    assert old.where("p = 1").count() == 100

    # identity table: allocation continues, engine fills the column
    lsql.sql("CREATE TABLE ti (k INT GENERATED ALWAYS AS IDENTITY, v INT)")
    lsql.sql("INSERT INTO ti (v) VALUES (1), (2), (100)")
    r2 = lsql.sql("INSERT INTO ti REPLACE WHERE v >= 100 SELECT 200").first()
    assert (r2.num_deleted, r2.num_inserted) == (1, 1)
    got = sorted(tuple(x) for x in repo.read_table(spark, "ti", "main").collect())
    assert got == [(1, 1), (2, 2), (4, 200)]

    # replace-everything degenerates to an overwrite; empty source to a
    # plain predicate delete
    r3 = lsql.sql("INSERT INTO ti REPLACE WHERE TRUE SELECT 7").first()
    assert (r3.num_deleted, r3.num_inserted) == (3, 1)
    r4 = lsql.sql(
        "INSERT INTO ti REPLACE WHERE v = 7 SELECT CAST(v AS INT) FROM "
        "(SELECT 1 AS v) WHERE v < 0"
    ).first()
    assert (r4.num_deleted, r4.num_inserted) == (1, 0)
    assert repo.read_table(spark, "ti", "main").count() == 0

def test_insert_replace_where_atomic_on_failure(spark, repo, lsql):
    """r14 (ADVICE r13 high): a failure AFTER the delete half is staged
    (here a CHECK violation in the insert append) must restore the
    pre-statement staged entry — otherwise the branch is left dirty
    with a delete-only state the next COMMIT silently sweeps in."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql(
        "INSERT INTO t SELECT CAST(id AS INT), CAST(id % 3 AS INT) "
        "FROM range(300)"
    )
    lsql.sql("ALTER TABLE t ADD CONSTRAINT k_small CHECK (k < 1000)")
    v0 = repo.head("main").version
    assert repo.staged_entry("main", "t") is None
    with pytest.raises(ConstraintViolation):
        lsql.sql(
            "INSERT INTO t REPLACE WHERE p = 1 "
            "SELECT CAST(id + 5000 AS INT), CAST(1 AS INT) FROM range(5)"
        )
    # staged state restored: no delete-only entry left to sweep in
    assert repo.staged_entry("main", "t") is None
    assert repo.head("main").version == v0
    live = repo.read_table(spark, "t", "main", include_staged=True)
    assert live.count() == 300
    assert live.where("p = 1").count() == 100
    # the branch's next DML commits cleanly on the intact table
    lsql.sql("INSERT INTO t VALUES (999, 1)")
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 301
    assert t.where("p = 1").count() == 101

    # same discipline on an UNPARTITIONED table (the non-pruned branch:
    # the delete half is a staged full overwrite, not a file split)
    lsql.sql("CREATE TABLE u (k INT, g INT)")
    lsql.sql(
        "INSERT INTO u SELECT CAST(id AS INT), CAST(id % 2 AS INT) "
        "FROM range(100)"
    )
    lsql.sql("ALTER TABLE u ADD CONSTRAINT k_small CHECK (k < 1000)")
    with pytest.raises(ConstraintViolation):
        lsql.sql("INSERT INTO u REPLACE WHERE g = 0 SELECT 5000, 0")
    assert repo.staged_entry("main", "u") is None
    assert repo.read_table(spark, "u", "main", include_staged=True).count() == 100


def test_insert_replace_where_rejects_subquery_cond(spark, repo, lsql):
    """r14 (ADVICE r13 medium): the REPLACE WHERE condition is bound
    with raw F.expr outside the repo rewriter, where a subquery's table
    names resolve against the Spark session catalog — refuse up front,
    the _dv_routable rule (the insert BODY may of course contain
    SELECT)."""
    lsql.sql("CREATE TABLE t (k INT, p INT)")
    lsql.sql("INSERT INTO t VALUES (1, 1), (2, 2)")
    with pytest.raises(ValueError, match="subquery"):
        lsql.sql(
            "INSERT INTO t REPLACE WHERE p = (SELECT 1) SELECT 9, 1"
        )
    # nothing staged, nothing committed by the refusal
    assert repo.staged_entry("main", "t") is None
    assert repo.read_table(spark, "t", "main").count() == 2

def test_show_partitions_manifest_backed_and_partial_spec(
    spark, repo, lsql, monkeypatch
):
    """r14 (VERDICT r13 #3): SHOW PARTITIONS reads partition dirs from
    the group manifests' per-file rel paths — zero os.walk on a clean
    snapshot (pinned by making os.walk raise) — stays correct on files
    carried by reference across branch merges, and supports Spark's
    partial PARTITION (k=v) spec filter."""
    lsql.sql(
        "CREATE TABLE t (k INT, p INT, q STRING) PARTITIONED BY (p, q)"
    )
    lsql.sql(
        "INSERT INTO t SELECT CAST(id AS INT), CAST(id % 2 AS INT), "
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END FROM range(60)"
    )
    want = ["p=0/q=a", "p=0/q=b", "p=1/q=a", "p=1/q=b"]
    assert _parts(lsql, "t") == want

    # the manifest path: a clean snapshot never lists directories
    import manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo as repo_mod

    def no_walk(*a, **kw):
        raise AssertionError("SHOW PARTITIONS must not os.walk a clean snapshot")

    monkeypatch.setattr(repo_mod.os, "walk", no_walk)
    assert _parts(lsql, "t") == want
    monkeypatch.undo()

    # partial-spec filter, SQL surface; quoted strings and bare ints
    rows = lsql.sql("SHOW PARTITIONS t PARTITION (p = 1)").collect()
    assert [r.partition for r in rows] == ["p=1/q=a", "p=1/q=b"]
    rows = lsql.sql("SHOW PARTITIONS t PARTITION (q = 'a', p = 0)").collect()
    assert [r.partition for r in rows] == ["p=0/q=a"]
    with pytest.raises(ValueError, match="not partition columns"):
        lsql.sql("SHOW PARTITIONS t PARTITION (k = 1)")
    with pytest.raises(ValueError, match="malformed"):
        lsql.sql("SHOW PARTITIONS t PARTITION (p)")
    # a quoted value containing ',' or ')' is ONE pair, not malformed
    # (r14 review) — it simply matches nothing here
    assert lsql.sql("SHOW PARTITIONS t PARTITION (q = 'a,b')").count() == 0
    assert lsql.sql("SHOW PARTITIONS t PARTITION (q = 'a)b')").count() == 0

    # carried-by-reference correctness across a branch merge: the pruned
    # DELETE stages untouched partition SUBDIRS as entries; merge carries
    # them — listing must still see every live partition
    repo.create_branch("dev", "main")
    dev = type(lsql)(spark, repo, "dev")
    dev.sql("DELETE FROM t WHERE p = 0")
    repo.merge(spark, "dev", "main")
    assert _parts(lsql, "t") == ["p=1/q=a", "p=1/q=b"]
    assert [
        r.partition
        for r in lsql.sql("SHOW PARTITIONS t PARTITION (q = 'b')").collect()
    ] == ["p=1/q=b"]

def test_insert_replace_where_failure_restores_dv_companion(spark, repo, lsql):
    """r14 review: on a DV-bearing table, the delete half's overwrite
    stages a __dv__ DROP (write_table's obsolete-vector rule); a failed
    insert must restore THAT entry too, or the orphaned drop resurrects
    DV-deleted rows on the next commit."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import (
        DV_PREFIX,
        ConstraintViolation,
    )

    lsql.sql("CREATE TABLE t (k INT, p INT)")
    lsql.sql(
        "INSERT INTO t SELECT CAST(id AS INT), CAST(id % 2 AS INT) "
        "FROM range(100)"
    )
    lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
    lsql.sql("DELETE FROM t WHERE k < 40")  # rides a deletion vector
    lsql.sql("ALTER TABLE t ADD CONSTRAINT k_small CHECK (k < 1000)")
    assert repo.read_table(spark, "t", "main").count() == 60
    with pytest.raises(ConstraintViolation):
        lsql.sql("INSERT INTO t REPLACE WHERE p = 1 SELECT 5000, 1")
    assert repo.staged_entry("main", "t") is None
    assert repo.staged_entry("main", DV_PREFIX + "t") is None
    # deleted rows stay deleted, now and after the next commit
    assert repo.read_table(spark, "t", "main").count() == 60
    lsql.sql("INSERT INTO t VALUES (999, 1)")
    assert repo.read_table(spark, "t", "main").count() == 61
