"""ALTER TABLE ... ALTER COLUMN ... TYPE — metadata-only lossless type
widening (r14, Delta type-widening parity). One schema step; existing
files keep their narrow physical encoding and re-read through an exact
cast; appends land the wide type; time travel before the ALTER shows
the narrow schema. Only hops on the lossless lattice are legal."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


@pytest.fixture()
def lsql(spark, repo):
    return LakeSQL(spark, repo, "main")


def test_widen_is_metadata_only_and_time_travels(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, x FLOAT)")
    lsql.sql("INSERT INTO t VALUES (1, CAST(1.5 AS FLOAT)), (2, CAST(2.5 AS FLOAT))")
    files = sorted(repo.current_files("main", "t"))
    v_pre = repo.head("main").version
    lsql.sql("ALTER TABLE t ALTER COLUMN k TYPE BIGINT")
    lsql.sql("ALTER TABLE t ALTER COLUMN x TYPE DOUBLE")
    # zero file rewrites: the commit carried the same entries
    assert sorted(repo.current_files("main", "t")) == files
    df = repo.read_table(spark, "t", "main")
    assert df.schema.simpleString() == "struct<k:bigint,x:double>"
    assert sorted((r.k, r.x) for r in df.collect()) == [(1, 1.5), (2, 2.5)]
    # appends land values only the wide type can hold
    lsql.sql(f"INSERT INTO t VALUES ({2**40}, 3.5)")
    assert repo.read_table(spark, "t", "main").where(
        F.col("k") == 2**40
    ).count() == 1
    # time travel before the ALTER shows the narrow schema
    old = repo.read_table(spark, "t", "main", version_as_of=v_pre)
    assert old.schema.simpleString() == "struct<k:int,x:float>"
    # SHOW CREATE reflects the widened type
    stmt = lsql.sql("SHOW CREATE TABLE t").first().createtab_stmt
    assert "k bigint" in stmt and "x double" in stmt


def test_widen_refusals(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t (k BIGINT, n INT, s STRING, "
        "i INT GENERATED ALWAYS AS IDENTITY)"
    )
    lsql.sql("ALTER TABLE t ADD COLUMN g BIGINT GENERATED ALWAYS AS (n + 1)")
    for bad in (
        "ALTER TABLE t ALTER COLUMN k TYPE INT",       # narrowing
        "ALTER TABLE t ALTER COLUMN k TYPE DOUBLE",    # precision loss
        "ALTER TABLE t ALTER COLUMN n TYPE INT",       # same type
        "ALTER TABLE t ALTER COLUMN s TYPE BIGINT",    # non-numeric
        "ALTER TABLE t ALTER COLUMN i TYPE BIGINT",    # identity
        "ALTER TABLE t ALTER COLUMN g TYPE BIGINT",    # generated
    ):
        with pytest.raises((ValueError, KeyError)):
            lsql.sql(bad)
    with pytest.raises(KeyError):
        lsql.sql("ALTER TABLE t ALTER COLUMN nope TYPE BIGINT")
    # nothing staged behind the refusals
    assert repo.status("main") == {}


def test_widen_composes_with_rename_and_branches(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k SMALLINT, v STRING)")
    lsql.sql("INSERT INTO t VALUES (CAST(7 AS SMALLINT), 'a')")
    lsql.sql("ALTER TABLE t ALTER COLUMN k TYPE INT")
    lsql.sql("ALTER TABLE t RENAME COLUMN k TO kk")
    lsql.sql("ALTER TABLE t ALTER COLUMN kk TYPE BIGINT")
    df = repo.read_table(spark, "t", "main")
    assert df.schema.simpleString() == "struct<kk:bigint,v:string>"
    assert [r.kk for r in df.collect()] == [7]
    # the widened map rides branches like every schema step
    repo.create_branch("b", "main")
    lsql_b = LakeSQL(spark, repo, "b")
    lsql_b.sql(f"INSERT INTO t VALUES ({2**35}, 'big')")
    assert repo.read_table(spark, "t", "b").count() == 2
    assert repo.read_table(spark, "t", "main").count() == 1


def test_foreign_type_mix_stays_loud_without_widen_step(spark, repo, lsql):
    """r14 review: the per-era fallback is legal ONLY when the schema
    map carries a widen step — an incompatible file mix smuggled in by
    reference (foreign writer) must keep failing loudly, never be
    silently union-coerced."""
    lsql.sql("CREATE TABLE a (k INT)")
    lsql.sql("INSERT INTO a VALUES (1)")
    lsql.sql("CREATE TABLE b (k DOUBLE)")
    lsql.sql("INSERT INTO b VALUES (2.5)")
    # force a mixed file list under one table name (adoption-style)
    files = repo.current_files("main", "a") + repo.current_files("main", "b")
    repo.stage_table_files("main", "a", files)
    # give the table a schema map WITHOUT a widen step (add era)
    repo.commit("main", "mixed")
    lsql.sql("ALTER TABLE a ADD COLUMN extra STRING")
    with pytest.raises(Exception, match="(?i)merg"):
        repo.read_table(spark, "a", "main").collect()


def test_widened_table_streams_with_wide_schema(spark, repo):
    """The stream source pins the declared WIDE type for every era, so
    a narrow-era file and a wide append stream back identically to the
    batch read; absence of the widened column stays a loud error."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("CREATE TABLE t (k INT, v STRING)")
    lsql.sql("INSERT INTO t VALUES (1, 'a')")
    lsql.sql("ALTER TABLE t ALTER COLUMN k TYPE BIGINT")
    lsql.sql(f"INSERT INTO t VALUES ({2**40}, 'b')")
    name = f"widen_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, "t")
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    assert dict(out.dtypes)["k"] == "bigint"
    assert sorted((r.k, r.v) for r in out.collect()) == [
        (1, "a"),
        (2**40, "b"),
    ]
