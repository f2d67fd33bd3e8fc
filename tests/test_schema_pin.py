"""r14 optimization internals: manifest schema pinning and manifest-based
rows_affected.

The read path may skip parquet footer inference ONLY when that changes
nothing observable: pinned schemas must equal inferred ones bit-for-bit,
vanished data must stay a loud failure (not an empty scan), and
rows_affected must stay exact with or without a manifest."""

import os

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.stats import (
    STATS_NAME,
    read_group_manifest,
)


def _df(spark, n=10):
    return spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_manifest_records_written_schema_and_pin_matches_inference(spark, tmp_path):
    repo = LakeRepo.init(str(tmp_path / "r"))
    repo.write_table("main", "t", _df(spark))
    repo.commit("main", "v1")
    rels = repo.head("main").tables["t"]
    m = read_group_manifest(os.path.join(repo.root, rels[0]))
    assert m and m.get("spark_schema"), "write_table must record the schema"
    paths = [os.path.join(repo.root, r) for r in rels]
    pinned = repo._pinned_schema(paths)
    assert pinned is not None
    # the pin must be EXACTLY what inference returns — schema and rows
    inferred = spark.read.parquet(*paths)
    assert pinned == inferred.schema
    got = repo.read_table(spark, "t", "main")
    assert got.schema == inferred.schema
    assert got.count() == 10


def test_pinned_read_stays_loud_when_data_files_vanish(spark, tmp_path):
    repo = LakeRepo.init(str(tmp_path / "r"))
    repo.write_table("main", "t", _df(spark))
    repo.commit("main", "v1")
    # delete the parquet files but keep the manifest: the pin knows the
    # schema, but scanning must FAIL like inference did, never return an
    # empty frame (silent data loss)
    for dirpath, _dn, fns in os.walk(os.path.join(repo.root, "data")):
        for fn in fns:
            if fn.endswith(".parquet"):
                os.unlink(os.path.join(dirpath, fn))
    with pytest.raises(Exception):
        repo.read_table(spark, "t", "main").count()


def test_insert_rows_affected_with_and_without_manifest(spark, tmp_path):
    repo = LakeRepo.init(str(tmp_path / "r"))
    repo.write_table("main", "t", _df(spark, 3))
    repo.commit("main", "v1")
    sql = LakeSQL(spark, repo, "main")
    r = sql.sql("INSERT INTO t VALUES (100, 'x', 1.0), (101, 'y', 2.0)").first()
    assert r.rows_affected == 2
    # strip every manifest: the count() fallback must report identically
    killed = 0
    for dirpath, _dn, fns in os.walk(os.path.join(repo.root, "data")):
        for fn in fns:
            if fn == STATS_NAME:
                os.unlink(os.path.join(dirpath, fn))
                killed += 1
    assert killed > 0
    r2 = sql.sql("INSERT INTO t VALUES (102, 'z', 3.0)").first()
    assert r2.rows_affected == 1
    assert repo.read_table(spark, "t", "main").count() == 6


def test_widened_table_era_split_reads_identically(spark, tmp_path):
    repo = LakeRepo.init(str(tmp_path / "r"))
    repo.write_table(
        "main",
        "t",
        spark.range(4).select(F.col("id").cast("int").alias("k")),
    )
    repo.commit("main", "v1")
    sql = LakeSQL(spark, repo, "main")
    sql.sql("ALTER TABLE t ALTER COLUMN k TYPE BIGINT")
    sql.sql(f"INSERT INTO t VALUES ({2**40})")
    got = sorted(r.k for r in sql.sql("SELECT k FROM t").collect())
    assert got == [0, 1, 2, 3, 2**40]
    # both eras carry manifests, so the split keyed on them (no footer
    # probe, no failed merge attempt) — same rows, long type
    f = sql.sql("SELECT k FROM t").schema.fields[0]
    assert f.dataType.simpleString() == "bigint"
