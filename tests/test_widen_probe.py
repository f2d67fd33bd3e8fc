"""r15 code-shape pins (VERDICT r14 #6): the `_widen` shuffle-probe must
match plan NODE names, not raw substrings, and `write_table` must not
record a schema pin for partitioned writes (including the 0-row flat
rewrite) or for non-footer-round-tripping types."""

import os

from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import _widen
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.stats import (
    nullable_schema_json,
    read_group_manifest,
)


def test_widen_ignores_column_named_join(spark, tmp_path):
    # a narrow one-file scan whose COLUMN is literally named "Join" (and
    # a literal containing "Sort"): the old substring probe skipped the
    # widen for it
    p = str(tmp_path / "one.parquet")
    spark.range(5).coalesce(1).select(F.col("id").alias("Join")).write.parquet(p)
    df = spark.read.parquet(p).select(
        "Join", F.lit("Window marker Sort").alias("txt")
    )
    target = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() < target, "fixture must start narrow"
    out = _widen(df, "Join")
    assert out.rdd.getNumPartitions() == target, (
        "a column named like a plan node must still widen"
    )


def test_widen_still_skips_real_shuffle_nodes(spark):
    base = spark.range(50).select(F.col("id").alias("k"))
    agg = base.groupBy("k").count()
    assert _widen(agg, "k") is agg, "an Aggregate subtree must skip the widen"
    jn = base.join(base.withColumnRenamed("k", "k2"), F.col("k") == F.col("k2"))
    assert _widen(jn, "k") is jn, "a Join subtree must skip the widen"


def _group_manifests(repo):
    out = []
    for dirpath, _dn, fns in os.walk(os.path.join(repo.root, "data")):
        m = read_group_manifest(dirpath)
        if m is not None:
            out.append(m)
    return out


def test_partitioned_empty_write_records_no_pin(spark, tmp_path):
    repo = LakeRepo.init(str(tmp_path / "r"))
    empty = spark.range(0).select(
        F.col("id").alias("k"), F.lit("a").alias("p")
    )
    repo.write_table("main", "t", empty, partition_by=["p"])
    repo.commit("main", "v1")
    ms = _group_manifests(repo)
    assert ms, "the 0-row flat rewrite still writes a manifest"
    assert all(not m.get("spark_schema") for m in ms), (
        "partitioned writes must not record a schema pin"
    )
    # and the read still returns the full (partition-bearing) schema
    got = repo.read_table(spark, "t", "main")
    assert set(got.columns) == {"k", "p"}
    assert got.count() == 0


def test_partitioned_write_records_no_pin(spark, tmp_path):
    repo = LakeRepo.init(str(tmp_path / "r"))
    df = spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    repo.commit("main", "v1")
    ms = _group_manifests(repo)
    assert ms
    assert all(not m.get("spark_schema") for m in ms)
    assert repo.read_table(spark, "t", "main").count() == 4


def test_nullable_schema_json_skips_non_roundtripping_types(spark):
    from pyspark.sql.types import (
        ArrayType,
        CharType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
        VarcharType,
    )

    ok = StructType([StructField("a", LongType()), StructField("b", StringType())])
    assert nullable_schema_json(ok) is not None
    for bad_dt in (CharType(3), VarcharType(3), TimestampNTZType()):
        bad = StructType([StructField("a", bad_dt)])
        assert nullable_schema_json(bad) is None
        nested = StructType(
            [StructField("a", ArrayType(bad_dt)), StructField("b", LongType())]
        )
        assert nullable_schema_json(nested) is None
