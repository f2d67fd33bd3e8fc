"""File-level data skipping: stats manifests, the conservative predicate
evaluator, pruned DELETE/UPDATE rewrites, pruned reads, and vacuum safety
for part-file references. Property test at the bottom drives random simple
predicates through the pruned DELETE and checks bit-identical results vs
the unpruned rewrite."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import stats as S


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


def _clustered(spark, n=4000, files=8):
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("grp"),
        F.concat(F.lit("n_"), F.format_string("%06d", F.col("id"))).alias("name"),
        F.when(F.col("id") % 11 == 0, None).otherwise(F.col("id") * 1.5).alias("v"),
    )
    return df.repartitionByRange(files, F.col("k")).sortWithinPartitions("k")


# ---------------------------------------------------------------------------
# predicate evaluator unit tests (pure metadata, no Spark)
# ---------------------------------------------------------------------------

ST = {
    "rows": 100,
    "cols": {
        "k": {"min": 10, "max": 20, "nulls": 0},
        "name": {"min": "bbb", "max": "ddd", "nulls": 5},
        "allnull": {"min": None, "max": None, "nulls": 100},
    },
}


@pytest.mark.parametrize(
    "cond,expected",
    [
        ("k < 10", False),
        ("k < 11", True),
        ("k <= 10", True),
        ("k > 20", False),
        ("k >= 20", True),
        ("k = 15", True),
        ("k = 21", False),
        ("k != 15", True),
        ("15 > k", True),
        ("9 > k", False),
        ("k BETWEEN 21 AND 30", False),
        ("k BETWEEN 20 AND 30", True),
        ("k IN (1, 2, 3)", False),
        ("k IN (1, 2, 15)", True),
        ("k = NULL", False),
        ("name = 'aaa'", False),
        ("name = 'ccc'", True),
        ("name < 'bbb'", False),
        ("name IS NULL", True),
        ("k IS NULL", False),
        ("k IS NOT NULL", True),
        ("allnull = 5", False),
        ("allnull IS NULL", True),
        ("allnull IS NOT NULL", False),
        ("k < 10 OR name = 'ccc'", True),
        ("k < 10 OR name = 'aaa'", False),
        ("k > 5 AND k < 10", False),
        ("(k > 5) AND (name = 'ccc')", True),
        ("NOT (k = 15)", True),  # NOT is opaque → conservative may-match
        ("missing_col = 7", True),  # unknown column → may-match
        ("k = 15 AND some_func(name) = 1", True),  # recovered subtree
        ("k < 10 AND some_func(name) = 1", False),  # AND still prunes
    ],
)
def test_predicate_can_match(cond, expected):
    pred = S.parse_predicate(cond)
    assert pred is not None, cond
    assert pred.can_match(ST) is expected, cond


def test_predicate_unparseable_returns_none():
    assert S.parse_predicate("((((") is None
    assert S.parse_predicate("") is None


def test_fully_supported_flags_recovered_subtrees():
    assert S.fully_supported(S.parse_predicate("k < 5 AND name = 'x'"))
    assert not S.fully_supported(S.parse_predicate("k < 5 AND f(name) = 1"))
    assert not S.fully_supported(S.parse_predicate("NOT (k = 5)"))
    assert not S.fully_supported(
        S.parse_predicate("k IN (SELECT k FROM t)")
    ) or S.parse_predicate("k IN (SELECT k FROM t)") is None


def test_big_int_bounds_compare_exactly():
    # 2^53+1 collapses under float; Decimal comparison must not
    st = {"rows": 1, "cols": {"k": {"min": 2**53 + 1, "max": 2**53 + 1, "nulls": 0}}}
    assert S.parse_predicate(f"k = {2**53}").can_match(st) is False
    assert S.parse_predicate(f"k = {2**53 + 1}").can_match(st) is True


# ---------------------------------------------------------------------------
# stats manifests
# ---------------------------------------------------------------------------


def test_write_table_persists_stats_manifest(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    (rel,) = repo.current_files("main", "t")
    with open(os.path.join(repo.root, rel, S.STATS_NAME)) as f:
        man = json.load(f)
    assert len(man["files"]) == 8
    for st in man["files"].values():
        assert st["rows"] > 0
        assert st["cols"]["k"]["min"] <= st["cols"]["k"]["max"]
        assert st["cols"]["name"]["min"].startswith("n_")
        # v has injected nulls; counts must be recorded
        assert st["cols"]["v"]["nulls"] >= 0
    # range clustering → per-file k ranges are disjoint
    spans = sorted(
        (st["cols"]["k"]["min"], st["cols"]["k"]["max"]) for st in man["files"].values()
    )
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_manifest_ignored_by_spark_reader(spark, repo):
    repo.write_table("main", "t", _clustered(spark, n=100, files=2))
    repo.commit("main", "base")
    assert repo.read_table(spark, "t", "main").count() == 100


def test_load_group_stats_computes_when_manifest_missing(spark, repo):
    repo.write_table("main", "t", _clustered(spark, n=100, files=2))
    repo.commit("main", "base")
    (rel,) = repo.current_files("main", "t")
    os.remove(os.path.join(repo.root, rel, S.STATS_NAME))
    man = S.load_group_stats(os.path.join(repo.root, rel))
    assert man is not None and len(man["files"]) == 2


# ---------------------------------------------------------------------------
# pruned DML
# ---------------------------------------------------------------------------


def test_delete_pruned_carries_safe_files_by_reference(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    before = repo.current_files("main", "t")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM t WHERE k < 500").collect()[0]
    assert res.rows_affected == 500
    after = repo.current_files("main", "t")
    reused = [f for f in after if f.endswith(".parquet")]
    # 8 range-clustered files: at most 2 overlap k<500, the rest reused
    assert len(reused) >= 6
    assert all(f.startswith(before[0]) for f in reused)
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 3500
    assert t.agg(F.min("k")).collect()[0][0] == 500


def test_delete_pruned_matches_full_rewrite(spark, repo):
    df = _clustered(spark)
    repo.write_table("main", "t", df)
    repo.write_table("main", "u", df)
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    cond = "grp BETWEEN 10 AND 20 OR k >= 3900"
    lsql.sql(f"DELETE FROM t WHERE {cond}")
    # u: force the full path by making the predicate opaque to the parser
    lsql.sql(f"DELETE FROM u WHERE ({cond}) AND abs(1) = 1")
    a = repo.read_table(spark, "t", "main")
    b = repo.read_table(spark, "u", "main")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_delete_no_match_is_metadata_only(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    before = repo.current_files("main", "t")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM t WHERE k > 999999").collect()[0]
    assert res.rows_affected == 0
    after = repo.current_files("main", "t")
    # every file proved safe → identical part-file set, nothing rewritten
    assert sorted(os.path.basename(f) for f in after) == sorted(
        S._part_files(os.path.join(repo.root, before[0]))
    )


def test_update_pruned_rewrites_only_overlap(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("UPDATE t SET name = 'HIT' WHERE k >= 3800").collect()[0]
    assert res.rows_affected == 200
    after = repo.current_files("main", "t")
    assert len([f for f in after if f.endswith(".parquet")]) >= 6
    t = repo.read_table(spark, "t", "main")
    assert t.filter("name = 'HIT'").count() == 200
    assert t.count() == 4000


def test_update_with_subquery_set_falls_back(spark, repo):
    repo.write_table("main", "t", _clustered(spark, n=200, files=2))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql(
        "UPDATE t SET v = (SELECT MAX(k) FROM t) WHERE k < 50"
    ).collect()[0]
    assert res.rows_affected == 50
    t = repo.read_table(spark, "t", "main")
    assert t.filter("v = 199.0").count() == 50


def test_null_condition_rows_survive_pruned_delete(spark, repo):
    # v is null on k % 11 == 0; `v < X` is NULL there → rows survive
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM t WHERE v < 300.0")
    t = repo.read_table(spark, "t", "main")
    # deleted: non-null v<300 → k in (1..199 minus multiples of 11)
    assert t.filter("k < 200 AND k % 11 = 0").count() == 19  # 0,11,...,198
    assert t.filter("k < 200 AND k % 11 != 0").count() == 0


def test_time_travel_intact_after_pruned_dml(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    c0 = repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM t WHERE k < 1000")
    old = repo.read_table(spark, "t", "main", version_as_of=c0.version)
    assert old.count() == 4000


def test_vacuum_keeps_dirs_referenced_by_part_files(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM t WHERE k < 1000")
    repo.vacuum(keep_history=False, grace_seconds=0)
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 3000 and t.agg(F.min("k")).collect()[0][0] == 1000


def test_pruned_read_skips_files(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    full = repo.read_table(spark, "t", "main")
    pruned = repo.read_table(spark, "t", "main", prune_where="k BETWEEN 2000 AND 2100")
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert (
        pruned.filter("k BETWEEN 2000 AND 2100").count()
        == full.filter("k BETWEEN 2000 AND 2100").count()
        == 101
    )


def test_partitioned_delete_on_data_column(spark, repo):
    # k < 30 overlaps every partition → whole-group rewrite, still correct
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM t WHERE k < 30").collect()[0]
    assert res.rows_affected == 30
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 270
    assert set(t.select("p").distinct().toPandas()["p"]) == {0, 1, 2}


def test_partitioned_delete_on_partition_column_carries_other_partitions(spark, repo):
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM t WHERE p = 1 AND k < 250").collect()[0]
    assert res.rows_affected == len([i for i in range(250) if i % 3 == 1])
    after = repo.current_files("main", "t")
    # p=0 and p=2 partition dirs carried by reference, p=1 rewritten
    carried = [f for f in after if "=" in f]
    assert sorted(f.rsplit("/", 1)[-1] for f in carried) == ["p=0", "p=2"]
    t = repo.read_table(spark, "t", "main")
    # partition column survives the basePath read of carried subdirs
    assert set(t.select("p").distinct().toPandas()["p"]) == {0, 1, 2}
    assert t.count() == 300 - res.rows_affected
    assert t.where("p = 0").count() == 100
    # chain a second pruned DML over the carried subdir references
    res2 = lsql.sql("DELETE FROM t WHERE p = 0").collect()[0]
    assert res2.rows_affected == 100
    t2 = repo.read_table(spark, "t", "main")
    assert set(t2.select("p").distinct().toPandas()["p"]) == {1, 2}
    assert t2.count() == 200 - len([i for i in range(250) if i % 3 == 1])


def test_partitioned_pruned_read_on_partition_column(spark, repo):
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    repo.commit("main", "base")
    pr = repo.read_table(spark, "t", "main", prune_where="p = 2")
    full = repo.read_table(spark, "t", "main")
    assert len(pr.inputFiles()) < len(full.inputFiles())
    assert pr.filter("p = 2").count() == 100


def test_compact_then_selective_delete_is_cheap(spark, repo):
    # the intended 100 TB flow: compact(sort_by=key) → pruned DML
    repo.write_table("main", "t", _clustered(spark).repartition(16))
    repo.commit("main", "messy")
    repo.compact(spark, "main", "t", target_files=8, sort_by=["k"])
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM t WHERE k = 1234")
    after = repo.current_files("main", "t")
    assert len([f for f in after if f.endswith(".parquet")]) == 7
    assert repo.read_table(spark, "t", "main").count() == 3999


def test_sql_select_auto_file_skipping(spark, repo):
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    df = lsql.sql("SELECT k, name FROM t WHERE k BETWEEN 1000 AND 1050")
    assert len(df.inputFiles()) < 8  # files outside the band skipped
    assert df.count() == 51
    # aggregates / aliases / ORDER BY still prune
    agg = lsql.sql(
        "SELECT grp, COUNT(*) AS n FROM t AS x WHERE k < 500 GROUP BY grp ORDER BY grp"
    )
    assert len(agg.inputFiles()) < 8
    assert agg.agg(F.sum("n")).collect()[0][0] == 500


def test_sql_select_auto_skipping_disabled_when_unsafe(spark, repo):
    df = _clustered(spark)
    repo.write_table("main", "t", df)
    repo.write_table("main", "u", df.select("k"))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    # join: both scans stay full
    j = lsql.sql(
        "SELECT t.k FROM t JOIN u ON t.k = u.k WHERE t.k < 100"
    )
    assert j.count() == 100
    assert len([f for f in j.inputFiles()]) >= 16
    # self-reference via subquery: scalar subquery must see ALL files
    s = lsql.sql("SELECT COUNT(*) AS n FROM t WHERE k > (SELECT MAX(k) - 10 FROM t)")
    assert s.collect()[0].n == 10
    # IS NULL predicate on a single table is safe and uses null counts
    z = lsql.sql("SELECT COUNT(*) AS n FROM t WHERE v IS NULL AND k < 400")
    assert z.collect()[0].n == len([i for i in range(400) if i % 11 == 0])


def test_sql_optimize_sort_by_enables_skipping(spark, repo):
    # messy layout: hash-partitioned, every file spans the full k range
    repo.write_table("main", "t", _clustered(spark).repartition(8, "grp"))
    repo.commit("main", "messy")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM t WHERE k < 100").collect()[0]
    assert res.rows_affected == 100
    # overlapping ranges → nothing provably safe → full rewrite
    assert not any(
        f.endswith(".parquet") for f in repo.current_files("main", "t")
    )
    out = lsql.sql("OPTIMIZE t SORT BY (k) INTO 8 FILES").collect()[0]
    assert out.file_groups == 1
    lsql.sql("DELETE FROM t WHERE k < 200")
    # now range-clustered → most part-files carried by reference
    reused = [f for f in repo.current_files("main", "t") if f.endswith(".parquet")]
    assert len(reused) >= 6
    assert repo.read_table(spark, "t", "main").count() == 3800


def test_sql_optimize_zorder_and_plain(spark, repo):
    repo.write_table("main", "t", _clustered(spark, n=500, files=4))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    v1 = lsql.sql("OPTIMIZE t INTO 2 FILES").collect()[0]
    assert v1.version == 2
    assert repo.read_table(spark, "t", "main").count() == 500
    v2 = lsql.sql("OPTIMIZE t ZORDER BY (k, grp) INTO 4 FILES").collect()[0]
    assert v2.version == 3
    assert repo.read_table(spark, "t", "main").count() == 500


def test_sql_describe_stats(spark, repo):
    repo.write_table("main", "t", _clustered(spark, n=400, files=4))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    df = lsql.sql("DESCRIBE STATS t")
    pdf = df.toPandas()
    assert set(pdf["column"]) == {"k", "grp", "name", "v"}
    krows = pdf[pdf["column"] == "k"]
    assert len(krows) == 4
    assert krows["row_count"].sum() == 400
    # after a pruned DELETE the reused part-files keep their stats rows
    lsql.sql("DELETE FROM t WHERE k < 100")
    pdf2 = lsql.sql("DESCRIBE STATS t").toPandas()
    assert pdf2[pdf2["column"] == "k"]["row_count"].sum() == 300


# ---------------------------------------------------------------------------
# property test: pruned DELETE ≡ full-rewrite DELETE on random predicates
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:
    _comparison = st.one_of(
        st.tuples(
            st.just("k"),
            st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
            st.integers(-10, 4100),
        ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
        st.tuples(st.integers(0, 96), st.integers(0, 96)).map(
            lambda t: f"grp BETWEEN {min(t)} AND {max(t)}"
        ),
        st.lists(st.integers(0, 4100), min_size=1, max_size=4).map(
            lambda v: f"k IN ({', '.join(map(str, v))})"
        ),
        st.sampled_from(["v IS NULL", "v IS NOT NULL", "v < 600.0"]),
    )
    _predicate = st.one_of(
        _comparison,
        st.tuples(_comparison, st.sampled_from(["AND", "OR"]), _comparison).map(
            lambda t: f"({t[0]}) {t[1]} ({t[2]})"
        ),
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(cond=_predicate)
    @pytest.mark.slow
    def test_pruned_delete_equals_full_delete(spark, tmp_path_factory, cond):
        root = str(tmp_path_factory.mktemp("prop") / "lake")
        repo = LakeRepo.init(root)
        df = _clustered(spark, n=1000, files=5)
        repo.write_table("main", "t", df)
        repo.write_table("main", "u", df)
        repo.commit("main", "base")
        lsql = LakeSQL(spark, repo, "main")
        lsql.sql(f"DELETE FROM t WHERE {cond}")
        # identity-wrapped condition defeats the parser → full rewrite
        lsql.sql(f"DELETE FROM u WHERE ({cond}) AND abs(1) = 1")
        a = repo.read_table(spark, "t", "main")
        b = repo.read_table(spark, "u", "main")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        LakeRepo.delete(root)


# ---------------------------------------------------------------------------
# soundness fixes from review: NaN floats, partition escaping, staged state
# ---------------------------------------------------------------------------


def test_nan_rows_survive_no_pruned_delete(spark, repo):
    # parquet footers exclude NaN from min/max while Spark orders NaN
    # greater than everything: files holding NaN must stay candidates
    # for >, >=, != predicates
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 2.0)] + [(i, 0.5) for i in range(10, 20)],
        "k INT, v DOUBLE",
    )
    repo.write_table("main", "t", df.repartitionByRange(3, F.col("k")))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    out = lsql.sql("DELETE FROM t WHERE v > 100.0").collect()[0]
    # Spark: NaN > 100.0 is TRUE → exactly the NaN row is deleted
    assert out.rows_affected == 1
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 12
    assert t.filter("isnan(v)").count() == 0


def test_float_lt_still_prunes(spark, repo):
    # < and <= can never be satisfied by NaN, so float pruning stays
    # effective for them
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM t WHERE v < 300.0")
    after = repo.current_files("main", "t")
    assert len([f for f in after if f.endswith(".parquet")]) >= 6


def test_partition_value_escaping_is_sound(spark, repo):
    df = spark.createDataFrame(
        [(1, "a:b"), (2, "a:b"), (3, "plain")], "k INT, p STRING"
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    # 'a:b' contains ':' → no stats recorded (Spark could type-infer) →
    # conservative full candidacy → the delete must still remove the rows
    out = lsql.sql("DELETE FROM t WHERE p = 'a:b'").collect()[0]
    assert out.rows_affected == 2
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 1 and t.collect()[0].p == "plain"


def test_dml_state_consistent_between_pruned_and_full_paths(spark, repo):
    base = spark.createDataFrame([(i, "x") for i in range(10)], "k INT, s STRING")
    extra = spark.createDataFrame([(100, "staged")], "k INT, s STRING")
    for t in ("a", "b"):
        repo.write_table("main", t, base)
    repo.commit("main", "base")
    # stage an uncommitted append to BOTH tables
    repo.write_table("main", "a", extra, mode="append")
    repo.write_table("main", "b", extra, mode="append")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM a WHERE k < 5")  # parseable → pruned path
    lsql.sql("DELETE FROM b WHERE (k < 5) AND abs(1) = 1")  # opaque → full
    ra = sorted(r.k for r in repo.read_table(spark, "a", "main").collect())
    rb = sorted(r.k for r in repo.read_table(spark, "b", "main").collect())
    assert ra == rb  # same predicate, same committed result, either path


def test_describe_stats_keeps_partition_column_after_pruned_delete(spark, repo):
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    repo.write_table("main", "t", df, partition_by=["p"])
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("DELETE FROM t WHERE p = 1")
    pdf = lsql.sql("DESCRIBE STATS t").toPandas()
    prow = pdf[pdf["column"] == "p"]
    assert set(prow["min"]) >= {"0", "2"}  # carried subdirs still report p


def test_pruned_delete_midway_failure_falls_back_without_loss(spark, repo):
    """ADVICE r5 (sql.py:852): if the pruned path fails AFTER write_table
    staged only the rewritten candidate rows but BEFORE stage_table_files
    restored the safe files, the full-rewrite fallback (include_staged)
    used to read a snapshot missing every safe-file row and commit it —
    silent loss. The staged-entry snapshot/restore must make the fallback
    start from the pre-DML state."""
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")

    real_stage = repo.stage_table_files
    calls = {"n": 0}

    def dying_stage(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated failure before safe-file restore")

    repo.stage_table_files = dying_stage
    try:
        res = lsql.sql("DELETE FROM t WHERE k < 500").collect()[0]
    finally:
        repo.stage_table_files = real_stage
    assert calls["n"] >= 1  # the pruned path ran and died mid-mutation
    assert res.rows_affected == 500
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 3500  # all safe-file rows survived the fallback
    assert t.agg(F.min("k")).collect()[0][0] == 500


def test_pruned_update_midway_failure_falls_back_without_loss(spark, repo):
    """Same staged-state discipline for UPDATE."""
    repo.write_table("main", "t", _clustered(spark))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")

    real_stage = repo.stage_table_files

    def dying_stage(*a, **k):
        raise RuntimeError("simulated failure before safe-file restore")

    repo.stage_table_files = dying_stage
    try:
        res = lsql.sql("UPDATE t SET v = 0.0 WHERE k < 500").collect()[0]
    finally:
        repo.stage_table_files = real_stage
    assert res.rows_affected == 500
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 4000
    assert t.filter("v = 0.0").count() >= 500 - 46  # k<500 minus pre-null rows
    assert t.filter("k >= 500").count() == 3500  # safe rows intact


def test_failed_ctas_replace_restores_staged_constraint_deletion(spark, repo):
    """ADVICE r5 (sql.py _ctas): CREATE OR REPLACE stages the old table's
    constraints-object deletion BEFORE the write (so the new data isn't
    validated against the old constraints); if the write then fails, the
    staged deletion must be rolled back — not left to be swept into the
    next unrelated COMMIT, silently dropping the survivor's constraints."""
    repo.write_table("main", "t", spark.range(5).selectExpr("id AS k"))
    repo.commit("main", "base")
    repo.add_constraint(spark, "main", "t", "k_nonneg", "k >= 0")
    lsql = LakeSQL(spark, repo, "main")

    real_write = repo.write_table

    def dying_write(*a, **k):
        raise RuntimeError("simulated write failure during REPLACE")

    repo.write_table = dying_write
    try:
        with pytest.raises(RuntimeError, match="simulated write failure"):
            lsql.sql("CREATE OR REPLACE TABLE t AS SELECT k * 2 AS k FROM t")
    finally:
        repo.write_table = real_write
    # nothing staged: the constraint-object deletion was rolled back
    assert repo.status("main") == {}
    # an unrelated commit cycle must not sweep away the constraints
    repo.write_table("main", "other", spark.range(3).selectExpr("id AS x"))
    repo.commit("main", "unrelated")
    assert "k_nonneg" in repo.table_constraints("t", "main")
    # and the constraint still enforces
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        repo.write_table(
            "main", "t", spark.createDataFrame([(-1,)], "k LONG"), mode="append"
        )


# ---------------------------------------------------------------------------
# bloom-filter file skipping (r7): point lookups on UNCLUSTERED columns
# ---------------------------------------------------------------------------


def test_bloom_membership_no_false_negatives(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "f.parquet")
    ks = list(range(0, 3000, 3))
    pq.write_table(
        pa.table({"k": ks, "s": [f"v{v}" for v in ks], "f": [v * 0.5 for v in ks]}),
        path,
    )
    bk = S.build_file_bloom(path, "k")
    bs = S.build_file_bloom(path, "s")
    assert bk and bs
    # zero false negatives, ever
    assert all(S._bloom_may_contain(bk, v) for v in ks)
    assert all(S._bloom_may_contain(bs, f"v{v}") for v in ks)
    # absent values: overwhelmingly excluded (deterministic hash — the
    # exact count is stable; assert a loose floor)
    absent = [v for v in range(1, 3000, 3)]
    excluded = sum(0 if S._bloom_may_contain(bk, v) else 1 for v in absent)
    assert excluded / len(absent) > 0.95
    # float columns build no bloom; float literals bypass any bloom
    assert S.build_file_bloom(path, "f") is None
    assert S._bloom_may_contain(bk, 2.5)


def test_bloom_evaluator_integration():
    """_Cmp consults the bloom for '=' (and IN via _Cmp): absence proof
    wins even when min/max overlap; malformed blooms are may-match."""
    import base64

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "f.parquet")
        pq.write_table(pa.table({"k": [10, 500, 990]}), path)
        bloom = S.build_file_bloom(path, "k")
    st = {
        "rows": 3,
        "cols": {"k": {"min": 10, "max": 990, "nulls": 0}},
        "bloom": {"k": bloom},
    }
    assert S.parse_predicate("k = 500").can_match(st)
    assert not S.parse_predicate("k = 501").can_match(st)  # in range, not in bloom
    assert not S.parse_predicate("k IN (499, 501)").can_match(st)
    assert S.parse_predicate("k IN (499, 990)").can_match(st)
    # inequality never consults the bloom
    assert S.parse_predicate("k != 501").can_match(st)
    assert S.parse_predicate("k < 100").can_match(st)
    # malformed bloom → may-match
    bad = dict(st, bloom={"k": {"m": 64, "k": 4, "b64": base64.b64encode(b"x").decode()}})
    assert S.parse_predicate("k = 501").can_match(bad)


def test_bloom_point_delete_skips_unclustered_files(spark, repo):
    """The headline win: hash-distributed keys make every file's min/max
    span the whole domain (range pruning skips NOTHING), yet a bloomed
    point DELETE rewrites only the file(s) whose bloom fires."""
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    repo.write_table(
        "main", "t", df.repartition(8, F.col("k")), bloom_cols=["k"]
    )
    repo.commit("main", "base")
    before = repo.current_files("main", "t")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM t WHERE k = 1234").collect()[0]
    assert res.rows_affected == 1
    after = repo.current_files("main", "t")
    reused = [f for f in after if f.endswith(".parquet")]
    # 8 hash-partitioned files; without blooms min/max reuses nothing —
    # with them at least 6 of 8 are carried by reference (bloom false
    # positives are the only reason fewer than 7 would be)
    assert len(reused) >= 6
    assert all(f.startswith(before[0]) for f in reused)
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 3999 and t.where("k = 1234").count() == 0
    # sanity: without blooms the same layout reuses nothing
    repo.write_table("main", "u", df.repartition(8, F.col("k")))
    repo.commit("main", "u base")
    lsql.sql("DELETE FROM u WHERE k = 1234")
    after_u = repo.current_files("main", "u")
    assert not [f for f in after_u if f.endswith(".parquet")]

def test_bloom_cross_type_probe_stays_may_match(spark, repo):
    """Spark's PromoteStrings coercion makes `int_col = '05'` TRUE for 5,
    but '05' and 5 canonicalize to different bloom bytes — so a probe whose
    literal type differs from the column's must bypass the bloom entirely,
    or pruning proves absence of a row the engine would match."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ipath = os.path.join(d, "i.parquet")
        spath = os.path.join(d, "s.parquet")
        pq.write_table(pa.table({"k": [5, 700]}), ipath)
        pq.write_table(pa.table({"k": [" 5", "x"]}), spath)
        ib = S.build_file_bloom(ipath, "k")
        sb = S.build_file_bloom(spath, "k")
    ist = {"rows": 2, "cols": {"k": {"min": 5, "max": 700, "nulls": 0}},
           "bloom": {"k": ib}}
    sst = {"rows": 2, "cols": {"k": {"min": " 5", "max": "x", "nulls": 0}},
           "bloom": {"k": sb}}
    # cross-type probes: may-match both ways (coercion could equate them)
    assert S.parse_predicate("k = '05'").can_match(ist)
    assert S.parse_predicate("k = 5").can_match(sst)
    # same-type probes still prove absence
    assert not S.parse_predicate("k = 6").can_match(ist)
    assert not S.parse_predicate("k = '5'").can_match(sst)

    # end-to-end: the confirmed repro — DELETE with a non-canonical string
    # literal on a bloomed int column must still delete the coerced match
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    repo.write_table("main", "xt", df.repartition(4, F.col("k")), bloom_cols=["k"])
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    res = lsql.sql("DELETE FROM xt WHERE k = '05'").collect()[0]
    assert res.rows_affected == 1
    t = repo.read_table(spark, "xt", "main")
    assert t.count() == 49 and t.where("k = 5").count() == 0


def test_bloom_multi_column_single_pass(tmp_path):
    """build_file_blooms reads the file once for all columns and matches
    the single-column builder bit-for-bit; absent/unsupported columns are
    simply missing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "m.parquet")
    ks = list(range(100))
    pq.write_table(
        pa.table({"a": ks, "b": [f"v{v}" for v in ks], "f": [v * 0.5 for v in ks]}),
        path,
    )
    out = S.build_file_blooms(path, ["a", "b", "f", "missing"])
    assert set(out) == {"a", "b"}  # float unsupported, missing absent
    assert out["a"] == S.build_file_bloom(path, "a")
    assert out["b"] == S.build_file_bloom(path, "b")


def test_optimize_where_scopes_the_rewrite(spark, repo):
    """r10: OPTIMIZE ... WHERE rewrites only the file entries whose
    stats may match — cold entries carry by reference, the commit is a
    data_change=false rearrangement, reads are unchanged, and the batch
    CDF emits nothing for it."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.changes import table_changes

    # four range-banded single-file appends: provably disjoint k ranges
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    for b in range(4):
        band = df.where(
            (F.col("k") >= b * 1000) & (F.col("k") < (b + 1) * 1000)
        ).coalesce(1)
        repo.write_table("main", "t", band, mode="append")
    base = repo.commit("main", "banded")
    before = set(repo.current_files("main", "t"))
    c = repo.compact(spark, "main", "t", target_files=1, where="k < 500")
    assert c.meta.get("data_change") is False
    after = set(repo.current_files("main", "t"))
    # three cold bands carried by reference (as dirs or their part
    # files); band 0 replaced by one new group
    carried = [
        f
        for f in after
        if any(f == b or f.startswith(b + "/") for b in before)
    ]
    fresh = [f for f in after if f not in carried]
    assert len(carried) == 3 and len(fresh) == 1
    assert repo.read_table(spark, "t", "main").count() == 4000
    assert (
        sorted(r.k for r in repo.read_table(spark, "t", "main").collect())
        == list(range(4000))
    )
    # the CDF over the optimize commit is empty
    feed = table_changes(repo, spark, "t", c.version, c.version).collect()
    assert feed == []
    # nothing-may-match predicate: no-op, no commit
    assert repo.compact(spark, "main", "t", where="k > 100000").id == c.id


def test_optimize_where_materializes_vector_for_selected_files(spark, repo):
    """OPTIMIZE WHERE on a vectored table: positions on the rewritten
    files materialize away; positions on carried files stay vectored;
    reads identical throughout."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import DV_PREFIX

    for b in range(2):
        band = (
            spark.range(b * 100, (b + 1) * 100)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
        repo.write_table("main", "t", band, mode="append")
    repo.commit("main", "banded")
    repo.delete_where_dv(spark, "main", "t", "k IN (5, 150)")
    got0 = sorted(r.k for r in repo.read_table(spark, "t", "main").collect())
    repo.compact(spark, "main", "t", target_files=1, where="k < 100")
    assert (
        sorted(r.k for r in repo.read_table(spark, "t", "main").collect())
        == got0
    )
    dv = repo._read_files(
        spark, repo.current_files("main", DV_PREFIX + "t")
    ).collect()
    assert len(dv) == 1 and dv[0]["pos"] == 50  # only k=150's position left
    # purging the rest clears the vector; reads still identical
    repo.purge_deletion_vectors(spark, "main", "t")
    assert (
        sorted(r.k for r in repo.read_table(spark, "t", "main").collect())
        == got0
    )


def test_sql_optimize_where_with_sort(spark, repo):
    """The SQL spelling composes WHERE with SORT BY and INTO n FILES."""
    df = _clustered(spark, n=2000, files=4)
    repo.write_table("main", "t", df)
    repo.commit("main", "base")
    sql = LakeSQL(spark, repo, "main")
    r = sql.sql(
        "OPTIMIZE t WHERE k < 500 SORT BY (k) INTO 1 FILES"
    ).first()
    assert r.version == repo.head("main").version
    assert sql.sql("SELECT COUNT(*) AS n FROM t").first().n == 2000
    assert sql.sql("SELECT MIN(k) AS m FROM t").first().m == 0


def test_optimize_where_guards(spark, repo):
    """Fourth-review findings: an unparseable / malformed-trailing-clause
    WHERE raises instead of silently rewriting the whole table; and a
    fully-vectored selection still commits a readable (0-row) table,
    never an empty file list."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import DV_PREFIX

    repo.write_table(
        "main", "t",
        spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
    )
    repo.commit("main", "base")
    # unsupported expression shape
    with pytest.raises(ValueError, match="not prunable"):
        repo.compact(spark, "main", "t", where="abs(k) = 1")
    # malformed trailing clause swallowed into the regex's WHERE group
    sql = LakeSQL(spark, repo, "main")
    with pytest.raises(ValueError, match="not prunable"):
        sql.sql("OPTIMIZE t WHERE k < 5 SORT BY k")  # missing parens
    assert not repo.status("main")  # nothing staged by the failures
    # hide EVERY row, then compact the (fully-vectored) file
    repo.delete_where_dv(spark, "main", "t", "k >= 0")
    assert repo.read_table(spark, "t", "main").count() == 0
    c = repo.compact(spark, "main", "t", where="k < 100")
    assert c.meta.get("data_change") is False
    assert repo.read_table(spark, "t", "main").count() == 0  # still readable
    assert DV_PREFIX + "t" not in repo._resolve("main").tables
    # and the table accepts new appends afterwards
    repo.write_table(
        "main", "t",
        spark.range(100, 103).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        mode="append",
    )
    repo.commit("main", "refill")
    assert repo.read_table(spark, "t", "main").count() == 3
