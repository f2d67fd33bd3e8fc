"""Metadata-only schema evolution (Delta column-mapping parity):
ALTER TABLE ADD/RENAME/DROP COLUMN rewrite zero data files — the mapping
is a versioned object replayed on read, so it rides branches, merges,
diffs, and time travel like any other versioned state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


def _base(spark, repo, rows=((1, "a", 10.0), (2, "b", 20.0))):
    df = spark.createDataFrame(list(rows), "k LONG, name STRING, v DOUBLE")
    repo.write_table("main", "t", df)
    repo.commit("main", "base")


def test_add_column_metadata_only_nulls_on_old_rows(spark, repo):
    _base(spark, repo)
    before = repo.current_files("main", "t")
    repo.alter_add_column(spark, "main", "t", "score", "INT")
    assert repo.current_files("main", "t") == before  # zero files rewritten
    t = repo.read_table(spark, "t", "main")
    assert t.columns == ["k", "name", "v", "score"]
    assert t.filter("score IS NULL").count() == 2
    # appends carry the column; declared type is pinned on read
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(3, "c", 30.0, 7)], "k LONG, name STRING, v DOUBLE, score INT"),
        mode="append",
    )
    repo.commit("main", "append with score")
    t = repo.read_table(spark, "t", "main")
    assert t.filter("score = 7").count() == 1
    assert dict(t.dtypes)["score"] == "int"


def test_rename_column_merges_old_and_new_eras(spark, repo):
    _base(spark, repo)
    before = repo.current_files("main", "t")
    repo.alter_rename_column(spark, "main", "t", "v", "price")
    assert repo.current_files("main", "t") == before
    t = repo.read_table(spark, "t", "main")
    assert "price" in t.columns and "v" not in t.columns
    assert {r.price for r in t.collect()} == {10.0, 20.0}
    # post-rename appends write the new physical name; both eras merge
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(3, "c", 30.0)], "k LONG, name STRING, price DOUBLE"),
        mode="append",
    )
    repo.commit("main", "append new era")
    t = repo.read_table(spark, "t", "main")
    assert sorted(r.price for r in t.collect()) == [10.0, 20.0, 30.0]
    # the old physical name is consumed: writing it again is rejected
    with pytest.raises(ValueError, match="renamed away or dropped"):
        repo.write_table(
            "main",
            "t",
            spark.createDataFrame([(9, "z", 1.0)], "k LONG, name STRING, v DOUBLE"),
            mode="append",
        )


def test_drop_column_and_tombstone(spark, repo):
    _base(spark, repo)
    repo.alter_drop_column(spark, "main", "t", "name")
    t = repo.read_table(spark, "t", "main")
    assert t.columns == ["k", "v"]
    # re-adding a dropped name is forbidden (old bytes would resurface)
    with pytest.raises(ValueError, match="renamed away or dropped"):
        repo.alter_add_column(spark, "main", "t", "name", "STRING")
    # dropping the only remaining... (two left; drop one more is fine)
    repo.alter_drop_column(spark, "main", "t", "v")
    with pytest.raises(ValueError, match="only column"):
        repo.alter_drop_column(spark, "main", "t", "k")


def test_time_travel_sees_old_schema(spark, repo):
    _base(spark, repo)
    v_before = repo.head("main").version
    repo.alter_rename_column(spark, "main", "t", "v", "price")
    repo.alter_add_column(spark, "main", "t", "score", "INT")
    old = repo.read_table(spark, "t", "main", version_as_of=v_before)
    assert old.columns == ["k", "name", "v"]
    new = repo.read_table(spark, "t", "main")
    assert new.columns == ["k", "name", "price", "score"]


def test_constraint_blocks_rename_and_drop(spark, repo):
    _base(spark, repo)
    repo.add_constraint(spark, "main", "t", "v_pos", "v > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        repo.alter_rename_column(spark, "main", "t", "v", "price")
    with pytest.raises(ValueError, match="CHECK constraint"):
        repo.alter_drop_column(spark, "main", "t", "v")
    # unreferenced columns still evolve freely
    repo.alter_rename_column(spark, "main", "t", "name", "label")
    assert "label" in repo.read_table(spark, "t", "main").columns


def test_sql_alter_column_surface_and_describe(spark, repo):
    _base(spark, repo)
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("ALTER TABLE t RENAME COLUMN v TO price")
    lsql.sql("ALTER TABLE t ADD COLUMN score INT")
    lsql.sql("ALTER TABLE t DROP COLUMN name")
    desc = {r.col_name for r in lsql.sql("DESCRIBE TABLE t").collect()}
    assert desc == {"k", "price", "score"}
    got = lsql.sql("SELECT k, price FROM t ORDER BY k").collect()
    assert [(r.k, r.price) for r in got] == [(1, 10.0), (2, 20.0)]
    # SELECT at an old version sees the old schema through time travel
    hist = lsql.sql("DESCRIBE HISTORY t").collect()
    first_v = min(r.version for r in hist)
    old = lsql.sql(f"SELECT * FROM t VERSION AS OF {first_v}")
    assert old.columns == ["k", "name", "v"]


def test_sql_dml_on_column_mapped_table(spark, repo):
    """DELETE/UPDATE (incl. the pruned file-skipping path) bind against
    the LOGICAL schema on a column-mapped table."""
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    ).repartitionByRange(4, "k").sortWithinPartitions("k")
    repo.write_table("main", "t", df)
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("ALTER TABLE t RENAME COLUMN k TO key")
    res = lsql.sql("DELETE FROM t WHERE key < 500").collect()[0]
    assert res.rows_affected == 500
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 1500 and t.agg(F.min("key")).collect()[0][0] == 500
    res = lsql.sql("UPDATE t SET v = 0.0 WHERE key >= 1900").collect()[0]
    assert res.rows_affected == 100
    assert repo.read_table(spark, "t", "main").filter("v = 0.0").count() == 100


def test_mapping_rides_branches_and_merges(spark, repo):
    _base(spark, repo)
    repo.create_branch("dev", "main")
    lsql = LakeSQL(spark, repo, "dev")
    lsql.sql("ALTER TABLE t RENAME COLUMN v TO price")
    # main unaffected until merge
    assert "v" in repo.read_table(spark, "t", "main").columns
    repo.merge(spark, "dev", "main")
    assert "price" in repo.read_table(spark, "t", "main").columns


def test_replace_and_drop_table_clear_mapping(spark, repo):
    _base(spark, repo)
    repo.alter_rename_column(spark, "main", "t", "v", "price")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("CREATE OR REPLACE TABLE t AS SELECT 1 AS v")
    # the new table's physical column v is NOT remapped to price
    assert repo.read_table(spark, "t", "main").columns == ["v"]
    # DROP TABLE clears the mapping for future same-name tables
    repo.write_table("main", "u", spark.range(3).selectExpr("id AS a"))
    repo.commit("main", "u")
    repo.alter_rename_column(spark, "main", "u", "a", "b")
    lsql.sql("DROP TABLE u")
    repo.write_table("main", "u", spark.range(3).selectExpr("id AS a"))
    repo.commit("main", "u again")
    assert repo.read_table(spark, "u", "main").columns == ["a"]


def test_alter_requires_clean_branch(spark, repo):
    _base(spark, repo)
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(9, "x", 9.0)], "k LONG, name STRING, v DOUBLE"),
        mode="append",
    )
    with pytest.raises(Exception, match="staged"):
        repo.alter_rename_column(spark, "main", "t", "v", "price")


def test_shallow_clone_zero_copy_and_divergence(spark, repo):
    """SHALLOW CLONE: O(1) metadata pointer at the source's files (no
    data copied), constraints and column mapping carried, then the two
    tables diverge copy-on-write; vacuum keeps shared files."""
    _base(spark, repo)
    repo.add_constraint(spark, "main", "t", "v_pos", "v > 0")
    repo.alter_rename_column(spark, "main", "t", "name", "label")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("CREATE TABLE t2 SHALLOW CLONE t")
    # same physical files — nothing copied
    assert repo.current_files("main", "t2") == repo.current_files("main", "t")
    t2 = repo.read_table(spark, "t2", "main")
    assert t2.columns == ["k", "label", "v"]  # mapping carried
    assert "v_pos" in repo.table_constraints("t2", "main")  # constraint carried
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        repo.write_table(
            "main",
            "t2",
            spark.createDataFrame([(5, "e", -1.0)], "k LONG, label STRING, v DOUBLE"),
            mode="append",
        )
    # divergence: write to clone, source unchanged
    repo.write_table(
        "main",
        "t2",
        spark.createDataFrame([(5, "e", 5.0)], "k LONG, label STRING, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "t2 grows")
    assert repo.read_table(spark, "t2", "main").count() == 3
    assert repo.read_table(spark, "t", "main").count() == 2
    # vacuum must not reclaim files shared with the clone
    repo.vacuum(keep_history=False, grace_seconds=0.0)
    assert repo.read_table(spark, "t", "main").count() == 2
    assert repo.read_table(spark, "t2", "main").count() == 3
    # cloning onto an existing name is rejected
    with pytest.raises(ValueError, match="already exists"):
        repo.clone_table("main", "t", "t2")


def test_merge_enforces_constraints_on_column_mapped_table(spark, repo):
    """Review fix: merge adopting files into a branch whose table is
    column-mapped must bind CHECK constraints by LOGICAL names — a raw
    physical read would skip them as unresolvable and merge violating
    rows in permanently."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    _base(spark, repo)
    repo.create_branch("dev", "main")
    lsql_dev = LakeSQL(spark, repo, "dev")
    lsql_dev.sql("ALTER TABLE t RENAME COLUMN v TO price")
    lsql_dev.sql("ALTER TABLE t ADD CONSTRAINT price_pos CHECK (price > 0)")
    # main (no mapping there) appends a row whose logical price is -5
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(7, "bad", -5.0)], "k LONG, name STRING, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "negative v on main")
    with pytest.raises(ConstraintViolation):
        repo.merge(spark, "main", "dev")
    # dev still clean: constraint holds over its current state
    assert repo.read_table(spark, "t", "dev").filter("price <= 0").count() == 0


def test_era_mixed_column_order_is_pinned(spark, repo):
    """Review fix: after renaming the FIRST column and appending a
    new-era file, the logical column order must be the recorded base
    order with the rename applied in place — not whatever order the
    parquet union schema happens to produce — so positional INSERT
    stays correct."""
    _base(spark, repo)
    repo.alter_rename_column(spark, "main", "t", "k", "key")
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(3, "c", 30.0)], "key LONG, name STRING, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "new era")
    t = repo.read_table(spark, "t", "main")
    assert t.columns == ["key", "name", "v"]
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("INSERT INTO t VALUES (9, 'z', 90.0)")
    got = {r.key: (r.name, r.v) for r in repo.read_table(spark, "t", "main").collect()}
    assert got[9] == ("z", 90.0)  # positional alignment landed correctly


def test_alter_commit_failure_rolls_back_staged_mapping(spark, repo):
    """Review fix: if the ALTER's commit fails (e.g. CAS conflict), the
    staged mapping object must not linger to be swept into the next
    unrelated COMMIT under a misleading message."""
    _base(spark, repo)
    real_commit = repo.commit

    def dying_commit(*a, **k):
        raise RuntimeError("simulated commit failure")

    repo.commit = dying_commit
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            repo.alter_rename_column(spark, "main", "t", "v", "price")
    finally:
        repo.commit = real_commit
    assert repo.status("main") == {}  # nothing staged lingers
    repo.write_table("main", "u", spark.range(2).selectExpr("id AS x"))
    repo.commit("main", "unrelated")
    assert "v" in repo.read_table(spark, "t", "main").columns  # no stealth rename


def test_clone_commit_failure_rolls_back(spark, repo):
    _base(spark, repo)
    real_commit = repo.commit

    def dying_commit(*a, **k):
        raise RuntimeError("simulated commit failure")

    repo.commit = dying_commit
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            repo.clone_table("main", "t", "t2")
    finally:
        repo.commit = real_commit
    assert repo.status("main") == {}
    assert "t2" not in repo.list_tables("main")


def test_generated_column_recomputed_on_read(spark, repo):
    """GENERATED ALWAYS AS: metadata-only, recomputed from the logical
    schema on every read — never stored, retroactive for old files, and
    DML keeps it consistent by construction."""
    _base(spark, repo)
    before = repo.current_files("main", "t")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("ALTER TABLE t ADD COLUMN v2 DOUBLE GENERATED ALWAYS AS (v * 2)")
    assert repo.current_files("main", "t") == before  # zero files rewritten
    t = repo.read_table(spark, "t", "main")
    assert t.columns == ["k", "name", "v", "v2"]
    assert {(r.v, r.v2) for r in t.collect()} == {(10.0, 20.0), (20.0, 40.0)}
    # appends don't provide it; a provided copy is stripped, not stored
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(3, "c", 30.0)], "k LONG, name STRING, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "append")
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame(
            [(4, "d", 40.0, 999.0)], "k LONG, name STRING, v DOUBLE, v2 DOUBLE"
        ),
        mode="append",
    )
    repo.commit("main", "append with bogus v2")
    got = {r.k: r.v2 for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: 20.0, 2: 40.0, 3: 60.0, 4: 80.0}  # 999 discarded
    # INSERT aligns against stored columns only
    lsql.sql("INSERT INTO t VALUES (5, 'e', 50.0)")
    assert repo.read_table(spark, "t", "main").filter("v2 = 100.0").count() == 1
    # UPDATE of the source column flows through; SET on the gen col errors
    lsql.sql("UPDATE t SET v = 100.0 WHERE k = 1")
    assert repo.read_table(spark, "t", "main").filter("k = 1").collect()[0].v2 == 200.0
    with pytest.raises(ValueError, match="GENERATED"):
        lsql.sql("UPDATE t SET v2 = 1.0 WHERE k = 1")
    # time travel: versions before the ALTER don't have the column
    hist = repo.log("main", limit=None)
    first = hist[-1].version + 1  # version of the 'base' commit
    old = repo.read_table(spark, "t", "main", version_as_of=first)
    assert "v2" not in old.columns


def test_generated_column_guards(spark, repo):
    _base(spark, repo)
    # bad expression rejected eagerly, nothing staged/committed
    with pytest.raises(Exception):
        repo.alter_add_generated_column(
            spark, "main", "t", "bad", "DOUBLE", "no_such_col + 1"
        )
    assert repo.status("main") == {}
    repo.alter_add_generated_column(spark, "main", "t", "v2", "DOUBLE", "v * 2")
    # the referenced source can be neither renamed nor dropped
    with pytest.raises(ValueError, match="GENERATED"):
        repo.alter_rename_column(spark, "main", "t", "v", "price")
    with pytest.raises(ValueError, match="GENERATED"):
        repo.alter_drop_column(spark, "main", "t", "v")
    # the generated column itself can be dropped; then the source moves
    repo.alter_drop_column(spark, "main", "t", "v2")
    repo.alter_rename_column(spark, "main", "t", "v", "price")
    assert repo.read_table(spark, "t", "main").columns == ["k", "name", "price"]


def test_generated_column_redefinition_and_constraints(spark, repo):
    """Review fixes: (a) dropping a generated column frees its name (no
    data ever existed under it), so the expression can be redefined;
    (b) a CHECK constraint on a generated column actually fires at
    write time (enforcement replays the mapping over the new files);
    (c) the SQL form accepts nested-paren expressions."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    _base(spark, repo)
    lsql = LakeSQL(spark, repo, "main")
    # (c) expression ending in a function call parses intact
    lsql.sql("ALTER TABLE t ADD COLUMN nu STRING GENERATED ALWAYS AS (upper(name))")
    assert {r.nu for r in repo.read_table(spark, "t", "main").collect()} == {"A", "B"}
    # (a) drop + redefine with a different expression
    repo.alter_drop_column(spark, "main", "t", "nu")
    lsql.sql("ALTER TABLE t ADD COLUMN nu STRING GENERATED ALWAYS AS (lower(name))")
    assert {r.nu for r in repo.read_table(spark, "t", "main").collect()} == {"a", "b"}
    # (b) constraint on a generated column gates writes
    repo.alter_drop_column(spark, "main", "t", "nu")
    repo.alter_add_generated_column(spark, "main", "t", "v2", "DOUBLE", "v * 2")
    repo.add_constraint(spark, "main", "t", "v2_small", "v2 < 100")
    with pytest.raises(ConstraintViolation):
        repo.write_table(
            "main",
            "t",
            spark.createDataFrame([(9, "x", 500.0)], "k LONG, name STRING, v DOUBLE"),
            mode="append",
        )
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(9, "x", 30.0)], "k LONG, name STRING, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "ok append")
    assert repo.read_table(spark, "t", "main").filter("v2 = 60.0").count() == 1


def test_optimize_compaction_on_column_mapped_table(spark, repo):
    """OPTIMIZE (compaction) on a renamed+generated table reads the
    LOGICAL schema and rewrites physical files under it — data, order
    pin, and recompute-on-read must all survive the rewrite."""
    _base(spark, repo)
    repo.write_table(
        "main",
        "t",
        spark.createDataFrame([(3, "c", 30.0)], "k LONG, name STRING, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "second file")
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("ALTER TABLE t RENAME COLUMN v TO price")
    lsql.sql("ALTER TABLE t ADD COLUMN p2 DOUBLE GENERATED ALWAYS AS (price * 2)")
    lsql.sql("OPTIMIZE t INTO 1 FILES")
    out = repo.read_table(spark, "t", "main")
    assert out.columns == ["k", "name", "price", "p2"]
    got = sorted((r.k, r.price, r.p2) for r in out.collect())
    assert got == [(1, 10.0, 20.0), (2, 20.0, 40.0), (3, 30.0, 60.0)]
    # time travel to the pre-ALTER version still shows the old schema
    first_v = min(c.version for c in repo.log("main", limit=None))
    old = repo.read_table(spark, "t", "main", version_as_of=first_v + 1)
    assert "v" in old.columns and "price" not in old.columns


def test_sql_dispatch_hygiene_for_new_statements(spark, repo):
    """Malformed spellings of the r6 statements must fail loudly (fall
    through to the rewriter / raise), never silently mis-dispatch."""
    _base(spark, repo)
    lsql = LakeSQL(spark, repo, "main")
    for bad in (
        "ALTER TABLE t ADD COLUMN score",          # missing type
        "ALTER TABLE t RENAME COLUMN v",           # missing TO
        "ALTER TABLE t DROP",                      # missing COLUMN/CONSTRAINT
        "CREATE TABLE t2 CLONE t",                 # missing SHALLOW
        "COPY t TO out_parquet",                   # unquoted path
        "VACUUM RETAIN VERSIONS",                  # missing n
    ):
        with pytest.raises(Exception):
            lsql.sql(bad)
    # and none of them left staged junk behind
    assert repo.status("main") == {}
    # well-formed spellings with odd spacing still dispatch
    lsql.sql("ALTER  TABLE  t  ADD  COLUMN  s2  DOUBLE")
    assert "s2" in repo.read_table(spark, "t", "main").columns
