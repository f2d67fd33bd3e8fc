"""ALTER TABLE ... RENAME TO, ALTER VIEW ... AS, and the CREATE VIEW
explicit column list (r14). Rename is pure metadata — file list, DV
companion, and every companion object (constraints, schema map,
tblproperties/partition spec, DEFAULT/IDENTITY metadata, COPY INTO
registry) move BY REFERENCE in one commit; no data file is touched.
A view column list is a positional rename of the SELECT's output,
stored with the view text and replayed at expansion time."""

from __future__ import annotations

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


def test_rename_carries_full_definition_by_reference(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t (k INT GENERATED ALWAYS AS IDENTITY, v STRING, "
        "p INT) PARTITIONED BY (p)"
    )
    lsql.sql("ALTER TABLE t ADD CONSTRAINT p_pos CHECK (p >= 0)")
    lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('team' = 'data')")
    lsql.sql("INSERT INTO t (v, p) VALUES ('a', 1), ('b', 2)")
    files_before = sorted(repo.current_files("main", "t"))
    h0 = repo.head("main")
    lsql.sql("ALTER TABLE t RENAME TO u")
    # exactly ONE commit, and the file list moved BY REFERENCE
    assert repo.head("main").parents == [h0.id]
    assert sorted(repo.current_files("main", "u")) == files_before
    # old name is gone; new name reads the same rows
    with pytest.raises(KeyError):
        repo.read_table(spark, "t", "main")
    assert sorted(
        (r.v, r.p) for r in repo.read_table(spark, "u", "main").collect()
    ) == [("a", 1), ("b", 2)]
    # definition carried: partition spec, constraint, properties
    assert repo.table_partition_columns("u", "main") == ["p"]
    assert repo.table_constraints("u", "main") == {"p_pos": "p >= 0"}
    assert repo.table_properties("u", "main").get("team") == "data"
    with pytest.raises(Exception):  # constraint enforced under new name
        lsql.sql("INSERT INTO u (v, p) VALUES ('x', -5)")
    # identity sequence continues past the rename (colmeta carried)
    lsql.sql("INSERT INTO u (v, p) VALUES ('c', 3)")
    ks = sorted(r.k for r in repo.read_table(spark, "u", "main").collect())
    assert ks == [1, 2, 3]
    # partitioned write landed in the declared layout
    assert "p=3" in repo.show_partitions("u", "main")


def test_rename_time_travel_and_collisions(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (2) AS v(k)")
    v_pre = repo.head("main").version
    lsql.sql("ALTER TABLE t RENAME TO u")
    # time travel: the old name still reads at pre-rename versions
    assert repo.read_table(spark, "t", "main", version_as_of=v_pre).count() == 2
    with pytest.raises(KeyError):
        repo.read_table(spark, "u", "main", version_as_of=v_pre)
    # collisions are loud
    lsql.sql("CREATE TABLE w AS SELECT 1 AS x")
    with pytest.raises(ValueError):
        lsql.sql("ALTER TABLE u RENAME TO w")
    lsql.sql("CREATE VIEW vw AS SELECT k FROM u")
    with pytest.raises(ValueError):
        lsql.sql("ALTER TABLE w RENAME TO vw")
    with pytest.raises(KeyError):
        lsql.sql("ALTER TABLE nope RENAME TO whatever")
    with pytest.raises(ValueError):
        repo.rename_table("main", "u", "__dv__u")
    # failed renames left the branch clean (rollback discipline)
    assert repo.status("main") == {}


def test_rename_rides_deletion_vectors(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (2), (3) AS v(k)")
    lsql.sql("DELETE FROM t WHERE k = 2")  # DV path or prune path
    lsql.sql("ALTER TABLE t RENAME TO u")
    assert sorted(
        r.k for r in repo.read_table(spark, "u", "main").collect()
    ) == [1, 3]


def test_rename_keeps_copy_into_idempotence(spark, repo, lsql, tmp_path):
    src = tmp_path / "land"
    src.mkdir()
    spark.range(5).selectExpr("id AS k").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "batch1"))
    lsql.sql("CREATE TABLE t (k BIGINT)")
    lsql.sql(f"COPY INTO t FROM '{src / 'batch1'}' FILEFORMAT = PARQUET")
    assert repo.read_table(spark, "t", "main").count() == 5
    lsql.sql("ALTER TABLE t RENAME TO u")
    # the loaded-file registry moved with the table: re-COPY skips
    r = lsql.sql(
        f"COPY INTO u FROM '{src / 'batch1'}' FILEFORMAT = PARQUET"
    ).first()
    assert r.num_inserted_rows == 0 and r.num_loaded_files == 0
    assert repo.read_table(spark, "u", "main").count() == 5


def test_rename_breaks_referencing_views_loudly(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT 1 AS k")
    lsql.sql("CREATE VIEW vw AS SELECT k FROM t")
    lsql.sql("ALTER TABLE t RENAME TO u")
    with pytest.raises(Exception):  # late-binding: loud, not silent
        lsql.sql("SELECT * FROM vw").collect()
    # RENAME COLUMN grammar is untouched by the new RENAME TO spelling
    lsql.sql("ALTER TABLE u RENAME COLUMN k TO kk")
    assert repo.read_table(spark, "u", "main").columns == ["kk"]


def test_view_column_list_renames_output(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a'), (2, 'b') AS v(k, s)")
    lsql.sql("CREATE VIEW vw (id, label) AS SELECT k, upper(s) FROM t")
    rows = sorted(
        (r.id, r.label) for r in lsql.sql("SELECT id, label FROM vw").collect()
    )
    assert rows == [(1, "A"), (2, "B")]
    # SHOW CREATE TABLE emits the column list and the script replays
    stmt = lsql.sql("SHOW CREATE TABLE vw").first().createtab_stmt
    assert stmt.startswith("CREATE VIEW vw (id, label) AS ")
    lsql.sql("DROP VIEW vw")
    lsql.sql(stmt.rstrip(";"))
    assert sorted(r.id for r in lsql.sql("SELECT id FROM vw").collect()) == [1, 2]
    # arity / duplicate / identifier validation is loud
    with pytest.raises(ValueError):
        lsql.sql("CREATE VIEW bad (one) AS SELECT k, s FROM t")
    with pytest.raises(ValueError):
        lsql.sql("CREATE VIEW bad (a, a) AS SELECT k, s FROM t")
    with pytest.raises(ValueError):
        lsql.sql("CREATE VIEW bad (a-b, c) AS SELECT k, s FROM t")
    # failed creations left nothing behind
    assert "bad" not in repo.list_view_names("main")


def test_view_rewrite_corners_from_review(spark, repo, lsql):
    """r14 review: TABLESAMPLE after an un-aliased view must not get an
    injected alias (Spark's grammar puts the sample before the alias);
    a backtick-masked user alias must read as an alias; a view FIRST in
    a comma join still expands; SHOW VIEWS reports the column list."""
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (12) AS v(k)")
    lsql.sql("CREATE VIEW high (h) AS SELECT k FROM t WHERE k > 9")
    # TABLESAMPLE parses and runs (row count is sample-dependent; just run)
    lsql.sql("SELECT * FROM high TABLESAMPLE (1 ROWS)").collect()
    # backticked alias on the view: one alias, parses, resolves
    assert [r.h for r in lsql.sql("SELECT `x`.h FROM high `x`").collect()] == [12]
    assert [r.h for r in lsql.sql("SELECT x.h FROM high AS `x` ").collect()] == [12]
    # view in FIRST comma-join position expands (directly follows FROM)
    assert lsql.sql("SELECT * FROM high, t").count() == 2
    # SHOW VIEWS carries the column list
    [row] = lsql.sql("SHOW VIEWS").collect()
    assert row.view_name == "high" and row.view_cols == "h"
    # digit-leading column names are rejected (identifier contract)
    with pytest.raises(ValueError):
        lsql.sql("CREATE VIEW bad (9lives) AS SELECT k FROM t")


def test_alter_view_redefines_whole_definition(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (12) AS v(k)")
    lsql.sql("CREATE VIEW vw (big) AS SELECT k FROM t WHERE k > 9")
    assert [r.big for r in lsql.sql("SELECT big FROM vw").collect()] == [12]
    lsql.sql("ALTER VIEW vw AS SELECT k FROM t WHERE k < 9")
    # redefined: new predicate AND the old column list is gone
    assert [r.k for r in lsql.sql("SELECT k FROM vw").collect()] == [1]
    with pytest.raises(KeyError):
        lsql.sql("ALTER VIEW missing AS SELECT k FROM t")
    # ALTER VIEW with a bad reference is refused at the statement
    with pytest.raises(Exception):
        lsql.sql("ALTER VIEW vw AS SELECT nope FROM t")
    assert [r.k for r in lsql.sql("SELECT k FROM vw").collect()] == [1]
