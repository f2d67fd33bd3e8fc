"""IDENTITY columns + DEFAULT values (r12, VERDICT r11 #3): the Delta
column-surface grammar after MERGE — `GENERATED ALWAYS AS IDENTITY`
with engine-allocated monotonic values honored by INSERT / COPY INTO /
MERGE INSERT, and `ALTER COLUMN ... SET DEFAULT` filling omitted
columns on the same three paths. Time-travel and branch stability ride
the versioned-object machinery the metadata lives on."""

from __future__ import annotations

import os

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


def _rows(spark, repo, table="t", ref="main"):
    return [
        tuple(r)
        for r in repo.read_table(spark, table, ref).orderBy("k").collect()
    ]


def test_identity_insert_allocates_monotonically(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql(
        "ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 100 INCREMENT BY 10)"
    )
    lsql.sql("INSERT INTO t (k, s) VALUES (2, 'b'), (3, 'c')")
    lsql.sql("INSERT INTO t (k, s) VALUES (4, 'd')")
    got = _rows(spark, repo)
    # pre-ALTER rows read NULL (the add-null era); allocation is
    # monotone across statements and deterministic (ordered by the
    # non-identity columns within a batch)
    assert got == [
        (1, "a", None),
        (2, "b", 100),
        (3, "c", 110),
        (4, "d", 120),
    ]
    assert repo.column_metadata("t", "main")["identity"]["rid"]["hwm"] == 120

    # GENERATED ALWAYS: providing the column is refused on every path
    with pytest.raises(KeyError, match="IDENTITY"):
        lsql.sql("INSERT INTO t (k, s, rid) VALUES (9, 'z', 999)")
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql("UPDATE t SET rid = 5")
    # full-arity INSERT excludes the identity column
    lsql.sql("INSERT INTO t VALUES (5, 'e')")
    assert (5, "e", 130) in _rows(spark, repo)
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql("INSERT INTO t VALUES (6, 'f', 999)")


def test_identity_assignment_is_layout_independent(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (0, 'z') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    src = spark.range(1, 41).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    src.createOrReplaceTempView("idsrc_many")
    lsql.sql("INSERT INTO t (k, s) SELECT k, s FROM idsrc_many")
    got = _rows(spark, repo)
    # deterministic: numbering follows the total order of the
    # non-identity columns regardless of source partitioning
    assert [r[2] for r in got if r[0] > 0] == list(range(1, 41))


def test_default_values_on_insert_paths(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a', 5) AS v(k, s, n)")
    lsql.sql("ALTER TABLE t ALTER COLUMN s SET DEFAULT upper('dflt')")
    lsql.sql("ALTER TABLE t ALTER COLUMN n SET DEFAULT 2 + 3")
    lsql.sql("INSERT INTO t (k) VALUES (2)")
    assert (2, "DFLT", 5) in _rows(spark, repo)
    lsql.sql("ALTER TABLE t ALTER COLUMN n DROP DEFAULT")
    lsql.sql("INSERT INTO t (k) VALUES (3)")
    assert (3, "DFLT", None) in _rows(spark, repo)
    with pytest.raises(KeyError, match="no DEFAULT"):
        lsql.sql("ALTER TABLE t ALTER COLUMN n DROP DEFAULT")
    # defaults must be self-contained: a column reference is refused at
    # ALTER time, not at some later insert
    with pytest.raises(Exception, match="k|resolve|cannot"):
        lsql.sql("ALTER TABLE t ALTER COLUMN n SET DEFAULT k + 1")


def test_identity_and_defaults_in_merge(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    lsql.sql("ALTER TABLE t ALTER COLUMN s SET DEFAULT 'dflt'")
    lsql.sql("INSERT INTO t (k, s) VALUES (2, 'b')")  # rid = 1
    lsql.sql(
        "MERGE INTO t USING (SELECT * FROM VALUES (2, 'B'), (10, 'x'), "
        "(11, 'y') AS w(k, s)) AS m ON t.k = m.k "
        "WHEN MATCHED THEN UPDATE SET s = m.s "
        "WHEN NOT MATCHED AND m.k = 10 THEN INSERT (k) VALUES (m.k) "
        "WHEN NOT MATCHED THEN INSERT (k, s) VALUES (m.k, m.s)"
    )
    got = _rows(spark, repo)
    # matched row keeps its allocated rid; the k=10 insert omitted s and
    # got the DEFAULT; both inserts drew fresh identity values in the
    # deterministic (k, s) order
    assert got == [
        (1, "a", None),
        (2, "B", 1),
        (10, "dflt", 2),
        (11, "y", 3),
    ]
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql(
            "MERGE INTO t USING (SELECT 2 AS k, 9 AS rid) AS m ON t.k = m.k "
            "WHEN MATCHED THEN UPDATE SET rid = m.rid"
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql(
            "MERGE INTO t USING (SELECT 99 AS k, 9 AS rid) AS m ON t.k = m.k "
            "WHEN NOT MATCHED THEN INSERT (k, rid) VALUES (m.k, m.rid)"
        )
    # INSERT * does not expect the identity column from the source
    lsql.sql(
        "MERGE INTO t USING (SELECT 12 AS k, 'w' AS s) AS m ON t.k = m.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert (12, "w", 4) in _rows(spark, repo)


def test_identity_and_defaults_in_copy_into(spark, repo, lsql, tmp_path):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    lsql.sql("ALTER TABLE t ALTER COLUMN s SET DEFAULT 'dflt'")
    land = str(tmp_path / "land")
    spark.createDataFrame([(20,), (21,)], "k INT").coalesce(1).write.parquet(
        os.path.join(land, "b1")
    )
    r = lsql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert (r.num_inserted_rows, r.num_loaded_files) == (2, 1)
    got = _rows(spark, repo)
    assert (20, "dflt", 1) in got and (21, "dflt", 2) in got
    # landed files carrying the identity column are refused loudly
    spark.createDataFrame(
        [(30, "x", 99)], "k INT, s STRING, rid BIGINT"
    ).coalesce(1).write.parquet(os.path.join(land, "b2"))
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")


def test_identity_time_travel_and_branch_stability(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    lsql.sql("INSERT INTO t (k, s) VALUES (2, 'b')")
    v1 = repo.head("main").version
    lsql.sql("INSERT INTO t (k, s) VALUES (3, 'c')")
    # time travel: the old snapshot shows only the old allocation
    old = [
        tuple(r)
        for r in repo.read_table(spark, "t", "main", version_as_of=v1)
        .orderBy("k")
        .collect()
    ]
    assert old == [(1, "a", None), (2, "b", 1)]
    assert _rows(spark, repo)[-1] == (3, "c", 2)

    # the high-water mark rides branches: a branch allocates its OWN
    # continuation without disturbing main
    repo.create_branch("feat", "main")
    fsql = LakeSQL(spark, repo, "feat")
    fsql.sql("INSERT INTO t (k, s) VALUES (50, 'f')")
    lsql.sql("INSERT INTO t (k, s) VALUES (60, 'm')")
    assert (50, "f", 3) in _rows(spark, repo, ref="feat")
    assert (60, "m", 3) in _rows(spark, repo, ref="main")
    assert (50, "f", 3) not in _rows(spark, repo, ref="main")


def test_identity_conflicts_and_replace_hygiene(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql("ALTER TABLE t ALTER COLUMN rid SET DEFAULT 5")
    lsql.sql("ALTER TABLE t ALTER COLUMN s SET DEFAULT 'x'")
    with pytest.raises(ValueError, match="DEFAULT"):
        lsql.sql(
            "ALTER TABLE t ADD COLUMN s BIGINT GENERATED ALWAYS AS IDENTITY"
        )
    with pytest.raises(ValueError, match="integer"):
        lsql.sql(
            "ALTER TABLE t ADD COLUMN bad STRING GENERATED ALWAYS AS IDENTITY"
        )
    # CREATE OR REPLACE defines a NEW table: no identity, no defaults
    lsql.sql("CREATE OR REPLACE TABLE t AS SELECT 9 AS k, 'n' AS s")
    meta = repo.column_metadata("t", "main")
    assert meta == {"defaults": {}, "identity": {}}
    lsql.sql("INSERT INTO t VALUES (10, 'p')")  # full arity again
    assert _rows(spark, repo) == [(9, "n"), (10, "p")]


@pytest.mark.slow
def test_identity_survives_drop_rename_clone_and_merge(spark, repo, lsql):
    """r12 review batch: DROP COLUMN retires the registration (inserts
    keep working), RENAME carries it (and a DEFAULT) to the new name,
    SHALLOW CLONE copies the metadata and continues allocation, and two
    branches that both inserted can MERGE (hwm resolves to the
    furthest-advanced mark)."""
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    lsql.sql("ALTER TABLE t ALTER COLUMN s SET DEFAULT 'd'")
    lsql.sql("INSERT INTO t (k) VALUES (2)")  # rid = 1

    # rename: identity + default follow the column
    lsql.sql("ALTER TABLE t RENAME COLUMN rid TO row_id")
    lsql.sql("ALTER TABLE t RENAME COLUMN s TO txt")
    meta = repo.column_metadata("t", "main")
    assert "row_id" in meta["identity"] and "rid" not in meta["identity"]
    assert meta["defaults"] == {"txt": "'d'"}
    lsql.sql("INSERT INTO t (k) VALUES (3)")  # continues at 2
    got = {r.k: (r.txt, r.row_id) for r in repo.read_table(spark, "t", "main").collect()}
    assert got[3] == ("d", 2)

    # clone: metadata copies, allocation continues from the same mark
    lsql.sql("CREATE TABLE c SHALLOW CLONE t")
    csql = LakeSQL(spark, repo, "main")
    csql.sql("INSERT INTO c (k) VALUES (100)")
    cgot = {r.k: r.row_id for r in repo.read_table(spark, "c", "main").collect()}
    assert cgot[100] == 3

    # branch merge: both sides insert; hwm resolves to the max
    repo.create_branch("feat", "main")
    fsql = LakeSQL(spark, repo, "feat")
    fsql.sql("INSERT INTO t (k) VALUES (50)")   # feat rid 3
    fsql.sql("INSERT INTO t (k) VALUES (51)")   # feat rid 4
    lsql.sql("INSERT INTO t (k) VALUES (60)")   # main rid 3
    repo.merge(spark, "feat", "main", keys={"t": ["k"]})
    assert repo.column_metadata("t", "main")["identity"]["row_id"]["hwm"] == 4
    lsql.sql("INSERT INTO t (k) VALUES (70)")   # continues past both
    got = {r.k: r.row_id for r in repo.read_table(spark, "t", "main").collect()}
    assert got[70] == 5

    # drop: registration retires, inserts keep working
    lsql.sql("ALTER TABLE t DROP COLUMN row_id")
    assert repo.column_metadata("t", "main")["identity"] == {}
    lsql.sql("INSERT INTO t (k) VALUES (80)")
    assert 80 in {r.k for r in repo.read_table(spark, "t", "main").collect()}


def test_identity_overflow_spellings_and_insert_star(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    # INCREMENT BY without START WITH parses (independently optional)
    lsql.sql(
        "ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY "
        "(INCREMENT BY 5)"
    )
    lsql.sql("INSERT INTO t (k, s) VALUES (2, 'b'), (3, 'c')")
    vals = sorted(
        r.rid for r in repo.read_table(spark, "t", "main").collect() if r.rid
    )
    assert vals == [1, 6]

    # INT columns refuse allocation past the type range, loudly
    lsql.sql("CREATE TABLE o AS SELECT 1 AS k")
    lsql.sql(
        "ALTER TABLE o ADD COLUMN rid INT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 2147483646)"
    )
    lsql.sql("INSERT INTO o (k) VALUES (2), (3)")  # 2147483646, ...647
    with pytest.raises(ValueError, match="overflows"):
        lsql.sql("INSERT INTO o (k) VALUES (4)")
    # the failed allocation leaves the branch clean (staged bump rolled
    # back): an ALTER is accepted immediately
    lsql.sql("ALTER TABLE o ALTER COLUMN k SET DEFAULT 0")
    with pytest.raises(ValueError, match="outside"):
        lsql.sql(
            "ALTER TABLE o ADD COLUMN r2 INT GENERATED ALWAYS AS IDENTITY "
            "(START WITH 9999999999)"
        )

    # MERGE INSERT * refuses a source that carries the identity column
    with pytest.raises(ValueError, match="IDENTITY"):
        lsql.sql(
            "MERGE INTO t USING (SELECT 9 AS k, 'z' AS s, 99 AS rid) AS m "
            "ON t.k = m.k WHEN NOT MATCHED THEN INSERT *"
        )


def test_identity_failed_write_rolls_back_everything(spark, repo, lsql):
    """r12 review: a failed identity write restores the staged colmeta
    bump AND the staged table entry — otherwise the retry would
    re-allocate the same values onto data the next commit sweeps in,
    landing duplicate identities."""
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1, 'a') AS v(k, s)")
    lsql.sql("ALTER TABLE t ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY")
    lsql.sql("ALTER TABLE t ADD CONSTRAINT pos CHECK (k > 0)")
    lsql.sql("INSERT INTO t (k, s) VALUES (2, 'b')")  # rid 1
    with pytest.raises(Exception, match="pos|onstraint"):
        lsql.sql("INSERT INTO t (k, s) VALUES (-5, 'bad')")
    # branch clean: ALTER accepted immediately; hwm unchanged; retry of
    # a GOOD insert continues at 2 with exactly one new row
    lsql.sql("ALTER TABLE t ALTER COLUMN s SET DEFAULT 'd'")
    assert repo.column_metadata("t", "main")["identity"]["rid"]["hwm"] == 1
    lsql.sql("INSERT INTO t (k) VALUES (3)")
    got = _rows(spark, repo)
    assert got == [(1, "a", None), (2, "b", 1), (3, "d", 2)]


@pytest.mark.slow
def test_create_table_explicit_schema(spark, repo, lsql):
    """r12: CREATE TABLE t (col TYPE ...) — the explicit-schema
    creation Delta users write, and Delta's canonical home for IDENTITY
    declarations. One commit creates an empty versioned table with
    identity/default registrations and NOT NULL as the equivalent
    CHECK constraint."""
    lsql.sql(
        "CREATE TABLE t ("
        "  rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 "
        "INCREMENT BY 5),"
        "  k INT NOT NULL,"
        "  s STRING DEFAULT 'dflt',"
        "  v DOUBLE)"
    )
    df = repo.read_table(spark, "t", "main")
    assert df.schema.simpleString() == (
        "struct<rid:bigint,k:int,s:string,v:double>"
    )
    assert df.count() == 0
    v0 = repo.head("main").version
    meta = repo.column_metadata("t", "main")
    assert meta["identity"]["rid"] == {
        "start": 10, "step": 5, "hwm": None, "type": "bigint",
        "always": True,
    }
    assert meta["defaults"] == {"s": "'dflt'"}
    assert repo.table_constraints("t", "main") == {
        "k_not_null": "k IS NOT NULL"
    }

    lsql.sql("INSERT INTO t (k, v) VALUES (1, 1.5), (2, 2.5)")
    got = [
        tuple(r)
        for r in repo.read_table(spark, "t", "main").orderBy("k").collect()
    ]
    assert got == [(10, 1, "dflt", 1.5), (15, 2, "dflt", 2.5)]
    with pytest.raises(Exception, match="k_not_null|onstraint"):
        lsql.sql("INSERT INTO t (k) VALUES (NULL)")
    # the empty creation is a real version: time travel reads it
    assert (
        repo.read_table(spark, "t", "main", version_as_of=v0).count() == 0
    )

    # COPY INTO aligns against the schema-created target (identity +
    # default omitted from the landed files)
    import os as _os
    import tempfile as _tf

    land = _tf.mkdtemp(prefix="ctland_")
    try:
        spark.createDataFrame(
            [(7, 9.9)], "k INT, v DOUBLE"
        ).coalesce(1).write.parquet(_os.path.join(land, "b"))
        lsql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    finally:
        import shutil as _sh

        _sh.rmtree(land, ignore_errors=True)
    got = {r.k: (r.rid, r.s) for r in repo.read_table(spark, "t", "main").collect()}
    assert got[7] == (20, "dflt")

    # loud contracts + REPLACE hygiene; CTAS keeps working alongside
    with pytest.raises(ValueError, match="duplicate column"):
        lsql.sql("CREATE TABLE d2 (a INT, A STRING)")
    with pytest.raises(ValueError, match="IDENTITY column"):
        lsql.sql(
            "CREATE TABLE d3 (a STRING GENERATED ALWAYS AS IDENTITY)"
        )
    with pytest.raises(ValueError, match="both"):
        lsql.sql(
            "CREATE TABLE d4 (a BIGINT GENERATED ALWAYS AS IDENTITY "
            "DEFAULT 5)"
        )
    with pytest.raises(ValueError, match="unsupported clause"):
        lsql.sql("CREATE TABLE d5 (a INT PRIMARY KEY)")
    with pytest.raises(Exception, match="already exists"):
        lsql.sql("CREATE TABLE t (x INT)")
    lsql.sql("CREATE TABLE u AS SELECT 1 AS a")
    lsql.sql("CREATE OR REPLACE TABLE t (x INT)")
    assert repo.column_metadata("t", "main") == {
        "defaults": {}, "identity": {},
    }
    assert repo.table_constraints("t", "main") == {}


@pytest.mark.slow
def test_create_table_complex_types_and_replace_clears_copyinto(
    spark, repo, lsql, tmp_path
):
    """r12 review batch: complex (nested) column types parse — the
    splitter keeps MAP/ARRAY/STRUCT internal commas and comparisons in
    DEFAULT expressions don't unbalance it; duplicate clauses are
    rejected; CREATE OR REPLACE clears the COPY INTO registry so the
    replacement table re-ingests landed files instead of silently
    skipping them."""
    lsql.sql(
        "CREATE TABLE c1 ("
        "  m MAP<STRING, INT>,"
        "  a ARRAY<STRUCT<x: INT, y: STRING>>,"
        "  d DECIMAL(10, 2),"
        "  f INT DEFAULT 1 + 2,"
        "  g BOOLEAN DEFAULT 1 < 2)"
    )
    sch = repo.read_table(spark, "c1", "main").schema.simpleString()
    assert "map<string,int>" in sch and "array<struct<x:int,y:string>>" in sch
    lsql.sql("INSERT INTO c1 (m) VALUES (map('k', 1))")
    [r] = repo.read_table(spark, "c1", "main").collect()
    assert (r.f, r.g) == (3, True)

    with pytest.raises(ValueError, match="duplicate DEFAULT"):
        lsql.sql("CREATE TABLE c2 (a INT DEFAULT 1 DEFAULT 2)")
    with pytest.raises(ValueError, match="duplicate NOT NULL"):
        lsql.sql("CREATE TABLE c3 (a INT NOT NULL NOT NULL)")

    # REPLACE clears the loaded-file registry (both creation forms)
    land = str(tmp_path / "landc")
    spark.createDataFrame([(1,)], "k INT").coalesce(1).write.parquet(
        os.path.join(land, "b")
    )
    for stmt in (
        "CREATE OR REPLACE TABLE ld (k INT)",
        "CREATE OR REPLACE TABLE ld AS SELECT 5 AS k",
    ):
        lsql.sql("CREATE OR REPLACE TABLE ld (k INT)")
        r1 = lsql.sql(
            f"COPY INTO ld FROM '{land}' FILEFORMAT = PARQUET"
        ).first()
        assert r1.num_loaded_files == 1
        lsql.sql(stmt)
        r2 = lsql.sql(
            f"COPY INTO ld FROM '{land}' FILEFORMAT = PARQUET"
        ).first()
        assert (r2.num_loaded_files, r2.num_skipped_files) == (1, 0), stmt


def test_describe_table_annotates_column_metadata(spark, repo, lsql):
    """r12: DESCRIBE TABLE's `extra` column surfaces the write-time
    surface a migrating user needs to see — identity allocator spec,
    DEFAULT expression, GENERATED expression, NOT NULL."""
    lsql.sql(
        "CREATE TABLE t ("
        "  rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 7 "
        "INCREMENT BY 2),"
        "  k INT NOT NULL,"
        "  s STRING DEFAULT 'x',"
        "  v DOUBLE)"
    )
    lsql.sql("ALTER TABLE t ADD COLUMN k2 INT GENERATED ALWAYS AS (k + 1)")
    got = {r.col_name: r.extra for r in lsql.sql("DESCRIBE TABLE t").collect()}
    assert got["rid"] == (
        "GENERATED ALWAYS AS IDENTITY (START WITH 7 INCREMENT BY 2)"
    )
    assert got["k"] == "NOT NULL"
    assert got["s"] == "DEFAULT 'x'"
    assert got["v"] == ""
    assert got["k2"] == "GENERATED ALWAYS AS (k + 1)"


def test_renamed_generated_column_stays_protected(spark, repo, lsql):
    """r12 review: the generated-column replay is rename-aware — a
    RENAMED generated column still refuses writes (previously INSERT
    could store a shadow value that read back inconsistently against
    the recompute), keeps recomputing on read under its new name, and
    DESCRIBE still annotates it."""
    lsql.sql("CREATE TABLE t AS SELECT 1 AS k")
    lsql.sql("ALTER TABLE t ADD COLUMN k2 INT GENERATED ALWAYS AS (k + 1)")
    lsql.sql("ALTER TABLE t RENAME COLUMN k2 TO k3")
    # write protection follows the rename on every path
    with pytest.raises(ValueError, match="GENERATED"):
        lsql.sql("INSERT INTO t VALUES (5, 99)")
    with pytest.raises(Exception, match="GENERATED|computed"):
        lsql.sql("INSERT INTO t (k, k3) VALUES (5, 99)")
    with pytest.raises(ValueError, match="GENERATED"):
        lsql.sql("UPDATE t SET k3 = 9")
    # the recompute rides the new name
    lsql.sql("INSERT INTO t VALUES (5)")
    got = {r.k: r.k3 for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: 2, 5: 6}
    desc = {r.col_name: r.extra for r in lsql.sql("DESCRIBE t").collect()}
    assert desc["k3"] == "GENERATED ALWAYS AS (k + 1)"


def test_create_table_glued_comparison_in_default(spark, repo, lsql):
    """r13 (ADVICE r12): a GLUED comparison in a DEFAULT expression
    (``DEFAULT 1<2``) must not open a generic-type bracket and swallow
    the next top-level comma; ``<`` is a type opener only after
    ARRAY/MAP/STRUCT (glued or spaced)."""
    lsql.sql(
        "CREATE TABLE gc ("
        "  a BOOLEAN DEFAULT 1<2,"
        "  b INT DEFAULT 7,"
        "  arr ARRAY <INT>,"
        "  c BOOLEAN DEFAULT (3>4))"
    )
    lsql.sql("INSERT INTO gc (arr) VALUES (array(1))")
    [r] = repo.read_table(spark, "gc", "main").collect()
    assert (r.a, r.b, list(r.arr), r.c) == (True, 7, [1], False)


def test_show_create_table_roundtrip(spark, repo, lsql):
    """r13: SHOW CREATE TABLE emits a script in this dialect's own
    spellings; replaying it on a fresh branch reproduces the table's
    full logical definition — columns, IDENTITY spec, DEFAULT, NOT
    NULL, PARTITIONED BY, generated columns, CHECK constraints, and
    TBLPROPERTIES (reserved partition key expressed as PARTITIONED BY,
    never re-emitted). Also covers the identity-fill fix: an identity
    INSERT into a table with an unorderable MAP column works (ordering
    skips MAP-bearing columns)."""
    lsql.sql(
        "CREATE TABLE t (k INT GENERATED ALWAYS AS IDENTITY (START WITH "
        "5 INCREMENT BY 2), v DOUBLE DEFAULT 1.5 NOT NULL, "
        "m MAP<STRING, INT>, p INT) PARTITIONED BY (p)"
    )
    lsql.sql("ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (p + 1)")
    lsql.sql("ALTER TABLE t ADD CONSTRAINT v_small CHECK (v < 1e9)")
    lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('o'='x', 'n'='it''s')")
    stmt = lsql.sql("SHOW CREATE TABLE t").first().createtab_stmt
    assert "PARTITIONED BY (p)" in stmt
    assert "lakegraft.partition.columns" not in stmt
    repo.create_branch("fresh", "main")
    f = LakeSQL(spark, repo, "fresh")
    f.sql("DROP TABLE t")
    for s in stmt.split(";\n"):
        if s.strip():
            f.sql(s)
    f.sql("INSERT INTO t (v, m, p) VALUES (2.5, map('a', 1), 3)")
    [row] = repo.read_table(spark, "t", "fresh").collect()
    assert (row.k, row.v, dict(row.m), row.p, row.g) == (
        5, 2.5, {"a": 1}, 3, 4,
    )
    assert repo.table_partition_columns("t", "fresh") == ["p"]
    assert repo.table_constraints("t", "fresh") == {
        "v_not_null": "v IS NOT NULL",
        "v_small": "v < 1e9",
    }
    assert repo.table_properties("t", "fresh")["n"] == "it's"
    # the view flavor emits its CREATE VIEW text
    lsql.sql("CREATE VIEW w AS SELECT v FROM t")
    assert (
        lsql.sql("SHOW CREATE TABLE w").first().createtab_stmt
        == "CREATE VIEW w AS SELECT v FROM t;"
    )


def test_show_create_preserves_order_casing_and_rejects_odd_names(
    spark, repo, lsql
):
    """r13 re-review: SHOW CREATE keeps the logical column ORDER when
    stored columns follow a generated one (they become ordered ALTERs),
    keeps nested struct field-name CASING (types are never uppercased),
    and refuses loudly when a column name is not expressible in the
    dialect's DDL."""
    lsql.sql("CREATE TABLE t (a INT, s STRUCT<Inner: INT, other: STRING>)")
    lsql.sql("ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (a + 1)")
    lsql.sql("ALTER TABLE t ADD COLUMN z INT")
    lsql.sql("ALTER TABLE t ALTER COLUMN z SET DEFAULT 7")
    stmt = lsql.sql("SHOW CREATE TABLE t").first().createtab_stmt
    assert "STRUCT" not in stmt and "struct<Inner:int,other:string>" in stmt
    repo.create_branch("fresh", "main")
    f = LakeSQL(spark, repo, "fresh")
    f.sql("DROP TABLE t")
    for s in stmt.split(";\n"):
        if s.strip():
            f.sql(s)
    t = repo.read_table(spark, "t", "fresh")
    assert t.columns == ["a", "s", "g", "z"]  # logical order preserved
    f.sql("INSERT INTO t (a, s) VALUES (1, named_struct('Inner', 2, 'other', 'x'))")
    [row] = repo.read_table(spark, "t", "fresh").collect()
    assert (row.a, row.s.Inner, row.g, row.z) == (1, 2, 2, 7)

    lsql.sql("CREATE TABLE odd AS SELECT 1 AS `my col`")
    with pytest.raises(ValueError, match="not a plain identifier"):
        lsql.sql("SHOW CREATE TABLE odd")


def test_create_table_like(spark, repo, lsql):
    """r13: CREATE TABLE dst LIKE src — an empty table with src's full
    logical definition, by replaying the SHOW CREATE script. Identity
    restarts at its declared START (definition, not state); data never
    copies; guards match the other creating paths."""
    lsql.sql(
        "CREATE TABLE t (k INT GENERATED ALWAYS AS IDENTITY (START WITH "
        "10), v DOUBLE DEFAULT 2.5 NOT NULL, p INT) PARTITIONED BY (p)"
    )
    lsql.sql("ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (p * 2)")
    lsql.sql("ALTER TABLE t ADD CONSTRAINT vpos CHECK (v > 0)")
    lsql.sql("INSERT INTO t (v, p) VALUES (1.0, 1), (2.0, 2)")  # k=10,11
    lsql.sql("CREATE TABLE d LIKE t")
    d = repo.read_table(spark, "d", "main")
    assert d.count() == 0 and d.columns == ["k", "v", "p", "g"]
    assert repo.table_partition_columns("d", "main") == ["p"]
    assert repo.table_constraints("d", "main") == {
        "v_not_null": "v IS NOT NULL",
        "vpos": "v > 0",
    }
    lsql.sql("INSERT INTO d (v, p) VALUES (9.0, 3)")
    [row] = repo.read_table(spark, "d", "main").collect()
    assert (row.k, row.v, row.p, row.g) == (10, 9.0, 3, 6)  # fresh sequence
    assert repo.show_partitions("d", "main") == ["p=3"]
    with pytest.raises(Exception):
        lsql.sql("INSERT INTO d (v, p) VALUES (-1.0, 0)")
    # guards: existing table/view/reserved names refuse up front
    with pytest.raises(ValueError, match="already exists"):
        lsql.sql("CREATE TABLE d LIKE t")
    lsql.sql("CREATE VIEW w AS SELECT v FROM t")
    with pytest.raises(ValueError, match="view of that name"):
        lsql.sql("CREATE TABLE w LIKE t")
    with pytest.raises(ValueError, match="reserved prefix"):
        lsql.sql("CREATE TABLE lake__d LIKE t")
