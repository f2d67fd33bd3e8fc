"""TRUNCATE TABLE, versioned CREATE [OR REPLACE] VIEW, and DEEP CLONE
(r13, VERDICT r12 #2/#6). Views are SELECT text stored as a versioned
object, so they ride branches, merges, commits, and time travel through
the existing object machinery; expansion re-binds to the CURRENT branch
state at query time (standard view semantics). DEEP CLONE materializes
an independent copy — own files, carried definition — so vacuum can
never entangle source and clone."""

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


def test_truncate_keeps_definition_and_identity(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t (k INT GENERATED ALWAYS AS IDENTITY, v STRING, "
        "p INT) PARTITIONED BY (p)"
    )
    lsql.sql("ALTER TABLE t ADD CONSTRAINT p_pos CHECK (p >= 0)")
    lsql.sql("INSERT INTO t (v, p) VALUES ('a', 1), ('b', 2)")
    r = lsql.sql("TRUNCATE TABLE t").first()
    assert r.rows_affected == 2
    t = repo.read_table(spark, "t", "main")
    assert t.count() == 0 and t.columns == ["k", "v", "p"]
    # definition survives: partition spec, constraint, identity HWM
    assert repo.table_partition_columns("t", "main") == ["p"]
    assert repo.table_constraints("t", "main") == {"p_pos": "p >= 0"}
    lsql.sql("INSERT INTO t (v, p) VALUES ('c', 3)")
    [row] = repo.read_table(spark, "t", "main").collect()
    assert row.k == 3  # identity sequence continues past the truncate
    assert repo.show_partitions("t", "main") == ["p=3"]
    with pytest.raises(Exception):  # constraint still enforced
        lsql.sql("INSERT INTO t (v, p) VALUES ('d', -1)")
    # truncate is a commit: time travel reads the pre-truncate rows
    v = repo.head("main").version
    old = repo.read_table(spark, "t", "main", version_as_of=v - 2)
    assert old.count() == 2


def test_views_expand_rebind_and_nest(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (2), (12) AS v(k)")
    lsql.sql("CREATE VIEW big AS SELECT k FROM t WHERE k > 9")
    assert [r.k for r in lsql.sql("SELECT * FROM big").collect()] == [12]
    # re-binds to current state (not frozen at creation)
    lsql.sql("INSERT INTO t VALUES (20)")
    assert sorted(
        r.k for r in lsql.sql("SELECT k FROM big ORDER BY k").collect()
    ) == [12, 20]
    # nested views and view-over-view replacement
    lsql.sql("CREATE VIEW big_n AS SELECT COUNT(*) AS n FROM big")
    assert lsql.sql("SELECT n FROM big_n").first().n == 2
    lsql.sql("CREATE OR REPLACE VIEW big AS SELECT k FROM t WHERE k > 19")
    assert lsql.sql("SELECT n FROM big_n").first().n == 1
    assert [
        (r.view_name) for r in lsql.sql("SHOW VIEWS").collect()
    ] == ["big", "big_n"]
    lsql.sql("DROP VIEW big_n")
    with pytest.raises(KeyError, match="no view"):
        lsql.sql("DROP VIEW big_n")
    # a view name inside a string literal is never rewritten
    [r] = lsql.sql("SELECT 'big' AS s FROM t WHERE k = 1").collect()
    assert r.s == "big"


def test_view_name_collisions_both_directions(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT 1 AS k")
    with pytest.raises(ValueError, match="table of that name"):
        lsql.sql("CREATE VIEW t AS SELECT 1 AS x")
    lsql.sql("CREATE VIEW w AS SELECT k FROM t")
    with pytest.raises(ValueError, match="view of that name"):
        lsql.sql("CREATE TABLE w AS SELECT 2 AS k")
    with pytest.raises(ValueError, match="view of that name"):
        lsql.sql("CREATE TABLE w (a INT)")
    with pytest.raises(ValueError, match="already exists"):
        lsql.sql("CREATE VIEW w AS SELECT 1 AS x")
    # creation-time analysis: a broken SELECT never lands
    with pytest.raises(Exception):
        lsql.sql("CREATE VIEW bad AS SELECT nope FROM t")
    assert "bad" not in repo.list_views("main")


def test_views_ride_branches_merges_and_time_travel(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (11) AS v(k)")
    lsql.sql("CREATE VIEW big AS SELECT k FROM t WHERE k > 9")
    repo.create_branch("dev", "main")
    dev = LakeSQL(spark, repo, "dev")
    # the view EXISTS on the branch and sees the branch's data
    dev.sql("INSERT INTO t VALUES (30)")
    assert dev.sql("SELECT COUNT(*) AS n FROM big").first().n == 2
    assert lsql.sql("SELECT COUNT(*) AS n FROM big").first().n == 1
    # a view created on the branch merges back
    dev.sql("CREATE VIEW small AS SELECT k FROM t WHERE k < 9")
    repo.merge(spark, "dev", "main")
    assert set(repo.list_views("main")) == {"big", "small"}
    assert lsql.sql("SELECT COUNT(*) AS n FROM small").first().n == 1
    # time travel: the view TEXT is versioned (old snapshot, old text)
    lsql.sql("CREATE OR REPLACE VIEW big AS SELECT k FROM t WHERE k > 29")
    assert "k > 29" in repo.list_views("main")["big"]
    assert "k > 9" in repo.list_views("main~1")["big"]


def test_view_cycle_raises(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT 1 AS k")
    lsql.sql("CREATE VIEW a AS SELECT k FROM t")
    lsql.sql("CREATE VIEW b AS SELECT k FROM a")
    # rewire a to read b -> a<->b cycle; creation-time analysis itself
    # must refuse (expansion of b hits a already on the stack)
    with pytest.raises(ValueError, match="cycle"):
        lsql.sql("CREATE OR REPLACE VIEW a AS SELECT k FROM b")
    # both views still work afterwards (no half-staged state)
    assert lsql.sql("SELECT k FROM b").first().k == 1


def test_deep_clone_independent_files_and_definition(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t (k INT GENERATED ALWAYS AS IDENTITY (START WITH "
        "5), v DOUBLE, p INT) PARTITIONED BY (p)"
    )
    lsql.sql("ALTER TABLE t ADD CONSTRAINT vpos CHECK (v > 0)")
    lsql.sql("INSERT INTO t (v, p) VALUES (1.5, 0), (2.5, 1)")
    lsql.sql("CREATE TABLE t2 DEEP CLONE t")
    got = sorted(tuple(r) for r in repo.read_table(spark, "t2", "main").collect())
    assert got == [(5, 1.5, 0), (6, 2.5, 1)]
    # definition carried: constraints, partition spec, identity HWM
    assert repo.table_constraints("t2", "main") == {"vpos": "v > 0"}
    assert repo.table_partition_columns("t2", "main") == ["p"]
    assert repo.show_partitions("t2", "main") == ["p=0", "p=1"]
    lsql.sql("INSERT INTO t2 (v, p) VALUES (9.0, 2)")
    assert {r.k for r in repo.read_table(spark, "t2", "main").collect()} == {
        5, 6, 7,
    }
    with pytest.raises(Exception):
        lsql.sql("INSERT INTO t2 (v, p) VALUES (-1.0, 0)")
    # file independence: zero shared physical entries (unlike SHALLOW)
    f1 = set(repo.current_files("main", "t"))
    f2 = set(repo.current_files("main", "t2"))
    assert not (f1 & f2)
    # vacuum independence: drop the SOURCE, vacuum away its history —
    # the clone still reads in full (the reason deep clone exists)
    lsql.sql("DROP TABLE t")
    repo.vacuum(keep_history=False, grace_seconds=0.0)
    assert repo.read_table(spark, "t2", "main").count() == 3


def test_shallow_vs_deep_share_vs_copy(spark, repo, lsql):
    lsql.sql("CREATE TABLE t AS SELECT id AS k FROM range(100)")
    lsql.sql("CREATE TABLE s SHALLOW CLONE t")
    lsql.sql("CREATE TABLE d DEEP CLONE t")
    base = set(repo.current_files("main", "t"))
    assert set(repo.current_files("main", "s")) == base  # shared refs
    assert not (set(repo.current_files("main", "d")) & base)  # own files
    assert repo.read_table(spark, "d", "main").count() == 100
    with pytest.raises(ValueError, match="already exists"):
        lsql.sql("CREATE TABLE d DEEP CLONE t")


def test_clone_refuses_view_named_destination(spark, repo, lsql):
    """r13 review: the clone paths must enforce the same table/view
    uniqueness the other CREATE TABLE paths do — a clone landing under
    a view's name would be silently shadowed by view expansion."""
    lsql.sql("CREATE TABLE t AS SELECT 1 AS k")
    lsql.sql("CREATE VIEW w AS SELECT k FROM t")
    with pytest.raises(ValueError, match="view of that name"):
        lsql.sql("CREATE TABLE w SHALLOW CLONE t")
    with pytest.raises(ValueError, match="view of that name"):
        lsql.sql("CREATE TABLE w DEEP CLONE t")


def test_view_and_lookalike_table_coexist(spark, repo, lsql):
    """r13 review: a view `recent` and a table `view__recent` must not
    collide in the scoped temp-view namespace — both referenced in ONE
    query, each must read its own rows."""
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (11) AS v(k)")
    lsql.sql("CREATE VIEW recent AS SELECT k FROM t WHERE k > 9")
    lsql.sql("CREATE TABLE view__recent AS SELECT 777 AS k")
    got = lsql.sql(
        "SELECT r.k AS vk, x.k AS tk FROM recent r CROSS JOIN view__recent x"
    ).collect()
    assert [(r.vk, r.tk) for r in got] == [(11, 777)]


def test_partition_casing_follows_declared_spec(spark, repo, lsql):
    """r13 review: a mixed-case append must not fork p=.../P=... Hive
    dir naming — the declared spec's casing wins."""
    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql("INSERT INTO t VALUES (1, 0)")
    df = spark.createDataFrame([(2, 1)], "k INT, P INT")
    repo.write_table("main", "t", df, mode="append")
    repo.commit("main", "mixed-case append")
    assert repo.show_partitions("t", "main") == ["p=0", "p=1"]
    got = sorted(tuple(r) for r in repo.read_table(spark, "t", "main").collect())
    assert got == [(1, 0), (2, 1)]


def test_reserved_prefixes_and_mixed_case_append_guard(spark, repo, lsql):
    """r13 re-review: lake__/lakeview__ names are reserved at creation
    (they would collide with scoped query rewrites), and the append
    type guard matches column names case-insensitively."""
    lsql.sql("CREATE TABLE t AS SELECT 1 AS k")
    for stmt in (
        "CREATE TABLE lake__x AS SELECT 1 AS k",
        "CREATE TABLE lakeview__x (a INT)",
        "CREATE VIEW lakeview__v AS SELECT k FROM t",
        "CREATE TABLE lake__c SHALLOW CLONE t",
    ):
        with pytest.raises(ValueError, match="reserved prefix"):
            lsql.sql(stmt)
    bad = spark.createDataFrame([("x",)], "K STRING")
    with pytest.raises(ValueError, match="changes column types"):
        repo.write_table("main", "t", bad, mode="append")

def test_truncate_is_metadata_only(spark, repo, lsql, monkeypatch):
    """r14 (VERDICT r13 #2): TRUNCATE's rows_affected comes from group
    manifests minus committed DV cardinality — no count() job over the
    about-to-vanish table. Pinned by making DataFrame.count raise for
    the duration of the statement: a regression to the scan path fails
    loudly. DV-deleted rows must subtract exactly."""
    from pyspark.sql import DataFrame

    lsql.sql("CREATE TABLE t (k INT, p INT) PARTITIONED BY (p)")
    lsql.sql(
        "INSERT INTO t SELECT CAST(id AS INT), CAST(id % 3 AS INT) "
        "FROM range(300)"
    )
    # route 40 rows through a deletion vector so the manifest count
    # must be corrected by the committed DV cardinality
    lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
    lsql.sql("DELETE FROM t WHERE k < 40")
    assert repo.read_table(spark, "t", "main").count() == 260

    def boom(self):
        raise AssertionError("TRUNCATE must not run a count() job")

    monkeypatch.setattr(DataFrame, "count", boom)
    r = lsql.sql("TRUNCATE TABLE t").first()
    monkeypatch.undo()
    assert r.rows_affected == 260
    assert repo.read_table(spark, "t", "main").count() == 0

def test_create_like_is_one_commit(spark, repo, lsql):
    """r14 (ADVICE r13): CREATE TABLE ... LIKE lands as exactly ONE
    commit — no half-defined intermediate table states in time-travel
    history (the old per-statement replay left them permanently)."""
    lsql.sql(
        "CREATE TABLE src (k INT GENERATED ALWAYS AS IDENTITY, v STRING, "
        "p INT) PARTITIONED BY (p)"
    )
    lsql.sql("ALTER TABLE src ADD CONSTRAINT p_pos CHECK (p >= 0)")
    lsql.sql("ALTER TABLE src SET TBLPROPERTIES ('team' = 'data')")
    h0 = repo.head("main")
    v0 = h0.version
    lsql.sql("CREATE TABLE dst LIKE src")
    # exactly ONE commit on this branch (versions are repo-global, so
    # the throwaway replay branch may consume numbers — parent linkage
    # is the invariant)
    assert repo.head("main").parents == [h0.id]
    # full definition carried in that single version
    assert repo.table_partition_columns("dst", "main") == ["p"]
    assert repo.table_constraints("dst", "main") == {"p_pos": "p >= 0"}
    assert repo.table_properties("dst", "main").get("team") == "data"
    assert repo.read_table(spark, "dst", "main").count() == 0
    # the version just before the LIKE has no trace of dst
    with pytest.raises(KeyError):
        repo.read_table(spark, "dst", "main", version_as_of=v0)
    # identity restarts at declared START on the new table
    lsql.sql("INSERT INTO dst (v, p) VALUES ('a', 1)")
    [row] = repo.read_table(spark, "dst", "main").collect()
    assert row.k == 1
    # no throwaway branch left behind
    assert not [b for b in repo.branches() if b.startswith("__like__")]

def test_view_name_rewrite_is_table_position_only(spark, repo, lsql):
    """r14 (ADVICE r13): a column or alias sharing a stored view's name
    must not be rewritten — only FROM/JOIN position expands. A view in
    an old-style comma join fails loudly (use JOIN), never silently as
    the wrong relation."""
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (12) AS v(high)")
    lsql.sql("CREATE VIEW high AS SELECT high AS h FROM t WHERE high > 9")
    # column position: untouched
    assert sorted(r.high for r in lsql.sql("SELECT high FROM t").collect()) == [1, 12]
    # alias position: untouched
    assert sorted(
        r.high for r in lsql.sql("SELECT t.high AS high FROM t").collect()
    ) == [1, 12]
    # FROM position: expands
    assert [r.h for r in lsql.sql("SELECT h FROM high").collect()] == [12]
    # JOIN position: expands
    assert (
        lsql.sql("SELECT * FROM t JOIN high ON t.high = high.h").count() == 1
    )
    # comma join: loud failure, not a silent mis-resolve
    with pytest.raises(Exception):
        lsql.sql("SELECT * FROM t, high").collect()

def test_view_qualified_refs_and_aliases(spark, repo, lsql):
    """r14 review: qualified refs (v.col) resolve through an injected
    alias when the view is un-aliased; a user alias wins; a table alias
    sharing a view's name is never rewritten; backticked view refs in
    FROM position still expand (step-1b normalization)."""
    lsql.sql("CREATE TABLE t AS SELECT * FROM VALUES (1), (12) AS v(high)")
    lsql.sql("CREATE VIEW high AS SELECT high AS h FROM t WHERE high > 9")
    # un-aliased view with qualified column ref → injected alias resolves
    assert [r.h for r in lsql.sql("SELECT high.h FROM high").collect()] == [12]
    # user alias on the view: their alias covers qualifiers
    assert [r.h for r in lsql.sql("SELECT x.h FROM high x").collect()] == [12]
    assert [r.h for r in lsql.sql("SELECT x.h FROM high AS x").collect()] == [12]
    # a TABLE alias that shares the view's name is untouched: reads t
    assert sorted(
        r.v for r in lsql.sql("SELECT high.high AS v FROM t high").collect()
    ) == [1, 12]
    # backticked view ref in FROM position expands (1b normalization)
    assert [r.h for r in lsql.sql("SELECT h FROM `high`").collect()] == [12]
    # self-join of the view under two aliases
    assert (
        lsql.sql("SELECT * FROM high a JOIN high b ON a.h = b.h").count() == 1
    )
