"""Versioning-layer invariants (SURVEY.md §2.9, V1-V15).

Not SQL-expressible → bespoke invariant tests per SURVEY.md §5: write v0,
overwrite v1, assert time-travel reads differ; branch isolation; reset;
revert; diff; merge (fast-forward, table-level, row-level); vacuum.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeRepo, MergeConflict


@pytest.fixture
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id INT, val STRING")


def test_init_and_default_branch(repo):
    assert repo.branches() == ["main"]
    assert repo.head("main").version == 0
    assert repo.list_tables("main") == []


def test_write_commit_read_roundtrip(spark, repo):
    df = _df(spark, [(1, "a"), (2, "b")])
    repo.write_table("main", "t", df)
    assert "t" in repo.status("main")
    c = repo.commit("main", "add t")
    assert repo.status("main") == {}
    got = repo.read_table(spark, "t", "main").orderBy("id").collect()
    assert [(r.id, r.val) for r in got] == [(1, "a"), (2, "b")]
    assert repo.head("main").id == c.id
    assert repo.list_tables("main") == ["t"]


def test_overwrite_creates_new_version_and_time_travel(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "v0")]))
    c0 = repo.commit("main", "v0")
    repo.write_table("main", "t", _df(spark, [(1, "v1"), (2, "v1")]))
    c1 = repo.commit("main", "v1")

    latest = repo.read_table(spark, "t", "main").count()
    assert latest == 2
    # V14 flavors: commit id, branch~n, version_as_of
    assert repo.read_table(spark, "t", c0.id).count() == 1
    assert repo.read_table(spark, "t", "main~1").count() == 1
    assert repo.read_table(spark, "t", "main", version_as_of=c0.version).count() == 1
    assert repo.read_table(spark, "t", "main", version_as_of=c1.version).count() == 2


def test_append_mode(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.write_table("main", "t", _df(spark, [(2, "b")]), mode="append")
    repo.commit("main", "append")
    assert repo.read_table(spark, "t", "main").count() == 2
    assert repo.read_table(spark, "t", "main~1").count() == 1


def test_reset_discards_staged(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.write_table("main", "t", _df(spark, [(9, "z")]))
    assert repo.status("main")
    repo.reset("main")
    assert repo.status("main") == {}
    assert repo.read_table(spark, "t", "main").count() == 1


def test_branch_isolation(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.create_branch("dev", source="main")
    repo.write_table("dev", "t", _df(spark, [(1, "a"), (2, "dev-only")]))
    repo.commit("dev", "dev change")
    assert repo.read_table(spark, "t", "dev").count() == 2
    assert repo.read_table(spark, "t", "main").count() == 1  # untouched


def test_remove_table(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.remove_table("main", "t")
    repo.commit("main", "drop t")
    assert repo.list_tables("main") == []
    with pytest.raises(KeyError):
        repo.read_table(spark, "t", "main")
    # still readable in history
    assert repo.read_table(spark, "t", "main~1").count() == 1


def test_revert(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "good")]))
    c0 = repo.commit("main", "good")
    repo.write_table("main", "t", _df(spark, [(1, "bad"), (2, "bad")]))
    repo.commit("main", "bad")
    repo.revert("main", c0.id)
    rows = repo.read_table(spark, "t", "main").collect()
    assert [(r.id, r.val) for r in rows] == [(1, "good")]
    # history preserved: bad commit still one step back
    assert repo.read_table(spark, "t", "main~1").count() == 2


def test_log_and_show(repo, spark):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "first")
    repo.write_table("main", "t", _df(spark, [(2, "b")]))
    repo.commit("main", "second")
    log = repo.log("main")
    assert [c.message for c in log] == ["second", "first", "repo init"]
    assert repo.head("main").message == "second"


def test_diff_row_level(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "a"), (2, "B"), (3, "c")]))
    repo.commit("dev", "edit")
    d = repo.diff(spark, "t", "main", "dev")
    changes = {(r["id"], r["val"], r["__change"]) for r in d.collect()}
    assert changes == {(2, "b", "removed"), (2, "B", "added"), (3, "c", "added")}


def test_diff_tables_object_level(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.write_table("main", "u", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "x")]))
    repo.write_table("dev", "w", _df(spark, [(1, "w")]))
    repo.remove_table("dev", "u")
    repo.commit("dev", "changes")
    assert repo.diff_tables("main", "dev") == {
        "t": "changed",
        "u": "removed",
        "w": "added",
    }


def test_merge_fast_forward(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "a"), (2, "b")]))
    dev_head = repo.commit("dev", "dev work")
    merged = repo.merge(spark, "dev", "main")
    assert merged.id == dev_head.id  # fast-forward, no new commit
    assert repo.read_table(spark, "t", "main").count() == 2


def test_merge_disjoint_tables(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "u", _df(spark, [(10, "u")]))
    repo.commit("dev", "add u")
    repo.write_table("main", "w", _df(spark, [(20, "w")]))
    repo.commit("main", "add w")
    c = repo.merge(spark, "dev", "main")
    assert len(c.parents) == 2
    assert repo.list_tables("main") == ["t", "u", "w"]


def test_merge_conflict_raises(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "base")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "dev")]))
    repo.commit("dev", "dev edit")
    repo.write_table("main", "t", _df(spark, [(1, "main")]))
    repo.commit("main", "main edit")
    with pytest.raises(MergeConflict):
        repo.merge(spark, "dev", "main")


def test_merge_row_level_no_overlap(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "base"), (2, "base")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "dev"), (2, "base")]))
    repo.commit("dev", "dev edits row 1")
    repo.write_table("main", "t", _df(spark, [(1, "base"), (2, "main"), (3, "new")]))
    repo.commit("main", "main edits row 2, adds row 3")
    repo.merge(spark, "dev", "main", keys={"t": ["id"]})
    rows = {(r.id, r.val) for r in repo.read_table(spark, "t", "main").collect()}
    assert rows == {(1, "dev"), (2, "main"), (3, "new")}


def test_merge_row_level_conflict_policies(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "base")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "dev")]))
    repo.commit("dev", "dev")
    repo.write_table("main", "t", _df(spark, [(1, "main")]))
    repo.commit("main", "main")
    with pytest.raises(MergeConflict):
        repo.merge(spark, "dev", "main", keys={"t": ["id"]}, on_conflict="error")
    repo.merge(spark, "dev", "main", keys={"t": ["id"]}, on_conflict="source")
    rows = repo.read_table(spark, "t", "main").collect()
    assert [(r.id, r.val) for r in rows] == [(1, "dev")]


def test_merge_row_level_delete_propagation(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(2, "b")]))  # dev deletes id=1
    repo.commit("dev", "delete 1")
    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    repo.commit("main", "add 3")
    repo.merge(spark, "dev", "main", keys={"t": ["id"]})
    rows = {(r.id, r.val) for r in repo.read_table(spark, "t", "main").collect()}
    assert rows == {(2, "b"), (3, "c")}


def test_vacuum_keep_history(spark, repo, tmp_path):
    repo.write_table("main", "t", _df(spark, [(1, "v0")]))
    repo.commit("main", "v0")
    repo.write_table("main", "t", _df(spark, [(1, "v1")]))
    repo.commit("main", "v1")
    # staged-then-reset write becomes orphaned
    repo.write_table("main", "t", _df(spark, [(1, "orphan")]))
    repo.reset("main")
    removed = repo.vacuum(keep_history=True, grace_seconds=0)
    assert len(removed) == 1  # only the orphan
    # time travel still works
    assert repo.read_table(spark, "t", "main~1").collect()[0].val == "v0"


def test_vacuum_heads_only(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "v0")]))
    repo.commit("main", "v0")
    repo.write_table("main", "t", _df(spark, [(1, "v1")]))
    repo.commit("main", "v1")
    removed = repo.vacuum(keep_history=False, grace_seconds=0)
    assert len(removed) == 1  # v0 files gone
    assert repo.read_table(spark, "t", "main").collect()[0].val == "v1"
    with pytest.raises(Exception):
        repo.read_table(spark, "t", "main~1").collect()


def test_delete_branch_and_repo(spark, repo):
    repo.create_branch("dev")
    repo.delete_branch("dev")
    assert repo.branches() == ["main"]
    with pytest.raises(ValueError):
        repo.delete_branch("main")
    root = repo.root
    LakeRepo.delete(root)
    assert not os.path.exists(root)


def test_staged_read_visibility(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "committed")]))
    repo.commit("main", "base")
    repo.write_table("main", "t", _df(spark, [(1, "staged"), (2, "staged")]))
    # default read = committed head; include_staged sees the pending write
    assert repo.read_table(spark, "t", "main").count() == 1
    assert repo.read_table(spark, "t", "main", include_staged=True).count() == 2


def test_compact_reduces_files_preserves_data_and_history(spark, repo):
    import glob
    import os

    df = spark.range(0, 1000).selectExpr("CAST(id AS INT) AS id", "CAST(id % 7 AS STRING) AS val")
    repo.write_table("main", "t", df.repartition(16))
    repo.commit("main", "v0: 16-way write")

    def parquet_files():
        c = repo.head("main")
        files = []
        for rel in c.tables["t"]:
            files += glob.glob(os.path.join(repo.root, rel, "**", "*.parquet"), recursive=True)
        return files

    before = len(parquet_files())
    assert before >= 16
    repo.compact(spark, "main", "t", target_files=2)
    after = len(parquet_files())
    assert after <= 2

    # data identical, v0 still time-travelable at its 16-file layout
    now = repo.read_table(spark, "t", "main")
    assert now.count() == 1000
    v0 = repo.read_table(spark, "t", "main", version_as_of=repo.log("main")[-1].version + 1)
    assert sorted(map(tuple, v0.collect())) == sorted(map(tuple, now.collect()))


def test_compact_sorted_layout(spark, repo):
    df = spark.range(0, 1000).selectExpr("CAST(id AS INT) AS id", "CAST(id % 7 AS STRING) AS val")
    repo.write_table("main", "t", df.repartition(8))
    repo.commit("main", "v0")
    repo.compact(spark, "main", "t", target_files=4, sort_by=["id"])
    out = repo.read_table(spark, "t", "main")
    assert out.count() == 1000
    assert out.agg({"id": "min"}).collect()[0][0] == 0


def test_schema_evolution_append_adds_column(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    c0 = repo.commit("main", "v0: two columns")
    evolved = spark.createDataFrame([(2, "b", 9.5)], "id INT, val STRING, score DOUBLE")
    repo.write_table("main", "t", evolved, mode="append")
    repo.commit("main", "v1: append adds score column")

    merged = repo.read_table(spark, "t", "main", merge_schema=True)
    assert set(merged.columns) == {"id", "val", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5
    # time travel to v0 still sees the original two-column schema
    old = repo.read_table(spark, "t", c0.id, merge_schema=True)
    assert set(old.columns) == {"id", "val"}


def test_schema_evolution_rejects_type_change(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "v0")
    clash = spark.createDataFrame([(2, 99)], "id INT, val INT")
    with pytest.raises(ValueError, match="changes column types"):
        repo.write_table("main", "t", clash, mode="append")
    # overwrite (a new logical version) remains legal
    repo.write_table("main", "t", clash, mode="overwrite")
    repo.commit("main", "v1: schema replaced via overwrite")
    assert repo.read_table(spark, "t", "main").schema["val"].dataType.simpleString() == "int"


def test_schema_check_covers_staged_appends(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    # no commit yet — the staged write must still gate the second append
    clash = spark.createDataFrame([(2, 99)], "id INT, val INT")
    with pytest.raises(ValueError, match="changes column types"):
        repo.write_table("main", "t", clash, mode="append")


def test_upsert_table_update_and_insert(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "old"), (2, "keep")]))
    repo.commit("main", "v0")
    src = _df(spark, [(1, "new"), (3, "inserted")])
    repo.upsert_table(spark, "main", "t", src, ["id"])
    got = {r.id: r.val for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: "new", 2: "keep", 3: "inserted"}
    # prior version untouched (time travel)
    old = {r.id: r.val for r in repo.read_table(spark, "t", "main~1").collect()}
    assert old == {1: "old", 2: "keep"}


def test_upsert_ignore_mode_keeps_target_rows(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "old")]))
    repo.commit("main", "v0")
    src = _df(spark, [(1, "new"), (2, "inserted")])
    repo.upsert_table(spark, "main", "t", src, ["id"], when_matched="ignore")
    got = {r.id: r.val for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: "old", 2: "inserted"}


def test_upsert_rejects_schema_mismatch(spark, repo):
    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "v0")
    bad = spark.createDataFrame([(1,)], "id INT")
    with pytest.raises(ValueError, match="schema"):
        repo.upsert_table(spark, "main", "t", bad, ["id"])


def test_merge_refuses_dirty_dest(spark, repo):
    """V12 data-loss guard: merging into a branch with staged writes must
    raise (lakeFS refuses dirty-branch merges) and leave staging intact."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import DirtyBranchError

    repo.write_table("main", "t", _df(spark, [(1, "base")]))
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.write_table("dev", "t", _df(spark, [(1, "dev")]))
    repo.commit("dev", "dev change")
    # dirty the destination
    repo.write_table("main", "staged_tbl", _df(spark, [(9, "staged")]))
    with pytest.raises(DirtyBranchError):
        repo.merge(spark, "dev", "main")
    assert "staged_tbl" in repo.status("main")  # staged write survived
    # after committing, the merge (fast-forward) goes through
    repo.commit("main", "keep staged")
    repo.merge(spark, "dev", "main")
    assert repo.read_table(spark, "t", "main").collect()[0].val == "dev"
    assert repo.read_table(spark, "staged_tbl", "main").count() == 1


def test_revert_refuses_dirty_branch(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import DirtyBranchError

    repo.write_table("main", "t", _df(spark, [(1, "v0")]))
    c0 = repo.commit("main", "v0")
    repo.write_table("main", "t", _df(spark, [(1, "v1")]))
    repo.commit("main", "v1")
    repo.write_table("main", "t", _df(spark, [(1, "uncommitted")]))
    with pytest.raises(DirtyBranchError):
        repo.revert("main", c0.id)
    assert "t" in repo.status("main")
    repo.reset("main")
    repo.revert("main", c0.id)
    assert repo.read_table(spark, "t", "main").collect()[0].val == "v0"


def test_append_after_staged_drop_keeps_append(spark, repo):
    """Staging drop→append then committing must yield exactly the appended
    rows (previously the lingering op='drop' threw the append away)."""
    repo.write_table("main", "t", _df(spark, [(1, "old"), (2, "old")]))
    repo.commit("main", "v0")
    repo.remove_table("main", "t")
    repo.write_table("main", "t", _df(spark, [(3, "new")]), mode="append")
    repo.commit("main", "drop then append")
    rows = {(r.id, r.val) for r in repo.read_table(spark, "t", "main").collect()}
    assert rows == {(3, "new")}


# -- arbitrary objects (lakectl fs parity: upload/cat/ls/rm on any path) ----


def test_object_put_get_roundtrip(repo):
    repo.put_object("main", "configs/schema.json", b'{"v": 1}')
    # staged but uncommitted: visible only with include_staged
    assert repo.get_object("configs/schema.json", "main", include_staged=True) == b'{"v": 1}'
    with pytest.raises(KeyError):
        repo.get_object("configs/schema.json", "main")
    repo.commit("main", "add schema")
    assert repo.get_object("configs/schema.json", "main") == b'{"v": 1}'
    assert repo.list_objects("main") == ["configs/schema.json"]
    assert repo.list_objects("main", prefix="other/") == []


def test_object_time_travel_and_delete(repo):
    repo.put_object("main", "model.txt", "weights-v0")
    c0 = repo.commit("main", "v0")
    repo.put_object("main", "model.txt", "weights-v1")
    repo.commit("main", "v1")
    assert repo.get_object("model.txt", "main") == b"weights-v1"
    assert repo.get_object("model.txt", c0.id) == b"weights-v0"
    assert repo.get_object("model.txt", "main", version_as_of=c0.version) == b"weights-v0"
    repo.delete_object("main", "model.txt")
    with pytest.raises(KeyError):
        repo.get_object("model.txt", "main", include_staged=True)
    repo.commit("main", "rm")
    assert repo.list_objects("main") == []
    # history still readable
    assert repo.get_object("model.txt", "main~1") == b"weights-v1"


def test_object_branch_isolation_and_merge(repo):
    repo.put_object("main", "a.txt", "base-a")
    repo.put_object("main", "b.txt", "base-b")
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.put_object("dev", "a.txt", "dev-a")
    repo.put_object("dev", "c.txt", "dev-c")
    repo.commit("dev", "dev edits")
    assert repo.get_object("a.txt", "main") == b"base-a"  # isolation
    repo.merge(None, "dev", "main")
    assert repo.get_object("a.txt", "main") == b"dev-a"
    assert repo.get_object("c.txt", "main") == b"dev-c"
    assert repo.get_object("b.txt", "main") == b"base-b"
    d = repo.diff_objects("main~1", "main")
    assert d == {"a.txt": "changed", "c.txt": "added"}


def test_object_merge_conflict_and_dirty_branch(repo):
    repo.put_object("main", "a.txt", "base")
    repo.commit("main", "base")
    repo.create_branch("dev")
    repo.put_object("dev", "a.txt", "dev")
    repo.commit("dev", "dev")
    repo.put_object("main", "a.txt", "main-side")
    # dirty dest refuses merge (object staged counts as dirty)
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import DirtyBranchError

    with pytest.raises(DirtyBranchError):
        repo.merge(None, "dev", "main")
    repo.commit("main", "main edit")
    with pytest.raises(MergeConflict) as exc:
        repo.merge(None, "dev", "main")
    assert "object:a.txt" in exc.value.conflicts


def test_object_revert_and_reset(repo):
    repo.put_object("main", "a.txt", "v0")
    c0 = repo.commit("main", "v0")
    repo.put_object("main", "a.txt", "v1")
    repo.commit("main", "v1")
    repo.put_object("main", "a.txt", "staged-junk")
    assert "object:a.txt" in repo.status("main")
    repo.reset("main")
    repo.revert("main", c0.id)
    assert repo.get_object("a.txt", "main") == b"v0"


def test_vacuum_objects(repo):
    repo.put_object("main", "keep.txt", "live")
    repo.commit("main", "v0")
    repo.put_object("main", "orphan.txt", "dead")
    repo.reset("main")  # orphaned blob
    removed = repo.vacuum(keep_history=True, grace_seconds=0)
    assert len(removed) == 1 and removed[0].startswith(os.path.join("data", "_objects"))
    assert repo.get_object("keep.txt", "main") == b"live"
    # staged blob is live (not collected)
    repo.put_object("main", "staged.txt", "staged")
    assert repo.vacuum(keep_history=True, grace_seconds=0) == []


# -- Delta-style SQL surface (VERSION AS OF / TIMESTAMP AS OF / HISTORY) ----


def test_lakesql_version_as_of(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "v0"), (2, "v0")]))
    c0 = repo.commit("main", "v0")
    repo.write_table("main", "t", _df(spark, [(1, "v1")]))
    repo.commit("main", "v1")
    lsql = LakeSQL(spark, repo)
    assert lsql.sql("SELECT count(*) AS n FROM t").collect()[0].n == 1
    assert (
        lsql.sql(f"SELECT count(*) AS n FROM t VERSION AS OF {c0.version}").collect()[0].n
        == 2
    )
    assert lsql.sql(f"SELECT val FROM t@v{c0.version} WHERE id = 2").collect()[0].val == "v0"


def test_lakesql_timestamp_as_of(spark, repo):
    import time as _time
    from datetime import datetime, timezone

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "v0")]))
    repo.commit("main", "v0")
    cut = datetime.now(timezone.utc).isoformat()
    _time.sleep(0.05)
    repo.write_table("main", "t", _df(spark, [(1, "v1"), (2, "v1")]))
    repo.commit("main", "v1")
    lsql = LakeSQL(spark, repo)
    assert lsql.sql(f"SELECT count(*) AS n FROM t TIMESTAMP AS OF '{cut}'").collect()[0].n == 1


def test_lakesql_describe_history(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "v0")]))
    repo.commit("main", "add t")
    repo.write_table("main", "u", _df(spark, [(9, "x")]))
    repo.commit("main", "add u (t untouched)")
    lsql = LakeSQL(spark, repo)
    hist = lsql.sql("DESCRIBE HISTORY t").collect()
    assert [h.message for h in hist] == ["add t"]
    full = lsql.history().collect()
    assert [h.operation for h in full] == ["WRITE", "WRITE", "CREATE"]


# -- concurrency: RepoLock must serialize metadata mutations ----------------


def test_concurrent_commits_and_vacuum(spark, repo):
    """8 threads × (write + commit) racing a vacuum loop: every commit must
    survive with a unique monotone version, and vacuum must never collect
    a file any surviving snapshot references."""
    import threading

    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            for j in range(3):
                repo.write_table("main", f"t{i}", _df(spark, [(j, f"w{i}")]))
                repo.commit("main", f"writer {i} commit {j}")
        except Exception as e:  # surfaced below
            errors.append(e)

    def gc() -> None:
        # grace window on: an in-flight parquet write exists on disk before
        # its staged pointer is recorded, and the mtime grace is what
        # spares it (vacuum's documented contract — grace 0 is only safe
        # with no active writers)
        try:
            for _ in range(5):
                repo.vacuum(keep_history=True, grace_seconds=60)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    threads.append(threading.Thread(target=gc))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    log = repo.log("main", limit=1000)
    versions = [c.version for c in log]
    assert len(set(versions)) == len(versions)  # unique versions
    assert versions == sorted(versions, reverse=True)  # monotone on first-parent
    assert len(log) == 8 * 3 + 1  # every commit landed (+ genesis)
    # every table readable at head with its final write
    for i in range(8):
        rows = {(r.id, r.val) for r in repo.read_table(spark, f"t{i}", "main").collect()}
        assert rows == {(2, f"w{i}")}
    # writers quiesced: a zero-grace vacuum must find nothing dead
    assert repo.vacuum(keep_history=True, grace_seconds=0) == []


def test_lakesql_literals_and_case(spark, repo):
    """The lexical rewriter must not rewrite inside string literals, and
    identifier matching must be case-insensitive (Spark resolution is)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "bob@v1"), (2, "x")]))
    c0 = repo.commit("main", "v0")
    repo.write_table("main", "t", _df(spark, [(1, "bob@v1")]))
    repo.commit("main", "v1")
    lsql = LakeSQL(spark, repo)
    # 'bob@v1' inside a literal must stay a literal, not become a snapshot
    out = lsql.sql("SELECT id FROM t WHERE val = 'bob@v1'").collect()
    assert [r.id for r in out] == [1]
    # a literal containing the VERSION AS OF grammar must survive untouched
    out2 = lsql.sql("SELECT 't VERSION AS OF 1' AS s, count(*) AS n FROM t").collect()[0]
    assert out2.s == "t VERSION AS OF 1" and out2.n == 1
    # case-insensitive table resolution, head and snapshot
    assert lsql.sql("SELECT count(*) AS n FROM T").collect()[0].n == 1
    assert (
        lsql.sql(f"SELECT count(*) AS n FROM T VERSION AS OF {c0.version}")
        .collect()[0].n == 2
    )


def test_delete_object_unknown_path_raises(spark, repo):
    """lakectl-fs parity: rm of a nonexistent path is an error, not a
    silently-staged no-op that turns into an empty commit."""
    import pytest

    repo.put_object("main", "model.txt", b"weights")
    repo.commit("main", "add model")
    with pytest.raises(KeyError):
        repo.delete_object("main", "typo.txt")
    repo.delete_object("main", "model.txt")  # real path still deletable


def test_repolock_foreign_host_raises(repo):
    """Single-writer-node contract: a lock file written by another host
    must fail loudly (DistributedWriterError), never spin until timeout —
    RepoLock is not a cross-machine mutex."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log import (
        DistributedWriterError,
        RepoLock,
    )

    lock_path = os.path.join(repo.root, ".lock")
    with open(lock_path, "w") as f:
        f.write("some-other-node:12345")
    try:
        with pytest.raises(DistributedWriterError, match="some-other-node"):
            with RepoLock(repo.root, timeout=5.0):
                pass
    finally:
        os.unlink(lock_path)


def test_repolock_same_host_spins_then_times_out(repo):
    """A same-host holder is normal contention: spin, then TimeoutError
    (not DistributedWriterError)."""
    import socket

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log import RepoLock

    lock_path = os.path.join(repo.root, ".lock")
    with open(lock_path, "w") as f:
        f.write(f"{socket.gethostname()}:99999")
    try:
        with pytest.raises(TimeoutError):
            with RepoLock(repo.root, timeout=0.2):
                pass
    finally:
        os.unlink(lock_path)


def test_repolock_reentrant_after_release(repo):
    """Acquire/release/acquire works and leaves no lock file behind."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log import RepoLock

    for _ in range(2):
        with RepoLock(repo.root, timeout=5.0):
            assert os.path.exists(os.path.join(repo.root, ".lock"))
    assert not os.path.exists(os.path.join(repo.root, ".lock"))


def test_lakesql_does_not_clobber_user_temp_views(spark, repo):
    """sql() scopes its views to lake__; a user's own temp view with a
    repo table's name must survive (and keep its own contents)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo_df = spark.range(3).selectExpr("id AS k")
    repo.write_table("main", "events", repo_df)
    repo.commit("main", "v0")
    # user's own temp view named `events` with DIFFERENT contents
    spark.range(99).selectExpr("id AS k").createOrReplaceTempView("events")
    try:
        lsql = LakeSQL(spark, repo)
        out = lsql.sql("SELECT count(*) AS n FROM events").collect()[0]
        assert out.n == 3  # repo table, not the user view
        user = spark.sql("SELECT count(*) AS n FROM events").collect()[0]
        assert user.n == 99  # user view untouched
    finally:
        spark.catalog.dropTempView("events")


def test_lakesql_literal_escapes_not_rewritten(spark, repo):
    """Backslash-escaped and double-quoted literals mask correctly: text
    inside them is never treated as a table ref / time-travel clause."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.range(2).selectExpr("id AS k"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    r = lsql.sql(r"SELECT 'it\'s t VERSION AS OF 9' AS s, count(*) AS n FROM t").collect()[0]
    assert r.s == "it's t VERSION AS OF 9" and r.n == 2
    r2 = lsql.sql('SELECT "t@v9 isn\'t a ref" AS s, count(*) AS n FROM t').collect()[0]
    assert r2.s == "t@v9 isn't a ref" and r2.n == 2


def test_lakesql_history_of_dropped_table(spark, repo):
    """DESCRIBE HISTORY of a table that was dropped from the head still
    returns its commit history (resolved across the commit walk)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "gone", spark.range(2).selectExpr("id AS k"))
    repo.commit("main", "add gone")
    repo.remove_table("main", "gone")
    repo.commit("main", "drop gone")
    lsql = LakeSQL(spark, repo)
    hist = lsql.sql("DESCRIBE HISTORY gone").collect()
    assert len(hist) >= 2  # the add AND the drop both changed it
    with pytest.raises(KeyError, match="never existed"):
        lsql.history("nevermade")


def test_lakesql_backticked_identifiers(spark, repo):
    """Backticked repo-table names resolve like bare refs; OTHER
    backticked identifiers (e.g. a column named `order-events`) must
    never be corrupted by the table rewrite."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "events", spark.range(4).selectExpr("id AS k", "id * 2 AS `order-events`")
    )
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    # backticked table ref resolves to the repo table
    assert lsql.sql("SELECT count(*) AS n FROM `events`").collect()[0].n == 4
    # a backticked NON-table identifier containing a table name survives
    r = lsql.sql(
        "SELECT sum(`order-events`) AS s FROM `events`"
    ).collect()[0]
    assert r.s == 0 + 2 + 4 + 6
    # and DistributedWriterError is part of the public package surface
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import DistributedWriterError  # noqa: F401


# -- optimistic cross-host arbitration (r5: generation-fenced CAS) ----------

def test_cas_stale_writer_raises_conflict(repo):
    """A writer publishing from a stale ref read (another commit advanced
    the generation in between) must get a retryable CommitConflictError,
    never silently clobber the winner (the lost-update anomaly)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import CommitConflictError

    repo.put_object("main", "a.txt", b"1")
    stale = repo._read_ref("main")  # generation g
    repo.put_object("main", "b.txt", b"2")  # advances to g+1
    with pytest.raises(CommitConflictError):
        repo._write_ref("main", stale)
    # retry-after-re-read is the documented recovery
    fresh = repo._read_ref("main")
    repo._write_ref("main", fresh)


def test_cas_orphaned_fence_is_reclaimed(repo):
    """A fence left by a writer that crashed between claim and publish
    (ref generation never advanced, fence older than the grace window)
    must be reclaimed, not deadlock the branch."""
    import time as _time

    repo.put_object("main", "a.txt", b"1")
    g = int(repo._read_ref("main").get("gen", 0))
    fdir = repo._fence_dir()
    os.makedirs(fdir, exist_ok=True)
    fence = os.path.join(fdir, f"main.gen-{g + 1}")
    with open(fence, "w") as f:
        f.write("dead-host:1")
    old = _time.time() - 300
    os.utime(fence, (old, old))
    c = repo.commit("main", "after orphan")
    assert repo.head("main").id == c.id


def test_cas_live_fence_conflicts_then_clears(repo):
    """A FRESH fence for the next generation (a mid-publish writer) makes
    a concurrent publish raise CommitConflictError; once the fence owner
    is gone the branch recovers."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import CommitConflictError

    repo.put_object("main", "a.txt", b"1")
    g = int(repo._read_ref("main").get("gen", 0))
    fence = os.path.join(repo._fence_dir(), f"main.gen-{g + 1}")
    os.makedirs(repo._fence_dir(), exist_ok=True)
    with open(fence, "w") as f:
        f.write("other-host:7")
    with pytest.raises(CommitConflictError):
        repo.commit("main", "should lose")
    os.unlink(fence)
    repo.commit("main", "now wins")


def test_cas_branch_recreate_restarts_generations(repo):
    """delete_branch drops the branch's fences so a recreated branch of
    the same name restarts its generation chain instead of colliding
    with fences from the previous lifetime."""
    repo.create_branch("dev")
    repo.put_object("dev", "x", b"1")
    repo.commit("dev", "c1")
    repo.delete_branch("dev")
    repo.create_branch("dev")
    repo.put_object("dev", "y", b"2")
    repo.commit("dev", "c2")
    assert repo.get_object("y", ref="dev") == b"2"


def test_cas_vacuum_prunes_superseded_fences(repo):
    """Superseded fences (gen <= the branch's current generation, older
    than the grace window) are vacuum-pruned; the current chain's future
    is unaffected."""
    import time as _time

    for i in range(3):
        repo.put_object("main", f"f{i}", b"x")
    repo.commit("main", "c")
    fdir = repo._fence_dir()
    old = _time.time() - 3600
    for f in os.listdir(fdir):
        os.utime(os.path.join(fdir, f), (old, old))
    repo.vacuum(grace_seconds=60)
    assert [f for f in os.listdir(fdir) if not f.startswith(".")] == []
    repo.put_object("main", "more", b"y")
    repo.commit("main", "after prune")


def test_repolock_optimistic_multihost_spins(repo, monkeypatch):
    """LAKEGRAFT_MULTIHOST=optimistic: a foreign-host lock holder is
    treated as normal contention (spin → TimeoutError), with correctness
    delegated to the CAS fence — not DistributedWriterError."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log import RepoLock

    monkeypatch.setenv("LAKEGRAFT_MULTIHOST", "optimistic")
    lock_path = os.path.join(repo.root, ".lock")
    with open(lock_path, "w") as f:
        f.write("some-other-node:12345")
    try:
        with pytest.raises(TimeoutError):
            with RepoLock(repo.root, timeout=0.2):
                pass
    finally:
        os.unlink(lock_path)


def test_cas_threaded_no_lost_updates(repo):
    """Concurrency stress for the fence CAS with the lock DELIBERATELY
    bypassed (threads call _read_ref/_write_ref directly — the situation
    optimistic multi-host mode must survive): every thread retries its
    mutation on CommitConflictError until it lands; afterwards ALL
    mutations must be present — a lost update would drop one silently."""
    import threading

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import CommitConflictError

    n = 8
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            for _ in range(200):
                ref = repo._read_ref("main")
                ref.setdefault("staged_objects", {})[f"t{i}"] = {
                    "blob": f"fake/{i}",
                    "op": "put",
                }
                try:
                    repo._write_ref("main", ref)
                    return
                except CommitConflictError:
                    continue
            raise AssertionError(f"writer {i} starved after 200 attempts")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    staged = repo._read_ref("main")["staged_objects"]
    assert {f"t{i}" for i in range(n)} <= set(staged), sorted(staged)


def test_lakesql_show_tables_and_describe_detail(spark, repo):
    """SHOW TABLES lists the branch head's tables; DESCRIBE DETAIL
    reports the head snapshot's file/byte counts and the last commit
    that changed the table (Delta's DESCRIBE DETAIL essentials)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "events", _df(spark, [(1, "a"), (2, "b")]))
    repo.write_table("main", "dims", _df(spark, [(9, "z")]))
    c1 = repo.commit("main", "v1")
    repo.write_table("main", "dims", _df(spark, [(9, "zz")]))
    repo.commit("main", "v2")
    lsql = LakeSQL(spark, repo)

    tables = sorted(r.tableName for r in lsql.sql("SHOW TABLES").collect())
    assert tables == ["dims", "events"]

    d = lsql.sql("DESCRIBE DETAIL events").collect()[0]
    assert d.name == "events" and d.format == "parquet" and d.branch == "main"
    assert d.numFiles >= 1 and d.sizeInBytes > 0
    # events last changed in c1, not the later dims-only commit
    assert d.version == c1.version
    d2 = lsql.sql("describe detail DIMS").collect()[0]  # case-insensitive
    assert d2.version == c1.version + 1


def test_restore_table_is_cow_metadata_only(spark, repo):
    """RESTORE TABLE parity: restoring a table to an old version stages
    the OLD snapshot's file list verbatim (copy-on-write — zero data
    rewritten) and lands as a new commit; other tables are untouched and
    history is preserved."""
    repo.write_table("main", "events", _df(spark, [(1, "old")]))
    repo.write_table("main", "dims", _df(spark, [(7, "d")]))
    c1 = repo.commit("main", "v1")
    repo.write_table("main", "events", _df(spark, [(2, "new")]))
    repo.commit("main", "v2")

    c3 = repo.restore_table("main", "events", c1.version)
    rows = repo.read_table(spark, "events", "main").collect()
    assert [(r.id, r.val) for r in rows] == [(1, "old")]
    # CoW: the restored commit references c1's files verbatim
    assert repo.head("main").tables["events"] == c1.tables["events"]
    # other tables untouched; old version still time-travelable
    assert repo.head("main").tables["dims"] == c1.tables["dims"]
    assert c3.version == c1.version + 2
    new_rows = repo.read_table(
        spark, "events", "main", version_as_of=c1.version + 1
    ).collect()
    assert [(r.id, r.val) for r in new_rows] == [(2, "new")]


def test_tblproperties_set_show_unset_and_dv_routing(spark, repo):
    """TBLPROPERTIES (r11): SET/SHOW/UNSET roundtrip as metadata-only
    commits; the Delta-named delta.enableDeletionVectors property
    routes DML through deletion vectors per TABLE — overriding the
    session dv_writes default in both directions; properties ride
    clones and die with DROP TABLE."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo)  # session default: dv_writes=False

    out = lsql.sql(
        "ALTER TABLE t SET TBLPROPERTIES ("
        "'delta.enableDeletionVectors' = 'true', 'owner' = 'pipeline')"
    ).collect()
    assert out[0].version == repo.head("main").version
    got = {r.key: r.value for r in lsql.sql("SHOW TBLPROPERTIES t").collect()}
    assert got == {
        "delta.enableDeletionVectors": "true",
        "owner": "pipeline",
    }
    one = lsql.sql("SHOW TBLPROPERTIES t ('owner')").collect()
    assert [(r.key, r.value) for r in one] == [("owner", "pipeline")]

    # DML now routes through the DV path DESPITE dv_writes=False:
    # the data files are kept, a vector companion appears
    files_before = repo.head("main").tables["t"]
    lsql.sql("DELETE FROM t WHERE id = 2")
    head = repo.head("main")
    assert head.tables["t"] == files_before  # zero rewrites
    assert any(k.endswith("t") and k != "t" for k in head.tables)  # vector
    assert sorted(
        r.id for r in lsql.sql("SELECT id FROM t").collect()
    ) == [1, 3]

    # the property wins in the OTHER direction too: 'false' disables
    # DV routing even when the session default is on
    repo.write_table("main", "u", _df(spark, [(1, "x"), (2, "y")]))
    repo.commit("main", "u0")
    dv_sql = LakeSQL(spark, repo, dv_writes=True)
    dv_sql.sql(
        "ALTER TABLE u SET TBLPROPERTIES ('delta.enableDeletionVectors' = 'false')"
    )
    u_files = repo.head("main").tables["u"]
    dv_sql.sql("DELETE FROM u WHERE id = 1")
    head = repo.head("main")
    assert head.tables["u"] != u_files  # rewrite path: files replaced
    assert not any(k != "u" and k.endswith("u") for k in head.tables)

    # properties ride SHALLOW CLONE and die with DROP TABLE
    lsql.sql("CREATE TABLE t2 SHALLOW CLONE t")
    assert repo.table_properties("t2", "main")["owner"] == "pipeline"
    lsql.sql("DROP TABLE t2")
    assert repo.table_properties("t2", "main") == {}

    # UNSET: missing keys are loud without IF EXISTS, silent with
    with pytest.raises(KeyError, match="IF EXISTS"):
        lsql.sql("ALTER TABLE t UNSET TBLPROPERTIES ('nope')")
    lsql.sql("ALTER TABLE t UNSET TBLPROPERTIES IF EXISTS ('nope', 'owner')")
    got = {r.key: r.value for r in lsql.sql("SHOW TBLPROPERTIES t").collect()}
    assert got == {"delta.enableDeletionVectors": "true"}

    # IF EXISTS with nothing to remove: NO spurious commit
    v = repo.head("main").version
    lsql.sql("ALTER TABLE t UNSET TBLPROPERTIES IF EXISTS ('nope')")
    assert repo.head("main").version == v

    # malformed lists, duplicates, dangling commas and unknown tables
    # are loud (Spark parser parity)
    with pytest.raises(ValueError, match="malformed"):
        lsql.sql("ALTER TABLE t SET TBLPROPERTIES (owner = 'x')")
    with pytest.raises(ValueError, match="duplicate key"):
        lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('a'='1', 'a'='2')")
    with pytest.raises(ValueError, match="trailing comma"):
        lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('a'='1',)")
    with pytest.raises(KeyError, match="not found"):
        lsql.sql("ALTER TABLE ghost SET TBLPROPERTIES ('a' = 'b')")
    # a missing SHOW key is NOT an error — Spark/Delta return a
    # non-failing message row so scripts can probe optional properties
    # (ADVICE r11); the message distinguishes absent from empty
    [probe] = lsql.sql("SHOW TBLPROPERTIES t ('onwer')").collect()
    assert probe.key == "onwer"
    assert "does not have property: onwer" in probe.value

    # ''-escaped quotes in keys/values parse and round-trip unescaped
    # (Spark literal grammar; ADVICE r11)
    lsql.sql("ALTER TABLE t SET TBLPROPERTIES ('it''s' = 'a ''quoted'' v')")
    assert repo.table_properties("t", "main")["it's"] == "a 'quoted' v"
    [got] = lsql.sql("SHOW TBLPROPERTIES t ('it''s')").collect()
    assert (got.key, got.value) == ("it's", "a 'quoted' v")
    lsql.sql("ALTER TABLE t UNSET TBLPROPERTIES ('it''s')")
    assert "it's" not in repo.table_properties("t", "main")

    # CREATE OR REPLACE defines a NEW table: properties do not leak
    lsql.sql("CREATE OR REPLACE TABLE t AS SELECT 1 AS id, 'z' AS val")
    assert repo.table_properties("t", "main") == {}
    assert lsql.sql("SHOW TBLPROPERTIES t").collect() == []


def test_lakesql_restore_and_vacuum_statements(spark, repo):
    """SQL spellings: RESTORE TABLE t TO VERSION AS OF n and
    VACUUM [DRY RUN]."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "events", _df(spark, [(1, "a")]))
    c1 = repo.commit("main", "v1")
    repo.write_table("main", "events", _df(spark, [(2, "b")]))
    repo.commit("main", "v2")
    lsql = LakeSQL(spark, repo)

    out = lsql.sql(f"RESTORE TABLE events TO VERSION AS OF {c1.version}").collect()
    assert out[0].version == c1.version + 2
    assert [r.id for r in lsql.sql("SELECT id FROM events").collect()] == [1]

    # RESTORE ... TO TIMESTAMP AS OF (r11): resolves at-or-before like
    # the read path's TIMESTAMP AS OF, then the same CoW restore
    from datetime import datetime, timezone

    ts2 = datetime.fromtimestamp(
        next(
            c.timestamp
            for c in repo.log("main", limit=None)
            if c.version == c1.version + 1
        ),
        tz=timezone.utc,
    ).isoformat()
    out2 = lsql.sql(f"RESTORE TABLE events TO TIMESTAMP AS OF '{ts2}'").collect()
    assert sorted(
        r.id for r in lsql.sql("SELECT id FROM events").collect()
    ) == [2]
    assert out2[0].version == out[0].version + 1

    # keep_history vacuum removes nothing here; DRY RUN returns a frame
    assert lsql.sql("VACUUM DRY RUN").collect() == lsql.sql("VACUUM").collect()


# -- SQL DML (CTAS / INSERT / DELETE / UPDATE, r5) --------------------------


def test_sql_ctas_creates_and_requires_or_replace(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b")]))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo)
    out = lsql.sql("CREATE TABLE t2 AS SELECT id, val FROM t WHERE id = 1").collect()[0]
    assert (out.table, out.rows_affected) == ("t2", 1)
    assert lsql.sql("SELECT count(*) AS n FROM t2").collect()[0].n == 1
    with pytest.raises(ValueError, match="already exists"):
        lsql.sql("CREATE TABLE t2 AS SELECT * FROM t")
    lsql.sql("CREATE OR REPLACE TABLE t2 AS SELECT * FROM t")
    assert lsql.sql("SELECT count(*) AS n FROM t2").collect()[0].n == 2


def test_sql_insert_select_values_and_time_travel(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    c0 = repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    lsql.sql("INSERT INTO t VALUES (2, 'b'), (3, 'c')")
    assert lsql.sql("SELECT count(*) AS n FROM t").collect()[0].n == 3
    # INSERT with a time-travel SELECT body: re-append the v0 snapshot
    lsql.sql(f"INSERT INTO t SELECT * FROM t VERSION AS OF {c0.version}")
    rows = sorted(
        (r.id, r.val) for r in lsql.sql("SELECT id, val FROM t").collect()
    )
    assert rows == [(1, "a"), (1, "a"), (2, "b"), (3, "c")]
    # positional cast: string ids arrive as INT per target schema
    lsql.sql("INSERT INTO t VALUES ('7', 'x')")
    assert lsql.sql("SELECT id FROM t WHERE val = 'x'").collect()[0].id == 7
    with pytest.raises(ValueError, match="column count"):
        lsql.sql("INSERT INTO t VALUES (1, 'a', 'extra')")


def test_sql_delete_null_condition_rows_survive(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    df = spark.createDataFrame([(1, 10), (2, None), (3, 99)], "id INT, x INT")
    repo.write_table("main", "t", df)
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    out = lsql.sql("DELETE FROM t WHERE x > 50").collect()[0]
    assert out.rows_affected == 1
    # ANSI: the NULL-x row is NOT deleted (condition not TRUE)
    assert sorted(r.id for r in lsql.sql("SELECT id FROM t").collect()) == [1, 2]
    # unconditional delete empties but keeps the schema
    lsql.sql("DELETE FROM t")
    kept = lsql.sql("SELECT * FROM t")
    assert kept.count() == 0 and kept.columns == ["id", "x"]


def test_sql_update_with_where_and_type_preservation(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b")]))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    out = lsql.sql(
        "UPDATE t SET val = concat(val, '!'), id = id + 10 WHERE id = 2"
    ).collect()[0]
    assert out.rows_affected == 1
    rows = {r.id: r.val for r in lsql.sql("SELECT id, val FROM t").collect()}
    assert rows == {1: "a", 12: "b!"}
    # id stays INT (cast back to the column type even though id+10 is INT
    # and a literal would widen)
    sch = {f.name: f.dataType.simpleString() for f in lsql.sql("SELECT * FROM t").schema.fields}
    assert sch == {"id": "int", "val": "string"}
    with pytest.raises(KeyError, match="no column"):
        lsql.sql("UPDATE t SET nope = 1")


def test_sql_dml_versions_and_history(spark, repo):
    """Every DML statement lands exactly one commit; time travel across
    DML versions reads each intermediate state."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    v_ins = lsql.sql("INSERT INTO t VALUES (2, 'b')").collect()[0].version
    v_del = lsql.sql("DELETE FROM t WHERE id = 1").collect()[0].version
    assert v_del == v_ins + 1
    assert (
        lsql.sql(f"SELECT count(*) AS n FROM t VERSION AS OF {v_ins}").collect()[0].n
        == 2
    )
    assert sorted(r.id for r in lsql.sql("SELECT id FROM t").collect()) == [2]
    msgs = [r.message for r in lsql.sql("DESCRIBE HISTORY t").collect()]
    assert any("INSERT INTO t" in m for m in msgs)
    assert any("DELETE FROM t" in m for m in msgs)


def test_sql_update_set_list_with_commas_in_literals_and_calls(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    lsql.sql("UPDATE t SET val = concat('x,y', ',', val), id = greatest(id, 0)")
    assert lsql.sql("SELECT val FROM t").collect()[0].val == "x,y,a"


def test_sql_branch_management_statements(spark, repo):
    """CREATE/USE/SHOW/DROP BRANCH, COMMIT MESSAGE, MERGE BRANCH and
    DROP TABLE — the lakectl verbs as SQL statements."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a")]))
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo)

    lsql.sql("CREATE BRANCH dev FROM main")
    assert sorted(r.branch for r in lsql.sql("SHOW BRANCHES").collect()) == [
        "dev",
        "main",
    ]
    lsql.sql("USE BRANCH dev")
    assert lsql.branch == "dev"
    # stage on dev via DML-free path then COMMIT with a message
    repo.write_table("dev", "t", _df(spark, [(1, "a"), (2, "dev")]))
    out = lsql.sql("COMMIT MESSAGE 'it''s done'").collect()[0]
    assert out.message == "it's done"
    # main unchanged until merge
    assert (
        LakeSQL(spark, repo, branch="main").sql("SELECT count(*) AS n FROM t").collect()[0].n
        == 1
    )
    lsql.sql("MERGE BRANCH dev INTO main")
    lsql.sql("USE BRANCH main")
    assert lsql.sql("SELECT count(*) AS n FROM t").collect()[0].n == 2
    lsql.sql("DROP TABLE t")
    assert lsql.sql("SHOW TABLES").count() == 0
    # an unrewritten bare name now falls through to Spark's resolver
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        lsql.sql("SELECT * FROM no_such_table").collect()
    lsql.sql("DROP BRANCH dev")
    assert [r.branch for r in lsql.sql("SHOW BRANCHES").collect()] == ["main"]


def test_sql_use_branch_unknown_raises(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    lsql = LakeSQL(spark, repo)
    with pytest.raises(KeyError, match="no branch"):
        lsql.sql("USE BRANCH nope")


def test_sql_table_changes_cdc(spark, repo):
    """TABLE_CHANGES(t, v1[, v2]): per-commit insert/delete rows with
    _commit_version — Delta CDC semantics (update = delete+insert)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", _df(spark, [(1, "a"), (2, "b")]))
    v1 = repo.commit("main", "v1").version
    lsql = LakeSQL(spark, repo)
    v2 = lsql.sql("UPDATE t SET val = 'B' WHERE id = 2").collect()[0].version
    v3 = lsql.sql("INSERT INTO t VALUES (3, 'c')").collect()[0].version

    rows = {
        (r.id, r.val, r._change_type, r._commit_version)
        for r in lsql.sql(f"SELECT * FROM TABLE_CHANGES(t, {v1}, {v3})").collect()
    }
    assert rows == {
        (1, "a", "insert", v1),
        (2, "b", "insert", v1),
        (2, "b", "delete", v2),
        (2, "B", "insert", v2),
        (3, "c", "insert", v3),
    }
    # open-ended end defaults to head; composable with plain SQL on top
    n = lsql.sql(
        f"SELECT count(*) AS n FROM TABLE_CHANGES(t, {v2}) WHERE _change_type = 'insert'"
    ).collect()[0].n
    assert n == 2


def test_sql_merge_into_upsert(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "t", spark.createDataFrame([(1, 10.0), (2, 20.0)], "id INT, v DOUBLE")
    )
    repo.write_table(
        "main", "s", spark.createDataFrame([(2, 99.0), (3, 30.0)], "id INT, v DOUBLE")
    )
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    out = lsql.sql(
        "MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert out.rows_affected == 2  # 1 updated + 1 inserted
    got = {r.id: r.v for r in lsql.sql("SELECT * FROM t").collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}


def test_sql_merge_into_custom_set_and_aliases(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "acct", spark.createDataFrame([(1, 100.0), (2, 200.0)], "id INT, bal DOUBLE")
    )
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    src = spark.createDataFrame([(1, 5.0), (9, 7.0)], "id INT, delta DOUBLE")
    src.createOrReplaceTempView("deposits")
    out = lsql.sql(
        "MERGE INTO acct a USING (SELECT id, delta FROM deposits) d "
        "ON a.id = d.id "
        "WHEN MATCHED THEN UPDATE SET bal = a.bal + d.delta"
    ).collect()[0]
    assert out.rows_affected == 1  # only matched updates, no insert clause
    got = {r.id: r.bal for r in lsql.sql("SELECT * FROM acct").collect()}
    assert got == {1: 105.0, 2: 200.0}  # id=9 ignored: no NOT MATCHED clause


def test_sql_merge_into_delete_and_insert(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "t", spark.createDataFrame([(1, "a"), (2, "b")], "id INT, s STRING")
    )
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    src = spark.createDataFrame([(2, "x"), (5, "e")], "id INT, s STRING")
    src.createOrReplaceTempView("chg")
    out = lsql.sql(
        "MERGE INTO t USING chg ON t.id = chg.id "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert out.rows_affected == 2  # 1 deleted + 1 inserted
    got = sorted((r.id, r.s) for r in lsql.sql("SELECT * FROM t").collect())
    assert got == [(1, "a"), (5, "e")]


def test_sql_merge_into_rejects_ambiguous_source(spark, repo):
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, "a")], "id INT, s STRING"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "id INT, s STRING")
    dup.createOrReplaceTempView("dupsrc")
    with _pytest.raises(ValueError, match="multiple rows per join key"):
        lsql.sql(
            "MERGE INTO t USING dupsrc ON t.id = dupsrc.id "
            "WHEN MATCHED THEN UPDATE SET *"
        )


def test_sql_merge_into_versions_like_dml(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, 1)], "id INT, x INT"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    src = spark.createDataFrame([(1, 2)], "id INT, x INT")
    src.createOrReplaceTempView("m_src")
    lsql.sql("MERGE INTO t USING m_src ON t.id = m_src.id WHEN MATCHED THEN UPDATE SET *")
    # pre-merge version still readable (time travel intact)
    old = lsql.sql("SELECT x FROM t VERSION AS OF 1").collect()
    assert [r.x for r in old] == [1]
    assert [r.x for r in lsql.sql("SELECT x FROM t").collect()] == [2]


def test_sql_merge_into_duplicate_nonmatching_keys_insert(spark, repo):
    # Delta-legal: duplicate source keys that match NO target row are a
    # multi-row insert, not an ambiguity
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, "a")], "id INT, s STRING"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    src = spark.createDataFrame([(9, "x"), (9, "y")], "id INT, s STRING")
    src.createOrReplaceTempView("dupnew")
    out = lsql.sql(
        "MERGE INTO t USING dupnew ON t.id = dupnew.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert out.rows_affected == 2
    got = sorted((r.id, r.s) for r in lsql.sql("SELECT * FROM t").collect())
    assert got == [(1, "a"), (9, "x"), (9, "y")]


def test_sql_merge_into_insert_only_with_duplicate_matching_keys(spark, repo):
    # insert-only merge never raises and never fans out matched targets
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, "a")], "id INT, s STRING"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    src = spark.createDataFrame([(1, "x"), (1, "y"), (5, "e")], "id INT, s STRING")
    src.createOrReplaceTempView("insrc")
    out = lsql.sql(
        "MERGE INTO t USING insrc ON t.id = insrc.id "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert out.rows_affected == 1
    got = sorted((r.id, r.s) for r in lsql.sql("SELECT * FROM t").collect())
    assert got == [(1, "a"), (5, "e")]


def test_sql_merge_using_subquery_with_join_on(spark, repo):
    # the source subquery's own JOIN ... ON must not be mistaken for the
    # merge condition
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, 0.0), (2, 0.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    spark.createDataFrame([(1,), (2,)], "id INT").createOrReplaceTempView("ja")
    spark.createDataFrame([(1, 7.5)], "id INT, v DOUBLE").createOrReplaceTempView("jb")
    out = lsql.sql(
        "MERGE INTO t USING "
        "(SELECT ja.id, jb.v FROM ja JOIN jb ON ja.id = jb.id) s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET *"
    ).collect()[0]
    assert out.rows_affected == 1
    got = {r.id: r.v for r in lsql.sql("SELECT * FROM t").collect()}
    assert got == {1: 7.5, 2: 0.0}


def test_sql_select_sees_staged_state(spark, repo):
    # lakeFS semantics: reading a branch shows its uncommitted staged data
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1,)], "id INT"))
    repo.commit("main", "v0")
    repo.write_table("main", "t", spark.createDataFrame([(2,)], "id INT"), mode="append")
    lsql = LakeSQL(spark, repo)
    assert lsql.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 2
    # committed snapshot reads stay pinned to the commit
    assert lsql.sql("SELECT COUNT(*) AS n FROM t VERSION AS OF 1").collect()[0].n == 1


def test_check_constraints_enforced_on_writes(spark, repo):
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    repo.write_table("main", "t", spark.createDataFrame([(1, 10.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    lsql.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    shown = {r.name: r.check_expr for r in lsql.sql("SHOW CONSTRAINTS t").collect()}
    assert shown == {"v_pos": "v > 0"}
    # violating write raises and leaves branch state untouched
    with _pytest.raises(ConstraintViolation, match="v_pos"):
        repo.write_table(
            "main", "t", spark.createDataFrame([(2, -5.0)], "id INT, v DOUBLE"),
            mode="append",
        )
    assert repo.read_table(spark, "t", "main").count() == 1
    # NULL passes (SQL CHECK semantics), positive passes
    repo.write_table(
        "main", "t", spark.createDataFrame([(3, None), (4, 2.0)], "id INT, v DOUBLE"),
        mode="append",
    )
    repo.commit("main", "ok rows")
    assert repo.read_table(spark, "t", "main").count() == 3
    # DML paths are covered too: UPDATE that would break the check raises
    with _pytest.raises(ConstraintViolation):
        lsql.sql("UPDATE t SET v = -1.0 WHERE id = 1")
    # dropping the constraint re-opens the gate
    lsql.sql("ALTER TABLE t DROP CONSTRAINT v_pos")
    lsql.sql("UPDATE t SET v = -1.0 WHERE id = 1")
    assert repo.read_table(spark, "t", "main").filter("v = -1.0").count() == 1


def test_add_constraint_validates_existing_rows(spark, repo):
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    repo.write_table("main", "t", spark.createDataFrame([(1, -1.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    with _pytest.raises(ConstraintViolation, match="existing rows"):
        lsql.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert lsql.sql("SHOW CONSTRAINTS t").count() == 0


def test_constraints_ride_branches(spark, repo):
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    repo.write_table("main", "t", spark.createDataFrame([(1, 1.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    LakeSQL(spark, repo).sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    repo.create_branch("dev")
    # the constraint came along with the branch
    with _pytest.raises(ConstraintViolation):
        repo.write_table(
            "dev", "t", spark.createDataFrame([(9, -9.0)], "id INT, v DOUBLE"),
            mode="append",
        )
    # main keeps enforcing independently
    assert repo.table_constraints("t", "dev") == {"v_pos": "v > 0"}


def test_drop_and_replace_clear_constraints(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, 1.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    lsql.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    lsql.sql("DROP TABLE t")
    # a recreated table of the same name starts unconstrained
    lsql.sql("CREATE TABLE t AS SELECT -5.0 AS v")
    assert lsql.sql("SHOW CONSTRAINTS t").count() == 0
    assert repo.read_table(spark, "t", "main").count() == 1
    # CREATE OR REPLACE likewise defines a NEW table
    lsql.sql("ALTER TABLE t ADD CONSTRAINT v_neg CHECK (v < 0)")
    lsql.sql("CREATE OR REPLACE TABLE t AS SELECT 7.0 AS v")
    assert lsql.sql("SHOW CONSTRAINTS t").count() == 0


def test_merge_validates_destination_constraints(spark, repo):
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation

    repo.write_table("main", "t", spark.createDataFrame([(1, 1.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    repo.create_branch("dev")  # dev branches BEFORE the constraint exists
    LakeSQL(spark, repo).sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    repo.write_table(
        "dev", "t", spark.createDataFrame([(2, -9.0)], "id INT, v DOUBLE"),
        mode="append",
    )
    repo.commit("dev", "legal on dev (no constraint there)")
    with _pytest.raises(ConstraintViolation, match="v_pos"):
        repo.merge(spark, "dev", "main")
    # main's data is untouched by the refused merge
    assert repo.read_table(spark, "t", "main").count() == 1


def test_alter_refuses_dirty_branch(spark, repo):
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import DirtyBranchError

    repo.write_table("main", "t", spark.createDataFrame([(1, 1.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    repo.write_table("main", "u", spark.createDataFrame([(9,)], "id INT"))  # staged
    with _pytest.raises(DirtyBranchError):
        LakeSQL(spark, repo).sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    repo.reset("main")
    LakeSQL(spark, repo).sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")


def test_constraint_on_missing_column_passes_schema_evolution(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table("main", "t", spark.createDataFrame([(1, 1.0)], "id INT, v DOUBLE"))
    repo.commit("main", "v0")
    LakeSQL(spark, repo).sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)")
    # schema-evolution append without column v: missing = NULL = passes
    repo.write_table(
        "main", "t", spark.createDataFrame([(2,)], "id INT"), mode="append"
    )
    repo.commit("main", "evolved append")
    t = repo.read_table(spark, "t", "main", merge_schema=True)
    assert t.count() == 2


def test_sql_describe_table_schema(spark, repo):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "t", spark.createDataFrame([(1, "a", 2.5)], "id INT, s STRING, v DOUBLE")
    )
    repo.commit("main", "v0")
    lsql = LakeSQL(spark, repo)
    rows = {(r.col_name, r.data_type) for r in lsql.sql("DESCRIBE TABLE t").collect()}
    assert rows == {("id", "int"), ("s", "string"), ("v", "double")}
    assert lsql.sql("DESC t").count() == 3
    # two-word DESCRIBE forms still route to their own handlers
    assert "version" in lsql.sql("DESCRIBE HISTORY t").columns
    assert "file" in lsql.sql("DESCRIBE STATS t").columns


def test_sql_copy_to_exports(spark, repo, tmp_path):
    """COPY [t | (SELECT ...)] TO 'path' [FORMAT ...] [WITH HEADER] —
    the export verb over the existing io sinks."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "t", spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, s STRING")
    )
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo)
    p1 = str(tmp_path / "out_parquet")
    r = lsql.sql(f"COPY t TO '{p1}'").collect()[0]
    assert r.rows_copied == 2 and r.format == "parquet"
    assert spark.read.parquet(p1).count() == 2
    p2 = str(tmp_path / "out_csv")
    lsql.sql(f"COPY (SELECT k FROM t WHERE k = 1) TO '{p2}' FORMAT CSV WITH HEADER")
    back = spark.read.option("header", True).csv(p2)
    assert back.columns == ["k"] and back.count() == 1
    p3 = str(tmp_path / "out_json")
    lsql.sql(f"COPY t TO '{p3}' FORMAT JSON")
    assert spark.read.json(p3).count() == 2


def test_sql_copy_to_select_with_hostile_literal(spark, repo, tmp_path):
    """ADVICE r6: the select body ends at its BALANCED closing paren —
    a string literal containing ``) TO '`` inside the query must not
    shift the select/path split (the old greedy regex anchored on the
    LAST occurrence and exported a truncated query to the wrong path)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    repo.write_table(
        "main", "t",
        spark.createDataFrame([(1, "x) TO 'y'"), (2, "plain")], "k LONG, s STRING"),
    )
    repo.commit("main", "base")
    lsql = LakeSQL(spark, repo)
    p = str(tmp_path / "out_hostile")
    r = lsql.sql(
        f"COPY (SELECT k FROM t WHERE s = 'x) TO ''y''') TO '{p}'"
    ).collect()[0]
    assert r.rows_copied == 1 and r.path == p
    assert [x.k for x in spark.read.parquet(p).collect()] == [1]
    # nested parens inside the select still balance correctly
    p2 = str(tmp_path / "out_nested")
    r2 = lsql.sql(
        f"COPY (SELECT (k + (1)) AS k2 FROM t WHERE upper(s) = 'PLAIN') TO '{p2}'"
    ).collect()[0]
    assert r2.rows_copied == 1
    assert [x.k2 for x in spark.read.parquet(p2).collect()] == [3]


def test_vacuum_retain_versions(spark, repo, tmp_path):
    """VACUUM RETAIN n VERSIONS: data within the horizon (and the head)
    stays time-travelable; older snapshots keep their metadata but lose
    unshared data files — Delta retention semantics in version units."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

    commits = []
    for i in range(4):
        repo.write_table(
            "main", "t", spark.createDataFrame([(i,)], "v LONG"), mode="overwrite"
        )
        commits.append(repo.commit("main", f"v{i}"))
    lsql = LakeSQL(spark, repo)
    # SQL spelling parses and dispatches (fresh files sit inside the
    # write-race grace window, so the statement itself removes nothing)
    assert lsql.sql("VACUUM RETAIN 1 VERSIONS DRY RUN").collect() == []
    dry = repo.vacuum(retain_versions=1, dry_run=True, grace_seconds=0.0)
    assert len(dry) >= 1  # versions 0 and 1 hold collectable files
    repo.vacuum(retain_versions=1, grace_seconds=0.0)
    # head and the previous version still read
    assert repo.read_table(spark, "t", "main").collect()[0].v == 3
    assert (
        repo.read_table(spark, "t", "main", version_as_of=commits[2].version)
        .collect()[0].v == 2
    )
    # history metadata survives for collected versions...
    assert len(repo.log("main", limit=None)) >= 5
    # ...but their data is gone
    import pytest as _pytest

    with _pytest.raises(Exception):
        repo.read_table(
            spark, "t", "main", version_as_of=commits[0].version
        ).collect()
