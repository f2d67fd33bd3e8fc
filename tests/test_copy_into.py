"""COPY INTO (r11): Databricks' idempotent bulk load — exactly-once file
ingestion into a versioned table, with the loaded-file set riding a
hidden versioned object (branch/time-travel/push consistent)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


def _land(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_copy_into_idempotent_and_incremental(spark, repo, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "batch1"), 0, 10)
    sql = LakeSQL(spark, repo, "main")
    r = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r.num_inserted_rows == 10 and r.num_loaded_files >= 1
    assert r.num_skipped_files == 0
    v1 = repo.head("main").version
    # re-run: every file skips, NO new commit (exactly-once under retry)
    r2 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r2.num_inserted_rows == 0 and r2.num_loaded_files == 0
    assert r2.num_skipped_files == r.num_loaded_files
    assert repo.head("main").version == v1
    # a new landed batch loads ONLY its own rows
    # a branch cut BEFORE batch2 exists: its loaded set knows batch1 only
    repo.create_branch("b", "main")
    _land(spark, os.path.join(land, "batch2"), 10, 15)
    r3 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r3.num_inserted_rows == 5 and r3.num_skipped_files >= 1
    got = sorted(x.k for x in repo.read_table(spark, "t", "main").collect())
    assert got == list(range(15))
    # the loaded set is BRANCH state: COPY INTO on b loads batch2
    # independently (b's registry never saw it) and skips batch1
    rb = LakeSQL(spark, repo, "b").sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET"
    ).first()
    assert rb.num_inserted_rows == 5 and rb.num_skipped_files >= 1
    assert sorted(
        x.k for x in repo.read_table(spark, "t", "b").collect()
    ) == list(range(15))
    # a writer crash's _temporary droppings and _SUCCESS markers are
    # invisible — to the directory walk AND to a bare glob
    os.makedirs(os.path.join(land, "batch2", "_temporary", "0"), exist_ok=True)
    with open(
        os.path.join(land, "batch2", "_temporary", "0", "part-junk.parquet"),
        "wb",
    ) as f:
        f.write(b"not parquet")
    r4 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r4.num_inserted_rows == 0 and r4.num_loaded_files == 0
    r5 = sql.sql(
        f"COPY INTO t FROM '{os.path.join(land, 'batch1', '*')}' "
        f"FILEFORMAT = PARQUET"
    ).first()
    assert r5.num_loaded_files == 0  # _SUCCESS not matched, parts skipped
    # unknown COPY_OPTIONS are loud, not silently ignored
    with pytest.raises(ValueError, match="unknown COPY_OPTIONS"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"COPY_OPTIONS ('fore' = 'true')"
        )
    # DROP TABLE clears the registry: a drop-and-reload really loads
    sql.sql("DROP TABLE t")
    r6 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r6.num_inserted_rows == 15 and r6.num_skipped_files == 0
    assert repo.read_table(spark, "t", "main").count() == 15


def test_copy_into_recursive_glob_skips_hidden_dirs(spark, repo, tmp_path):
    """r11 review: a recursive glob whose wildcard spans a hidden
    directory must NOT load the files under it (a crashed writer's
    _temporary partials would otherwise load and be permanently
    recorded as correct) — while hidden components inside the
    pattern's LITERAL prefix stay admitted (the user explicitly named
    that location)."""
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "batch1"), 0, 5)
    junkdir = os.path.join(land, "_temporary", "0")
    os.makedirs(junkdir, exist_ok=True)
    # REAL parquet junk: if it were admitted it would load cleanly and
    # poison the table, not just error
    _land(spark, os.path.join(junkdir, "oops"), 100, 105)
    sql = LakeSQL(spark, repo, "main")
    r = sql.sql(
        f"COPY INTO t FROM '{land}/**/*.parquet' FILEFORMAT = PARQUET"
    ).first()
    assert r.num_inserted_rows == 5
    got = sorted(x.k for x in repo.read_table(spark, "t", "main").collect())
    assert got == list(range(5))
    # explicitly naming the hidden dir in the literal prefix admits it
    r2 = sql.sql(
        f"COPY INTO t2 FROM '{junkdir}/oops' FILEFORMAT = PARQUET"
    ).first()
    assert r2.num_inserted_rows == 5


def test_copy_into_force_reload_merges_with_sibling_load(spark, repo, tmp_path):
    """r11 review: a ONE-sided signature update (the documented force
    reload) must merge cleanly with a sibling branch that loaded new
    batches but never touched that path — three-way, not
    base-vs-each-side."""
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "batch1"), 0, 5)
    sql = LakeSQL(spark, repo, "main")
    sql.sql(f"COPY INTO t FROM '{land}/batch1' FILEFORMAT = PARQUET")
    repo.create_branch("b", "main")
    # branch b loads a NEW batch (its registry differs from base)
    _land(spark, os.path.join(land, "batch2"), 5, 9)
    LakeSQL(spark, repo, "b").sql(
        f"COPY INTO t FROM '{land}/batch2' FILEFORMAT = PARQUET"
    )
    # main force-reloads batch1 in place (same path, new signature)
    part = next(
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(os.path.join(land, "batch1"))
        for fn in sorted(fns)
        if fn.endswith(".parquet")
    )
    ns = time.time_ns()
    os.utime(part, ns=(ns, ns))
    sql.sql(
        f"COPY INTO t FROM '{land}/batch1' FILEFORMAT = PARQUET "
        f"COPY_OPTIONS ('force' = 'true')"
    )
    # merge: b never touched batch1's path — src's new signature wins
    repo.merge(spark, "b", "main", keys={"t": ["k"]})
    # the merged registry carries the FORCED signature (no reload) and
    # b's batch2 entry (no reload)
    r = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r.num_inserted_rows == 0 and r.num_skipped_files == 2


def test_copy_into_registries_union_across_merge(spark, repo, tmp_path):
    """r11 review: two branches' loaded sets are union-able maps of
    immutable files — merging them must not conflict; a same-path
    different-bytes clash still does."""
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "batch1"), 0, 5)
    sql = LakeSQL(spark, repo, "main")
    sql.sql(f"COPY INTO t FROM '{land}/batch1' FILEFORMAT = PARQUET")
    repo.create_branch("b", "main")
    _land(spark, os.path.join(land, "batch2"), 5, 8)
    _land(spark, os.path.join(land, "batch3"), 8, 12)
    sql.sql(f"COPY INTO t FROM '{land}/batch2' FILEFORMAT = PARQUET")
    LakeSQL(spark, repo, "b").sql(
        f"COPY INTO t FROM '{land}/batch3' FILEFORMAT = PARQUET"
    )
    repo.merge(spark, "b", "main", keys={"t": ["k"]})
    assert sorted(
        x.k for x in repo.read_table(spark, "t", "main").collect()
    ) == list(range(12))
    # the merged registry knows BOTH sides' files: nothing reloads
    r = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r.num_inserted_rows == 0 and r.num_skipped_files == 3


def test_copy_into_changed_file_raises_force_reloads(spark, repo, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "batch1"), 0, 5)
    sql = LakeSQL(spark, repo, "main")
    sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    # mutate a landed file IN PLACE (same path, new mtime — the
    # landing-zone contract violation; a rewrite under a NEW name is
    # just a new file and loads normally)
    part = next(
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(land)
        for fn in sorted(fns)
        if fn.endswith(".parquet")
    )
    ns = time.time_ns()
    os.utime(part, ns=(ns, ns))
    with pytest.raises(ValueError, match="CHANGED"):
        sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    # force reloads everything matched (documented duplication)
    r = sql.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        f"COPY_OPTIONS ('force' = 'true')"
    ).first()
    assert r.num_inserted_rows == 5
    assert repo.read_table(spark, "t", "main").count() == 10
    # after force re-records, a plain re-run skips again
    r2 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r2.num_inserted_rows == 0


def test_copy_into_csv_schema_alignment_and_guards(spark, repo, tmp_path):
    land = str(tmp_path / "csv")
    spark.range(0, 6).select(
        (F.col("id") * 3).alias("v"), F.col("id").alias("k")  # reordered
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(land)
    repo.write_table(
        "main", "t",
        spark.range(0, 0).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("v")
        ),
    )
    repo.commit("main", "schema")
    sql = LakeSQL(spark, repo, "main")
    r = sql.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = CSV "
        f"FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')"
    ).first()
    assert r.num_inserted_rows == 6
    got = {x.k: x.v for x in repo.read_table(spark, "t", "main").collect()}
    assert got == {k: 3 * k for k in range(6)}  # by-name, not positional
    # the cast pinned the target's INT type despite CSV inference
    assert dict(repo.read_table(spark, "t", "main").dtypes)["v"] == "int"
    # extra/missing columns raise
    land2 = str(tmp_path / "csv2")
    spark.range(3).select(
        F.col("id").alias("k"), F.col("id").alias("v"), F.col("id").alias("z")
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(land2)
    with pytest.raises(ValueError, match="BY NAME"):
        sql.sql(
            f"COPY INTO t FROM '{land2}' FILEFORMAT = CSV "
            f"FORMAT_OPTIONS ('header' = 'true')"
        )
    with pytest.raises(FileNotFoundError):
        sql.sql(f"COPY INTO t FROM '{tmp_path}/nope' FILEFORMAT = PARQUET")
    assert not repo.status("main")


def test_copy_into_files_and_pattern_spellings(spark, repo, tmp_path):
    """r12 (VERDICT r11 #6): FILES = (...) names explicit relative
    paths, PATTERN = '<glob>' matches relative to the FROM directory;
    both compose with the idempotence registry and both keep the
    hidden-file discipline."""
    land = str(tmp_path / "landing")
    _land(spark, os.path.join(land, "b1"), 0, 10)
    _land(spark, os.path.join(land, "b2"), 10, 15)
    sql = LakeSQL(spark, repo, "main")
    b1_file = next(
        f for f in sorted(os.listdir(os.path.join(land, "b1")))
        if f.endswith(".parquet")
    )

    # FILES loads exactly the named file
    r = sql.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        f"FILES = ('b1/{b1_file}')"
    ).first()
    assert (r.num_inserted_rows, r.num_loaded_files) == (10, 1)
    # idempotence interplay: a broader selection skips the loaded file
    r2 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r2.num_inserted_rows == 5 and r2.num_skipped_files == 1
    # FILES re-selection of the loaded file skips it too
    r3 = sql.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        f"FILES = ('b1/{b1_file}')"
    ).first()
    assert (r3.num_loaded_files, r3.num_skipped_files) == (0, 1)

    # PATTERN: glob relative to FROM; hidden files never match
    _land(spark, os.path.join(land, "b3"), 15, 18)
    open(os.path.join(land, "b3", "_garbage.parquet"), "w").write("x")
    r4 = sql.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        f"PATTERN = 'b3/*.parquet'"
    ).first()
    assert (r4.num_inserted_rows, r4.num_loaded_files) == (3, 1)
    got = sorted(x.k for x in repo.read_table(spark, "t", "main").collect())
    assert got == list(range(18))

    # loud contracts
    with pytest.raises(ValueError, match="mutually exclusive"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"FILES = ('b1/{b1_file}') PATTERN = '*.parquet'"
        )
    with pytest.raises(ValueError, match="literal directory"):
        sql.sql(
            f"COPY INTO t FROM '{land}/*' FILEFORMAT = PARQUET "
            f"PATTERN = '*.parquet'"
        )
    with pytest.raises(FileNotFoundError, match="not found"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"FILES = ('b1/nope.parquet')"
        )
    with pytest.raises(ValueError, match="hidden"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"FILES = ('b3/_garbage.parquet')"
        )
    with pytest.raises(FileNotFoundError, match="matches no files"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"PATTERN = 'zzz/*.parquet'"
        )


def test_copy_into_files_pattern_cannot_escape_from_dir(spark, repo, tmp_path):
    """r13 (ADVICE r12): FILES/PATTERN are relative-to-FROM by contract —
    absolute FILES entries and '..'-bearing or absolute PATTERNs must be
    rejected loudly, never silently load (and register forever) a file
    outside the landing directory."""
    land = str(tmp_path / "landing")
    outside = str(tmp_path / "outside")
    _land(spark, land, 0, 5)
    _land(spark, outside, 100, 103)
    out_file = next(
        f for f in sorted(os.listdir(outside)) if f.endswith(".parquet")
    )
    sql = LakeSQL(spark, repo, "main")

    with pytest.raises(ValueError, match="absolute"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"FILES = ('{outside}/{out_file}')"
        )
    with pytest.raises(ValueError, match="relative components"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"FILES = ('../outside/{out_file}')"
        )
    with pytest.raises(ValueError, match="outside"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"PATTERN = '../outside/*.parquet'"
        )
    with pytest.raises(ValueError, match="outside"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"PATTERN = '{outside}/*.parquet'"
        )
    # nothing was loaded or registered by the rejected statements
    with pytest.raises(KeyError):
        repo.read_table(spark, "t", "main")


def test_copy_into_symlink_cannot_escape_from_dir(spark, repo, tmp_path):
    """r13 review: os.path.relpath is lexical, so only a realpath
    containment check catches a SYMLINK inside the landing dir pointing
    outside it — both the FILES and PATTERN selections must refuse."""
    land = str(tmp_path / "landing")
    outside = str(tmp_path / "outside")
    _land(spark, land, 0, 5)
    _land(spark, outside, 100, 103)
    out_file = next(
        f for f in sorted(os.listdir(outside)) if f.endswith(".parquet")
    )
    os.symlink(os.path.join(outside, out_file), os.path.join(land, "sneaky.parquet"))
    sql = LakeSQL(spark, repo, "main")
    with pytest.raises(ValueError, match="outside the FROM"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"FILES = ('sneaky.parquet')"
        )
    with pytest.raises(ValueError, match="outside the FROM"):
        sql.sql(
            f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
            f"PATTERN = 'sneaky.parquet'"
        )
    # a symlink WITHIN the landing dir is fine
    legit = next(
        f for f in sorted(os.listdir(land)) if f.endswith(".parquet") and f != "sneaky.parquet"
    )
    os.symlink(os.path.join(land, legit), os.path.join(land, "alias.parquet"))
    r = sql.sql(
        f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET "
        f"FILES = ('alias.parquet')"
    ).first()
    assert r.num_loaded_files == 1


def test_clone_carries_copy_into_registry(spark, repo, tmp_path):
    """r13 review: both clone flavors must carry the loaded-file
    registry — the clone holds the landed rows (by copy or by shared
    reference), so re-running the same COPY INTO must skip."""
    land = str(tmp_path / "landing")
    _land(spark, land, 0, 5)
    sql = LakeSQL(spark, repo, "main")
    sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    for stmt in ("CREATE TABLE s SHALLOW CLONE t", "CREATE TABLE d DEEP CLONE t"):
        sql.sql(stmt)
    for tbl in ("s", "d"):
        r = sql.sql(
            f"COPY INTO {tbl} FROM '{land}' FILEFORMAT = PARQUET"
        ).first()
        assert (r.num_loaded_files, r.num_skipped_files) == (0, 1), tbl
        assert repo.read_table(spark, tbl, "main").count() == 5, tbl


def test_copy_into_bare_from_symlink_and_view_target(spark, repo, tmp_path):
    """r13 re-review: the bare-FROM spelling enforces symlink
    containment too, and a first COPY INTO may not auto-create a table
    under a stored view's name."""
    land = str(tmp_path / "landing")
    outside = str(tmp_path / "outside")
    _land(spark, land, 0, 2)
    _land(spark, outside, 100, 103)
    out_file = next(
        f for f in sorted(os.listdir(outside)) if f.endswith(".parquet")
    )
    os.symlink(
        os.path.join(outside, out_file), os.path.join(land, "sneaky.parquet")
    )
    sql = LakeSQL(spark, repo, "main")
    with pytest.raises(ValueError, match="outside the FROM"):
        sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    os.unlink(os.path.join(land, "sneaky.parquet"))
    sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET")
    sql.sql("CREATE VIEW w AS SELECT k FROM t")
    with pytest.raises(ValueError, match="view of that name"):
        sql.sql(f"COPY INTO w FROM '{land}' FILEFORMAT = PARQUET")
    assert "w" not in repo.list_tables("main")


def test_copy_into_registry_keyed_by_realpath(spark, repo, tmp_path):
    """r13 re-review: an in-dir symlink ALIAS of an already-loaded file
    is the same physical bytes — it must skip, not duplicate; two
    aliases in one statement load once."""
    land = str(tmp_path / "landing")
    _land(spark, land, 0, 5)
    legit = next(
        f for f in sorted(os.listdir(land)) if f.endswith(".parquet")
    )
    sql = LakeSQL(spark, repo, "main")
    r1 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert r1.num_loaded_files == 1
    os.symlink(os.path.join(land, legit), os.path.join(land, "alias.parquet"))
    r2 = sql.sql(f"COPY INTO t FROM '{land}' FILEFORMAT = PARQUET").first()
    assert (r2.num_loaded_files, r2.num_skipped_files) == (0, 2)
    assert repo.read_table(spark, "t", "main").count() == 5
    # fresh table, both spellings of the same file in one statement
    os.symlink(os.path.join(land, legit), os.path.join(land, "alias2.parquet"))
    r3 = sql.sql(
        f"COPY INTO t2 FROM '{land}' FILEFORMAT = PARQUET "
        f"FILES = ('{legit}', 'alias.parquet', 'alias2.parquet')"
    ).first()
    assert r3.num_loaded_files == 1
    assert repo.read_table(spark, "t2", "main").count() == 5
