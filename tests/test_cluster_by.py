"""CLUSTER BY (r14): the Delta liquid-clustering analogue. A declared
clustering spec rides a reserved TBLPROPERTIES key (branch/merge/clone/
rename/time-travel for free, same machinery as PARTITIONED BY), plain
``OPTIMIZE t`` re-clusters on the declared keys (explicit ZORDER/SORT
overrides for that run), and ``ALTER TABLE t CLUSTER BY (...) | NONE``
changes the spec metadata-only — already-written data keeps its layout
until the next OPTIMIZE, exactly Delta's contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import (
    CLUSTER_PROP,
    LakeRepo,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL


@pytest.fixture()
def repo(tmp_path):
    return LakeRepo.init(str(tmp_path / "lake"))


@pytest.fixture()
def lsql(spark, repo):
    return LakeSQL(spark, repo, "main")


def _fill(lsql, n=400):
    # k = id % 7 with contiguous range() slices ≥ 7 ids wide: every
    # written file holds the full k domain, so un-clustered min/max
    # stats prune nothing
    lsql.sql(
        "INSERT INTO t SELECT CAST(id % 7 AS INT) AS k, "
        f"CAST(id AS INT) AS v FROM range({n})"
    )


def test_create_cluster_by_and_plain_optimize_clusters(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, v INT) CLUSTER BY (k)")
    assert repo.table_cluster_columns("t", "main") == ["k"]
    for _ in range(4):
        _fill(lsql, 200)
    full = repo.read_table(spark, "t", "main")
    assert len(full.inputFiles()) >= 4
    # every file spans the whole k domain: pruning on k skips nothing
    assert len(
        repo.read_table(spark, "t", "main", prune_where="k < 1").inputFiles()
    ) == len(full.inputFiles())

    # plain OPTIMIZE (no keys named) picks up the declared spec
    out = lsql.sql("OPTIMIZE t INTO 4 FILES").collect()[0]
    assert out.file_groups == 1
    pruned = repo.read_table(spark, "t", "main", prune_where="k < 1")
    assert len(pruned.inputFiles()) < len(
        repo.read_table(spark, "t", "main").inputFiles()
    )
    assert repo.read_table(spark, "t", "main").count() == 800
    assert pruned.filter("k < 1").count() == 4 * sum(
        1 for i in range(200) if i % 7 < 1
    )


def test_ctas_cluster_by_with_partitioning_and_validation(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t PARTITIONED BY (p) CLUSTER BY (k) AS "
        "SELECT CAST(id % 2 AS INT) AS p, CAST(id % 11 AS INT) AS k, "
        "id AS v FROM range(100)"
    )
    assert repo.table_partition_columns("t", "main") == ["p"]
    assert repo.table_cluster_columns("t", "main") == ["k"]

    # cluster spec must be disjoint from the partition spec
    with pytest.raises(ValueError, match="disjoint"):
        lsql.sql(
            "CREATE TABLE bad PARTITIONED BY (p) CLUSTER BY (p) AS "
            "SELECT CAST(id % 2 AS INT) AS p, id AS v FROM range(10)"
        )
    with pytest.raises(ValueError, match="duplicate"):
        lsql.sql("CREATE TABLE bad (a INT, b INT) CLUSTER BY (a, a)")
    with pytest.raises(ValueError, match="nope"):
        lsql.sql("CREATE TABLE bad (a INT) CLUSTER BY (nope)")
    # failed creations left nothing behind
    assert "bad" not in repo.list_tables("main")


def test_alter_cluster_by_set_change_and_none(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, grp INT, v INT)")
    assert repo.table_cluster_columns("t", "main") == []
    lsql.sql("ALTER TABLE t CLUSTER BY (k, grp)")
    assert repo.table_cluster_columns("t", "main") == ["k", "grp"]
    # case-corrected to the stored spelling; backticks accepted (the
    # create-time clause accepts them, so ALTER must too — review r14)
    lsql.sql("ALTER TABLE t CLUSTER BY (`GRP`)")
    assert repo.table_cluster_columns("t", "main") == ["grp"]
    lsql.sql("ALTER TABLE t CLUSTER BY NONE")
    assert repo.table_cluster_columns("t", "main") == []

    with pytest.raises(ValueError, match="nope"):
        lsql.sql("ALTER TABLE t CLUSTER BY (nope)")
    with pytest.raises(Exception, match="not found"):
        lsql.sql("ALTER TABLE missing CLUSTER BY (k)")


def test_reserved_prop_key_rejected(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT) CLUSTER BY (k)")
    with pytest.raises(ValueError, match="reserved"):
        lsql.sql(
            f"ALTER TABLE t SET TBLPROPERTIES ('{CLUSTER_PROP}' = 'v')"
        )
    with pytest.raises(ValueError, match="reserved"):
        lsql.sql(f"ALTER TABLE t UNSET TBLPROPERTIES ('{CLUSTER_PROP}')")
    # the spec IS visible read-only (Delta shows its delta.* props too)
    props = {
        r.key: r.value for r in lsql.sql("SHOW TBLPROPERTIES t").collect()
    }
    assert props[CLUSTER_PROP] == "k"


def test_show_create_emits_and_like_carries_the_spec(spark, repo, lsql):
    lsql.sql(
        "CREATE TABLE t (p INT, k INT, v STRING) "
        "PARTITIONED BY (p) CLUSTER BY (k, v)"
    )
    script = lsql.sql("SHOW CREATE TABLE t").collect()[0][0]
    assert "PARTITIONED BY (p)" in script
    assert "CLUSTER BY (k, v)" in script
    # CLUSTER BY rides the one definition serializer → LIKE carries it
    lsql.sql("CREATE TABLE u LIKE t")
    assert repo.table_cluster_columns("u", "main") == ["k", "v"]
    assert repo.table_partition_columns("u", "main") == ["p"]
    # and the emitted script replays verbatim on a fresh branch
    repo.create_branch("replay", "main")
    LakeSQL(spark, repo, "replay").sql(script.replace(" t ", " t2 ", 1))
    assert repo.table_cluster_columns("t2", "replay") == ["k", "v"]


def test_spec_rides_branches_and_explicit_zorder_overrides(spark, repo, lsql):
    lsql.sql("CREATE TABLE t (k INT, v INT) CLUSTER BY (k)")
    _fill(lsql, 300)
    repo.create_branch("dev", "main")
    assert repo.table_cluster_columns("t", "dev") == ["k"]
    dev = LakeSQL(spark, repo, "dev")
    # an explicit ZORDER clause overrides the declared spec for the run
    out = dev.sql("OPTIMIZE t ZORDER BY (v) INTO 2 FILES").collect()[0]
    assert out.file_groups == 1
    pr_v = repo.read_table(spark, "t", "dev", prune_where="v < 50")
    assert len(pr_v.inputFiles()) < 2 or pr_v.count() == 300
    assert repo.read_table(spark, "t", "dev").count() == 300


def test_drop_blocked_and_rename_follows_the_spec(spark, repo, lsql):
    # review r14: a stale spec pointing at a gone/renamed column would
    # crash the next plain OPTIMIZE and break SHOW CREATE replay
    lsql.sql("CREATE TABLE t (k INT, v INT) CLUSTER BY (k)")
    with pytest.raises(ValueError, match="CLUSTER BY"):
        lsql.sql("ALTER TABLE t DROP COLUMN k")
    # rename is pure metadata: the spec follows the column
    lsql.sql("ALTER TABLE t RENAME COLUMN k TO key")
    assert repo.table_cluster_columns("t", "main") == ["key"]
    script = lsql.sql("SHOW CREATE TABLE t").collect()[0][0]
    assert "CLUSTER BY (key)" in script
    # after CLUSTER BY NONE the drop goes through
    lsql.sql("ALTER TABLE t CLUSTER BY NONE")
    lsql.sql("ALTER TABLE t DROP COLUMN key")
    assert repo.read_table(spark, "t", "main").columns == ["v"]


def test_cluster_by_none_on_unclustered_table_is_a_noop(spark, repo, lsql):
    # review r14: no spurious commit, mirroring unset_tblproperties
    lsql.sql("CREATE TABLE t (k INT)")
    before = repo.head("main").version
    lsql.sql("ALTER TABLE t CLUSTER BY NONE")
    assert repo.head("main").version == before
    # and NONE on a clustered table that has no other props drops the
    # tblprops object entirely rather than leaving an empty '{}'
    lsql.sql("ALTER TABLE t CLUSTER BY (k)")
    lsql.sql("ALTER TABLE t CLUSTER BY NONE")
    assert repo.table_properties("t", "main") == {}


def test_script_emits_alter_for_post_alter_cluster_columns(spark, repo, lsql):
    # review r14: a cluster column that only exists via ALTER ADD COLUMN
    # cannot ride the inline CREATE clause — the script must express
    # clustering as its own trailing ALTER so the replay validates
    lsql.sql("CREATE TABLE t (a INT)")
    lsql.sql("ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (a + 1)")
    lsql.sql("ALTER TABLE t ADD COLUMN b INT")
    lsql.sql("ALTER TABLE t CLUSTER BY (b)")
    script = lsql.sql("SHOW CREATE TABLE t").collect()[0][0]
    assert "ALTER TABLE t CLUSTER BY (b)" in script
    # LIKE replays the script end-to-end, carrying the spec
    lsql.sql("CREATE TABLE u LIKE t")
    assert repo.table_cluster_columns("u", "main") == ["b"]
    assert repo.read_table(spark, "u", "main").columns == ["a", "g", "b"]
