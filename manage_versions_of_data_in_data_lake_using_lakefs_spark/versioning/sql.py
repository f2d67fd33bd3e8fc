"""Delta-style SQL surface over ``LakeRepo`` snapshots.

The reference reaches time travel through Delta's reader options and
``DeltaTable`` API (``jobs/vdt4.py:39-40, 80-85``); Delta also exposes the
same capabilities in SQL (``SELECT ... FROM t VERSION AS OF 3``,
``DESCRIBE HISTORY t``). This module provides that SQL spelling on top of
the engine's commit DAG so a user migrating Delta SQL scripts keeps them
unchanged.

Mechanics: time-travel clauses are recognized lexically and each pinned
snapshot is registered as a temp view resolving through
``LakeRepo.read_table`` — the rewritten query then runs through plain
``spark.sql`` and Catalyst sees ordinary parquet scans (pruning/pushdown
intact). This is a clause rewriter, not a SQL parser: it handles the
Delta grammar forms (``VERSION AS OF <n>``, ``TIMESTAMP AS OF
'<ts>'``, ``@v<n>`` suffix, ``DESCRIBE HISTORY <t>``) anywhere a table
name may appear, which is exactly the surface Delta documents.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_VERSION_RE = re.compile(
    rf"\b(?P<table>{_IDENT})\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)", re.IGNORECASE
)
_TIMESTAMP_RE = re.compile(
    rf"\b(?P<table>{_IDENT})\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'", re.IGNORECASE
)
_AT_RE = re.compile(rf"\b(?P<table>{_IDENT})@v(?P<ver>\d+)\b")
_HISTORY_RE = re.compile(
    rf"^\s*DESCRIBE\s+HISTORY\s+(?P<table>{_IDENT})\s*;?\s*$", re.IGNORECASE
)


class LakeSQL:
    """SQL front door: branch-head tables as views + Delta time-travel SQL.

    >>> lsql = LakeSQL(spark, repo, branch="main")
    >>> lsql.sql("SELECT count(*) FROM events VERSION AS OF 2")
    >>> lsql.sql("DESCRIBE HISTORY events")
    """

    def __init__(self, spark: SparkSession, repo: LakeRepo, branch: str = "main"):
        self.spark = spark
        self.repo = repo
        self.branch = branch

    # -- history (DESCRIBE HISTORY parity) ---------------------------------
    def history(self, table: str | None = None) -> DataFrame:
        """Commit history as a DataFrame, newest first — Delta's
        ``DESCRIBE HISTORY`` schema essentials (version, timestamp,
        operation, …). With ``table``, only commits that changed it."""
        rows = []
        prev_files: dict[str, list] = {}
        commits = self.repo.log(self.branch, limit=10_000)
        for c in reversed(commits):  # oldest → newest to detect per-table change
            changed = table is None or c.tables.get(table) != prev_files.get(table)
            prev_files = c.tables
            if changed:
                rows.append(
                    (
                        c.version,
                        c.id,
                        datetime.fromtimestamp(c.timestamp, tz=timezone.utc),
                        "MERGE" if len(c.parents) > 1 else ("WRITE" if c.parents else "CREATE"),
                        c.message,
                        c.branch,
                    )
                )
        rows.reverse()
        return self.spark.createDataFrame(
            rows,
            "version INT, commit_id STRING, timestamp TIMESTAMP, "
            "operation STRING, message STRING, branch STRING",
        )

    # -- query rewrite ------------------------------------------------------
    def _register_snapshot(self, table: str, version: int | None, ts: str | None) -> str:
        if ts is not None:
            version = self._version_at(ts)
        view = f"{table}__v{version}"
        df = self.repo.read_table(self.spark, table, ref=self.branch, version_as_of=version)
        df.createOrReplaceTempView(view)
        return view

    def _version_at(self, ts: str) -> int:
        """Latest commit version at-or-before a timestamp (Delta's
        TIMESTAMP AS OF semantics)."""
        t = datetime.fromisoformat(ts)
        if t.tzinfo is None:
            t = t.replace(tzinfo=timezone.utc)
        target = t.timestamp()
        best = None
        for c in self.repo.log(self.branch, limit=10_000):
            if c.timestamp <= target and (best is None or c.version > best):
                best = c.version
        if best is None:
            raise KeyError(f"no commit at or before {ts} on {self.branch}")
        return best

    def sql(self, query: str) -> DataFrame:
        m = _HISTORY_RE.match(query)
        if m:
            return self.history(m.group("table"))

        def sub_version(m: re.Match) -> str:
            return self._register_snapshot(m.group("table"), int(m.group("ver")), None)

        def sub_ts(m: re.Match) -> str:
            return self._register_snapshot(m.group("table"), None, m.group("ts"))

        rewritten = _VERSION_RE.sub(sub_version, query)
        rewritten = _TIMESTAMP_RE.sub(sub_ts, rewritten)
        rewritten = _AT_RE.sub(sub_version, rewritten)
        # plain references to repo tables resolve to branch heads
        for t in self.repo.list_tables(self.branch):
            if re.search(rf"\b{re.escape(t)}\b", rewritten):
                self.repo.read_table(self.spark, t, ref=self.branch).createOrReplaceTempView(t)
        return self.spark.sql(rewritten)
