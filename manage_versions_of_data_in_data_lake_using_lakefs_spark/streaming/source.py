"""The versioned lake as a Structured Streaming SOURCE.

Completes the streaming loop: the engine already streams INTO the lake
exactly-once (``streaming/ops.py``); this module lets a downstream
pipeline tail a lake table *out* — the Delta-streaming-source pattern
(reference's lakeFS+Delta stack gets this from the Delta connector;
here it is a native Spark 4 Python DataSource).

Design:

- **Offsets are commit versions.** ``latestOffset`` reads the branch
  head's global version; a microbatch covers versions ``(start, end]``.
  Offsets live in the query checkpoint, so a restarted query resumes at
  the exact commit it left off — combined with the deterministic
  per-version file lists this gives exactly-once delivery into any of
  the repo's exactly-once sinks.
- **A microbatch's rows are the files ADDED in its versions** (the
  append-only reading of a table history). A version that *removes*
  files (overwrite/DELETE/compaction) is not representable as an append
  stream: the reader raises unless ``ignorechanges=true``, in which
  case removed files are skipped and only additions flow (Delta's
  ``ignoreChanges`` contract — downstream must tolerate it).
- **CDC mode** (``mode=cdc``) streams the change feed instead: rows
  tagged (_change_type, _commit_version), removals emitted as delete
  rows (removed files persist until vacuum), non-append commits fully
  representable. File-granularity CDF — multiset-correct to fold,
  not row-minimal (see ``stream_table_from_repo``).
- **Partitions ship plain file paths**; executors read them with
  pyarrow only — no engine imports ever reach worker processes. All
  classes are built inside a factory so cloudpickle ships them BY VALUE
  (the repo package is not importable from Spark's spawned python
  runner/worker processes — same rule as every worker function in this
  codebase, pinned by tests/test_worker_pickling.py). Engine imports
  happen only in driver-side reader methods, bootstrapped via the
  ``package_root`` option.

Guard boundaries (loud, not silent): column-mapped tables (ALTER
RENAME/ADD history) and Hive-partitioned layouts raise — their replay
logic lives in the batch reader and is out of scope for the tailer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: the package directory's parent — what sys.path needs for imports
_PACKAGE_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

def make_lake_stream_source():
    """Build the DataSource class. Factory-scoped so cloudpickle ships
    the class (and EVERY helper it closes over, including the arrow→DDL
    mapper) by value — a module-level helper would pickle as a reference
    to this package and fail to import in Spark's python runner."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _arrow_to_ddl = {
        "int8": "tinyint",
        "int16": "smallint",
        "int32": "int",
        "int64": "bigint",
        "float": "float",
        "double": "double",
        "bool": "boolean",
        "string": "string",
        "large_string": "string",
        "binary": "binary",
        "large_binary": "binary",
        "date32[day]": "date",
    }

    def _arrow_field_ddl(t) -> str:
        """pyarrow type → Spark DDL type for the source's declared schema.
        Timestamps map by tz-awareness (naive parquet micros surface as
        TIMESTAMP_NTZ in Spark 4, matching the batch reader's inference)."""
        import pyarrow as pa

        s = str(t)
        if s in _arrow_to_ddl:
            return _arrow_to_ddl[s]
        if pa.types.is_timestamp(t):
            return "timestamp" if t.tz is not None else "timestamp_ntz"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return f"array<{_arrow_field_ddl(t.value_type)}>"
        if pa.types.is_decimal(t):
            return f"decimal({t.precision},{t.scale})"
        raise NotImplementedError(
            f"lake stream source: unsupported column type {s}"
        )

    def _open_repo(opts):
        import importlib
        import sys as _sys

        pkg_root = opts.get("package_root") or "."
        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        mod = importlib.import_module(
            "manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo"
        )
        return mod.LakeRepo(opts["root"])

    def _expand_entries(root, entries, missing=None):
        """Commit entries → individual parquet paths (relative). Raises
        on Hive-partitioned layouts: pruned-rewrite entries carry k=v
        path components directly, and a partition_by group dir contains
        k=v SUBDIRS — both path-encode columns the bare-file reader
        cannot reconstruct.

        An entry whose backing dir/file is GONE (vacuumed history) is a
        hard error — silently skipping it would drain an incomplete
        stream with no signal. Pass ``missing`` (a list) to collect such
        entries instead of raising (used for the diff's parent side,
        where the caller decides)."""
        out = []
        for e in entries:
            if any("=" in part for part in e.split(os.sep)):
                raise NotImplementedError(
                    "lake stream source: Hive-partitioned layouts are not "
                    "streamable (partition columns are path-encoded); read "
                    "the table in batch instead"
                )
            full = os.path.join(root, e)
            if os.path.isdir(full):
                for fn in sorted(os.listdir(full)):
                    if os.path.isdir(os.path.join(full, fn)):
                        if "=" in fn:
                            raise NotImplementedError(
                                "lake stream source: Hive-partitioned "
                                "layouts are not streamable (partition "
                                "columns are path-encoded); read the table "
                                "in batch instead"
                            )
                        raise NotImplementedError(
                            f"lake stream source: unrecognized nested layout "
                            f"under {e} ({fn}); read the table in batch"
                        )
                    if fn.endswith(".parquet"):
                        out.append(os.path.join(e, fn))
            elif e.endswith(".parquet") and os.path.exists(full):
                out.append(e)
            elif missing is not None:
                missing.append(e)
            else:
                raise FileNotFoundError(
                    f"lake stream source: commit entry {e} has no backing "
                    f"files on disk — the history this stream still needs "
                    f"was likely vacuumed; keep retention >= stream lag, "
                    f"or restart the stream from a live version"
                )
        return out

    def _commit_chain(repo, branch, start_v, end_v):
        """Commits on the branch's FIRST-PARENT line with version in
        (start_v, end_v], oldest first. Walking the chain (not raw
        version integers) is what makes multi-branch repos safe: the
        global version counter is shared across branches (and aborted
        commits burn numbers), so versions absent from this line simply
        never appear — they are other branches' history, not deletions."""
        chain = []
        c = repo.head(branch)
        while c is not None and c.version > start_v:
            if c.version <= end_v:
                chain.append(c)
            c = repo.get_commit(c.parents[0]) if c.parents else None
        chain.reverse()
        return chain

    class _FilePartition(InputPartition):
        def __init__(self, path, fields, change_type=None, version=None):
            self.path = path
            self.fields = fields
            # CDC mode only: rows from this file are tagged
            # (_change_type, _commit_version)
            self.change_type = change_type
            self.version = version

    class _LakeStreamReader(DataSourceStreamReader):
        def __init__(self, options, schema):
            self.opts = dict(options)
            self.cdc = str(self.opts.get("mode", "")).lower() == "cdc"
            names = list(schema.fieldNames())
            if self.cdc:
                # the source appends the meta columns LAST; validate the
                # contract so a user-supplied explicit schema of bare
                # data columns fails loudly instead of silently losing
                # its last two real columns
                if names[-2:] != ["_change_type", "_commit_version"]:
                    raise ValueError(
                        "lake stream source (mode=cdc): the schema's last "
                        "two fields must be `_change_type string, "
                        "_commit_version bigint` (the source appends "
                        f"them); got {names[-2:]} — append them to your "
                        "explicit schema or omit .schema() entirely"
                    )
                self.fields = names[:-2]
            else:
                self.fields = names

        # -- driver-side (python runner process; engine imports OK after
        #    the package_root bootstrap) --------------------------------
        def initialOffset(self) -> dict:
            return {"version": int(self.opts.get("starting_version", -1))}

        def latestOffset(self) -> dict:
            repo = _open_repo(self.opts)
            return {"version": repo.head(self.opts["branch"]).version}

        def partitions(self, start: dict, end: dict):
            repo = _open_repo(self.opts)
            branch, table = self.opts["branch"], self.opts["table"]
            if repo.table_schema_map(table, ref=branch, include_staged=False):
                raise NotImplementedError(
                    "lake stream source: column-mapped tables (ALTER "
                    "RENAME/ADD history) are not streamable; read in batch"
                )
            ignore = str(self.opts.get("ignorechanges", "")).lower() == "true"
            parts: list[_FilePartition] = []
            # one walk of the first-parent chain; each commit diffs
            # against its OWN parent's entries (O(chain), not
            # O(chain²) re-resolves from head)
            for c in _commit_chain(
                repo, branch, start["version"], end["version"]
            ):
                parent = (
                    repo.get_commit(c.parents[0]) if c.parents else None
                )
                prev_entries = parent.tables.get(table, []) if parent else []
                cur_entries = c.tables.get(table, [])
                if cur_entries == prev_entries:
                    continue  # commit did not touch this table
                # the parent side tolerates vacuumed entries at the DIFF
                # level (we may only need their names); the current side
                # is strict — its rows are about to be read
                miss_prev: list[str] = []
                prev = set(
                    _expand_entries(repo.root, prev_entries, miss_prev)
                )
                cur = set(_expand_entries(repo.root, cur_entries))
                removed = prev - cur
                if self.cdc:
                    if miss_prev:
                        shown = ", ".join(miss_prev[:3]) + (
                            ", ..." if len(miss_prev) > 3 else ""
                        )
                        raise FileNotFoundError(
                            f"lake stream source (mode=cdc): version "
                            f"{c.version} removed {len(miss_prev)} "
                            f"entr{'y' if len(miss_prev) == 1 else 'ies'} "
                            f"whose files were vacuumed ({shown}); their "
                            f"delete rows are unrecoverable — keep "
                            f"retention >= stream lag or restart past "
                            f"this version"
                        )
                    # CDC mode: removals become 'delete' rows (removed
                    # files persist on disk until vacuum), additions
                    # 'insert' rows — FILE-granularity CDF: a rewrite
                    # emits delete+insert for every row of the rewritten
                    # files (like Delta CDF without change files), so the
                    # feed is multiset-correct to fold, not row-minimal
                    for rel in sorted(removed):
                        parts.append(
                            _FilePartition(
                                os.path.join(repo.root, rel),
                                self.fields,
                                "delete",
                                c.version,
                            )
                        )
                    for rel in sorted(cur - prev):
                        parts.append(
                            _FilePartition(
                                os.path.join(repo.root, rel),
                                self.fields,
                                "insert",
                                c.version,
                            )
                        )
                    continue
                if (removed or miss_prev) and not ignore:
                    vac = (
                        f" ({len(miss_prev)} already vacuumed — mode=cdc "
                        f"cannot recover their delete rows either)"
                        if miss_prev
                        else " — or mode=cdc to stream delete+insert "
                        "change rows"
                    )
                    raise ValueError(
                        f"lake stream source: version {c.version} removed "
                        f"{len(removed) + len(miss_prev)} file(s)/"
                        f"entr(ies) from {table} (overwrite/DELETE/"
                        f"compaction); the append-only stream cannot "
                        f"represent it — set ignorechanges=true to skip "
                        f"removals and stream additions only{vac}"
                    )
                for rel in sorted(cur - prev):
                    parts.append(
                        _FilePartition(
                            os.path.join(repo.root, rel), self.fields
                        )
                    )
            return parts

        def commit(self, end: dict) -> None:
            pass

        # -- executor-side: pyarrow + stdlib ONLY ----------------------
        def read(self, partition):
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(partition.path)
            names = set(pf.schema_arrow.names)
            extra = names - set(partition.fields)
            if extra:
                # a file carrying columns the stream schema lacks would be
                # silently truncated; fail loudly like the other guards
                raise ValueError(
                    f"lake stream source: {partition.path} carries columns "
                    f"{sorted(extra)} absent from the stream schema "
                    f"{partition.fields} (schema-evolving append?); pass a "
                    f"full explicit schema or read in batch"
                )
            t = pf.read(columns=partition.fields)
            cols = [t.column(f).to_pylist() for f in partition.fields]
            if partition.change_type is None:
                for row in zip(*cols):
                    yield row
            else:
                tag = (partition.change_type, partition.version)
                for row in zip(*cols):
                    yield row + tag

    class LakeStreamSource(DataSource):
        """format("lakegraft_stream"): options root, branch, table,
        [starting_version, ignorechanges, package_root]."""

        @classmethod
        def name(cls) -> str:
            return "lakegraft_stream"

        def schema(self) -> str:
            import pyarrow.parquet as pq

            repo = _open_repo(self.options)
            cdc = str(self.options.get("mode", "")).lower() == "cdc"
            c = repo.head(self.options["branch"])
            files: list[str] = []
            while c is not None:
                # tolerate vacuumed entries here (collector) — schema
                # inference just needs ONE live file; if the whole walk
                # comes up empty the actionable remedy is an explicit
                # .schema(...), not a vacuum complaint
                files = _expand_entries(
                    repo.root, c.tables.get(self.options["table"], []), []
                )
                if files or not cdc:
                    # append mode pins the HEAD snapshot's schema; CDC
                    # walks back to the last version that had files — a
                    # DELETE-emptied head is exactly what a change feed
                    # must still be able to describe
                    break
                c = repo.get_commit(c.parents[0]) if c.parents else None
            if not files:
                raise ValueError(
                    "lake stream source: table has no committed files on "
                    "disk to derive a schema from (never written, or its "
                    "history was vacuumed); pass an explicit .schema(...)"
                )
            # first AND last file (snapshot order ≈ write order): a
            # schema-evolving append history (appends may ADD columns)
            # would otherwise silently pin the oldest file's columns
            sch = pq.ParquetFile(os.path.join(repo.root, files[0])).schema_arrow
            last = pq.ParquetFile(os.path.join(repo.root, files[-1])).schema_arrow
            if [f.name for f in sch] != [f.name for f in last]:
                raise NotImplementedError(
                    "lake stream source: the snapshot mixes physical "
                    "schemas (schema-evolving appends); the stream needs "
                    "one uniform schema — read in batch with "
                    "merge_schema=True instead"
                )
            ddl = ", ".join(
                f"{f.name} {_arrow_field_ddl(f.type)}" for f in sch
            )
            if str(self.options.get("mode", "")).lower() == "cdc":
                ddl += ", _change_type string, _commit_version bigint"
            return ddl

        def streamReader(self, schema):
            return _LakeStreamReader(self.options, schema)

    return LakeStreamSource


def register_lake_stream_source(spark: SparkSession) -> None:
    """Idempotent registration of the ``lakegraft_stream`` format."""
    spark.dataSource.register(make_lake_stream_source())


def stream_table_from_repo(
    spark: SparkSession,
    repo_root: str,
    table: str,
    branch: str = "main",
    *,
    starting_version: int = -1,
    ignore_changes: bool = False,
    cdc: bool = False,
) -> DataFrame:
    """Tail a lake table as a stream: every commit's appended rows become
    a microbatch, offsets = commit versions (checkpoint-resumable).

    ``cdc=True`` streams the CHANGE FEED instead: every row is tagged
    (_change_type ∈ insert|delete, _commit_version), removals emit their
    rows as deletes (removed files persist until vacuum), and non-append
    commits are representable instead of fatal. The feed has FILE
    granularity — a rewrite emits delete+insert for each row of the
    rewritten files — so it is multiset-correct to fold (inserts minus
    deletes per row ≡ the table at the drained version) but not
    row-minimal like the batch TABLE_CHANGES TVF's exceptAll diff."""
    register_lake_stream_source(spark)
    reader = (
        spark.readStream.format("lakegraft_stream")
        .option("root", repo_root)
        .option("branch", branch)
        .option("table", table)
        .option("starting_version", starting_version)
        .option("package_root", _PACKAGE_ROOT)
    )
    if cdc:
        reader = reader.option("mode", "cdc")
    if ignore_changes:
        reader = reader.option("ignorechanges", "true")
    return reader.load()
