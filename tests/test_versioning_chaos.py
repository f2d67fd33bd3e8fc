"""Property-based chaos tests for the versioning layer (hypothesis).

Random interleavings of branch/write/commit/merge/revert/reset/vacuum
must preserve the engine's three core versioning guarantees, whatever
the sequence:

1. **Committed snapshots are immutable**: every (commit id, table) pair
   ever committed reads back bit-identically at the end of the run.
2. **Time travel is stable under vacuum** (keep_history=True): reads
   pinned by global version survive GC.
3. **Merge never loses committed data**: a successful table-level merge
   leaves every table of either side present, with contents equal to one
   side's pre-merge contents (lakeFS object-granular semantics; true
   row-merges are covered deterministically in test_versioning.py).

The op stream is interpreted modulo the current repo state, so every
generated sequence is valid by construction; conflicts and dirty-branch
refusals are themselves asserted to raise their documented errors.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeRepo, MergeConflict
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import DirtyBranchError

# chaos/fuzz/property suite: excluded from the fast per-batch sweep (r13)
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_OPS = [
    "write", "commit", "branch", "merge", "revert", "reset", "vacuum",
    "delete", "upsert", "rename",
]

_op = st.tuples(st.sampled_from(_OPS), st.integers(0, 4), st.integers(0, 4))


def _rows(df) -> frozenset:
    # positional: ALTER RENAME may change the value column's NAME but
    # never its position (order is pinned from the recorded base)
    return frozenset((r[0], r[1]) for r in df.collect())


@given(ops=st.lists(_op, min_size=3, max_size=10))
@settings(**_SETTINGS)
def test_versioning_invariants_under_chaos(spark, ops):
    root = tempfile.mkdtemp(prefix="lake-chaos-")
    try:
        repo = LakeRepo.init(root)
        counter = 0  # unique row payloads so snapshots are identifiable
        tables = ["ta", "tb"]
        # live logical name of each table's value column PER BRANCH
        # (ALTER RENAME evolves it; revert restores the old schema map,
        # so the model must snapshot and restore names with commits)
        val_name = {"main": {t: "val" for t in tables}}
        # model of COMMITTED branch state: branch -> {table: frozenset}
        committed: dict[str, dict[str, frozenset]] = {"main": {}}
        staged: dict[str, dict[str, frozenset]] = {"main": {}}
        # (commit_id, version, {table: frozenset}) of every commit we made
        snapshots: list[tuple[str, int, dict[str, frozenset]]] = []

        for kind, a, b in ops:
            branches = sorted(committed)
            br = branches[a % len(branches)]
            if kind == "write":
                t = tables[b % len(tables)]
                counter += 1
                df = spark.createDataFrame(
                    [(counter, f"v{counter}")], f"id long, {val_name[br][t]} string"
                )
                repo.write_table(br, t, df)
                staged[br][t] = _rows(df)
            elif kind == "commit":
                if not staged[br]:
                    continue
                committed[br] = {**committed[br], **staged[br]}
                staged[br] = {}
                c = repo.commit(br, f"c{counter}")
                snapshots.append(
                    (c.id, c.version, dict(committed[br]), dict(val_name[br]))
                )
            elif kind == "branch":
                if staged[br] or len(committed) >= 4:
                    continue
                name = f"b{len(committed)}"
                repo.create_branch(name, source=br)
                committed[name] = dict(committed[br])
                staged[name] = {}
                val_name[name] = dict(val_name[br])
            elif kind == "merge":
                src = branches[b % len(branches)]
                if src == br:
                    continue
                if staged[br]:
                    # documented refusal: merging into a dirty branch
                    try:
                        repo.merge(spark, src, br)
                        raise AssertionError("merge into dirty branch must raise")
                    except DirtyBranchError:
                        continue
                try:
                    repo.merge(spark, src, br)
                except MergeConflict:
                    continue  # both-modified table, keys=None: model unchanged
                merged = dict(committed[br])
                for t, rows in committed[src].items():
                    if t not in merged:
                        merged[t] = rows
                post = {
                    t: _rows(repo.read_table(spark, t, br))
                    for t in repo.list_tables(br)
                }
                # no table lost; each table equals one side's contents
                assert set(post) == set(merged), (set(post), set(merged))
                for t in post:
                    assert post[t] in (
                        committed[br].get(t),
                        committed[src].get(t),
                    ), f"merge invented contents for {t}"
                committed[br] = post
            elif kind == "revert":
                if not snapshots or staged[br]:
                    continue
                cid, _, snap, names = snapshots[b % len(snapshots)]
                # revert only to commits on this branch's history
                if cid not in {c.id for c in repo.log(br, limit=None)}:
                    continue
                repo.revert(br, cid)
                committed[br] = dict(snap)
                # the schema-map object reverts with the snapshot: the
                # model's column names must follow
                val_name[br] = dict(names)
            elif kind == "reset":
                repo.reset(br)
                staged[br] = {}
            elif kind == "vacuum":
                repo.vacuum(keep_history=True, grace_seconds=0.0)
            elif kind == "rename":
                # metadata-only ALTER RENAME on the value column; only
                # while a single branch exists (so every branch's schema
                # map stays identical and merges can't diverge on it),
                # only on a clean branch (ALTER requires it), and only
                # for committed tables
                if len(committed) > 1 or staged[br] or not committed[br]:
                    continue
                t = tables[b % len(tables)]
                if t not in committed[br]:
                    continue
                counter += 1
                new = f"val{counter}"
                repo.alter_rename_column(spark, br, t, val_name[br][t], new)
                val_name[br][t] = new
                c = repo.head(br)
                # values are untouched; the ALTER commit is a snapshot too
                snapshots.append(
                    (c.id, c.version, dict(committed[br]), dict(val_name[br]))
                )
            elif kind == "delete":
                # SQL DELETE auto-commits; run it only on a clean branch so
                # it can't sweep unrelated staged tables into its commit.
                # The three predicate shapes hit all three DML paths:
                # stats-pruned rewrite, no-match metadata-only commit, and
                # the parser-fallback full rewrite (`%` isn't tokenized)
                if staged[br] or not committed[br]:
                    continue
                t = tables[b % len(tables)]
                if t not in committed[br] or not committed[br][t]:
                    continue
                from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

                variant = (a + b) % 3
                if variant == 0:
                    cond = f"id <= {counter - 1}"
                    survives = lambda r: not (r[0] <= counter - 1)
                elif variant == 1:
                    cond = f"{val_name[br][t]} = 'no-such-value'"
                    survives = lambda r: True
                else:
                    cond = "id % 2 = 0"
                    survives = lambda r: r[0] % 2 != 0
                LakeSQL(spark, repo, br).sql(f"DELETE FROM {t} WHERE {cond}")
                committed[br] = {
                    **committed[br],
                    t: frozenset(r for r in committed[br][t] if survives(r)),
                }
                c = repo.head(br)
                snapshots.append(
                    (c.id, c.version, dict(committed[br]), dict(val_name[br]))
                )
            elif kind == "upsert":
                # SQL MERGE INTO with a 2-row source: one row targets an
                # existing id (update), one a fresh id (insert)
                if staged[br] or not committed[br]:
                    continue
                t = tables[b % len(tables)]
                if t not in committed[br] or not committed[br][t]:
                    continue
                from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import LakeSQL

                hit_id = sorted(committed[br][t])[0][0]
                counter += 1
                rows = [(hit_id, f"m{counter}"), (counter + 10_000, f"i{counter}")]
                spark.createDataFrame(
                    rows, f"id long, {val_name[br][t]} string"
                ).createOrReplaceTempView("chaos_src")
                LakeSQL(spark, repo, br).sql(
                    f"MERGE INTO {t} USING chaos_src ON {t}.id = chaos_src.id "
                    "WHEN MATCHED THEN UPDATE SET * "
                    "WHEN NOT MATCHED THEN INSERT *"
                )
                merged_rows = {r for r in committed[br][t] if r[0] != hit_id}
                merged_rows |= set(rows)
                committed[br] = {**committed[br], t: frozenset(merged_rows)}
                c = repo.head(br)
                snapshots.append(
                    (c.id, c.version, dict(committed[br]), dict(val_name[br]))
                )

        # INVARIANT 1+2: every snapshot ever committed — including through
        # any number of vacuums/reverts/merges — reads back identically,
        # both by commit id and by pinned global version
        for cid, version, snap, _names in snapshots:
            for t, rows in snap.items():
                assert _rows(repo.read_table(spark, t, cid)) == rows, (
                    f"snapshot {cid[:8]} table {t} mutated"
                )
        # final committed branch state matches the model
        for br2, tabs in committed.items():
            assert set(repo.list_tables(br2)) == set(tabs)
            for t, rows in tabs.items():
                assert _rows(repo.read_table(spark, t, br2)) == rows
    finally:
        shutil.rmtree(root, ignore_errors=True)
