"""Manifest spill: bounded commit metadata at any table size (round 8).

A commit JSON stores the full table→entries snapshot; the spill keeps
that model O(changed), not O(total files), by storing long entry lists
once as content-addressed manifests. These tests pin the raw on-disk
forms (pointer + inline tail, folding, content dedup) and that every
consumer — reads, time travel, diff, branch/merge/revert, vacuum, the
streaming source — is oblivious because expansion happens in
``LakeRepo.get_commit`` alone.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log as log_mod
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log import (
    expand_entries,
    is_manifest_ptr,
    spill_entries,
    write_manifest,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

# chaos/fuzz/property suite: excluded from the fast per-batch sweep (r13)
pytestmark = pytest.mark.slow


def _entries(n, prefix="data/t"):
    return [f"{prefix}/{i:04d}" for i in range(n)]


# ---------------------------------------------------------------------------
# unit: the raw forms
# ---------------------------------------------------------------------------


def test_spill_inline_below_threshold(tmp_path, monkeypatch):
    monkeypatch.setattr(log_mod, "MANIFEST_SPILL_THRESHOLD", 4)
    e = _entries(4)
    assert spill_entries(str(tmp_path), e, None) == e
    assert not os.path.exists(tmp_path / "manifests")


def test_spill_folds_and_roundtrips(tmp_path, monkeypatch):
    monkeypatch.setattr(log_mod, "MANIFEST_SPILL_THRESHOLD", 4)
    root = str(tmp_path)
    e = _entries(9)
    raw = spill_entries(root, e, None)
    assert len(raw) == 1 and is_manifest_ptr(raw[0]) and raw[0]["n"] == 9
    assert expand_entries(root, raw) == e


def test_spill_appends_extend_pointer_then_fold(tmp_path, monkeypatch):
    monkeypatch.setattr(log_mod, "MANIFEST_SPILL_THRESHOLD", 4)
    root = str(tmp_path)
    base = spill_entries(root, _entries(9), None)
    # +2 appends ride the pointer inline
    raw2 = spill_entries(root, _entries(11), base)
    assert raw2[0] == base[0] and raw2[1:] == _entries(11)[9:]
    # tail outgrows the threshold → folds into ONE fresh manifest
    raw3 = spill_entries(root, _entries(14), raw2)
    assert len(raw3) == 1 and is_manifest_ptr(raw3[0]) and raw3[0]["n"] == 14
    assert expand_entries(root, raw3) == _entries(14)


def test_spill_rewrite_breaks_prefix_and_refolds(tmp_path, monkeypatch):
    monkeypatch.setattr(log_mod, "MANIFEST_SPILL_THRESHOLD", 4)
    root = str(tmp_path)
    base = spill_entries(root, _entries(9), None)
    rewritten = _entries(9, prefix="data/t2")
    raw = spill_entries(root, rewritten, base)
    assert len(raw) == 1 and is_manifest_ptr(raw[0]) and raw[0] != base[0]
    assert expand_entries(root, raw) == rewritten


def test_manifest_content_addressing_dedups(tmp_path):
    root = str(tmp_path)
    p1 = write_manifest(root, _entries(6))
    p2 = write_manifest(root, _entries(6))
    assert p1 == p2
    assert len(os.listdir(tmp_path / "manifests")) == 1


def test_expand_missing_manifest_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="metadata corruption"):
        expand_entries(str(tmp_path), [{"manifest": "manifests/dead.json", "n": 1}])


# ---------------------------------------------------------------------------
# integration: consumers stay oblivious (threshold forced low)
# ---------------------------------------------------------------------------


@pytest.fixture()
def small_threshold(monkeypatch):
    monkeypatch.setattr(log_mod, "MANIFEST_SPILL_THRESHOLD", 2)


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))


def _raw_tables(repo, cid):
    with open(os.path.join(repo.root, "commits", f"{cid}.json")) as f:
        return json.load(f)["tables"]


def test_spilled_history_reads_and_metadata_stay_bounded(spark, tmp_path, small_threshold):
    repo = LakeRepo.init(str(tmp_path / "lake"))
    commits = []
    for i in range(8):
        repo.write_table("main", "t", _kv(spark, 10 * i, 10 * i + 10), mode="append")
        commits.append(repo.commit("main", f"v{i}"))
    # raw head form is pointer + bounded tail, never 8 inline entries
    raw = _raw_tables(repo, commits[-1].id)["t"]
    assert is_manifest_ptr(raw[0]) and len(raw) <= 3
    # every version reads exactly as an unspilled repo would
    for i, c in enumerate(commits):
        got = repo.read_table(spark, "t", version_as_of=c.version).count()
        assert got == 10 * (i + 1)
    # an untouched table costs one pointer per subsequent commit, SHARED
    repo.write_table("main", "u", _kv(spark, 0, 5))
    repo.commit("main", "add u")
    repo.write_table("main", "u", _kv(spark, 5, 10), mode="append")
    c_last = repo.commit("main", "u2")
    assert _raw_tables(repo, c_last.id)["t"] == raw


def test_spilled_branch_merge_revert_diff(spark, tmp_path, small_threshold):
    repo = LakeRepo.init(str(tmp_path / "lake"))
    for i in range(5):
        repo.write_table("main", "t", _kv(spark, 10 * i, 10 * i + 10), mode="append")
        repo.commit("main", f"v{i}")
    base = repo.head("main")
    repo.create_branch("dev", "main")
    repo.write_table("dev", "t", _kv(spark, 50, 60), mode="append")
    repo.commit("dev", "dev append")
    repo.merge(spark, "dev", "main")
    assert repo.read_table(spark, "t", ref="main").count() == 60
    # object-level diff across spilled snapshots still sees the change
    assert repo.diff_tables(base.id, repo.head("main").id) == {"t": "changed"}
    repo.revert("main", base.id)
    assert repo.read_table(spark, "t", ref="main").count() == 50


def test_vacuum_keeps_referenced_manifests_prunes_orphans(
    spark, tmp_path, small_threshold
):
    repo = LakeRepo.init(str(tmp_path / "lake"))
    for i in range(5):
        repo.write_table("main", "t", _kv(spark, 10 * i, 10 * i + 10), mode="append")
        repo.commit("main", f"v{i}")
    mdir = os.path.join(repo.root, "manifests")
    live = set(os.listdir(mdir))
    assert live
    # hand-plant an orphan: referenced by NO commit
    orphan = os.path.join(mdir, "0" * 32 + ".json")
    with open(orphan, "w") as f:
        json.dump({"entries": ["data/ghost/0001"]}, f)
    removed = repo.vacuum(keep_history=True, grace_seconds=0)
    assert f"manifests/{os.path.basename(orphan)}" in removed
    assert set(os.listdir(mdir)) == live
    # history still fully readable after vacuum
    assert repo.read_table(spark, "t").count() == 50


def test_stream_source_reads_spilled_table(spark, tmp_path, small_threshold):
    import uuid as _uuid

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    for i in range(6):
        repo.write_table("main", "t", _kv(spark, 10 * i, 10 * i + 10), mode="append")
        repo.commit("main", f"v{i}")
    name = f"spill_{_uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, "t")
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.k for r in spark.table(name).collect())
    assert got == list(range(60))
