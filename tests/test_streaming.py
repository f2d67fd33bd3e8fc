"""Structured Streaming ops: batch/stream parity via availableNow replay
over a file source — every streaming op must agree with its batch twin."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events parquet rewritten with a streaming-friendly layout (several
    files so availableNow gets multiple splits). ts arrives as micros."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    load_table(spark, SF_CORRECT, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def test_windowed_counts_matches_batch(spark, events_dir):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming import (
        run_to_memory,
        stream_events_from_dir,
        windowed_counts,
    )

    name = f"wc_{uuid.uuid4().hex[:8]}"
    stream = stream_events_from_dir(spark, events_dir)
    run_to_memory(windowed_counts(stream), name, output_mode="complete")
    got = {
        (r.win_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in spark.table(name).collect()
    }

    batch = (
        _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
    )
    want = {
        (r.win_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch(spark, events_dir):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming import (
        run_to_memory,
        stream_events_from_dir,
        streaming_dedup,
    )

    name = f"dd_{uuid.uuid4().hex[:8]}"
    stream = stream_events_from_dir(spark, events_dir)
    run_to_memory(streaming_dedup(stream, ["user_id", "event_type"]), name)
    got = spark.table(name).count()
    want = _batch_events(spark, events_dir).dropDuplicates(["user_id", "event_type"]).count()
    assert got == want


def test_sessionize_emits_valid_sessions(spark, events_dir):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming import (
        run_to_memory,
        sessionize,
        stream_events_from_dir,
    )

    name = f"ss_{uuid.uuid4().hex[:8]}"
    stream = stream_events_from_dir(spark, events_dir)
    run_to_memory(sessionize(stream, gap_seconds=1800), name)
    sessions = spark.table(name)
    n = sessions.count()
    assert n > 0
    bad = sessions.where(
        (F.col("session_end") < F.col("session_start")) | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0
    # sessions for one user never overlap (checked driver-side; memory-sink
    # self-joins trip attribute dedup in Spark 4)
    by_user: dict = {}
    for r in sessions.collect():
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 < s2, f"overlapping sessions: {(s1, e1)} then {(s2, _)}"


def test_multimodal_features_deterministic(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
        media_stats,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    media = documents_as_media(docs)
    stats = {r.kind: (r.n, r.total_bytes) for r in media_stats(media).collect()}
    assert stats["text"][0] == 500

    feats = extract_features(media).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 500
    assert all(r.byte_len > 0 and r.feat_mean > 0 for r in rows)
    # deterministic across runs and partitionings
    again = extract_features(media.repartition(7)).orderBy("media_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_multimodal_stub_gating(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    media = documents_as_media(load_table(spark, SF_CORRECT, "documents")).limit(5)
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        extract_features(media, allow_stub=False).collect()


def test_stream_into_repo_versioned_ingest(spark, tmp_path):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming import stream_events_from_dir
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    src = str(tmp_path / "src")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    events.repartition(3).write.mode("overwrite").parquet(src)

    stream = stream_events_from_dir(spark, src)
    stream_into_repo(
        stream, repo, "main", "events", checkpoint_dir=str(tmp_path / "ckpt")
    )

    # everything ingested, and the history records the batch commits
    got = repo.read_table(spark, "events", "main")
    assert got.count() == events.count()
    messages = [c.message for c in repo.log("main")]
    assert any(m.startswith("stream batch") for m in messages)


def test_stream_into_repo_enforces_check_constraints(spark, tmp_path):
    """Streaming ingest goes through write_table, so a CHECK constraint
    gates every micro-batch — the composition needs no extra code."""
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import ConstraintViolation, LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    repo.write_table(
        "main", "m", spark.createDataFrame([(1, 5.0)], "id LONG, v DOUBLE")
    )
    repo.commit("main", "seed")
    repo.add_constraint(spark, "main", "m", "v_pos", "v > 0")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(2, 7.0), (3, -1.0)], "id LONG, v DOUBLE"
    ).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("id LONG, v DOUBLE").parquet(src)
    )
    with _pytest.raises(Exception) as ei:
        stream_into_repo(
            stream, repo, "main", "m", checkpoint_dir=str(tmp_path / "ckpt")
        )
    # foreachBatch wraps the error; the cause must be the constraint
    assert "ConstraintViolation" in str(ei.value) or isinstance(
        ei.value, ConstraintViolation
    )
    # the violating batch never committed
    assert repo.read_table(spark, "m", "main").count() == 1


@pytest.mark.slow
def test_streaming_simhash_neardup_matches_batch(spark, tmp_path):
    """Streaming near-dup pairs must equal batch simhash_pairs exactly:
    same banding, same map-only signature (simhash_expr ≡ simhash,
    equivalence-tested separately), per-band state verify. Pairs emitted
    once per colliding band are deduped downstream, mirroring the batch
    op's .distinct()."""
    import uuid as _uuid

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import simhash_pairs
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming import (
        run_to_memory,
        streaming_simhash_neardup,
    )

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select(
            "doc_id",
            "text",
            F.timestamp_micros((F.lit(1700000000) + F.col("doc_id")) * 1000000).alias("ts"),
        )
    )
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id LONG, text STRING, ts TIMESTAMP"
    ).parquet(src)
    name = f"nd_{_uuid.uuid4().hex[:8]}"
    run_to_memory(streaming_simhash_neardup(stream, max_hamming=3), name)
    got = {
        (r.a, r.b, r.hamming)
        for r in spark.table(name).dropDuplicates(["a", "b"]).collect()
    }
    want = {
        (r.a, r.b, r.hamming)
        for r in simhash_pairs(
            load_table(spark, SF_CORRECT, "documents"), max_hamming=3
        ).collect()
    }
    assert got == want, (len(got), len(want))


def test_real_media_probe_and_decode(spark):
    """The r5 REAL codec path: stdlib header probing must parse
    hand-constructed BMP/WAV/PNG/GIF/JPEG-SOF payloads to their true
    dimensions/rates, and extract_features must compute the TRUE pixel /
    amplitude means for BMP/WAV (not the byte-statistics stub)."""
    import struct
    import zlib

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        _make_synth_media,
        extract_features,
        probe_media,
        synthesize_media,
    )

    build = _make_synth_media()
    # ground truth computed independently of the operator code
    _, bmp = build(4)    # even -> BMP: w=6, h=5
    _, wav = build(7)    # odd  -> WAV: rate=16000, n=107

    # PNG: signature + IHDR for 321x65
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 321, 65)
        + b"\x08\x02\x00\x00\x00"
        + struct.pack(">I", zlib.crc32(b"IHDR" + struct.pack(">II", 321, 65)))
    )
    gif = b"GIF89a" + struct.pack("<HH", 77, 33)
    # JPEG: SOI + APP0 stub + SOF0 (h=120, w=200)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 120, 200) + b"\x03"
    )

    rows = [
        (1, "image", bytearray(bmp)),
        (2, "audio", bytearray(wav)),
        (3, "image", bytearray(png)),
        (4, "image", bytearray(gif)),
        (5, "image", bytearray(jpeg)),
        (6, "blob", bytearray(b"not media at all")),
    ]
    media = spark.createDataFrame(
        [(i, k, bytes(p), None) for i, k, p in rows],
        "media_id LONG, kind STRING, payload BINARY, "
        "meta STRUCT<format: STRING, width: INT, height: INT, sample_rate: INT, duration_ms: INT>",
    )
    probed = {r.media_id: r for r in probe_media(media).collect()}
    assert (probed[1].detected_format, probed[1].width, probed[1].height) == ("bmp", 6, 5)
    assert (probed[2].detected_format, probed[2].sample_rate) == ("wav", 16000)
    assert probed[2].duration_ms == 107 * 1000 // 16000
    assert (probed[3].detected_format, probed[3].width, probed[3].height) == ("png", 321, 65)
    assert (probed[4].detected_format, probed[4].width, probed[4].height) == ("gif", 77, 33)
    assert (probed[5].detected_format, probed[5].width, probed[5].height) == ("jpeg", 200, 120)
    assert probed[6].detected_format is None

    feats = {r.media_id: r.feat_mean for r in extract_features(media).collect()}
    # true BMP pixel mean: raster bytes after the 54-byte header
    raster = bytes(bmp)[54:]
    assert feats[1] == sum(raster) // len(raster)
    # true WAV mean |amplitude| over 16-bit LE samples
    data = bytes(wav)[44:]
    samples = [
        struct.unpack_from("<h", data, 2 * k)[0] for k in range(len(data) // 2)
    ]
    assert feats[2] == sum(abs(s) for s in samples) // len(samples)

    # synthesize_media roundtrip at scale-ish: ids 0..99, all parse
    ids = spark.range(100).selectExpr("id AS doc_id")
    out = probe_media(synthesize_media(ids))
    assert out.where(F.col("detected_format").isNull()).count() == 0


def test_stream_refresh_agg_matches_batch_rebuild(spark, tmp_path):
    """Streaming materialized-view maintenance: a change stream split
    across micro-batches folds into persistent state that lands EXACTLY
    on a from-scratch rebuild of the final version — batch boundaries
    must not matter (each batch may contain partial groups, retractions
    before additions, etc.)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.incremental import agg_result, agg_state
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming import stream_refresh_agg

    keys = ["o_orderstatus"]
    measures = {"sum_price": ("o_totalprice", 2)}
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v0 = orders.where(F.col("o_orderkey") % 3 == 0)
    v1 = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") * 2.0)
        .otherwise(F.col("o_totalprice")),
    )
    removed = v0.exceptAll(v1).withColumn("__change", F.lit("removed"))
    added = v1.exceptAll(v0).withColumn("__change", F.lit("added"))
    changes = removed.unionByName(added)

    state_dir = str(tmp_path / "mv_state")
    # seed: state at v0
    agg_state(v0, keys, measures).write.parquet(state_dir)

    src = str(tmp_path / "changes")
    changes.repartition(5).write.parquet(src)  # 5 files → several batches
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_refresh_agg(
        stream, state_dir, keys, measures, str(tmp_path / "ckpt")
    )

    got = sorted(
        tuple(r)
        for r in agg_result(
            spark.read.parquet(state_dir), keys, measures
        ).collect()
    )
    want = sorted(
        tuple(r) for r in agg_result(agg_state(v1, keys, measures), keys, measures).collect()
    )
    assert got == want


def test_stream_into_repo_exactly_once_on_replay(spark, tmp_path):
    """foreachBatch is at-least-once across restarts; the commit-metadata
    batch log must make the repo sink idempotent (Delta txnVersion
    protocol): re-delivering an already-committed batch id is a no-op."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import (
        latest_stream_batch,
        stream_into_repo,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (2,), (3,)], "id LONG").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("id LONG").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    stream_into_repo(stream, repo, "main", "m", checkpoint_dir=ckpt)
    assert repo.read_table(spark, "m", "main").count() == 3
    import os as _os

    sid = _os.path.abspath(ckpt)
    last = latest_stream_batch(repo, "main", sid)
    assert last is not None
    before = repo.read_table(spark, "m", "main").count()
    # a second full run over the SAME checkpoint must add nothing (Spark
    # won't redeliver drained batches; the guard covers the crash window
    # where a batch commits but the checkpoint doesn't advance)
    stream2 = spark.readStream.schema("id LONG").parquet(src)
    stream_into_repo(stream2, repo, "main", "m", checkpoint_dir=ckpt)
    assert repo.read_table(spark, "m", "main").count() == before
    assert latest_stream_batch(repo, "main", sid) == last
    # new data under a NEW batch id appends normally and advances the log
    spark.createDataFrame([(9,)], "id LONG").write.mode("append").parquet(src)
    stream3 = spark.readStream.schema("id LONG").parquet(src)
    stream_into_repo(stream3, repo, "main", "m", checkpoint_dir=ckpt)
    assert repo.read_table(spark, "m", "main").count() == before + 1
    assert latest_stream_batch(repo, "main", sid) > last
    # the crash-window decision directly: redelivering any committed id
    # is a skip, the next id is not, and other streams are unaffected
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import is_replayed_batch

    newest = latest_stream_batch(repo, "main", sid)
    assert is_replayed_batch(repo, "main", sid, newest)
    assert is_replayed_batch(repo, "main", sid, 0)
    assert not is_replayed_batch(repo, "main", sid, newest + 1)
    assert not is_replayed_batch(repo, "main", "other-stream", 0)

def test_stream_into_repo_exactly_once_on_staged_crash(spark, tmp_path):
    """The OTHER crash window: the process dies between write_table (files
    durably staged on the branch) and commit. The committed-log guard
    cannot see the leftover, so redelivery must drop its own stale staged
    copy before writing — otherwise the next commit lands the batch twice
    (ADVICE r5, streaming/ops.py:378)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (2,), (3,)], "id LONG").write.mode(
        "overwrite"
    ).parquet(src)
    ckpt = str(tmp_path / "ckpt")
    import os as _os

    sid = _os.path.abspath(ckpt)

    # crash the first delivery AFTER staging, BEFORE commit
    real_commit = repo.commit

    def dying_commit(*a, **k):
        raise RuntimeError("simulated crash between stage and commit")

    repo.commit = dying_commit
    stream = spark.readStream.schema("id LONG").parquet(src)
    try:
        stream_into_repo(stream, repo, "main", "m", checkpoint_dir=ckpt)
    except Exception:
        pass  # the stream dies with our injected crash
    repo.commit = real_commit
    # leftover staged copy exists and is tagged with this stream's id
    assert "m" in repo.status("main")
    tag = repo.staged_txn("main", "m")
    assert tag is not None and tag["stream_id"] == sid

    # restart: checkpoint did NOT advance (commit never ran), so Spark
    # redelivers the same batch — it must land exactly once
    stream2 = spark.readStream.schema("id LONG").parquet(src)
    stream_into_repo(stream2, repo, "main", "m", checkpoint_dir=ckpt)
    assert repo.read_table(spark, "m", "main").count() == 3
    assert repo.status("main") == {}  # nothing left staged

    # mixing with a DIFFERENT writer fails loudly in either direction:
    # a user write staged on the table makes the stream's tagged append
    # raise (instead of silently stripping crash-recovery state), and
    # after the user commits, the stream proceeds normally
    spark.createDataFrame([(50,)], "id LONG").write.mode("append").parquet(src)
    other = spark.createDataFrame([(99,)], "id LONG")
    repo.write_table("main", "m", other, mode="append")  # untagged, user write
    stream3 = spark.readStream.schema("id LONG").parquet(src)
    with pytest.raises(Exception, match="another writer"):
        stream_into_repo(stream3, repo, "main", "m", checkpoint_dir=ckpt)
    repo.commit("main", "user append lands first")
    stream4 = spark.readStream.schema("id LONG").parquet(src)
    stream_into_repo(stream4, repo, "main", "m", checkpoint_dir=ckpt)
    got = sorted(r.id for r in repo.read_table(spark, "m", "main").collect())
    assert got == [1, 2, 3, 50, 99]


def test_append_onto_inflight_stream_staged_entry_raises(spark, tmp_path):
    """Review fix: a plain append onto a crashed stream's TAGGED staged
    entry would strip the crash-recovery tag and turn exactly-once
    replay into silent duplication — it must fail loudly instead."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    df = spark.createDataFrame([(1,)], "id LONG")
    repo.write_table("main", "m", df, mode="append", txn={"stream_id": "s1", "stream_batch_id": 0})
    with pytest.raises(ValueError, match="another writer"):
        repo.write_table("main", "m", df, mode="append")
    # the same writer may keep appending (tag retained)
    repo.write_table("main", "m", df, mode="append", txn={"stream_id": "s1", "stream_batch_id": 0})
    assert repo.staged_txn("main", "m")["stream_id"] == "s1"


def test_stream_upsert_into_repo_cdc_apply(spark, tmp_path):
    """Streaming CDC upsert: change batches MERGE into the versioned
    table exactly once — updates replace, inserts land, a crash between
    stage and commit replays cleanly, and history time-travels."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_upsert_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    repo.write_table(
        "main", "t", spark.createDataFrame([(1, 10), (2, 20)], "k LONG, v LONG")
    )
    repo.commit("main", "seed")
    src = str(tmp_path / "changes")
    spark.createDataFrame([(2, 99), (3, 30)], "k LONG, v LONG").write.mode(
        "overwrite"
    ).parquet(src)
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("k LONG, v LONG").parquet(src)
    stream_upsert_into_repo(stream, repo, "main", "t", ["k"], checkpoint_dir=ckpt)
    got = {r.k: r.v for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: 10, 2: 99, 3: 30}

    # crash between stage and commit on the NEXT batch, then replay
    spark.createDataFrame([(1, 111), (4, 40)], "k LONG, v LONG").write.mode(
        "append"
    ).parquet(src)
    real_commit = repo.commit

    def dying_commit(*a, **kw):
        raise RuntimeError("crash before commit")

    repo.commit = dying_commit
    stream2 = spark.readStream.schema("k LONG, v LONG").parquet(src)
    try:
        stream_upsert_into_repo(stream2, repo, "main", "t", ["k"], checkpoint_dir=ckpt)
    except Exception:
        pass
    repo.commit = real_commit
    assert repo.staged_txn("main", "t") is not None  # tagged leftover
    stream3 = spark.readStream.schema("k LONG, v LONG").parquet(src)
    stream_upsert_into_repo(stream3, repo, "main", "t", ["k"], checkpoint_dir=ckpt)
    got = {r.k: r.v for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: 111, 2: 99, 3: 30, 4: 40}
    assert repo.status("main") == {}
    # replaying the whole source on the same checkpoint adds nothing
    stream4 = spark.readStream.schema("k LONG, v LONG").parquet(src)
    stream_upsert_into_repo(stream4, repo, "main", "t", ["k"], checkpoint_dir=ckpt)
    assert repo.read_table(spark, "t", "main").count() == 4


def test_stream_upsert_intra_batch_dedup(spark, tmp_path):
    """Review fix: multiple change events per key in one micro-batch —
    without seq_col the batch RAISES (no nondeterministic 'current'
    row); with seq_col the highest sequence wins deterministically."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_upsert_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    repo.write_table("main", "t", spark.createDataFrame([(1, 10)], "k LONG, v LONG"))
    repo.commit("main", "seed")
    src = str(tmp_path / "changes")
    # two events for k=2 in ONE batch (one availableNow drain)
    spark.createDataFrame(
        [(2, 5, 100), (2, 6, 200), (3, 30, 150)], "k LONG, v LONG, seq LONG"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("k LONG, v LONG, seq LONG").parquet(src)
    with pytest.raises(Exception, match="multiple change rows"):
        stream_upsert_into_repo(
            stream, repo, "main", "t", ["k"], checkpoint_dir=str(tmp_path / "c1")
        )
    stream2 = spark.readStream.schema("k LONG, v LONG, seq LONG").parquet(src)
    stream_upsert_into_repo(
        stream2, repo, "main", "t", ["k"],
        checkpoint_dir=str(tmp_path / "c2"), seq_col="seq",
    )
    got = {r.k: r.v for r in repo.read_table(spark, "t", "main").collect()}
    assert got == {1: 10, 2: 6, 3: 30}  # seq=200 wins for k=2; seq dropped


def test_overwrite_onto_foreign_tagged_entry_raises(spark, tmp_path):
    """Review fix: an OVERWRITE clobbering another idempotent writer's
    tagged staged entry would silently destroy its crash-recovery tag —
    it must raise like the append path does."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    df = spark.createDataFrame([(1,)], "id LONG")
    repo.write_table("main", "m", df, mode="append", txn={"stream_id": "sA", "stream_batch_id": 0})
    with pytest.raises(ValueError, match="another writer"):
        repo.write_table("main", "m", df, mode="overwrite")
    with pytest.raises(ValueError, match="another writer"):
        repo.write_table(
            "main", "m", df, mode="overwrite", txn={"stream_id": "sB", "stream_batch_id": 0}
        )
    # same writer may overwrite its own tagged entry (upsert sink path)
    repo.write_table(
        "main", "m", df, mode="overwrite", txn={"stream_id": "sA", "stream_batch_id": 1}
    )
    assert repo.staged_txn("main", "m")["stream_batch_id"] == 1


def test_tagged_overwrite_onto_untagged_staged_entry_raises(spark, tmp_path):
    """ADVICE r6: the symmetric direction — a TAGGED overwrite (the CDC
    upsert sink's mode) landing on an UNTAGGED foreign staged entry
    previously passed the tag check (entry txn is None) and silently
    absorbed the user's uncommitted staged write into the stream's
    commit. It must fail loudly like every other mixed-writer path."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    df = spark.createDataFrame([(1,)], "id LONG")
    repo.write_table("main", "m", df, mode="append")  # user's untagged stage
    with pytest.raises(ValueError, match="untagged staged"):
        repo.write_table(
            "main", "m", df, mode="overwrite",
            txn={"stream_id": "sA", "stream_batch_id": 0},
        )
    # the user's staged entry is untouched by the refused write
    assert repo.read_table(spark, "m", "main", include_staged=True).count() == 1
    # untagged overwrite over one's own untagged stage stays allowed
    repo.write_table("main", "m", df, mode="overwrite")
    # and after the user commits, the tagged writer proceeds normally
    repo.commit("main", "user data")
    repo.write_table(
        "main", "m", df, mode="overwrite",
        txn={"stream_id": "sA", "stream_batch_id": 0},
    )
    assert repo.staged_txn("main", "m")["stream_id"] == "sA"


def test_tagged_create_onto_untagged_staged_create_raises(spark, tmp_path):
    """VERDICT r7 #5: the CREATE-path interaction pinned by name. A
    table that exists ONLY as a user's untagged staged create must
    reject a tagged create in BOTH modes — a tagged append would ride
    on the foreign uncommitted rows (and commit them under the stream's
    message), a tagged overwrite would absorb-and-replace them. Same
    branch as the committed-table cases, now exercised for creates."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    df = spark.createDataFrame([(1,)], "id LONG")
    repo.write_table("main", "m", df)  # untagged staged CREATE (no commit)
    for mode in ("append", "overwrite"):
        with pytest.raises(ValueError, match="another writer|untagged staged"):
            repo.write_table(
                "main", "m", df, mode=mode,
                txn={"stream_id": "sA", "stream_batch_id": 0},
            )
    # the refused writes left the user's staged create intact
    assert repo.read_table(spark, "m", "main", include_staged=True).count() == 1
    assert repo.staged_txn("main", "m") is None
    # the reverse direction on creates: untagged write onto a TAGGED
    # staged create fails too (covered for committed tables above)
    repo2 = LakeRepo.init(str(tmp_path / "lake2"))
    repo2.write_table(
        "main", "m", df, txn={"stream_id": "sA", "stream_batch_id": 0}
    )
    with pytest.raises(ValueError, match="another writer"):
        repo2.write_table("main", "m", df, mode="append")


# --- hypothesis chaos: CDC upsert exactly-once under adversarial crashes ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_CHAOS_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# one step = (keys changed this batch, failure injected around delivery)
#   ok            — clean delivery
#   stage_crash   — process dies between write_table (staged) and commit;
#                   redelivery must replace the tagged leftover, not stack
#   ckpt_rollback — process dies between commit and checkpoint advance
#                   (simulated by restoring the pre-run checkpoint), so
#                   Spark redelivers the SAME batch id; the committed-log
#                   guard must skip it
_chaos_step = st.tuples(
    st.sets(st.integers(0, 5), min_size=1, max_size=3),
    st.sampled_from(["ok", "stage_crash", "ckpt_rollback"]),
)


@given(steps=st.lists(_chaos_step, min_size=1, max_size=3))
@settings(**_CHAOS_SETTINGS)
@pytest.mark.slow
def test_stream_upsert_exactly_once_under_chaos(spark, tmp_path_factory, steps):
    """VERDICT r6 #6: adversarial interleavings of the two crash windows
    the exactly-once protocol must close. Whatever the sequence of clean
    deliveries, stage-then-crash replays, and commit-then-checkpoint-loss
    replays, the table's row multiset equals applying each change batch's
    MERGE exactly once in order, nothing stays staged, and the commit log
    carries each (stream, batch id) at most once."""
    import os
    import tempfile

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_upsert_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    root = tempfile.mkdtemp(prefix="lake-upsert-chaos-")
    try:
        repo = LakeRepo.init(os.path.join(root, "lake"))
        repo.write_table(
            "main", "t", spark.createDataFrame([(1, 10), (2, 20)], "k LONG, v LONG")
        )
        repo.commit("main", "seed")
        expected = {1: 10, 2: 20}
        src = os.path.join(root, "changes")
        ckpt = os.path.join(root, "ckpt")
        ckpt_bak = os.path.join(root, "ckpt_bak")
        counter = 100

        def run_sink():
            stream = spark.readStream.schema("k LONG, v LONG").parquet(src)
            stream_upsert_into_repo(
                stream, repo, "main", "t", ["k"], checkpoint_dir=ckpt
            )

        for keys, mode in steps:
            batch = [(int(k), counter + i) for i, k in enumerate(sorted(keys))]
            counter += 10
            spark.createDataFrame(batch, "k LONG, v LONG").write.mode(
                "append"
            ).parquet(src)
            for k, v in batch:
                expected[k] = v

            if mode == "stage_crash":
                real_commit = repo.commit

                def dying_commit(*a, **kw):
                    raise RuntimeError("chaos: crash between stage and commit")

                repo.commit = dying_commit
                try:
                    with pytest.raises(Exception):
                        run_sink()
                finally:
                    repo.commit = real_commit
                # durable tagged leftover — the window under test is open
                assert repo.staged_txn("main", "t") is not None
                run_sink()  # redelivery replaces the leftover exactly once
            elif mode == "ckpt_rollback":
                shutil.rmtree(ckpt_bak, ignore_errors=True)
                if os.path.exists(ckpt):
                    shutil.copytree(ckpt, ckpt_bak)
                run_sink()  # commits AND advances the checkpoint
                # roll the checkpoint back to before this delivery: Spark
                # will redeliver the same files under the same batch id
                if os.path.exists(ckpt_bak):
                    shutil.rmtree(ckpt, ignore_errors=True)
                    shutil.copytree(ckpt_bak, ckpt)
                    run_sink()  # must be skipped by the committed-log guard
                # (first-ever batch has no pre-delivery checkpoint to
                # restore: skip the replay AND keep the live checkpoint —
                # deleting it outright models a different failure, "lost
                # checkpoint under the same stream id", which the
                # txnAppId-style protocol deliberately does not support:
                # a fresh checkpoint re-brackets ALL source files as batch
                # 0 and the committed-log guard rightly skips them, same
                # as Delta's documented txnAppId/checkpoint contract)
            else:
                run_sink()

            got = {r.k: r.v for r in repo.read_table(spark, "t", "main").collect()}
            assert got == expected, f"after {mode}: {got} != {expected}"
            assert repo.status("main") == {}, "staged leftover survived"

        # exactly-once commit log: this stream committed each batch id once
        stream_id = os.path.abspath(ckpt)
        seen_ids = [
            c.meta["stream_batch_id"]
            for c in repo.log("main", limit=None)
            if c.meta.get("stream_id") == stream_id
        ]
        assert len(seen_ids) == len(set(seen_ids)), f"duplicate batch commit: {seen_ids}"
        assert len(seen_ids) == len(steps), (seen_ids, steps)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# lake as a streaming SOURCE (r7): offsets = commit versions
# ---------------------------------------------------------------------------


@pytest.fixture()
def source_repo(spark, tmp_path):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    return LakeRepo.init(str(tmp_path / "lake"))


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _drain_to_memory(spark, repo, table, **kw):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    name = f"lsrc_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, table, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted((r.k, r.v) for r in spark.table(name).collect())


def test_lake_stream_source_reads_all_commits(spark, source_repo):
    """Every commit's appended rows arrive exactly once; commits that
    don't touch the table contribute nothing."""
    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 10))
    repo.commit("main", "v1")
    repo.write_table("main", "other", _kv(spark, 90, 95))
    repo.commit("main", "unrelated")
    repo.write_table("main", "t", _kv(spark, 10, 15), mode="append")
    repo.commit("main", "v2")
    got = _drain_to_memory(spark, repo, "t")
    assert got == [(i, 2 * i) for i in range(15)]


def test_drain_stream_to_head_available_now_semantics(spark, source_repo):
    """drain_stream_to_head = Trigger.AvailableNow for the Python
    DataSource (which silently ignores the real trigger): a continuously
    triggered query is driven until its committed offset reaches the
    branch head pinned AT CALL TIME, then stopped — commits after the
    drain are NOT delivered."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        drain_stream_to_head,
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 10))
    repo.commit("main", "v1")
    repo.write_table("main", "t", _kv(spark, 10, 15), mode="append")
    c2 = repo.commit("main", "v2")

    name = f"drain_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, "t")
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        drained_to = drain_stream_to_head(q, repo.root, timeout_s=60)
        assert drained_to == c2.version
        assert not q.isActive
        got = sorted((r.k, r.v) for r in spark.table(name).collect())
        assert got == [(i, 2 * i) for i in range(15)]
        # post-drain commits stay undelivered (the stream is stopped)
        repo.write_table("main", "t", _kv(spark, 15, 20), mode="append")
        repo.commit("main", "v3")
        assert sorted((r.k, r.v) for r in spark.table(name).collect()) == got
    finally:
        if q.isActive:
            q.stop()


def test_lake_stream_source_checkpoint_resume_exactly_once(spark, source_repo, tmp_path):
    """A checkpointed query resumes at the exact commit version it left
    off: no duplicates, no gaps (the exactly-once read half of the
    existing exactly-once sinks)."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    repo.write_table("main", "t", _kv(spark, 0, 10))
    repo.commit("main", "v1")
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    def drain():
        q = (
            stream_table_from_repo(spark, repo.root, "t")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    repo.write_table("main", "t", _kv(spark, 10, 13), mode="append")
    repo.commit("main", "v2")
    drain()
    drain()  # idempotent: nothing new
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(13)]


def test_lake_stream_source_rejects_non_append_unless_opted_in(spark, source_repo):
    """An overwrite (file removal) cannot be represented as an append
    stream: loud failure by default; ignore_changes streams additions."""
    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 10))
    repo.commit("main", "v1")
    repo.write_table("main", "t", _kv(spark, 50, 55))  # overwrite
    repo.commit("main", "v2-overwrite")
    with pytest.raises(Exception, match="removed|STREAM_FAILED"):
        _drain_to_memory(spark, repo, "t")
    got = _drain_to_memory(spark, repo, "t", ignore_changes=True)
    assert got == [(i, 2 * i) for i in range(10)] + [
        (i, 2 * i) for i in range(50, 55)
    ]


def test_lake_stream_source_guards(spark, source_repo):
    """starting_version skips history; GENERATED columns raise (their
    expressions need Spark evaluation — batch-only)."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo.write_table("main", "t", _kv(spark, 0, 5))
    c1 = repo.commit("main", "v1")
    repo.write_table("main", "t", _kv(spark, 5, 8), mode="append")
    repo.commit("main", "v2")
    got = _drain_to_memory(spark, repo, "t", starting_version=c1.version)
    assert got == [(i, 2 * i) for i in range(5, 8)]  # only post-v1 commits
    repo.alter_add_generated_column(spark, "main", "t", "v9", "bigint", "v * 9")
    with pytest.raises(Exception, match="GENERATED|STREAM_FAILED"):
        _drain_to_memory(spark, repo, "t")


def test_lake_stream_source_gen_column_added_then_dropped_streams(spark, source_repo):
    """Only LIVE generated columns block streaming: add_gen followed by
    DROP leaves nothing stored and nothing to replay — the table must
    stream (r8 review fix: the guard used to fire on any add_gen in
    history, making the table permanently unstreamable)."""
    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 6))
    repo.commit("main", "v1")
    repo.alter_add_generated_column(spark, "main", "t", "v9", "bigint", "v * 9")
    repo.alter_drop_column(spark, "main", "t", "v9")
    repo.write_table("main", "t", _kv(spark, 6, 9), mode="append")
    repo.commit("main", "v2")
    assert _drain_to_memory(spark, repo, "t") == [(i, 2 * i) for i in range(9)]


def _drain_rows(spark, repo, table, **kw):
    """Drain a lake stream to a memory sink, returning collected Rows."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    name = f"lsrc_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, table, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_lake_stream_source_renamed_table(spark, source_repo):
    """ALTER RENAME then stream (r8): the pinned schema speaks the
    post-rename name; pre-rename era files resolve through the alias
    chain — bit-for-bit the batch read-at-head replay."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo.write_table("main", "t", _kv(spark, 0, 5))
    repo.commit("main", "v1: k,v era")
    LakeSQL(spark, repo, "main").sql("ALTER TABLE t RENAME COLUMN v TO w")
    repo.write_table(
        "main",
        "t",
        _kv(spark, 5, 9).withColumnRenamed("v", "w"),
        mode="append",
    )
    repo.commit("main", "v2: k,w era")
    df = _drain_rows(spark, repo, "t")
    assert df.columns == ["k", "w"]
    got = sorted((r.k, r.w) for r in df.collect())
    assert got == [(i, 2 * i) for i in range(9)]
    # batch agrees (the authority for replay semantics)
    batch = sorted(
        (r.k, r.w) for r in repo.read_table(spark, "t", "main").collect()
    )
    assert got == batch


def test_lake_stream_source_added_column(spark, source_repo):
    """ALTER ADD then stream (r8): pre-ADD era files surface the new
    column as null; post-ADD appends carry real values."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo.write_table("main", "t", _kv(spark, 0, 4))
    repo.commit("main", "v1")
    LakeSQL(spark, repo, "main").sql("ALTER TABLE t ADD COLUMN tag STRING")
    repo.write_table(
        "main",
        "t",
        _kv(spark, 4, 7).withColumn("tag", F.lit("new")),
        mode="append",
    )
    repo.commit("main", "v2")
    df = _drain_rows(spark, repo, "t")
    assert df.columns == ["k", "v", "tag"]
    got = sorted((r.k, r.v, r.tag) for r in df.collect())
    assert got == [(i, 2 * i, None) for i in range(4)] + [
        (i, 2 * i, "new") for i in range(4, 7)
    ]


def test_lake_stream_source_dropped_column(spark, source_repo):
    """ALTER DROP then stream (r8): the dropped column leaves the
    schema; old era files still carrying it physically are legal."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo.write_table("main", "t", _kv(spark, 0, 4))
    repo.commit("main", "v1")
    LakeSQL(spark, repo, "main").sql("ALTER TABLE t DROP COLUMN v")
    repo.write_table(
        "main", "t", _kv(spark, 4, 6).drop("v"), mode="append"
    )
    repo.commit("main", "v2")
    df = _drain_rows(spark, repo, "t")
    assert df.columns == ["k"]
    assert sorted(r.k for r in df.collect()) == list(range(6))


def test_lake_stream_source_rename_chain_and_cdc(spark, source_repo):
    """A two-step rename chain (v→x→w) replays through BOTH eras, and
    mode=cdc resolves removed old-era files through the same chain."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    sql = LakeSQL(spark, repo, "main")
    repo.write_table("main", "t", _kv(spark, 0, 6))
    repo.commit("main", "v1")
    sql.sql("ALTER TABLE t RENAME COLUMN v TO x")
    sql.sql("ALTER TABLE t RENAME COLUMN x TO w")
    repo.write_table(
        "main",
        "t",
        _kv(spark, 6, 8).withColumnRenamed("v", "w"),
        mode="append",
    )
    repo.commit("main", "v2")
    sql.sql("DELETE FROM t WHERE k % 3 = 0")
    feed = _drain_rows(spark, repo, "t", cdc=True)
    assert feed.columns == ["k", "w", "_change_type", "_commit_version"]
    folded = sorted(
        (r.k, r.w)
        for r in feed.groupBy("k", "w")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("net")
        )
        .where(F.col("net") > 0)
        .collect()
    )
    assert folded == [(i, 2 * i) for i in range(8) if i % 3 != 0]


def test_lake_stream_source_cdc_dv_on_evolved_table(spark, source_repo):
    """r9: delete_where_dv now works on ALTERed tables — the CDC feed
    must emit the vectored positions as delete rows with the LOGICAL
    schema, exact across both eras, and fold to head."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    sql = LakeSQL(spark, repo, "main")
    repo.write_table("main", "t", _kv(spark, 0, 6).coalesce(1))
    repo.commit("main", "v1")
    sql.sql("ALTER TABLE t RENAME COLUMN v TO w")
    repo.write_table(
        "main", "t",
        _kv(spark, 6, 9).withColumnRenamed("v", "w").coalesce(1),
        mode="append",
    )
    repo.commit("main", "v2")
    # DV-delete across both eras, by the logical name
    c_dv = repo.delete_where_dv(spark, "main", "t", "w = 4 OR w = 14")  # k=2,7
    feed = _drain_rows(spark, repo, "t", cdc=True)
    assert feed.columns == ["k", "w", "_change_type", "_commit_version"]
    dv_rows = sorted(
        (r.k, r._change_type)
        for r in feed.collect()
        if r._commit_version == c_dv.version
    )
    assert dv_rows == [(2, "delete"), (7, "delete")]
    folded = sorted(
        r.k
        for r in feed.groupBy("k", "w")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("net")
        )
        .where(F.col("net") > 0)
        .collect()
    )
    head = sorted(r.k for r in repo.read_table(spark, "t", "main").collect())
    assert folded == head == [0, 1, 3, 4, 5, 6, 8]


def test_lake_stream_source_midstream_rename_fails_pinned_stream(
    spark, source_repo
):
    """A column renamed AFTER the stream's schema was pinned fails the
    stream loudly (Delta's contract): a pinned schema cannot follow
    ALTERs — restart with a fresh checkpoint. Pinning the pre-rename
    schema explicitly reproduces exactly the long-running-query state."""
    repo = source_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        _PACKAGE_ROOT,
        register_lake_stream_source,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo.write_table("main", "t", _kv(spark, 0, 4))
    repo.commit("main", "v1")
    LakeSQL(spark, repo, "main").sql("ALTER TABLE t RENAME COLUMN v TO vv")
    repo.write_table(
        "main",
        "t",
        _kv(spark, 4, 6).withColumnRenamed("v", "vv"),
        mode="append",
    )
    repo.commit("main", "v2 post-rename")
    register_lake_stream_source(spark)
    stream = (
        spark.readStream.format("lakegraft_stream")
        .schema("k bigint, v bigint")  # the PRE-rename pinned schema
        .option("root", repo.root)
        .option("branch", "main")
        .option("table", "t")
        .option("starting_version", -1)
        .option("package_root", _PACKAGE_ROOT)
        .load()
    )
    name = f"lsrc_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="renamed or dropped AFTER|STREAM_FAILED"):
        q.awaitTermination()


def test_lake_stream_source_partitioned(spark, source_repo):
    """Hive-partitioned layouts stream (r8): k=v path components come
    back as typed partition-column constants, appended after the data
    columns exactly like Spark's batch partition discovery."""
    repo = source_repo
    df = spark.range(0, 12).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("int").alias("p"),
    )
    repo.write_table("main", "t", df.where("p < 2"), partition_by=["p"])
    repo.commit("main", "v1")
    repo.write_table(
        "main", "t", df.where("p = 2"), mode="append", partition_by=["p"]
    )
    repo.commit("main", "v2")
    out = _drain_rows(spark, repo, "t")
    assert out.columns == ["k", "v", "p"]
    got = sorted((r.k, r.v, r.p) for r in out.collect())
    assert got == [(i, 2 * i, i % 3) for i in range(12)]
    # batch read agrees on values (partition-discovery authority)
    batch = sorted(
        (r.k, r.v, int(r.p))
        for r in repo.read_table(spark, "t", "main").collect()
    )
    assert got == batch


def test_lake_stream_source_partitioned_string_and_null(spark, source_repo):
    """String partition values (URL-encoded paths) and the Hive NULL
    sentinel round-trip through the stream."""
    repo = source_repo
    df = spark.createDataFrame(
        [(1, "a b"), (2, "x=y"), (3, None)], "k long, cat string"
    )
    repo.write_table("main", "t", df, partition_by=["cat"])
    repo.commit("main", "v1")
    out = _drain_rows(spark, repo, "t")
    assert out.columns == ["k", "cat"]
    got = sorted((r.k, r.cat) for r in out.collect())
    assert got == [(1, "a b"), (2, "x=y"), (3, None)]


def test_lake_to_lake_streaming_pipeline(spark, source_repo, tmp_path):
    """The full loop: tail table A (commit-version offsets) → transform →
    exactly-once versioned ingest into table B. After each drain B equals
    the batch transform of A's history; draining with nothing new is a
    no-op (no duplicate commits, no duplicate rows)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    repo = source_repo
    ck = str(tmp_path / "ck")
    repo.write_table("main", "a", _kv(spark, 0, 10))
    repo.commit("main", "a v1")

    def drain():
        s = stream_table_from_repo(spark, repo.root, "a").where(
            F.col("k") % 2 == 0
        ).withColumn("v3", F.col("v") * 3)
        stream_into_repo(s, repo, "main", "b", ck)

    drain()
    got = sorted(
        (r.k, r.v3) for r in repo.read_table(spark, "b", "main").collect()
    )
    assert got == [(i, 6 * i) for i in range(0, 10, 2)]
    repo.write_table("main", "a", _kv(spark, 10, 16), mode="append")
    repo.commit("main", "a v2")
    drain()
    drain()  # nothing new: must not duplicate
    got = sorted(
        (r.k, r.v3) for r in repo.read_table(spark, "b", "main").collect()
    )
    assert got == [(i, 6 * i) for i in range(0, 16, 2)]


def test_lake_stream_source_multibranch_version_gaps(spark, source_repo):
    """The global version counter is shared across branches, so versions
    missing from the streamed branch's first-parent line are other
    branches' history — NOT table wipes. A side-branch commit between two
    main-branch appends must neither fail the stream nor duplicate rows."""
    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 10))
    repo.commit("main", "t v1")
    repo.create_branch("side", "main")
    repo.write_table("side", "x", _kv(spark, 90, 95))
    repo.commit("side", "burn a version off-branch")
    repo.write_table("main", "t", _kv(spark, 10, 15), mode="append")
    repo.commit("main", "t v2")
    got = _drain_to_memory(spark, repo, "t")
    assert got == [(i, 2 * i) for i in range(15)]
    # same under ignore_changes (the old version-integer walk re-delivered
    # everything after the gap)
    got = _drain_to_memory(spark, repo, "t", ignore_changes=True)
    assert got == [(i, 2 * i) for i in range(15)]


def test_lake_stream_source_rejects_mixed_partition_layouts(spark, source_repo):
    """One snapshot mixing partitioned and unpartitioned file groups has
    no single path-encoding scheme — loud failure, never a wrong stream.
    (Uniformly partitioned tables stream since r8.)"""
    repo = source_repo
    df = _kv(spark, 0, 10).withColumn("p", (F.col("k") % 2).cast("int"))
    repo.write_table("main", "t", df.where("k < 5"), partition_by=["p"])
    repo.commit("main", "partitioned half")
    repo.write_table("main", "t", df.where("k >= 5"), mode="append")
    repo.commit("main", "flat half")
    with pytest.raises(Exception, match="inconsistent|STREAM_FAILED"):
        _drain_to_memory(spark, repo, "t")


def test_lake_stream_source_explicit_schema_layout_break_is_loud(spark, source_repo):
    """An explicit .schema(...) bypasses inference (where the mixed-layout
    guard lives); the READ-side guard must still refuse to stream silent
    nulls for a partition column some files don't path-encode (r8 review
    fix)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        _PACKAGE_ROOT,
        register_lake_stream_source,
    )

    repo = source_repo
    df = _kv(spark, 0, 10).withColumn("p", (F.col("k") % 2).cast("int"))
    repo.write_table("main", "t", df.where("k < 5"), partition_by=["p"])
    repo.commit("main", "partitioned half")
    repo.write_table("main", "t", df.where("k >= 5").drop("p"), mode="append")
    repo.commit("main", "flat half")
    register_lake_stream_source(spark)
    name = f"mix_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("lakegraft_stream")
        .schema("k bigint, v bigint, p int")
        .option("root", repo.root)
        .option("branch", "main")
        .option("table", "t")
        .option("starting_version", -1)
        .option("package_root", _PACKAGE_ROOT)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="no column for stream field|STREAM_FAILED"):
        q.awaitTermination()
        if q.exception() is not None:
            raise q.exception()


def test_lake_stream_source_partition_values_python_only_literals(spark, source_repo):
    """Path values Python would happily parse as numbers ("1_2", "inf",
    "+5"-style) must stay STRINGS, matching Spark's stricter batch
    partition discovery (r8 review fix: lexical gates, not Python
    parsers)."""
    repo = source_repo
    df = spark.createDataFrame(
        [(1, "1_2"), (2, "inf"), (3, "nan")], "k long, cat string"
    )
    repo.write_table("main", "t", df, partition_by=["cat"])
    repo.commit("main", "v1")
    out = _drain_rows(spark, repo, "t")
    assert dict(out.dtypes)["cat"] == "string"
    got = sorted((r.k, r.cat) for r in out.collect())
    batch = sorted(
        (r.k, r.cat) for r in repo.read_table(spark, "t", "main").collect()
    )
    assert got == batch == [(1, "1_2"), (2, "inf"), (3, "nan")]


@pytest.mark.slow
def test_lake_stream_source_survives_compaction(spark, source_repo, tmp_path):
    """OPTIMIZE/compact commits carry data_change=false (a pure
    rearrangement of the parent's rows); the append stream SKIPS them —
    Delta's dataChange contract — instead of failing on their file
    removals. No duplicates, no gaps, across a checkpointed resume."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 10).repartition(4))
    repo.commit("main", "v1")
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    def drain():
        q = (
            stream_table_from_repo(spark, repo.root, "t")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    c = repo.compact(spark, "main", "t", target_files=1)
    assert c.meta["data_change"] is False
    repo.write_table("main", "t", _kv(spark, 10, 13), mode="append")
    repo.commit("main", "v3")
    drain()
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(13)]
    # a FRESH stream from -1 reads the pre-compaction files (still on
    # disk until vacuum) plus later appends — full table, no duplicates
    fresh = _drain_to_memory(spark, repo, "t")
    assert fresh == [(i, 2 * i) for i in range(13)]


def _committed_offsets(ck):
    """Parse the checkpoint's offset WAL: one committed end-offset dict
    per microbatch, batch order. The Python DataSource serializes its
    offset as the dict repr — ast.literal_eval, not json (r8 lesson)."""
    import ast
    import json
    import os

    out = []
    odir = os.path.join(ck, "offsets")
    for name in sorted(
        (n for n in os.listdir(odir) if n.isdigit()), key=int
    ):
        with open(os.path.join(odir, name)) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        # v1 header, metadata json, then one offset line per source
        for ln in lines[2:]:
            try:
                out.append(ast.literal_eval(ln))
            except (ValueError, SyntaxError):
                out.append(json.loads(ln))
    return out


def test_lake_stream_source_max_files_per_trigger_paces_catchup(
    spark, source_repo, tmp_path
):
    """maxFilesPerTrigger bounds every microbatch to N source files, so
    a long catch-up is consumed as many small batches: offsets may land
    MID-commit ({'version': v, 'fidx': n} = first n of v's sorted
    new-file list), data_change=false compaction commits contribute
    nothing to the budget, and drain_stream_to_head keeps draining while
    the head version is only partially consumed (fidx present)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        drain_stream_to_head,
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 9).repartition(3))
    repo.commit("main", "v1")  # 3 files
    repo.write_table("main", "other", _kv(spark, 90, 95))
    repo.commit("main", "unrelated")
    repo.compact(spark, "main", "t", target_files=1)  # data_change=false
    repo.write_table("main", "t", _kv(spark, 9, 13).repartition(2), mode="append")
    repo.commit("main", "v2")  # 2 files
    repo.write_table("main", "t", _kv(spark, 13, 25).repartition(4), mode="append")
    repo.commit("main", "v3")  # 4 files — must slice at cap=2

    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        stream_table_from_repo(spark, repo.root, "t", max_files_per_trigger=2)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        drain_stream_to_head(q, repo.root, timeout_s=120)
    finally:
        if q.isActive:
            q.stop()

    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(25)]
    offsets = _committed_offsets(ck)
    # 9 countable files at cap 2 → at least ceil(9/2) committed batches
    assert len(offsets) >= 5, offsets
    # the 4-file v3 commit cannot fit one batch: some offset is mid-commit
    assert any("fidx" in o for o in offsets), offsets
    # compaction never counted: no offset slices INTO the compacted file
    compact_v = next(
        c.version
        for c in repo.log("main", limit=None)
        if c.meta.get("data_change") is False
    )
    assert not any(
        o.get("fidx") is not None and o["version"] == compact_v for o in offsets
    ), offsets


@pytest.mark.slow
def test_lake_stream_source_capped_restart_resumes_mid_commit(
    spark, source_repo, tmp_path
):
    """A checkpointed restart whose committed offset is MID-commit
    ({'version': v, 'fidx': n}) resumes at exactly file n of v's sorted
    new-file list: no duplicates, no gaps across the slice boundary, and
    the cap HOLDS across restarts (the engine replays partitions() of
    the offset log's last batch before planning new ones, which restores
    the reader's position). The Python DataSource falls back to
    single-batch on availableNow, so each run = one capped batch."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 20).repartition(5))
    repo.commit("main", "v1")  # 5 files
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    def run_once():
        q = (
            stream_table_from_repo(spark, repo.root, "t", max_files_per_trigger=2)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # fresh stream: capped → first 2 of 5 files
    first = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert 0 < len(first) < 20, first
    offsets = _committed_offsets(ck)
    assert offsets and offsets[0].get("fidx") == 2, offsets
    run_once()  # restart: STILL capped — files[2:4]
    offsets = _committed_offsets(ck)
    assert offsets[-1].get("fidx") == 4, offsets
    second = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert len(first) < len(second) < 20, (len(first), len(second))
    run_once()  # files[4:] — commit fully consumed, fidx gone
    offsets = _committed_offsets(ck)
    assert offsets[-1] == {"version": 1}, offsets
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(20)]
    run_once()  # idempotent: nothing new
    assert sorted(
        (r.k, r.v) for r in spark.read.parquet(sink).collect()
    ) == got


@pytest.mark.slow
def test_lake_stream_source_max_bytes_per_trigger_paces_catchup(
    spark, source_repo, tmp_path
):
    """maxBytesPerTrigger bounds every microbatch by cumulative source
    file SIZE (Delta's soft-max admission: at least one file per batch,
    the last admitted file may overshoot). With a budget of ~1 file's
    size, a 5-file catch-up takes ~5 batches with mid-commit offsets;
    the drained result still equals the batch table exactly."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        drain_stream_to_head,
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 20).repartition(5))
    repo.commit("main", "v1")  # 5 files
    repo.write_table("main", "t", _kv(spark, 20, 28).repartition(2), mode="append")
    repo.commit("main", "v2")  # 2 files
    # budget = 1 byte: every file overshoots, so admission is exactly
    # one file per batch — the soft-max floor, deterministic regardless
    # of parquet size jitter
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        stream_table_from_repo(spark, repo.root, "t", max_bytes_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        drain_stream_to_head(q, repo.root, timeout_s=120)
    finally:
        if q.isActive:
            q.stop()

    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(28)]
    offsets = _committed_offsets(ck)
    # 7 files at a 1-byte soft budget → one file per batch
    assert len(offsets) >= 7, offsets
    assert any("fidx" in o for o in offsets), offsets


def test_lake_stream_source_byte_cap_delta_admission(
    spark, source_repo, tmp_path
):
    """r11 review: admission follows Delta's semantics exactly — files
    are taken while the budget is not yet MET (the last admitted file
    may overshoot), not stopped ahead of the file that would cross it.
    With 3 files and budget = size(file0) + 1, the first batch must
    admit exactly TWO files (file1 overshoots; file2 waits)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        drain_stream_to_head,
        stream_table_from_repo,
    )

    import os

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 12).repartition(3))
    repo.commit("main", "v1")  # 3 files
    entries = repo.head("main").tables["t"]
    sizes = []
    for rel in sorted(
        os.path.join(dp, fn)
        for e in entries
        for dp, _dn, fns in os.walk(os.path.join(repo.root, e))
        for fn in sorted(fns)
        if not fn.startswith((".", "_"))
    ):
        sizes.append(os.path.getsize(rel))
    assert len(sizes) == 3
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        stream_table_from_repo(
            spark, repo.root, "t", max_bytes_per_trigger=sizes[0] + 1
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        drain_stream_to_head(q, repo.root, timeout_s=120)
    finally:
        if q.isActive:
            q.stop()
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(12)]
    offsets = _committed_offsets(ck)
    # first batch = exactly two files (a mid-commit fidx=2 offset)
    assert any(o.get("fidx") == 2 for o in offsets), offsets


def test_lake_stream_source_byte_and_file_caps_compose(
    spark, source_repo, tmp_path
):
    """When both limits are set a batch ends at whichever is hit first:
    with a generous byte budget and file cap 2, batches stay 2 files
    (the hard cap); the stream still drains to the exact table."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        drain_stream_to_head,
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 12).repartition(4))
    repo.commit("main", "v1")  # 4 files
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    q = (
        stream_table_from_repo(
            spark,
            repo.root,
            "t",
            max_files_per_trigger=2,
            max_bytes_per_trigger=1 << 30,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        drain_stream_to_head(q, repo.root, timeout_s=120)
    finally:
        if q.isActive:
            q.stop()
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(i, 2 * i) for i in range(12)]
    offsets = _committed_offsets(ck)
    # 4 files, hard cap 2 → at least 2 committed batches, one mid-commit
    assert len(offsets) >= 2, offsets
    assert any("fidx" in o for o in offsets), offsets


def test_lake_stream_source_cdc_rejects_max_bytes_per_trigger(
    spark, source_repo
):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 5))
    repo.commit("main", "v1")
    name = f"cdbcap_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(
            spark, repo.root, "t", cdc=True, max_bytes_per_trigger=10
        )
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="maxBytesPerTrigger|STREAM_FAILED"):
        q.awaitTermination()


def test_lake_stream_source_cdc_rejects_max_files_per_trigger(
    spark, source_repo
):
    """A commit's delete+insert change rows must land in one microbatch
    to fold atomically — capping the CDC feed is refused loudly."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (
        stream_table_from_repo,
    )

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 5))
    repo.commit("main", "v1")
    name = f"cdcap_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(
            spark, repo.root, "t", cdc=True, max_files_per_trigger=2
        )
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="maxFilesPerTrigger|STREAM_FAILED"):
        q.awaitTermination()


def test_lake_stream_source_cdc_skips_compaction(spark, source_repo):
    """The CDC feed emits NOTHING for a data_change=false version (the
    row multiset is unchanged) — folding the feed still equals head."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 8).repartition(3))
    repo.commit("main", "v1")
    c = repo.compact(spark, "main", "t", target_files=1)
    repo.write_table("main", "t", _kv(spark, 8, 10), mode="append")
    repo.commit("main", "v3")
    name = f"cdcc_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, "t", cdc=True)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    assert not [r for r in rows if r._commit_version == c.version]
    assert all(r._change_type == "insert" for r in rows)
    assert sorted((r.k, r.v) for r in rows) == [(i, 2 * i) for i in range(10)]


def test_compact_refuses_dirty_branch(spark, source_repo):
    """compact commits ALL staged entries; unrelated staged writes must
    not ride a commit flagged as changing nothing."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import DirtyBranchError

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 5))
    repo.commit("main", "v1")
    repo.write_table("main", "u", _kv(spark, 0, 3))  # staged, uncommitted
    with pytest.raises(DirtyBranchError, match="data_change"):
        repo.compact(spark, "main", "t", target_files=1)


def test_lake_stream_source_cdc_folds_to_head(spark, source_repo, tmp_path):
    """CDC mode: the drained change feed, folded (inserts minus deletes
    per row), equals the table at head — across appends, a pruned DELETE,
    and a full overwrite, none of which the append mode can represent."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 10))
    repo.commit("main", "v1")
    repo.write_table("main", "t", _kv(spark, 10, 16), mode="append")
    repo.commit("main", "v2")
    LakeSQL(spark, repo, "main").sql("DELETE FROM t WHERE k % 3 = 0")
    repo.write_table("main", "t", _kv(spark, 100, 104))  # overwrite
    repo.commit("main", "v4")

    name = f"cdc_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, repo.root, "t", cdc=True)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.table(name)
    assert set(feed.columns) == {"k", "v", "_change_type", "_commit_version"}
    # versions tagged and monotone; both change types present
    kinds = {r._change_type for r in feed.select("_change_type").distinct().collect()}
    assert kinds == {"insert", "delete"}
    folded = (
        feed.groupBy("k", "v")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("net")
        )
        .where(F.col("net") > 0)
    )
    got = sorted((r.k, r.v) for r in folded.collect())
    want = sorted(
        (r.k, r.v) for r in repo.read_table(spark, "t", "main").collect()
    )
    assert got == want == [(i, 2 * i) for i in range(100, 104)]
    # the DELETE commit (first delete-bearing version): its net removals
    # must be exactly the predicate's keys — delete rows carry every row
    # of the rewritten files, inserts re-add the survivors
    delv = min(
        r._commit_version
        for r in feed.where(F.col("_change_type") == "delete")
        .select("_commit_version")
        .distinct()
        .collect()
    )
    at_v = feed.where(F.col("_commit_version") == delv).collect()
    dels = {r.k for r in at_v if r._change_type == "delete"}
    ins = {r.k for r in at_v if r._change_type == "insert"}
    assert dels - ins == {k for k in range(16) if k % 3 == 0}


def test_lake_stream_source_vacuum_hazard_is_loud(spark, source_repo, tmp_path):
    """Vacuuming history a checkpointed stream has not yet read must fail
    that stream's next drain loudly (missing file), never yield partial
    silent data — the Delta retention-vs-stream-lag hazard, pinned."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo

    repo = source_repo
    repo.write_table("main", "t", _kv(spark, 0, 5))
    repo.commit("main", "v1")
    # overwrite makes v1's files unreachable from the head snapshot
    repo.write_table("main", "t", _kv(spark, 5, 9))
    repo.commit("main", "v2")
    removed = repo.vacuum(keep_history=False, grace_seconds=0.0)
    assert removed, "vacuum removed nothing; fixture broken"
    ck = str(tmp_path / "ck")
    q = (
        stream_table_from_repo(spark, repo.root, "t", cdc=True)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="No such file|does not exist|FileNotFound|STREAM_FAILED"):
        q.awaitTermination()


@given(
    ops=st.lists(
        st.sampled_from(["append", "overwrite", "delete"]),
        min_size=1,
        max_size=4,
    )
)
@settings(**_CHAOS_SETTINGS)
@pytest.mark.slow
def test_lake_stream_cdc_chaos_fold_equals_head(spark, tmp_path_factory, ops):
    """Property: for ANY commit history of appends / overwrites / SQL
    DELETEs, the CDC stream drained from scratch and folded (inserts
    minus deletes per row) equals the table at head. This is the
    multiset-correctness contract of the file-granularity change feed,
    checked over op-streams rather than one hand-picked history."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    root = str(tmp_path_factory.mktemp("cdc_chaos") / "lake")
    repo = LakeRepo.init(root)
    nxt = 0

    def fresh(n):
        nonlocal nxt
        lo, nxt = nxt, nxt + n
        return _kv(spark, lo, lo + n)

    repo.write_table("main", "t", fresh(6))
    repo.commit("main", "seed")
    for i, op in enumerate(ops):
        if op == "append":
            repo.write_table("main", "t", fresh(4), mode="append")
            repo.commit("main", f"append {i}")
        elif op == "overwrite":
            repo.write_table("main", "t", fresh(5))
            repo.commit("main", f"overwrite {i}")
        else:
            # auto-commits (possibly metadata-only when nothing matches)
            LakeSQL(spark, repo, "main").sql("DELETE FROM t WHERE k % 2 = 0")

    name = f"cdcx_{uuid.uuid4().hex[:8]}"
    q = (
        stream_table_from_repo(spark, root, "t", cdc=True)
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    folded = (
        spark.table(name)
        .groupBy("k", "v")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("net")
        )
        .where(F.col("net") > 0)
    )
    got = sorted((r.k, r.v) for r in folded.collect())
    want = sorted(
        (r.k, r.v) for r in repo.read_table(spark, "t", "main").collect()
    )
    assert got == want, f"ops={ops}: folded CDC {got} != head {want}"
    # fold nets are 0/1 everywhere (unique keys): no row double-counted
    bad = (
        spark.table(name)
        .groupBy("k", "v")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("net")
        )
        .where(~F.col("net").isin(0, 1))
        .count()
    )
    assert bad == 0


def test_stream_into_declared_partitioned_table(spark, source_repo, tmp_path):
    """r13: a streaming exactly-once sink into a table declared
    PARTITIONED BY lands every micro-batch in the Hive layout — the
    spec is consulted by write_table on EVERY path, streaming included
    — and SHOW PARTITIONS tracks the partitions across drains."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import stream_into_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import stream_table_from_repo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo = source_repo
    lsql = LakeSQL(spark, repo, "main")
    lsql.sql("CREATE TABLE b (k BIGINT, v BIGINT, p BIGINT) PARTITIONED BY (p)")
    ck = str(tmp_path / "ck")
    repo.write_table("main", "a", _kv(spark, 0, 10))
    repo.commit("main", "a v1")

    def drain():
        s = stream_table_from_repo(spark, repo.root, "a").withColumn(
            "p", F.col("k") % 2
        )
        stream_into_repo(s, repo, "main", "b", ck)

    drain()
    assert repo.show_partitions("b", "main") == ["p=0", "p=1"]
    assert repo.read_table(spark, "b", "main").count() == 10
    # second source commit adds a new partition value; drain again
    repo.write_table(
        "main", "a",
        spark.range(100, 103).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        mode="append",
    )
    repo.commit("main", "a v2")
    def drain2():
        s = stream_table_from_repo(spark, repo.root, "a").withColumn(
            "p", F.col("k") % 3
        )
        stream_into_repo(s, repo, "main", "b", ck)
    drain2()
    t = repo.read_table(spark, "b", "main")
    assert t.count() == 13
    assert set(repo.show_partitions("b", "main")) >= {"p=0", "p=1"}
    # every ROW-bearing file of b is under a Hive partition dir (the
    # CREATE's 0-row schema-carrier file is legitimately flat)
    import os as _os

    import pyarrow.parquet as _pq

    for rel in repo.current_files("main", "b"):
        full = _os.path.join(repo.root, rel)
        for dp, _dn, fns in _os.walk(full):
            for fn in fns:
                if not fn.endswith(".parquet"):
                    continue
                if _pq.ParquetFile(_os.path.join(dp, fn)).metadata.num_rows:
                    assert "p=" in dp, (rel, dp, fn)
