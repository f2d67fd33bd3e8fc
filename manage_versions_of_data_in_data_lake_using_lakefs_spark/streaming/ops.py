"""Structured Streaming equivalents of the batch operators.

The reference is batch-only (SURVEY.md §2.8), so this module is pure
extension surface: the same aggregations/dedup expressed as incremental
streaming plans with watermarked state, plus a custom stateful operator
(gap sessionization) via ``applyInPandasWithState``.

Batch/stream parity is the design rule: every op here has a batch
equivalent the tests compare against using ``trigger(availableNow=True)``
over a file source — the replay-the-lake-then-keep-following pattern that
a 100 TB ingest pipeline actually uses.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events_from_dir(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over parquet event files (explicit schema — file
    streams cannot infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    decimal_scale: int | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound.

    The watermark caps state: windows older than max(ts)-watermark are
    finalized and evicted — the piece that makes unbounded streams safe.

    ``decimal_scale`` switches the value sum to exact fixed-point integer
    accumulation (see aggregates.decimal_sum) — incremental state updates
    then commute, so results are independent of arrival order.
    """
    if decimal_scale is None:
        total = F.sum("value")
    else:
        scale = float(10**decimal_scale)
        total = F.sum(F.round(F.col("value") * F.lit(scale)).cast("long")) / F.lit(scale)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            total.alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once-per-key stream dedup with bounded state: duplicates
    arriving within the watermark horizon are dropped; state for old keys
    is evicted. The streaming twin of dedup.exact_dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator: gap-based sessions per user via
    ``applyInPandasWithState`` — the arbitrary-state API (what you reach
    for when windows/dedup built-ins can't express the semantics).

    Emits a session row when the gap to the next event exceeds
    ``gap_seconds`` or the group times out past the watermark.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0
        out = []
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.hasTimedOut:
            if n:
                out.append((user_id, start_us, last_us, n, total))
            state.remove()
        else:
            for ts, value in zip(rows["ts"], rows["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if last_us is not None and ts_us - last_us > gap_us:
                    out.append((user_id, start_us, last_us, n, total))
                    start_us, n, total = ts_us, 0, 0.0
                if start_us is None:
                    start_us = ts_us
                last_us = ts_us
                n += 1
                total += float(value)
            state.update((start_us, last_us, n, total))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1] * 1000) for o in out],
                    "session_end": [pd.Timestamp(o[2] * 1000) for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: left rows match right rows with the same
    key whose timestamp falls in [left_ts - lookback, left_ts].

    Both sides carry watermarks and the join condition bounds the time
    range — the two things Structured Streaming needs to know when
    buffered state can be evicted (an unbounded stream-stream join would
    grow state forever)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= F.expr(f"{left_ts} - INTERVAL {lookback}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, "inner").drop(r[on])


_NEARDUP_SCHEMA = StructType(
    [
        StructField("a", LongType()),
        StructField("b", LongType()),
        StructField("hamming", IntegerType()),
    ]
)

_NEARDUP_STATE = StructType(
    [
        StructField("ids", StringType()),   # comma-joined doc ids
        StructField("sigs", StringType()),  # comma-joined simhash values
    ]
)


def streaming_simhash_neardup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    bits: int = 30,
    max_hamming: int = 3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming near-duplicate detection — the streaming twin of the
    batch ``dedup.simhash_pairs``: as documents arrive, emit every pair
    (a < b, hamming ≤ max_hamming) between the new doc and previously
    seen docs within the watermark horizon.

    Plan shape (the same banding trick as batch, adapted to streaming's
    one-stateful-operator constraint):
    1. signature is the MAP-ONLY ``dedup.simhash_expr`` (bit-identical
       to the batch shuffle formulation — the two-shuffle batch simhash
       cannot legally precede a stateful streaming op);
    2. each doc explodes to its ``max_hamming + 1`` (band, value) keys —
       by pigeonhole, any pair within the hamming budget collides on at
       least one band, so per-band state suffices for exact recall;
    3. ``applyInPandasWithState`` keyed by (band, value) keeps the
       bucket's (id, sig) pairs, verifies exact hamming against each
       arrival, and evicts idle buckets past the watermark.

    A pair colliding on several bands is emitted once per colliding band
    — downstream consumers ``dropDuplicates(["a", "b"])`` (the batch op
    pays the same ``.distinct()``). State rides as comma-joined strings:
    per-bucket occupancy is small by construction (that is the entire
    point of banding), and string state sidesteps per-engine array-state
    encoding differences."""
    n_bands = max_hamming + 1
    band_bits = -(-bits // n_bands)
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import simhash_expr

    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        simhash_expr(F.col(text_col), bits).alias("simhash"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.floor(F.col("simhash") / F.lit(float(2 ** (b * band_bits)))).cast(
                        "long"
                    )
                    % F.lit(2**band_bits)
                ).alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        "doc_id", "ts", "simhash", F.explode(bands).alias("bv")
    ).select("doc_id", "ts", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))

    horizon_ms = 6 * 3600 * 1000  # eviction slack past the watermark

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids_s, sigs_s = state.get
            ids = [int(x) for x in ids_s.split(",")] if ids_s else []
            sigs = [int(x) for x in sigs_s.split(",")] if sigs_s else []
        else:
            ids, sigs = [], []
        out_a, out_b, out_h = [], [], []
        rows = pd.concat(list(pdfs)).sort_values(["ts", "doc_id"])
        for did, sh in zip(rows["doc_id"], rows["simhash"]):
            did, sh = int(did), int(sh)
            for pid, psh in zip(ids, sigs):
                if pid == did:
                    continue
                h = bin(sh ^ psh).count("1")
                if h <= max_hamming:
                    out_a.append(min(did, pid))
                    out_b.append(max(did, pid))
                    out_h.append(h)
            ids.append(did)
            sigs.append(sh)
        state.update(
            (",".join(map(str, ids)), ",".join(map(str, sigs)))
        )
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + horizon_ms)
        if out_a:
            yield pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    return (
        banded.withWatermark("ts", watermark)
        .groupBy("band", "val")
        .applyInPandasWithState(
            fn,
            outputStructType=_NEARDUP_SCHEMA,
            stateStructType=_NEARDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def latest_stream_batch(repo, branch: str, stream_id: str) -> int | None:
    """Highest micro-batch id this stream has already COMMITTED on the
    branch — the repo-side half of exactly-once ingest. Walks the commit
    log until the first commit carrying this stream's id (newest first,
    so steady state inspects O(1) commits)."""
    for c in repo.log(branch, limit=None):
        meta = getattr(c, "meta", None) or {}
        if meta.get("stream_id") == stream_id:
            return int(meta["stream_batch_id"])
    return None


def is_replayed_batch(repo, branch: str, stream_id: str, batch_id: int) -> bool:
    """True when this (stream, batch) was already committed — the
    idempotence decision a restarted foreachBatch delivery hits."""
    last = latest_stream_batch(repo, branch, stream_id)
    return last is not None and batch_id <= last


def stream_into_repo(
    stream_df: DataFrame,
    repo,
    branch: str,
    table: str,
    checkpoint_dir: str,
    commit_prefix: str = "stream batch",
) -> None:
    """Versioned streaming ingest: every micro-batch lands as an append +
    commit on a LakeRepo branch (foreachBatch — the sink adapter for any
    custom writer). The lake's history *is* the stream's batch log: each
    commit message carries the batch id, time travel reproduces any
    prefix of the stream, and a bad batch rolls back with ``revert``.

    **Exactly-once**: foreachBatch is at-least-once across restarts — a
    crash between the repo commit and the checkpoint advance makes Spark
    REPLAY the last batch. Each commit therefore records
    (stream_id = checkpoint dir, batch_id) in its metadata, and a batch
    whose id is ≤ the stream's last committed id is skipped — the same
    idempotent-sink protocol as Delta's ``txnAppId``/``txnVersion``.
    The check walks the log newest-first and stops at this stream's
    previous commit, so steady state inspects O(1) commits.

    The replay guard also covers the *staged* half of the crash window: a
    crash between ``write_table`` (which durably stages the batch's files)
    and ``commit`` leaves an uncommitted staged copy that the committed-log
    check cannot see. Every stage is therefore tagged with this stream's
    id (``write_table(txn=...)``), and on batch entry any staged entry for
    this table still carrying the tag is dropped before writing — the
    redelivered batch replaces its own leftover instead of stacking a
    second copy on top of it. Mixing staged entries between the stream
    and any other writer — in either direction — fails loudly in
    ``write_table`` instead of silently weakening this guarantee: the
    other party must commit or reset before the stream proceeds.

    Drains with availableNow (bounded replay); a live deployment drops
    the trigger and keeps the same code.
    """

    def stage_append(batch_df: DataFrame, txn: dict) -> None:
        repo.write_table(branch, table, batch_df, mode="append", txn=txn)

    _run_exactly_once_sink(
        stream_df, repo, branch, table, checkpoint_dir, commit_prefix, stage_append
    )


def _run_exactly_once_sink(
    stream_df: DataFrame,
    repo,
    branch: str,
    table: str,
    checkpoint_dir: str,
    commit_prefix: str,
    stage_batch,
) -> None:
    """ONE copy of the exactly-once crash-window protocol, shared by
    every versioned streaming sink (append ingest, CDC upsert): skip
    already-committed batch ids, drop this stream's own stale staged
    leftover, run ``stage_batch(batch_df, txn)`` (which must stage via
    ``write_table(..., txn=txn)`` so the crash-recovery tag rides the
    staged entry), then commit with the batch id in the metadata."""
    stream_id = os.path.abspath(checkpoint_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if is_replayed_batch(repo, branch, stream_id, batch_id):
            return  # already committed, exactly-once skip
        stale = repo.staged_txn(branch, table)
        if stale and stale.get("stream_id") == stream_id:
            # leftover from a crash between stage and commit: drop our own
            # staged copy so the redelivery lands exactly once
            repo.unstage_table(branch, table)
        txn = {"stream_id": stream_id, "stream_batch_id": batch_id}
        stage_batch(batch_df, txn)
        repo.commit(branch, f"{commit_prefix} {batch_id}", meta=dict(txn))

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain a stream with availableNow into an in-memory table (test/
    driver-contract helper): processes everything currently in the source,
    then stops — the batch-replay mode of a streaming pipeline.

    Note on modes: watermarked aggregations in *append* mode only emit
    windows the watermark has closed; a single availableNow replay keeps
    the tail windows in state. Use ``output_mode='complete'`` to observe
    every window in bounded tests.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_refresh_agg(
    changes_stream: DataFrame,
    state_dir: str,
    keys: list[str],
    measures: dict,
    checkpoint_dir: str,
) -> None:
    """Streaming materialized-view maintenance: a stream of row-level
    change records (tagged ``__change`` ∈ {added, removed} — the same
    shape ``LakeRepo.diff`` emits) folds into a persistent aggregate
    state via ``operators/incremental.agg_refresh``, one micro-batch at
    a time. Per batch the work is O(|batch| + |state|) with the batch
    side a tiny broadcast — never a rescan of the underlying table; the
    exact fixed-point state is what makes out-of-order retractions safe
    (see operators/incremental.py).

    The state swap is write-new-then-rename (single maintainer per view
    — the checkpoint already enforces that for a streaming query).
    Drains with availableNow; a live deployment drops the trigger.
    """
    import os as _os
    import shutil as _shutil

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.incremental import agg_refresh, agg_state

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if _os.path.exists(state_dir):
            state = spark.read.parquet(state_dir)
        else:
            state = agg_state(batch_df.drop("__change").limit(0), keys, measures)
        new_state = agg_refresh(state, batch_df, keys, measures)
        nxt = state_dir + ".next"
        new_state.write.mode("overwrite").parquet(nxt)
        old = state_dir + ".old"
        if _os.path.exists(state_dir):
            _os.rename(state_dir, old)
        _os.rename(nxt, state_dir)
        _shutil.rmtree(old, ignore_errors=True)

    q = (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_into_repo(
    stream_df: DataFrame,
    repo,
    branch: str,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    when_matched: str = "update",
    seq_col: str | None = None,
    commit_prefix: str = "stream upsert batch",
) -> None:
    """Streaming CDC apply: every micro-batch of change rows MERGEs into
    the versioned table on ``keys`` (row-level upsert — updates replace,
    new keys insert) and commits one version, via the shared
    exactly-once scaffold (``_run_exactly_once_sink``): an
    already-committed batch id is skipped, and a crash between staging
    and commit leaves a txn-tagged staged overwrite that the redelivery
    drops before re-merging from the committed head — so the replayed
    merge runs against the same base state and lands once.

    **Multiple change events per key in one micro-batch** (the normal
    CDC case): pass ``seq_col`` — the batch is reduced last-wins per key
    by (seq_col, remaining columns) before merging, so the table keeps
    its key-uniqueness invariant deterministically. Without ``seq_col``
    a batch holding duplicate keys RAISES rather than committing a
    nondeterministic "current" row.

    This is the Delta "streaming upsert via foreachBatch + MERGE"
    recipe on the lake's commit DAG; each batch's cost is the
    anti-join + rewrite of ``upsert_table``, and the stream's history is
    time-travelable per batch."""

    def stage_merge(batch_df: DataFrame, txn: dict) -> None:
        from pyspark.sql import Window as W

        from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.mutations import upsert

        if seq_col is not None:
            order = [F.col(seq_col).desc()] + [
                F.col(c).desc()
                for c in batch_df.columns
                if c != seq_col and c not in keys
            ]
            w = W.partitionBy(*keys).orderBy(*order)
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            # the sequence column is feed metadata unless the table
            # itself carries it
            if seq_col not in repo.read_table(
                batch_df.sparkSession, table, ref=branch, include_staged=True
            ).columns:
                batch_df = batch_df.drop(seq_col)
        else:
            dup = (
                batch_df.groupBy(*keys)
                .count()
                .where(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    f"CDC batch for {table!r} holds multiple change rows "
                    f"for one key {keys}; pass seq_col=... for last-wins "
                    "reduction or pre-dedupe the feed"
                )
        # read AFTER the scaffold dropped our stale staged copy:
        # include_staged must see other writers' staged state (lakeFS
        # semantics) but never our own crash leftover
        current = repo.read_table(
            batch_df.sparkSession, table, ref=branch, include_staged=True
        )
        merged = upsert(current, batch_df, keys, when_matched)
        repo.write_table(branch, table, merged, mode="overwrite", txn=txn)

    _run_exactly_once_sink(
        stream_df, repo, branch, table, checkpoint_dir, commit_prefix, stage_merge
    )
