"""Sequence packing: assign documents to fixed-token-budget training
sequences (the pre-batching step of every pretraining pipeline).

Sequential-fill packing — documents in a deterministic order, each bin
holding ``seq_len`` tokens of running budget, a document landing in the
bin where its first token falls (straddlers continue into the next bin,
which is how packed pretraining batches actually treat document
boundaries). That definition makes packing a WINDOW problem, not a bin-
packing heuristic: bin = (running-sum-before-this-doc) DIV seq_len.

Scale shape: a single global order would serialize the window on one
partition, so documents are first hash-bucketed (``portable_hash``,
deterministic and oracle-portable) into independent packing streams —
each bucket packs in parallel, the window runs per-bucket, and bucket
count scales with the cluster, not the data. Bin arithmetic is exact
BIGINT (DIV, never float division) so the assignment is reproducible at
any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import (
    PORTABLE_HASH_SQL,
    portable_hash,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import tokenize


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(bucket, bin) packing summary: documents packed, tokens
    filled, fill ratio. One map pass (tokenize + hash), one per-bucket
    window, one small agg."""
    h = portable_hash(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("n_tokens"),
        h.alias("_h"),
    ).withColumn("bucket", (F.col("_h") % F.lit(buckets)).cast("int"))
    w = Window.partitionBy("bucket").orderBy("_h", id_col)
    packed = base.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ),
    ).withColumn("bin", F.expr(f"cum_before DIV {seq_len}"))
    return (
        packed.groupBy("bucket", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("bucket", "bin")
    )


def pack_sequences_sql(
    toks_sql: str, seq_len: int = 512, buckets: int = 8
) -> str:
    """DuckDB twin of ``pack_sequences`` over ``documents`` (kept
    adjacent so the two never drift)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import _P

    h = PORTABLE_HASH_SQL.format(x="CAST(doc_id AS VARCHAR)", m=_P)
    return f"""
WITH base AS (
    SELECT doc_id,
           len({toks_sql}) AS n_tokens,
           {h} AS _h
    FROM documents
),
packed AS (
    SELECT CAST(_h % {buckets} AS INT) AS bucket,
           doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY _h % {buckets} ORDER BY _h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM base
)
SELECT bucket, cum_before // {seq_len} AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens
FROM packed
GROUP BY 1, 2
ORDER BY bucket, bin
"""
