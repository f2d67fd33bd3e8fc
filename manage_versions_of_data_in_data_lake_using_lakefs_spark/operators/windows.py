"""Window functions (SURVEY.md §2.5, W1-W4) with scale-safe variants.

W1/W2 (top-1-per-group via ``row_number``) and W3 (unordered-frame count)
are native patterns. W4 — the reference's global ``rank`` ID assignment
(``jobs/vdt4.py:48-49``) — collapses to a single partition and is fatal at
100 TB; ``global_rank_scalable`` replaces it with a partition-local
sort + offset-join scheme that never funnels data through one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int = 1,
    row_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """W1/W2: keep the first n rows per group under a deterministic order.

    ``order_by`` must be a *total* order (include a unique tiebreaker) for
    reproducible results across engines/partitionings.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(row_col, F.row_number().over(w)).where(F.col(row_col) <= n)
    return out if keep_rank else out.drop(row_col)


def count_over_partition(
    df: DataFrame, partition_by: Sequence[str], out: str = "cnt"
) -> DataFrame:
    """W3: count(*) over an unordered partition frame (``jobs/vdt3.py:47-48``)."""
    return df.withColumn(out, F.count(F.lit(1)).over(Window.partitionBy(*partition_by)))


def modal_value_per_group(
    df: DataFrame, group_by: Sequence[str], value_col: str, out: str = "modal"
) -> DataFrame:
    """W2 composite: most frequent ``value_col`` per group (``jobs/vdt3.py:47-52``).

    Implemented as groupBy-count + row_number instead of the reference's
    window-count-on-every-row: aggregating first shrinks the window input
    from |rows| to |groups × distinct values| — orders of magnitude less
    shuffle at scale. Ties break on the smallest value for determinism.
    """
    counts = df.groupBy(*group_by, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.partitionBy(*group_by).orderBy(F.col("_cnt").desc(), F.col(value_col).asc())
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*group_by, F.col(value_col).alias(out))
    )


def global_rank(df: DataFrame, order_by: Sequence[Column], out: str = "id") -> DataFrame:
    """W4 as the reference does it (``jobs/vdt4.py:48-49``): ``rank`` over a
    partition-less window. Correct, but single-partition — kept only for
    parity tests at small SF. Use ``global_rank_scalable`` in pipelines.
    """
    return df.withColumn(out, F.rank().over(Window.orderBy(*order_by)))


def global_row_number_scalable(
    df: DataFrame,
    order_cols: str | Sequence[str],
    out: str = "id",
    ascending: bool = True,
) -> DataFrame:
    """Scale-safe global sequential ID: range-partition by the sort keys,
    number within partitions, then add each partition's cumulative offset.

    ``order_cols`` must be a *total* order (include a unique tiebreaker)
    for a deterministic, engine-independent numbering — equivalent to
    ``ROW_NUMBER() OVER (ORDER BY cols)`` but never funnels the data
    through one task: ``repartitionByRange`` samples the key distribution,
    each partition numbers locally, and the per-partition offsets come
    from a #partitions-row aggregate (its window runs single-partition,
    but over ~dozens of count rows — metadata, not data; the range
    exchange feeding both branches is reused, so the table shuffles once).
    Even if sampling places range boundaries differently across runs, the
    final ids are unchanged — numbering follows the total order, only
    *where* a row is numbered moves.
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    keys = [F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols]
    parted = df.repartitionByRange(*keys).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*keys)
    numbered = parted.withColumn("_local", F.row_number().over(w))
    offsets = (
        numbered.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )


def ranged_prefix_sum(
    df: DataFrame, order_col: str, val_col: str, out: str
) -> DataFrame:
    """Exact running sum of ``val_col`` over rows STRICTLY BEFORE each
    row under ``order_col`` — the prefix-sum sibling of
    ``global_row_number_scalable``, same scaffolding and the same
    invariant (the range exchange feeds both the local window and the
    offsets aggregate, so both see identical partition boundaries; the
    offsets window runs single-partition over #partitions COUNT rows —
    metadata, not data). ``order_col`` values must be DISTINCT per row:
    with duplicates split across a range boundary, "strictly before"
    would depend on which partition a row landed in. The result column
    is decimal(38,0) — prefix totals outgrow int64 long before the
    inputs do."""
    parted = df.repartitionByRange(F.col(order_col).asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parted.withColumn(
        "_cum_local", F.coalesce(F.sum(val_col).over(w_local), F.lit(0))
    )
    offsets = (
        parted.groupBy("_pid")
        .agg(F.sum(val_col).cast("decimal(38,0)").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out, F.col("_cum_local").cast("decimal(38,0)") + F.col("_offset")
        )
        .drop("_pid", "_cum_local", "_offset")
    )
