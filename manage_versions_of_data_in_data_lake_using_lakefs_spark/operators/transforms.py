"""Projection / filter / column ops (SURVEY.md §2.2, P1-P11).

All pure Column-expression builders — Catalyst-optimizable, codegen-friendly,
no Python UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """P1: column subset + order."""
    return df.select(*cols)


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2: bulk column rename (single select, not chained withColumnRenamed —
    keeps the plan one Project node)."""
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def cast_all(df: DataFrame, dtype: DataType | str, cols: list[str] | None = None) -> DataFrame:
    """P8 done right: one-shot select of casts.

    The reference loops ``withColumn`` per column (``jobs/vdt4.py:35-36``),
    growing the logical plan linearly (54 Project nodes); a single select is
    one node and analyzes in O(1) passes.
    """
    target = set(cols if cols is not None else df.columns)
    return df.select(
        *[F.col(c).cast(dtype).alias(c) if c in target else F.col(c) for c in df.columns]
    )


def with_condition_label(
    df: DataFrame, out: str, cond: Column, if_true, if_false
) -> DataFrame:
    """P6: CASE WHEN-derived column (``jobs/vdt4.py:50``)."""
    return df.withColumn(out, F.when(cond, if_true).otherwise(if_false))


def bucketize(df: DataFrame, col: str, out: str, boundaries: list[float]) -> DataFrame:
    """P7: multi-branch conditional bucketing against sorted boundaries
    (``jobs/vdt4.py:69-73``). Produces buckets 1..len(boundaries)+1.
    """
    expr = None
    for i, b in enumerate(boundaries):
        clause = F.when(F.col(col) <= F.lit(b), F.lit(i + 1))
        expr = clause if expr is None else expr.when(F.col(col) <= F.lit(b), F.lit(i + 1))
    expr = expr.otherwise(F.lit(len(boundaries) + 1))
    return df.withColumn(out, expr)


def cols_with_prefix(df: DataFrame, prefix: str) -> list[Column]:
    """P11: dynamic column selection by name prefix (``jobs/vdt4.py:53,58``).
    Driver-side metadata op — no job runs."""
    return [F.col(c) for c in df.columns if c.startswith(prefix)]


def horizontal_mean(cols: list[Column]) -> Column:
    """P10: row-wise mean over a column family (``jobs/vdt4.py:53-60``).

    A fold of ``+`` over Column objects — stays a single codegen'd
    expression; no shuffle, no UDF.
    """
    if not cols:
        raise ValueError("horizontal_mean needs at least one column")
    return reduce(lambda a, b: a + b, cols) / F.lit(len(cols))
