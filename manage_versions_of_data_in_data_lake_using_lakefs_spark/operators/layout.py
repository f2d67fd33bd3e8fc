"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional layout: range-clustering on a single column prunes
scans filtered on that column only; interleaving the bits of two keys
produces an ordering where *both* columns' min/max parquet stats stay
tight, so predicates on either dimension skip row groups — the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea, as a pure Column expression.

The bit math is plain integer arithmetic (floor-div/mod/scale-add),
identical in the DuckDB oracle — same portability rationale as
operators/dedup.py's affine hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int columns:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    xm = x.cast("long") % F.lit(1 << bits)
    ym = y.cast("long") % F.lit(1 << bits)
    out = F.lit(0).cast("long")
    for i in range(bits):
        bx = F.floor(xm / F.lit(float(1 << i))).cast("long") % 2
        by = F.floor(ym / F.lit(float(1 << i))).cast("long") % 2
        out = out + bx * F.lit(1 << (2 * i)) + by * F.lit(1 << (2 * i + 1))
    return out


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of ``zorder_key`` (kept adjacent so they never drift)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(FLOOR(({x} % {1 << bits}) / {float(1 << i)}) AS BIGINT) % 2) * {1 << (2 * i)}"
        )
        terms.append(
            f"(CAST(FLOOR(({y} % {1 << bits}) / {float(1 << i)}) AS BIGINT) % 2) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_cluster(df: DataFrame, x: str, y: str, num_partitions: int, bits: int = 16) -> DataFrame:
    """Rewrite a DataFrame into Z-order-clustered partitions: range-split
    on the Morton key, sort within partitions, drop the key. Feed to a
    parquet write for a two-dimensionally prunable layout."""
    keyed = df.withColumn("_z", zorder_key(F.col(x), F.col(y), bits))
    return (
        keyed.repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
