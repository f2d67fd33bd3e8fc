"""Join surface (SURVEY.md §2.3, J1-J3 + the full strategy space).

The reference uses only inner equi-joins on single int keys
(``jobs/vdt1.py:41``, ``jobs/vdt2.py:46,52``, ``jobs/vdt3.py:55``) but its
telemetry schema enumerates broadcast/sort-merge/shuffle-hash × inner/outer
joins (``data/log_app_test.csv:1``), so the engine exposes the whole space.

Scale notes:
- equi-joins on keys shuffle both sides; ``broadcast()`` a dimension that
  fits in executor memory to skip the shuffle entirely.
- at 100 TB the fact-side shuffle dominates: co-locate repeated joins by
  pre-repartitioning on the join key (``co_partitioned_join``) so one
  Exchange serves several downstream joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    *,
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join with optional broadcast hint on the right side.

    Using the ``on=`` name form (not an expression) collapses the duplicate
    key column — the reference keeps both copies (SURVEY.md §2.3 note) and
    then has to project around them; we avoid that footgun by default.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS-style filter; never widens rows, safe on huge left sides."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS-style filter; the building block for branch diff (§2.9 V11)."""
    return left.join(right, on=on, how="left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key over ``salt``
    sub-partitions.

    The skewed (left/fact) side gets a deterministic salt in [0, salt)
    derived from non-key columns' hash; the right side is replicated
    ``salt``-fold via an exploded literal range. The join key becomes
    (key, salt), so one pathological key's rows land on ``salt`` tasks
    instead of one. AQE's skew-join split handles moderate skew
    automatically; explicit salting is for the extreme tail (a single key
    holding >1 task's worth of build-side rows) and for deterministic
    layout control.

    ``right`` is replicated — use with a dimension-sized right side.
    """
    non_key = [c for c in left.columns if c != on] or [on]
    l = left.withColumn("_salt", F.pmod(F.hash(*[F.col(c) for c in non_key]), F.lit(salt)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on=[on, "_salt"], how=how).drop("_salt")


def co_partitioned_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int | None = None,
) -> DataFrame:
    """Join after explicitly co-partitioning both sides on the key.

    When several joins/aggregations downstream reuse the same key, one
    explicit repartition lets Catalyst reuse the Exchange instead of
    re-shuffling per operator.
    """
    keys = [on] if isinstance(on, str) else list(on)
    cols = [F.col(k) for k in keys]
    if num_partitions:
        left = left.repartition(num_partitions, *cols)
        right = right.repartition(num_partitions, *cols)
    else:
        left = left.repartition(*cols)
        right = right.repartition(*cols)
    return left.join(right, on=on, how=how)
