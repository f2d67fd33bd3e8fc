"""Event-sequence analytics: funnel conversion and cohort retention.

The reference's event handling is static filters (``jobs/vdt3.py``); a
production event lake also answers the two canonical product-analytics
questions — "how many users progress through step 1 → 2 → 3, in order?"
(funnel) and "of the users who first appeared in week W, how many were
still active k weeks later?" (retention). Both are expressed as pure
relational algebra over integer microseconds, so they are bit-exact and
SQL-replayable in the DuckDB oracle:

- **funnel**: step i's entrants are ``min(ts)`` of a step-i event
  STRICTLY AFTER the user's step-(i−1) entry time — k−1 chained per-user
  aggregations, each one shuffle on the user key (high cardinality: the
  shape that scales; every join is user-keyed so AQE co-partitions the
  chain). Strict ordering means a user whose click precedes every view
  does not convert — the textbook ordered-funnel semantics.
- **retention**: cohort = integer day of the user's first event
  (``min`` over day numbers — monotone, so it is the day of the first
  event); activity weeks are ``(day − cohort_day) div 7`` offsets; the
  matrix is a count of distinct users per (cohort week, offset). All
  arithmetic is positive-integer division, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Users reaching each ordered step: (step, step_name, n_users)."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    reached = (
        ev.where(F.col("t") == steps[0]).groupBy("u").agg(F.min("us").alias("entry"))
    )
    counts = [(1, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=2):
        reached = (
            ev.where(F.col("t") == step)
            .join(reached, "u")
            .where(F.col("us") > F.col("entry"))
            .groupBy("u")
            .agg(F.min("us").alias("entry"))
        )
        counts.append((i, step, reached))
    rows = None
    for i, step, df in counts:
        one = df.agg(
            F.lit(i).alias("step"),
            F.lit(step).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows.orderBy("step")


def funnel_conversion_sql(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of ``funnel_conversion`` (kept adjacent). Step names
    are SQL-escaped — they are data values, not identifiers."""
    esc = [s.replace("'", "''") for s in steps]
    ctes = [
        f"s1 AS (SELECT {user_col} AS u, MIN(epoch_us({ts_col})) AS entry "
        f"FROM {table} WHERE {type_col} = '{esc[0]}' GROUP BY 1)"
    ]
    for i, step in enumerate(esc[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS u, MIN(epoch_us(e.{ts_col})) AS entry "
            f"FROM {table} e JOIN s{i - 1} p ON e.{user_col} = p.u "
            f"WHERE e.{type_col} = '{step}' AND epoch_us(e.{ts_col}) > p.entry "
            f"GROUP BY 1)"
        )
    selects = [
        f"SELECT CAST({i} AS INT) AS step, '{step}' AS step_name, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i}"
        for i, step in enumerate(esc, start=1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention matrix: (cohort_week, week_offset, n_users)."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.expr(f"unix_micros({ts_col}) div {_DAY_US}").alias("d"),
    )
    cohorts = ev.groupBy("u").agg(F.min("d").alias("d0"))
    active = (
        ev.join(cohorts, "u")
        .select(
            "u",
            F.expr("d0 div 7").alias("cohort_week"),
            F.expr("(d - d0) div 7").alias("week_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_sql(
    table: str, user_col: str = "user_id", ts_col: str = "ts"
) -> str:
    """DuckDB twin of ``cohort_retention`` (kept adjacent). Positive
    integer division only, so ``//`` ≡ Spark's ``div``."""
    return f"""
WITH ev AS (
    SELECT {user_col} AS u, epoch_us({ts_col}) // {_DAY_US} AS d FROM {table}
),
cohorts AS (SELECT u, MIN(d) AS d0 FROM ev GROUP BY u),
active AS (
    SELECT DISTINCT ev.u, c.d0 // 7 AS cohort_week, (ev.d - c.d0) // 7 AS week_offset
    FROM ev JOIN cohorts c ON ev.u = c.u
)
SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_users
FROM active GROUP BY 1, 2 ORDER BY 1, 2
"""
