"""Robust anomaly detection: per-key median/MAD outlier flagging.

The reference pipelines clean event tables with static predicates
(``jobs/vdt3.py``-style filters); a curation engine at 100 TB needs a
*data-derived* outlier rule. Mean/stddev z-scores are the textbook
answer but are themselves dragged by the outliers they're meant to
catch; the robust form — median and MAD (median absolute deviation) —
has a 50% breakdown point and is the standard choice for dirty data.

Exactness discipline: both medians are *lower medians* — the element at
rank ⌈n/2⌉ under the total order (value, event_id) — so every reported
number is an actual data value picked deterministically, never an
interpolated average. That makes the whole operator bit-exact and
SQL-replayable in the DuckDB oracle (same spelling, same ranks), the
same portability rationale as operators/aggregates.py's exact quantiles.

Scale shape: two window passes partitioned by the group key (each one
shuffle of (key, value, id) triples — the payload never moves), a
broadcast-sized per-key stats frame joined back, and a map-side filter.
No global sort, no driver collect; per-key medians via rank-select
windows is exactly the plan that survives 1000 executors. Skewed keys
cost what any per-key window costs; the alternative exact-selection
plan for a *single* giant key is operators/aggregates.py's histogram
bisection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lower_median(df: DataFrame, key: str, val: str, tie: str, out: str) -> DataFrame:
    """Per-``key`` lower median of ``val``: the value at rank ⌈n/2⌉ under
    ORDER BY (val, tie). One shuffle on ``key``."""
    w = Window.partitionBy(key).orderBy(val, tie)
    wn = Window.partitionBy(key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2).cast("int"))
        .select(F.col(key), F.col(val).alias(out))
    )


def mad_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    nsigma: int = 3,
) -> DataFrame:
    """Rows whose |value − median(key)| exceeds ``nsigma`` × MAD(key).

    Returns (id, key, value, med, mad) for the flagged rows — med/mad are
    the per-key lower medians described in the module docstring.
    """
    # NULL values carry no outlier signal and Spark/DuckDB disagree on
    # their ORDER BY placement (NULLS FIRST vs LAST) — exclude them up
    # front so the rank selects stay bit-identical across engines
    base = events.where(F.col(val_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(key_col).alias("key"), F.col(val_col).alias("v")
    )
    med = _lower_median(base, "key", "v", "id", "med")
    dev = base.join(med, "key").withColumn("ad", F.abs(F.col("v") - F.col("med")))
    mad = _lower_median(dev, "key", "ad", "id", "mad")
    return (
        dev.join(mad, "key")
        .where(F.col("ad") > F.lit(nsigma) * F.col("mad"))
        .select(
            F.col("id").alias(id_col),
            F.col("key").alias(key_col),
            F.col("v").alias(val_col),
            "med",
            "mad",
        )
    )


def mad_anomalies_sql(
    table: str,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    nsigma: int = 3,
) -> str:
    """DuckDB twin of ``mad_anomalies`` (kept adjacent so the rank-select
    spelling never drifts from the Spark build)."""
    return f"""
WITH base AS (
    SELECT {id_col} AS id, {key_col} AS key, {val_col} AS v FROM {table}
    WHERE {val_col} IS NOT NULL
),
med AS (
    SELECT key, v AS med FROM (
        SELECT key, v,
               row_number() OVER (PARTITION BY key ORDER BY v, id) AS rn,
               count(*) OVER (PARTITION BY key) AS n
        FROM base
    ) WHERE rn = CAST(floor((n + 1) / 2) AS INT)
),
dev AS (
    SELECT b.id, b.key, b.v, m.med, abs(b.v - m.med) AS ad
    FROM base b JOIN med m USING (key)
),
mad AS (
    SELECT key, ad AS mad FROM (
        SELECT key, ad, id,
               row_number() OVER (PARTITION BY key ORDER BY ad, id) AS rn,
               count(*) OVER (PARTITION BY key) AS n
        FROM dev
    ) WHERE rn = CAST(floor((n + 1) / 2) AS INT)
)
SELECT d.id AS {id_col}, d.key AS {key_col}, d.v AS {val_col}, d.med, t.mad
FROM dev d JOIN mad t USING (key)
WHERE d.ad > {nsigma} * t.mad
"""
