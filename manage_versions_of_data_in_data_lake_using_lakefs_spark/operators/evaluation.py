"""Classifier evaluation: exact ROC-AUC and threshold confusion metrics.

The engine trains models in-engine (operators/classifier.py); a curation
pipeline also has to *evaluate* them — and at 100 TB the textbook
"sort all scores globally, walk the ROC curve" approach is a
single-machine habit. Both metrics here are exact and shuffle-bounded:

- **AUC** is the Mann-Whitney statistic: the probability a random
  positive outscores a random negative, ties counting half. Computed
  WITHOUT a global row sort: group rows by distinct score (one
  hash-aggregation over the data), then one window over the DISTINCT
  SCORES ONLY — a frame that is |score domain| rows, not |data| rows
  (integer-ppm scores: ≤ 10⁶ + 1 regardless of table size). Pair sums
  accumulate in ``decimal(38,0)`` — n⁺·n⁻ overflows int64 past ~10⁹
  rows per class.
- **Confusion metrics** at a threshold are one aggregation pass.

Exactness discipline: all outputs are integers (counts and
parts-per-million via positive integer division), identical in the
DuckDB oracle — the twins are kept adjacent, the codebase rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PPM = 1_000_000

#: ceiling on the distinct-score domain the unpartitioned prefix-sum
#: window may collapse onto one task — 2× the ppm-integer domain, so
#: every score column the engine itself produces passes with headroom
MAX_SCORE_DOMAIN = 2 * _PPM + 1


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_distinct_scores: int | None = MAX_SCORE_DOMAIN,
) -> DataFrame:
    """One row: (n_pos, n_neg, auc_ppm) — exact rank-based ROC-AUC.
    NULL scores carry no ranking signal and Spark/DuckDB disagree on
    their ORDER BY placement — excluded up front (same rule as
    operators/anomaly.py).

    The one-window prefix sum over the DISTINCT SCORES is the fast path
    while the score domain is bounded (the engine's own classifier
    emits ppm integers: ≤ 10⁶ + 1 values at any table size). Raw float
    scores make the domain approach |data| and would collapse that
    window onto one task — so the domain is counted first (one extra
    aggregation pass, run eagerly) and an over-cap column AUTOMATICALLY
    reroutes through a range-partitioned prefix sum (the
    ``global_row_number_scalable`` pattern: range-partition the distinct
    scores, local prefix sums, per-partition offsets from a
    #partitions-row aggregate) — exact for ANY score domain, never a
    single-task window. ``max_distinct_scores=None`` skips the counting
    pass and trusts the one-window path (callers with known-bounded
    domains)."""
    df = df.where(F.col(score_col).isNotNull())
    per_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("np"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("nn"),
    )
    if max_distinct_scores is not None:
        # the guard must run eagerly (the plan SHAPE branches on it), but
        # a bare limit().count() on a grouped frame does NOT short-circuit
        # the shuffle — it would re-execute the caller's upstream pipeline
        # a second time when the result is consumed. Persisting the
        # grouped frame makes the guard's job double as the cache
        # materialization: upstream runs ONCE, and the whole computation
        # finishes eagerly inside try/finally so the cache entry is
        # RELEASED before returning (a lazy return would either leak one
        # cache entry per call or recompute upstream twice). The final
        # division runs driver-side on exact Python ints — same
        # truncation semantics as the lazy path's decimal `div`.
        per_score = per_score.persist()
        try:
            n_domain = per_score.count()
            totals = _auc_totals(
                per_score, scalable=n_domain > max_distinct_scores
            )
            row = totals.collect()[0]
        finally:
            per_score.unpersist(blocking=False)
        # empty input: SUM over zero rows is NULL — keep NULL (not 0) so
        # this path agrees with the lazy path and the DuckDB twin
        nps = int(row["nps"]) if row["nps"] is not None else None
        nns = int(row["nns"]) if row["nns"] is not None else None
        auc = (
            (int(row["u2s"]) * _PPM) // (2 * nps * nns)
            if nps and nns
            else None
        )
        spark = df.sparkSession
        return spark.range(1).select(
            F.lit(nps).cast("long").alias("n_pos"),
            F.lit(nns).cast("long").alias("n_neg"),
            F.lit(auc).cast("long").alias("auc_ppm"),
        )
    return _auc_result(per_score)


def _auc_totals(per_score: DataFrame, scalable: bool) -> DataFrame:
    """(nps, nns, u2s) decimal totals over the grouped per-score frame."""
    if scalable:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.windows import ranged_prefix_sum

        # distinct scores ⇒ unique order keys, the helper's contract
        cum = ranged_prefix_sum(per_score, "s", "nn", "_cum")
        u2 = cum.select(
            (
                F.col("np").cast("decimal(38,0)")
                * (F.lit(2) * F.col("_cum") + F.col("nn").cast("decimal(38,0)"))
            ).alias("u2"),
            "np",
            "nn",
        )
    else:
        w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        u2 = per_score.select(
            (
                F.col("np").cast("decimal(38,0)")
                * (
                    F.lit(2) * F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("decimal(38,0)")
                    + F.col("nn").cast("decimal(38,0)")
                )
            ).alias("u2"),
            "np",
            "nn",
        )
    return u2.agg(
        F.sum("np").cast("decimal(38,0)").alias("nps"),
        F.sum("nn").cast("decimal(38,0)").alias("nns"),
        F.sum("u2").alias("u2s"),
    )


def _auc_result(per_score: DataFrame) -> DataFrame:
    """Lazy (n_pos, n_neg, auc_ppm) plan over the grouped frame — only
    the guard-skipping (known-bounded-domain) path uses it, so it is
    always the one-window flavor; the scalable flavor is consumed
    eagerly inside ``binary_auc``."""
    totals = _auc_totals(per_score, scalable=False)
    # `div` (integral division) on decimals — truncation semantics match
    # DuckDB's `//`; a float or decimal `/` would ROUND the quotient
    return totals.select(
        F.col("nps").cast("long").alias("n_pos"),
        F.col("nns").cast("long").alias("n_neg"),
        F.expr(f"(u2s * {_PPM}) div (2 * nps * nns)").cast("long").alias("auc_ppm"),
    )


def binary_auc_sql(
    table_expr: str, score_col: str, label_col: str, extra_ctes: str = ""
) -> str:
    """DuckDB twin of ``binary_auc`` (kept adjacent). ``table_expr`` is a
    table name or a parenthesized subquery producing (score, label);
    ``extra_ctes`` (ending with a comma) lets the caller prepend the
    CTEs that produce it."""
    return f"""
WITH {extra_ctes}per_score AS (
    SELECT {score_col} AS s,
           CAST(SUM({label_col}) AS HUGEINT) AS np,
           CAST(SUM(1 - {label_col}) AS HUGEINT) AS nn
    FROM {table_expr} WHERE {score_col} IS NOT NULL GROUP BY 1
),
u AS (
    SELECT np, nn,
           np * (2 * COALESCE(SUM(nn) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + nn) AS u2
    FROM per_score
)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST(SUM(u2) * {_PPM} // (2 * SUM(np) * SUM(nn)) AS BIGINT) AS auc_ppm
FROM u
"""


def confusion_metrics(
    df: DataFrame, score_col: str, label_col: str, threshold
) -> DataFrame:
    """One row: tp/fp/tn/fn counts + precision/recall/F1 in ppm at
    ``score >= threshold``. One aggregation pass, integer-exact."""
    pred = (F.col(score_col) >= F.lit(threshold)).cast("long")
    y = F.col(label_col).cast("long")
    agg = df.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
        F.sum((1 - pred) * y).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.expr(f"tp * {_PPM} div (tp + fp)").alias("precision_ppm"),
        F.expr(f"tp * {_PPM} div (tp + fn)").alias("recall_ppm"),
        F.expr(f"2 * tp * {_PPM} div (2 * tp + fp + fn)").alias("f1_ppm"),
    )


def confusion_metrics_sql(
    table_expr: str, score_col: str, label_col: str, threshold, extra_ctes: str = ""
) -> str:
    """DuckDB twin of ``confusion_metrics`` (kept adjacent)."""
    return f"""
WITH {extra_ctes}agg AS (
    SELECT
        CAST(SUM(CASE WHEN {score_col} >= {threshold} AND {label_col} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN {score_col} >= {threshold} AND {label_col} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN {score_col} <  {threshold} AND {label_col} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(SUM(CASE WHEN {score_col} <  {threshold} AND {label_col} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM {table_expr}
)
SELECT tp, fp, tn, fn,
       tp * {_PPM} // (tp + fp) AS precision_ppm,
       tp * {_PPM} // (tp + fn) AS recall_ppm,
       2 * tp * {_PPM} // (2 * tp + fp + fn) AS f1_ppm
FROM agg
"""
