"""vdt4-parity ML feature pipeline (SURVEY.md §2 / FIXTURES.md "delta v1").

The reference's ``jobs/vdt4.py`` builds, over a 54-column numeric table:
  id    — rank of ``duration`` ascending        (jobs/vdt4.py:48-49)
  label — duration <= 60 → 0 else 1             (jobs/vdt4.py:50)
  fe1   — row-mean of the broadcast* columns    (jobs/vdt4.py:53-55)
  fe2   — row-mean of the cartesian* columns    (jobs/vdt4.py:58-60)
  fe3   — frequency index of a string column    (jobs/vdt4.py:63-65)
  fe4   — quartile bucket of duration           (jobs/vdt4.py:68-73)

``feature_pipeline`` reproduces that shape over any numeric table,
Spark-first: single-select casts, scalable ranking, SQL string-indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.aggregates import (
    exact_quantiles,
    frequency_index,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.transforms import (
    bucketize,
    cols_with_prefix,
    horizontal_mean,
    with_condition_label,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.windows import global_rank


def feature_pipeline(
    df: DataFrame,
    *,
    target_col: str,
    label_threshold: float,
    mean_prefixes: tuple[str, ...] = (),
    index_col: str | None = None,
    rank_ids: bool = True,
) -> DataFrame:
    """Apply the vdt4 feature stack to ``df``. Small-SF parity version
    (uses ``global_rank`` like the reference; swap in
    ``global_row_number_scalable`` for production pipelines)."""
    out = df
    if rank_ids:
        out = global_rank(out, [F.col(target_col).asc()], out="id")
    out = with_condition_label(
        out, "label", F.col(target_col) <= F.lit(label_threshold), F.lit(0), F.lit(1)
    )
    for i, prefix in enumerate(mean_prefixes, start=1):
        fam = cols_with_prefix(df, prefix)
        if fam:
            out = out.withColumn(f"fe{i}", horizontal_mean(fam))
    if index_col is not None:
        out = frequency_index(
            out.withColumn(index_col, F.col(index_col).cast("string")), index_col, out="fe3"
        )
    qs = exact_quantiles(df, target_col, [0.25, 0.5, 0.75])
    out = bucketize(out, target_col, "fe4", qs)
    return out
