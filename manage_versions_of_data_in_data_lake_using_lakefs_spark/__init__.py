"""lakegraft — a PySpark-native versioned-lakehouse analytics engine.

Re-expresses the capabilities of the reference repo
``ducanhMU/Manage-versions-of-data-in-Data-Lake-using-LakeFS`` (a lakeFS + Spark +
Delta data-lake versioning pipeline; see SURVEY.md) as an idiomatic,
standalone PySpark package:

- ``sources``    — reader/writer surface (csv/orc/parquet/json + versioned tables)
- ``operators``  — relational + pipeline operators (joins, aggs, windows,
                   dedup, similarity, text analysis, feature engineering)
- ``functions``  — scalar/column helper functions
- ``versioning`` — Git-like branch/commit/time-travel/diff/merge over
                   parquet tables with a JSON transaction log (the
                   Spark-native replacement for lakeFS + Delta)
- ``streaming``  — Structured Streaming equivalents for the batch ops
- ``plans``      — plan inspection / optimization guardrails

Everything is DataFrame-first: operators build declarative plans and let
Catalyst pick physical strategies; Python UDFs are avoided in hot paths.
"""

from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
