"""Query registry: every implemented operator as (Spark build, DuckDB oracle).

``all_queries()`` / ``all_oracles()`` are what ``__spark_entry__.py``
exposes to the driver. Keys without an oracle entry get the weaker
rows-only check (non-SQL-expressible ops: versioning, streaming state,
multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.relational import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(RELATIONAL_QUERIES)
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.extensions import EXTENSION_QUERIES

        out.update(EXTENSION_QUERIES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.versioned import VERSIONED_QUERIES

        out.update(VERSIONED_QUERIES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.pipeline import PIPELINE_QUERIES

        out.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.formats import FORMAT_QUERIES

        out.update(FORMAT_QUERIES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import ADVANCED_QUERIES

        out.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.extensions import EXTENSION_ORACLES

        out.update(EXTENSION_ORACLES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.pipeline import PIPELINE_ORACLES

        out.update(PIPELINE_ORACLES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.formats import FORMAT_ORACLES

        out.update(FORMAT_ORACLES)
    except ImportError:
        pass
    try:
        from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import ADVANCED_ORACLES

        out.update(ADVANCED_ORACLES)
    except ImportError:
        pass
    return out
