"""Source/sink format parity queries (SURVEY.md §2.1, S1-S3/S7-S9 + JSON).

Each query exercises a real write→read roundtrip through the format the
reference uses (headerless CSV sink ``jobs/vdt1.py:45-47``, ORC
``jobs/vdt3.py:60-61``, CSV scans with/without inference
``jobs/vdt1.py:32-35`` / ``jobs/vdt4.py:29-32``), then returns the rows —
the oracle compares against the original parquet, so the check is
"the roundtrip is lossless".
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import (
    load_table,
    read_csv,
    read_json,
    read_orc,
    write_csv,
    write_json,
    write_orc,
)


def _tmp(prefix: str) -> str:
    path = tempfile.mkdtemp(prefix=f"lakegraft_{prefix}_")
    shutil.rmtree(path, ignore_errors=True)
    return path


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+S2: headerless CSV sink → explicit-schema CSV scan. Doubles
    survive because Spark writes shortest-roundtrip representations."""
    cust = load_table(spark, sf_dir, "customer")
    path = _tmp("csv")
    write_csv(cust, path, header=False)
    return read_csv(
        spark,
        path,
        header=False,
        schema="c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING",
    )


ORACLE_CSV_ROUNDTRIP = "SELECT * FROM customer"


def q_csv_infer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: CSV scan with header + inferSchema=True (the reference's default
    read). Inference narrows small ints, so the projection re-casts to the
    canonical schema — the double-scan inference behavior still runs."""
    cust = load_table(spark, sf_dir, "customer")
    path = _tmp("csvinfer")
    write_csv(cust, path, header=True)
    inferred = read_csv(spark, path, header=True, infer_schema=True)
    return inferred.select(
        F.col("c_custkey").cast("long"),
        F.col("c_name").cast("string"),
        F.col("c_nationkey").cast("int"),
        F.col("c_acctbal").cast("double"),
        F.col("c_mktsegment").cast("string"),
    )


ORACLE_CSV_INFER_ROUNDTRIP = "SELECT * FROM customer"


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+S3: ORC sink (overwrite) → ORC scan; self-describing schema."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp("orc")
    write_orc(orders, path)
    return read_orc(spark, path)


ORACLE_ORC_ROUNDTRIP = "SELECT * FROM orders"


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → explicit-schema JSON scan (r7). Timestamps are
    written/parsed at microsecond precision (Spark's default JSON format
    truncates to millis); doubles survive via shortest-roundtrip
    representations, same as the CSV path. Explicit schema on the read
    skips the inference double-scan a production pipeline can't afford."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp("json")
    write_json(orders, path)
    # the writer's own schema drives the read: JSON is not self-describing
    # (inference widens numerics and can't distinguish TIMESTAMP from
    # TIMESTAMP_NTZ — o_orderdate's flavor depends on the session's
    # parquet NTZ inference), so the roundtrip contract is schema-in=out
    return read_json(spark, path, schema=orders.schema)


ORACLE_JSON_ROUNDTRIP = "SELECT * FROM orders"


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface: extract a field from the events props JSON.
    ``get_json_object`` is the Spark-native path (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


ORACLE_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


FORMAT_QUERIES = {
    "csv_roundtrip": q_csv_roundtrip,
    "csv_infer_roundtrip": q_csv_infer_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
    "json_roundtrip": q_json_roundtrip,
    "json_extract": q_json_extract,
}

FORMAT_ORACLES = {
    "csv_roundtrip": ORACLE_CSV_ROUNDTRIP,
    "csv_infer_roundtrip": ORACLE_CSV_INFER_ROUNDTRIP,
    "orc_roundtrip": ORACLE_ORC_ROUNDTRIP,
    "json_roundtrip": ORACLE_JSON_ROUNDTRIP,
    "json_extract": ORACLE_JSON_EXTRACT,
}
