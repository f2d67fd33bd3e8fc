"""Reader/writer surface (SURVEY.md §2.1, S1-S10).

Covers the reference's IO option surface — CSV with/without schema
inference (``jobs/vdt1.py:32-35``, ``jobs/vdt4.py:29-32``), ORC
(``jobs/vdt1.py:37-38``), Parquet (``jobs/vdt2.py:42-43``), headerless CSV
sink (``jobs/vdt1.py:45-47``), overwrite-mode sinks — as thin, explicit
wrappers over ``spark.read`` / ``df.write``. Versioned (Delta-like) IO
lives in ``versioning/``; the ``lakefs://`` connector (S11) is replaced by
branch-scoped paths there.

Scale notes: ``inferSchema=True`` is supported for parity but discouraged —
it double-scans the file (SURVEY.md §4 "known inefficiencies"); prefer an
explicit ``StructType``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: Tables the driver testdata ships (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (parquet).

    ``events.parquet``'s ``ts`` encoding has varied across driver testdata
    generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects) and naive ``timestamp[us]`` (which Spark 4 surfaces as
    TIMESTAMP_NTZ, breaking ``unix_micros``-based queries). Normalize both
    to a plain TimestampType column whose ``unix_micros`` equal the stored
    values regardless of the caller session's timezone: nanos are read as
    long (runtime conf) and integer-divided; naive micros are read with
    NTZ inference off, which keeps the raw micros unshifted.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # SCOPED conf change: both confs are consumed when spark.read
        # infers the parquet schema (verified for the nanos and the naive-
        # micros generation: the built DataFrame collects correctly after
        # restore), so save/restore here keeps the session's behavior for
        # every other parquet read unchanged.
        confs = {
            "spark.sql.legacy.parquet.nanosAsLong": "true",
            "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        }
        saved: dict[str, str | None] = {}
        for k, v in confs.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)
        try:
            df = spark.read.parquet(path)
        finally:
            for k, old in saved.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
        ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
        if ts_field is not None and isinstance(ts_field.dataType, LongType):
            # integer DIV, not float /: nanos exceed double's 53-bit exact
            # range, so float division rounds the low microsecond up on
            # ~half the rows while parquet readers (and DuckDB) truncate
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several testdata tables at once; all of them when no names given."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


# --- readers (S1-S4) -------------------------------------------------------

def read_csv(
    spark: SparkSession,
    path: str,
    *,
    header: bool = True,
    schema: StructType | str | None = None,
    infer_schema: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV scan. Explicit ``schema`` > ``infer_schema`` > all-string columns."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


#: microsecond-precision timestamp formats for JSON IO — Spark's defaults
#: write milliseconds, silently truncating micro-precision timestamps.
#: TIMESTAMP carries an offset (XXX); TIMESTAMP_NTZ has none by definition.
_JSON_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_JSON_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _json_ts_opts(rw):
    return rw.option("timestampFormat", _JSON_TS_FMT).option(
        "timestampNTZFormat", _JSON_NTZ_FMT
    )


def read_json(
    spark: SparkSession, path: str, *, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines scan. Explicit ``schema`` avoids the inference
    double-scan (and its numeric widening; inference also can't tell
    TIMESTAMP from TIMESTAMP_NTZ — pass the writer's schema back);
    timestamps parse at microsecond precision to match the writer."""
    reader = _json_ts_opts(spark.read)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, Spark-standard)."""
    _json_ts_opts(df.write.mode(mode)).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# --- writers (S7-S9) -------------------------------------------------------

def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = False,
    mode: str = "overwrite",
    sep: str = ",",
) -> None:
    """CSV sink; reference writes headerless comma-separated (``jobs/vdt1.py:45-47``)."""
    df.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def write_parquet(
    df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed managed table: pre-hash-partitioned (and optionally
    pre-sorted) on the join/agg key.

    The at-scale payoff: two tables bucketed on the same key with the same
    bucket count join with NO Exchange on either side — the shuffle was
    paid once at write time and amortizes over every downstream join/agg
    (see tests/test_advanced.py for the plan assertion). This is the
    Spark-native equivalent of the co-located table layout a 100 TB fact
    store needs for repeated key joins.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
