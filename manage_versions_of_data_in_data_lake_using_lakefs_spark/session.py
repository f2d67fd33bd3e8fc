"""SparkSession factory with scale-aware defaults.

The reference creates sessions ad hoc per job with object-store configs
(``jobs/vdt1.py:19-29``). Here we centralize session construction with
settings chosen for large clusters (AQE, skew handling, Arrow) that also
behave well on ``local[N]`` test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lakegraft",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-minded defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
      and runtime join-strategy demotion to broadcast — critical at 100 TB
      where static planning guesses wrong.
    - Arrow on: any pandas-UDF boundary is batch/columnar, not per-row.
    - Explicit shuffle partitioning: local tests use cpu-count; a real
      cluster would set this (or rely on AQE advisory sizes) per job.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # whole-stage codegen emits one class per plan; long sessions that
        # compile hundreds of plans overflow the default 240 MB JIT code
        # cache, after which the JVM stops compiling and every subsequent
        # query runs partly interpreted (profiled: last-in-suite queries
        # 3-4x slower than the same query in a fresh session)
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
