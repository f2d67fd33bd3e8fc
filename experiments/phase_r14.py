"""Round-14 phase attribution: split each bench query's wall time into
BUILD (registry call -> DataFrame: fixture staging, driver-paced
iterations, plan construction) vs EXEC (the noop write).

Usage: python experiments/phase_r14.py [query ...]   (default: bench set)
Prints one JSON: {name: {"build": [..sorted..], "exec": [..]}}.
Methodology matches bench.py: one untimed warmup, then N timed runs,
clearCache() between runs, ERROR log level, same session factory.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries
from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PHASE_N", "3"))

spark = get_spark(app_name="phase-r14")
spark.sparkContext.setLogLevel("ERROR")
reg = all_queries()

names = sys.argv[1:]
if not names:
    # a hardcoded slice of the bench headline set, in bench.py order
    names = [
        "corpus_prep",
        "classifier_quality",
        "multimodal_jpeg_suite",
        "dedup_embedding_cosine",
        "dedup_incremental",
        "dedup_embedding_cosine_hier",
        "versioned_copy_into",
        "graph_pagerank",
        "fuzzy_join_editdist",
        "sim_topk_ivfpq_refined",
        "versioned_dv_merge",
        "flagship",
        "agg_sum",
    ]

reg["flagship"](spark, SF).count()  # warm the JVM + parquet footers

res = {}
for name in names:
    builds, execs = [], []
    for i in range(N + 1):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = reg[name](spark, SF)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        if i > 0:
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
    res[name] = {"build": sorted(builds), "exec": sorted(execs)}
    print(f"# {name}: build {min(builds):.2f}s exec {min(execs):.2f}s", file=sys.stderr)

print(json.dumps(res, indent=1))
spark.stop()
