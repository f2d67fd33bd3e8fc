"""Round-15 build-phase profiler: cProfile one query's build (registry
call -> DataFrame) and exec (noop write), print the top cumulative-time
functions of the build phase plus wall timings.

Usage: python experiments/prof_r15.py <query> [n_runs]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries
from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

name = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark(app_name="prof-r15")
spark.sparkContext.setLogLevel("ERROR")
reg = all_queries()

reg["flagship"](spark, SF).count()  # warm JVM + footers

# untimed warmup of the target
df = reg[name](spark, SF)
df.write.format("noop").mode("overwrite").save()

for i in range(n):
    spark.catalog.clearCache()
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    df = reg[name](spark, SF)
    pr.disable()
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(f"== run {i}: build {t1-t0:.3f}s exec {t2-t1:.3f}s", flush=True)
    if i == n - 1:
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(40)
        print(s.getvalue())

spark.stop()
