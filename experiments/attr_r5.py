"""Round-5 attribution of the BENCH_r04 regressions (VERDICT item 1).

Times the regressed queries n times each in a fresh session (same
settings as bench.py), then re-times sim_topk_ivf with the round-4
``_persisted()`` wrappers neutralized, to separate cache-materialization
cost from machine/session noise. Prints one JSON with sorted run lists.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries
from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark
import manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity as sim

SF = "/root/testdata/sf0.1"
N = 5

spark = get_spark(app_name="attr-r5")
spark.sparkContext.setLogLevel("ERROR")
reg = all_queries()


def run(name: str, n: int = N) -> list[float]:
    ts = []
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        reg[name](spark, SF).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    return sorted(ts)


reg["flagship"](spark, SF).count()  # warm

res = {}
for name in ["sim_topk_ivf", "corpus_prep", "decontaminate", "dedup_simhash", "text_quality"]:
    res[name + ":fresh"] = run(name)

orig = sim._persisted
sim._persisted = lambda df: df
res["sim_topk_ivf:nopersist"] = run("sim_topk_ivf")
sim._persisted = orig

print(json.dumps(res, indent=1))
spark.stop()
