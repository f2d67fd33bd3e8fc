"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python experiments/dump_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from
$PLAN_SUFFIX (default "before").
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries
from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

tag = sys.argv[1]
names = sys.argv[2:]
suffix = os.environ.get("PLAN_SUFFIX", "before")
outdir = os.path.join("/root/repo/plans", tag)
os.makedirs(outdir, exist_ok=True)

spark = get_spark(app_name=f"plans-{tag}")
spark.sparkContext.setLogLevel("ERROR")
reg = all_queries()

for name in names:
    try:
        df = reg[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception as e:  # keep going; record the failure
        plan = f"ERROR building {name}: {e}"
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote {name}_{suffix}.txt", file=sys.stderr)

spark.stop()
