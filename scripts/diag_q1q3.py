"""Diagnostic: explain + time q1/q3 at sf0.1 (VERDICT r4 Wrong #2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark
from mega_data_factory_spark.plans.relational import q1_pricing_summary, q3_segment_revenue

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("WARN")

for name, fn in [("q1", q1_pricing_summary), ("q3", q3_segment_revenue)]:
    df = fn(spark, SF)
    print(f"===== {name} explain(formatted) =====")
    df.explain("formatted")
    # warm-up then 3 timed passes
    df2 = fn(spark, SF)
    df2.collect()
    times = []
    for _ in range(3):
        d = fn(spark, SF)
        t0 = time.perf_counter()
        d.collect()
        times.append(time.perf_counter() - t0)
    print(f"{name} times: {[round(t,3) for t in times]} min={min(times):.3f}")
spark.stop()
