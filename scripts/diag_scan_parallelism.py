"""Diagnostic: attribute the steep text-query slopes at the 100x dir to the
single-file test-data layout, with a measured counterfactual.

BENCH_SCALE.json's note claims the >2x residual slopes on document-CPU
queries (url_filter_full, text_exact_dedup) are a test-FILE artifact —
`make_scaled_sf.py` writes each table as ONE parquet file, and a single
row-group caps Spark's scan parallelism regardless of cores, while any real
corpus has thousands of input splits. This script proves the claim: it
clones the sf10 dir with `documents` rewritten as 32 files (data identical)
and times both queries against each layout. The engine is untouched — the
delta is purely `spark.sql.files` split planning doing its job when the
storage layout allows it.

Run: python scripts/diag_scan_parallelism.py
(needs /root/repo/.localdata/sf10 from scripts/make_scaled_sf.py 100)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.plans.curation import text_exact_dedup
from mega_data_factory_spark.plans.join_queries import url_filter_full
from mega_data_factory_spark.session import get_spark

SF10 = "/root/repo/.localdata/sf10"
MF = "/root/repo/.localdata/sf10_multifile"

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("WARN")
spark.range(1).count()

os.makedirs(MF, exist_ok=True)
for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"):
    dst = f"{MF}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SF10}/{t}.parquet", dst)
if not os.path.exists(f"{MF}/documents.parquet"):
    spark.read.parquet(f"{SF10}/documents.parquet").repartition(32).write.parquet(f"{MF}/documents.parquet")

for name, fn in (("url_filter_full", url_filter_full), ("text_exact_dedup", text_exact_dedup)):
    for d, label in ((SF10, "1-file documents"), (MF, "32-file documents")):
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, d).count()
            dt = min(dt, time.perf_counter() - t0)
        n_splits = spark.read.parquet(f"{d}/documents.parquet").rdd.getNumPartitions()
        print(f"{name:18s} {label:18s} min-of-2 {dt:6.2f}s  (scan partitions: {n_splits})")
spark.stop()
