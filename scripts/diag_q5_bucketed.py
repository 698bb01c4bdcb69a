"""Measure the bucketed-layout answer to q5's fact-fact shuffle join.

q5 is the suite's only large⋈large join (lineitem ⋈ orders) and the
steepest attributed slope in BENCH_SCALE.json: the adaptive shuffle plan
is CORRECT for the shape (diag_q5_sf10.out), so the remaining lever is
LAYOUT — write both facts bucketed+sorted by the join key once, and every
subsequent join runs co-located with zero exchanges. This script turns
that claim (README "Scale design", test_storage_layout.py plan
assertions) into a measured wall-time datapoint at the 10x scale dir.

    python scripts/diag_q5_bucketed.py [sf_dir] > scripts/diag_q5_bucketed.out

Method: the q5 join core (lineitem ⋈ orders on orderkey -> revenue by
order-year) is timed three ways on the same data: (a) plain parquet
(the shuffle plan the bench measures), (b) bucketed tables, joined with
broadcast disabled so the co-located SortMergeJoin is what's measured,
(c) the one-time bucketed-write cost, to show the amortization point.
min-of-2 timing after a warm-up pass, mirroring bench.py methodology.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mega_data_factory_spark.session import get_spark

BUCKETS = 32


def q5_core(lineitem, orders):
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy("o_year")
    )


def timed(fn, passes=2):
    fn()  # warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    spark = get_spark("diag-q5-bucketed", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_orderdate")
    n_li, n_o = li.count(), orders.count()
    print(f"# data: {sf_dir} lineitem={n_li} orders={n_o}")

    import re

    def n_exchanges(df) -> int:
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        return len(re.findall(r"\(\d+\) Exchange", plan))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain_ex = n_exchanges(q5_core(li, orders))
        t_plain = timed(lambda: q5_core(li, orders).collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    print(f"plain_parquet_shuffle_join: {t_plain:.3f}s ({plain_ex} exchanges)")

    import tempfile

    wh = tempfile.mkdtemp(prefix="q5_bucketed_")
    t0 = time.perf_counter()
    (
        li.write.mode("overwrite").option("path", f"{wh}/bl")
        .bucketBy(BUCKETS, "l_orderkey").sortBy("l_orderkey").saveAsTable("diag_bl")
    )
    (
        orders.write.mode("overwrite").option("path", f"{wh}/bo")
        .bucketBy(BUCKETS, "o_orderkey").sortBy("o_orderkey").saveAsTable("diag_bo")
    )
    t_write = time.perf_counter() - t0
    print(f"one_time_bucketed_write: {t_write:.3f}s ({BUCKETS} buckets, sorted)")

    bl, bo = spark.table("diag_bl"), spark.table("diag_bo")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_ex = n_exchanges(q5_core(bl, bo))
        print(
            f"# bucketed plan: {bucketed_ex} exchanges vs {plain_ex} plain — the join's "
            f"two fact shuffles are gone; what remains is the post-join aggregate exchange"
        )
        t_bucketed = timed(lambda: q5_core(bl, bo).collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("diag_bl", "diag_bo"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(f"bucketed_colocated_join: {t_bucketed:.3f}s")
    print(
        f"# speedup {t_plain / t_bucketed:.2f}x per join; write cost amortizes after "
        f"~{max(1.0, t_write / max(t_plain - t_bucketed, 1e-9)):.1f} joins"
    )


if __name__ == "__main__":
    main()
