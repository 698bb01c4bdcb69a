"""Round-12 diag (r11 verdict #7): the q5 family's 100x slope (7.2-11.2 at
sf10) is the suite's steepest non-export group. This measures, at sf10
with auto-broadcast off (the bench line's configuration), whether

  (a) a SHUFFLE_HASH hint on the orders side (skips both sorts), or
  (b) co-bucketing orders/lineitem at higher bucket counts (32 -> 64 ->
      128 — more parallelism per bucket-local join task),

moves the lineitem-orders join core below the sort-merge-join baseline,
or whether the fact-fact join is shuffle/scan-bound and correctly so.

Each variant is timed min-of-2 full plan+execute passes; exchange counts
come from the formatted plan (bucketed variants must show ZERO pre-join
exchanges or the layout isn't engaging). Output: scripts/diag_q5_sf10_buckets.out
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mega_data_factory_spark.session import get_spark, load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"


def q5_core(l, o):
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def n_exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return len(re.findall(r"\(\d+\) Exchange", plan))


def timed(df_fn) -> float:
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df_fn().collect()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main() -> None:
    spark = get_spark("mdf-diag-q5", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR, ("lineitem", "orders"))
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    od = t["orders"].select("o_orderkey", "o_orderdate")
    n_li, n_od = li.count(), od.count()
    print(f"sf_dir={SF_DIR} lineitem={n_li:,} orders={n_od:,}")

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    results: dict[str, tuple[float, int]] = {}
    try:
        # (1) baseline: sort-merge over two fact shuffles (the bench line)
        results["smj_plain"] = (timed(lambda: q5_core(li, od)), n_exchanges(q5_core(li, od)))

        # (2) shuffle-hash hint: same two shuffles, no sorts — builds a
        # hash map per partition from the (smaller) orders side
        od_h = od.hint("SHUFFLE_HASH")
        results["shuffle_hash"] = (
            timed(lambda: q5_core(li, od_h)),
            n_exchanges(q5_core(li, od_h)),
        )

        # (3) co-bucketed layouts at 32/64/128 buckets: zero pre-join
        # exchanges; higher counts = more parallel bucket-join tasks
        for n_buckets in (32, 64, 128):
            wh = tempfile.mkdtemp(prefix=f"mdf_q5b{n_buckets}_")
            try:
                for tbl in ("dq5_bl", "dq5_bo"):
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                li.write.mode("overwrite").option("path", f"{wh}/bl").bucketBy(
                    n_buckets, "l_orderkey"
                ).sortBy("l_orderkey").saveAsTable("dq5_bl")
                od.write.mode("overwrite").option("path", f"{wh}/bo").bucketBy(
                    n_buckets, "o_orderkey"
                ).sortBy("o_orderkey").saveAsTable("dq5_bo")
                bl, bo = spark.table("dq5_bl"), spark.table("dq5_bo")
                results[f"bucketed_{n_buckets}"] = (
                    timed(lambda: q5_core(bl, bo)),
                    n_exchanges(q5_core(bl, bo)),
                )
            finally:
                for tbl in ("dq5_bl", "dq5_bo"):
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                shutil.rmtree(wh, ignore_errors=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)

    print(f"{'variant':<16} {'sec':>8} {'exchanges':>10}")
    for k, (sec, ex) in results.items():
        print(f"{k:<16} {sec:>8.3f} {ex:>10}")


if __name__ == "__main__":
    main()
