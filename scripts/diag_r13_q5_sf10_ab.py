"""Round-13 diag (r12 verdict Next #3): interleaved A/B of the AQE
sort-merge -> shuffled-hash conversion on the q5 fact-fact join core at
sf10 — the round-12 decision was sf0.1-decisive only; this settles whether
the session default (maxShuffledHashJoinLocalMapThreshold=64MB) helps,
hurts, or is noise at the 100x local scale.

Interleaved passes (A,B,A,B,...) in ONE session so host drift hits both
arms equally; auto-broadcast off (the bench line's configuration); min and
median reported per arm. Output: scripts/diag_r13_q5_sf10_ab.out

Usage: python scripts/diag_r13_q5_sf10_ab.py [sf_dir] [--passes 4]
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mega_data_factory_spark.session import get_spark, load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
PASSES = 4


def q5_core(l, o):
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def join_nodes(df) -> list[str]:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return re.findall(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def main() -> None:
    spark = get_spark("diag-r13-q5-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    t = load_tables(spark, SF_DIR, ("lineitem", "orders"))
    l, o = t["lineitem"], t["orders"]
    l.count(), o.count()  # warm page cache / footers

    arms = {
        "aqe_shj_64m": str(64 * 1024 * 1024),  # the shipped session default
        "smj_only": "0",                        # conversion off
    }
    results: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(PASSES):
        for name, thresh in arms.items():
            spark.conf.set(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", thresh
            )
            spark.sparkContext.setJobDescription(f"q5_core {name} pass{i}")
            t0 = time.perf_counter()
            q5_core(l, o).collect()
            results[name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    lines = [
        f"# q5_core fact-fact join at {SF_DIR} (local[{spark.sparkContext.defaultParallelism}], "
        f"broadcasts off, {PASSES} interleaved passes per arm)"
    ]
    for name, ts in results.items():
        lines.append(
            f"{name:14s} min {min(ts):6.3f}s  median {statistics.median(ts):6.3f}s  "
            f"passes {[round(x, 3) for x in ts]}"
        )
    # final-plan join strategy per arm (initial plan always says SMJ; the
    # conversion is an AQE runtime rewrite, so re-run one pass and read the
    # executed plan from the SQL-tab string)
    for name, thresh in arms.items():
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", thresh)
        df = q5_core(l, o)
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        joins = re.findall(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
        lines.append(f"{name:14s} executed-plan joins: {sorted(set(joins))}")
    out = "\n".join(lines) + "\n"
    print(out)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "diag_r13_q5_sf10_ab.out"), "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
