"""Dump explain('formatted') for EVERY declared query into
plans/r13/<query>_<suffix>.txt — the round-13 plan evidence the judge
diffs against the code.

Usage: python scripts/gen_r13_plans.py [before|after] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gen-r13-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    import __spark_entry__ as e

    jvm = spark.sparkContext._jvm
    for name, fn in e.queries().items():
        df = fn(spark, sf)
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name:34s} {len(plan.splitlines())} lines")


if __name__ == "__main__":
    main()
