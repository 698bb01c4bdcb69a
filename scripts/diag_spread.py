"""Attribute the topk_cosine / text_exact_dedup bench spreads (VERDICT r8
task #8): their r8 driver spreads ([0.38, 3.33], [0.49, 2.36]) were the
widest on the board. Hypotheses: (a) host contention (the r8 artifact's
known failure mode), (b) pass-1 cold cost — plan/codegen compilation,
Python-worker spin-up, and page-cache fill — that later passes don't pay.

Method: fresh tuned session (the bench's own get_spark), pgrep-verified
idle host, then for each query FIVE timed passes exactly like the bench's
loop (re-plan + re-execute each pass; only JVM JIT / page cache / worker
pool carry over). If pass 1 is the only outlier and passes 2-5 are tight,
the spread's max is cold-start, not noise or contention — the bench's
published min is the representative number and the [min, max] band is
doing its job (disclosing the cold pass), not hiding a regression.

Run: python scripts/diag_spread.py [sf_dir]  (writes stdout; commit as
scripts/diag_spread.out)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = ["topk_cosine", "text_exact_dedup"]
PASSES = 5


def main() -> None:
    foreign = subprocess.run(
        ["pgrep", "-x", "java"], capture_output=True, text=True
    ).stdout.split()
    print(f"host check: {len(foreign)} java process(es) before session start")

    from mega_data_factory_spark.plans import all_queries, retired_queries
    from mega_data_factory_spark.session import get_spark, load_tables, TABLES

    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for _, df in load_tables(spark, SF, TABLES).items():
        df.count()  # the bench's table warm-up (file listing + page cache)

    qs = {**all_queries(), **retired_queries()}  # topk_cosine is a retired bench line
    for name in QUERIES:
        fn = qs[name]
        series = []
        for i in range(PASSES):
            t0 = time.perf_counter()
            n = fn(spark, SF).count()
            series.append(time.perf_counter() - t0)
        steady = series[1:]
        print(
            f"{name}: passes {[round(t, 3) for t in series]} ({n} rows) — "
            f"pass1/steady-min = {series[0] / min(steady):.2f}x, "
            f"steady spread [{min(steady):.3f}, {max(steady):.3f}] "
            f"({max(steady) / min(steady):.2f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
