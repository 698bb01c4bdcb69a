"""r13 session-2 diag: where does column_profile_sketch's wall go?

Phase split of ONE sketch-path pass (the bench block body) per table, plus
the pure driver-side plan-build latency of ColumnProfiler.profile /
top_values (py4j call-count bound, the r12 twin-batch hypothesis applied
to the profiling operator).

Usage: python scripts/diag_r13b_profile_build.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cpus=32)
    from mega_data_factory_spark.operators.profiling import (
        ColumnProfiler,
        sample_parquet_files,
    )

    tmp = tempfile.mkdtemp(prefix="mdf_diag_profile_")
    import shutil

    try:
        prof_dirs = {}
        for name, df in load_tables(spark, sf_dir, ("lineitem", "orders")).items():
            df.repartition(int(spark.sparkContext.defaultParallelism)).write.option(
                "maxRecordsPerFile", 50_000
            ).mode("overwrite").parquet(f"{tmp}/{name}")
            prof_dirs[name] = f"{tmp}/{name}"

        cat_cols = {"lineitem": "l_returnflag", "orders": "o_orderpriority"}

        # ---- phase split, 3 passes, report per-phase minima
        phases: dict[str, float] = {}

        def mark(key: str, dt: float) -> None:
            phases[key] = min(phases.get(key, float("inf")), dt)

        for _ in range(3):
            for name, path in prof_dirs.items():
                t0 = time.perf_counter()
                s = sample_parquet_files(spark, path, byte_budget=8 << 20, small_table_factor=0)
                mark(f"{name}.sample_build", time.perf_counter() - t0)

                t0 = time.perf_counter()
                s.count()
                mark(f"{name}.sample_count", time.perf_counter() - t0)

                prof = ColumnProfiler()
                t0 = time.perf_counter()
                pdf = prof.profile(s)
                mark(f"{name}.profile_planbuild", time.perf_counter() - t0)
                t0 = time.perf_counter()
                pdf.count()
                mark(f"{name}.profile_exec", time.perf_counter() - t0)

                tv = ColumnProfiler([cat_cols[name]])
                t0 = time.perf_counter()
                tvdf = tv.top_values(s, k=5, support=0.01, count_candidates=True)
                mark(f"{name}.top_values_build+freqItems", time.perf_counter() - t0)
                t0 = time.perf_counter()
                tvdf.count()
                mark(f"{name}.top_values_count_exec", time.perf_counter() - t0)

        total = sum(phases.values())
        print(f"== phase split (min of 3 passes), sum={total:.3f}s")
        for k, v in phases.items():
            print(f"  {k:38s} {v*1000:8.1f} ms")

        # ---- pure plan-build latency of profile() on a static frame
        li = spark.read.parquet(prof_dirs["lineitem"])
        prof = ColumnProfiler()
        builds = []
        for _ in range(5):
            t0 = time.perf_counter()
            prof.profile(li)
            builds.append(time.perf_counter() - t0)
        print(f"profile() plan build lineitem (16 cols): min {min(builds)*1000:.1f} ms of 5")

        od = spark.read.parquet(prof_dirs["orders"])
        builds = []
        for _ in range(5):
            t0 = time.perf_counter()
            prof.profile(od)
            builds.append(time.perf_counter() - t0)
        print(f"profile() plan build orders (9 cols):   min {min(builds)*1000:.1f} ms of 5")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
