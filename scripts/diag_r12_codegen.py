"""Attribute the recipe lines' cold-pass codegen cost (round-12 "Not yet
optimized" #2).

Each bench pass of a recipe line constructs a fresh Pipeline and runs it;
the janino class cache is keyed on generated source, so structurally
identical passes REUSE compiled classes — only the first pass of a plan
family in the process pays compilation. This diag runs Pipeline.run for
the fineweb recipe three times in one process and, around each pass,
snapshots Spark's CodegenMetrics (generated-class compile time and
source sizes), so the compile share of pass 1 vs passes 2-3 is measured
rather than guessed.

Usage: python scripts/diag_r12_codegen.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("diag-codegen", cpus=cpus)
    spark.range(1).count()

    jvm = spark.sparkContext._jvm
    cg = jvm.org.apache.spark.metrics.source.CodegenMetrics

    def snap():
        return {
            "compile_ms_total": cg.METRIC_COMPILATION_TIME().getSnapshot().getValues(),
            "compile_count": cg.METRIC_COMPILATION_TIME().getCount(),
            "source_count": cg.METRIC_SOURCE_CODE_SIZE().getCount(),
        }

    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yaml_path = os.path.join(repo, "configs", "fineweb_style_recipe.yaml")

    for i in range(3):
        before = snap()
        t0 = time.perf_counter()
        pipe = Pipeline(PipelineConfig.from_yaml(yaml_path))
        res = pipe.run(spark)
        wall = time.perf_counter() - t0
        after = snap()
        new = after["compile_count"] - before["compile_count"]
        vals = sorted(list(after["compile_ms_total"]), reverse=True)
        # histogram values are per-compilation MILLISECONDS in a
        # reservoir; sum-of-top-N is an upper bound on the new compiles'
        # cost, sum-of-bottom-N a lower bound
        hi = sum(vals[:new]) if new else 0
        lo = sum(vals[-new:]) if new else 0
        print(
            f"pass {i + 1}: wall {wall:6.2f}s  new_compiled_classes {new:3d}  "
            f"compile_ms [{lo:6.0f} .. {hi:6.0f}]  "
            f"total_classes {after['compile_count']}"
        )


if __name__ == "__main__":
    main()
