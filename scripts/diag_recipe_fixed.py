"""Phase-split of the recipe-pipeline bench lines' FIXED cost (round 12).

scripts/diag_fineweb.out showed a stages[:1] (two DISABLED ops) run costs
~3.3s at sf0.1 — pure machinery, no operator work. This script attributes
that fixed cost: plan build + analysis, tagged-frame persist, passed sink
write, rejected sink write, metrics write, store update, teardown.

Usage: python scripts/diag_recipe_fixed.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.config import PipelineConfig, SinkConfig
from mega_data_factory_spark.plans.pipeline import Pipeline
from mega_data_factory_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("diag-recipe-fixed", cpus=cpus)
    spark.range(1).count()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "configs", "fineweb_style_recipe.yaml")) as f:
        text = f.read()

    tmp = tempfile.mkdtemp(prefix="mdf_diag_fixed_")
    try:
        for label, keep_stages in (("disabled-ops-only", 1), ("full-recipe", None)):
            cfg = PipelineConfig.from_yaml(text)
            if keep_stages is not None:
                cfg.stages = cfg.stages[:keep_stages]
            cfg.source.path = f"{sf_dir}/documents.parquet"
            cfg.sink = SinkConfig(path=f"{tmp}/{label}/out", mode="overwrite")
            cfg.rejected_sink = SinkConfig(path=f"{tmp}/{label}/rej", mode="overwrite")
            cfg.metrics_path = f"{tmp}/{label}/metrics"

            for rep in range(2):
                marks: list[tuple[str, float]] = []

                def mark(name: str, t0: float) -> None:
                    marks.append((name, time.perf_counter() - t0))

                t0 = time.perf_counter()
                pipe = Pipeline(cfg)
                mark("construct", t0)

                t0 = time.perf_counter()
                tagged = pipe.build(spark)
                mark("build_plan(py)", t0)

                t0 = time.perf_counter()
                tagged._jdf.queryExecution().optimizedPlan()
                mark("analyze+optimize(jvm)", t0)

                from pyspark.sql import functions as F
                from pyspark.storagelevel import StorageLevel

                from mega_data_factory_spark.plans.pipeline import _R

                t0 = time.perf_counter()
                tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
                passed = tagged.filter(F.col(_R).isNull()).drop(_R)
                passed.write.mode("overwrite").parquet(f"{tmp}/{label}/out{rep}")
                mark("persist+passed_write", t0)

                t0 = time.perf_counter()
                rejected = (
                    tagged.filter(F.col(_R).isNotNull())
                    .withColumn("operator", F.col(f"{_R}.operator"))
                    .withColumn("run_id", F.lit("diag"))
                )
                rejected.write.mode("overwrite").partitionBy("operator").parquet(
                    f"{tmp}/{label}/rej{rep}"
                )
                mark("rejected_write", t0)

                t0 = time.perf_counter()
                from mega_data_factory_spark.metrics import write_metrics
                from mega_data_factory_spark.plans.pipeline import OperatorMetrics, PipelineResult

                res = PipelineResult(
                    "diag", cfg.name, 1.0, 5000, 4000,
                    [OperatorMetrics("s", f"op{i}", 5000, 5000) for i in range(13)],
                )
                write_metrics(spark, res, f"{tmp}/{label}/metrics{rep}")
                mark("metrics_write", t0)

                t0 = time.perf_counter()
                tagged.unpersist()
                pipe.release_intermediates()
                mark("teardown", t0)

                total = sum(d for _, d in marks)
                print(f"{label} pass{rep}: total={total:.2f}s :: "
                      + " | ".join(f"{n}={d:.2f}" for n, d in marks), flush=True)

            t0 = time.perf_counter()
            res = Pipeline(cfg).run(spark)
            print(f"{label}: Pipeline.run()={time.perf_counter()-t0:.2f}s "
                  f"({res.input_records}->{res.output_records})", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
