"""Per-refiner PLAN-BUILD latency attribution (round 12, second pass).

The round-12 "Not yet optimized" list ranks the remaining py4j plan-build
latency first: the struct builders (LanguageId / QualityScore /
RepetitionStats / GopherQuality / IntraDocDedup) are still composed
Column-by-Column, and py4j costs ~2-4 ms per call on this host. This
script times, for each builder, N repetitions of columns() +
withColumns() — driver-only work, no action — plus the full
Pipeline.build for both shipped recipes, so the translation work can be
checked against a measured baseline (guide §1: measure first).

Usage: python scripts/diag_r12_planbuild.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-planbuild", cpus=cpus)
    spark.range(1).count()  # warm the gateway

    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick brown fox line\nrepeat line\nrepeat line #"), F.col("id")).alias("text"),
        F.lit(100).alias("n_chars"),
    )

    from mega_data_factory_spark.operators.refiners import (
        GopherQualityRefiner,
        IntraDocDedupRefiner,
        LanguageIdRefiner,
        PiiRedactRefiner,
        QualityScoreRefiner,
        RepetitionStatsRefiner,
        TextStatsRefiner,
    )

    refiners = [
        TextStatsRefiner(length_col="n_chars"),
        LanguageIdRefiner(),
        QualityScoreRefiner(),
        GopherQualityRefiner(),
        RepetitionStatsRefiner(),
        IntraDocDedupRefiner(),
        PiiRedactRefiner(),
    ]

    # py4j round-trip yardstick: 200 trivial Column ops
    t0 = time.perf_counter()
    c = F.lit(0)
    for _ in range(200):
        c = c + F.lit(1)
    yard = time.perf_counter() - t0
    print(f"py4j yardstick: 200 Column '+' ops = {yard:.3f}s ({yard / 200 * 1000:.2f} ms/call)")

    for r in refiners:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            cols = r.columns(df)
            out = df.withColumns(cols)
            d = r.derived_columns(out)
            if d:
                out = out.withColumns(d)
            times.append(time.perf_counter() - t0)
        print(
            f"{type(r).__name__:28s} columns+withColumns: "
            f"min {min(times) * 1000:7.1f} ms  med {sorted(times)[len(times) // 2] * 1000:7.1f} ms"
        )

    # full recipe plan builds
    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for yaml_name in ("fineweb_style_recipe.yaml", "gopher_style_recipe.yaml"):
        with open(os.path.join(repo, "configs", yaml_name)) as f:
            text = f.read()
        times = []
        for _ in range(reps):
            cfg = PipelineConfig.from_yaml(text)
            cfg.source.path = "/root/testdata/sf0.01/documents.parquet"
            t0 = time.perf_counter()
            pipe = Pipeline(cfg)
            tagged = pipe.build(spark)
            times.append(time.perf_counter() - t0)
        print(
            f"{yaml_name:28s} Pipeline.build(py):  "
            f"min {min(times) * 1000:7.1f} ms  med {sorted(times)[len(times) // 2] * 1000:7.1f} ms"
        )

    spark.stop()


if __name__ == "__main__":
    main()
