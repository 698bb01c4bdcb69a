"""Interleaved A/B: composed-Column vs SQL-text-twin plan-build latency.

The host has an episodic slow mode (hypervisor-side, scripts/diag_episodic.out),
so separate before/after runs are not comparable. This diag alternates
composed (sql_plain_column stubbed to None in BOTH namespaces) and fast
passes of the same builder inside one process and reports per-mode minima —
the ratio survives host noise.

Usage: python scripts/diag_r12_twin_ab.py [reps-per-mode]
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark


@contextmanager
def composed_only():
    import mega_data_factory_spark.functions.text as T
    import mega_data_factory_spark.operators.refiners as R

    ot, orr = T.sql_plain_column, R.sql_plain_column
    T.sql_plain_column = R.sql_plain_column = lambda c: None
    try:
        yield
    finally:
        T.sql_plain_column, R.sql_plain_column = ot, orr


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-twin-ab", cpus=cpus)
    spark.range(1).count()

    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox line\nrepeat line\nrepeat line #"), F.col("id")
        ).alias("text"),
        F.lit(100).alias("n_chars"),
    )

    from mega_data_factory_spark.operators.refiners import (
        GopherQualityRefiner,
        IntraDocDedupRefiner,
        LanguageIdRefiner,
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
    ]

    def one_build(r):
        t0 = time.perf_counter()
        out = df.withColumns(r.columns(df))
        d = r.derived_columns(out)
        if d:
            out.withColumns(d)
        return time.perf_counter() - t0

    print(f"{'builder':28s} {'composed':>10s} {'twin':>10s}  speedup")
    tot_c = tot_f = 0.0
    for r in refiners:
        c_times, f_times = [], []
        for _ in range(reps):
            with composed_only():
                c_times.append(one_build(r))
            f_times.append(one_build(r))
        c, f = min(c_times), min(f_times)
        tot_c += c
        tot_f += f
        print(
            f"{type(r).__name__:28s} {c * 1000:8.1f}ms {f * 1000:8.1f}ms  {c / f:6.1f}x"
        )
    print(f"{'TOTAL (6 builders)':28s} {tot_c * 1000:8.1f}ms {tot_f * 1000:8.1f}ms  {tot_c / tot_f:6.1f}x")

    # whole recipe plan builds, interleaved
    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for yaml_name in ("fineweb_style_recipe.yaml", "gopher_style_recipe.yaml"):
        with open(os.path.join(repo, "configs", yaml_name)) as fh:
            text = fh.read()

        def build():
            cfg = PipelineConfig.from_yaml(text)
            cfg.source.path = "/root/testdata/sf0.01/documents.parquet"
            t0 = time.perf_counter()
            Pipeline(cfg).build(spark)
            return time.perf_counter() - t0

        c_times, f_times = [], []
        for _ in range(max(3, reps // 2)):
            with composed_only():
                c_times.append(build())
            f_times.append(build())
        c, f = min(c_times), min(f_times)
        print(
            f"{yaml_name:28s} {c * 1000:8.1f}ms {f * 1000:8.1f}ms  {c / f:6.1f}x"
        )

    spark.stop()


if __name__ == "__main__":
    main()
