"""Interleaved A/B for the round-12 FOURTH twin batch: the pipeline's
one-selectExpr refiner projection (alive gate folded into each CASE)
vs the per-column withColumns-of-F.when path.

Composed is forced by swapping Pipeline._apply back to the pre-batch-4
projection (withColumns of F.when(alive, v) over op.columns(), whose
internal F.expr twins stay ON) — tree identity between the column
builders is already pinned, so the delta isolates the projection
mechanics: one selectExpr round trip vs 2-3 py4j calls per column.

Usage: python scripts/diag_r12_twin_ab4.py [reps-per-mode]
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
    """Replay the PRE-batch-4 pipeline projection (withColumns of
    F.when(alive, v) over op.columns(), whose internal F.expr twins stay
    ON) — so the delta isolates the selectExpr fold alone."""
    from pyspark.sql import functions as F

    from mega_data_factory_spark.operators.base import Refiner
    from mega_data_factory_spark.plans import pipeline as P

    orig = P.Pipeline._apply

    def no_fast(self, df, op):
        if isinstance(op, Refiner) and not getattr(op, "pipeline_full_frame", False):
            alive = self._alive()
            cols = op.columns(df)
            out = df.withColumns({k: F.when(alive, v) for k, v in cols.items()})
            derived = op.derived_columns(out)
            if derived:
                out = out.withColumns({k: F.when(alive, v) for k, v in derived.items()})
            tmp = [k for k in cols if k.startswith("__")]
            return out.drop(*tmp) if tmp else out
        return orig(self, df, op)

    P.Pipeline._apply = no_fast
    try:
        yield
    finally:
        P.Pipeline._apply = orig


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-twin-ab4", cpus=cpus)
    spark.range(1).count()

    from pyspark.sql import functions as F

    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.operators.base import REJECTION_STRUCT_DDL
    from mega_data_factory_spark.plans.pipeline import Pipeline, _R

    df = spark.range(10).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("some words repeated here #"), F.col("id")).alias("text"),
    ).withColumn(_R, F.lit(None).cast(REJECTION_STRUCT_DDL))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import mega_data_factory_spark.operators.refiners as R

    def apply_six():
        pipe = Pipeline.__new__(Pipeline)
        pipe._expr_cache = {}
        pipe._mid_cached = []
        out = df
        for op in (
            R.TextStatsRefiner(),
            R.LanguageIdRefiner(),
            R.QualityScoreRefiner(),
            R.GopherQualityRefiner(),
            R.RepetitionStatsRefiner(),
            R.IntraDocDedupRefiner(),
        ):
            out = pipe._apply(out, op)
        return out

    def build_recipe(name):
        pipe = Pipeline(PipelineConfig.from_yaml(os.path.join(repo, "configs", name)))
        out = pipe.build(spark)
        pipe.release_intermediates()
        return out

    subjects = [
        ("six refiners through Pipeline._apply", apply_six),
        ("fineweb_style_recipe.yaml build", lambda: build_recipe("fineweb_style_recipe.yaml")),
        ("gopher_style_recipe.yaml build", lambda: build_recipe("gopher_style_recipe.yaml")),
    ]

    print(f"{'subject':40s} {'composed':>10s} {'twin':>10s} {'speedup':>8s}")
    for label, fn in subjects:
        slow_t, fast_t = [], []
        for _ in range(reps):
            with composed_only():
                t0 = time.perf_counter()
                fn()
                slow_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn()
            fast_t.append(time.perf_counter() - t0)
        s, f = min(slow_t), min(fast_t)
        print(f"{label:40s} {s*1000:9.1f}ms {f*1000:9.1f}ms {s/f:7.1f}x")


if __name__ == "__main__":
    main()
