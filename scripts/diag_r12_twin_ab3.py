"""Interleaved A/B for the round-12 THIRD twin batch: filter predicate
tags + the key-dedup window tag authored as single SQL exprs.

Composed is forced by class-level shadowing of predicate_sql /
effective_key_sql (returns None -> composed path); the word_shingles /
hash64 / refiner twins from the earlier batches stay ON in both modes,
so the rows isolate THIS change. Per-mode minima survive the host's
episodic slow mode.

Usage: python scripts/diag_r12_twin_ab3.py [reps-per-mode]
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
    import mega_data_factory_spark.operators.filters as FL
    from mega_data_factory_spark.operators.base import Deduplicator, Filter

    targets = [
        (Filter, "predicate_sql"),
        (Deduplicator, "effective_key_sql"),
        (FL.NumericRangeFilter, "predicate_sql"),
        (FL.TextLengthFilter, "predicate_sql"),
        (FL.GopherQualityFilter, "predicate_sql"),
        (FL.C4PageFilter, "predicate_sql"),
    ]
    saved = [(c, a, c.__dict__.get(a)) for c, a in targets]
    for c, a in targets:
        setattr(c, a, lambda self, df: None)
    try:
        yield
    finally:
        for c, a, orig in saved:
            if orig is None:
                delattr(c, a)
            else:
                setattr(c, a, orig)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-twin-ab3", cpus=cpus)
    spark.range(1).count()

    from pyspark.sql import functions as F

    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.operators.base import REJECTION_STRUCT_DDL
    from mega_data_factory_spark.operators.dedup import TextExactDeduplicator
    from mega_data_factory_spark.operators.filters import GopherQualityFilter, NumericRangeFilter
    from mega_data_factory_spark.plans.pipeline import Pipeline, _R

    df = spark.range(10).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("some words repeated here #"), F.col("id")).alias("text_redacted"),
        (F.col("id") % 7).cast("double").alias("score"),
    ).withColumn(_R, F.lit(None).cast(REJECTION_STRUCT_DDL))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def fresh_pipe():
        p = Pipeline.__new__(Pipeline)
        p._expr_cache = {}
        p._mid_cached = []
        return p

    def tag_filter():
        return fresh_pipe()._apply(df, NumericRangeFilter(column="score", lo=1.0, hi=5.0))

    def tag_gopher():
        # build needs the gopher_* columns; tag build itself only needs names
        d = df.withColumns({c: F.lit(1.0) for c in (
            "gopher_word_count", "gopher_mean_word_len", "gopher_hash_ratio",
            "gopher_ellipsis_ratio", "gopher_bullet_line_frac",
            "gopher_ellipsis_line_frac", "gopher_alpha_word_frac",
            "gopher_stopword_count")})
        return fresh_pipe()._apply(d, GopherQualityFilter())

    def tag_dedup():
        return fresh_pipe()._apply(
            df, TextExactDeduplicator(id_col="doc_id", text_col="text_redacted")
        )

    def build_recipe(name):
        pipe = Pipeline(PipelineConfig.from_yaml(os.path.join(repo, "configs", name)))
        out = pipe.build(spark)
        pipe.release_intermediates()
        return out

    subjects = [
        ("NumericRangeFilter tag", tag_filter),
        ("GopherQualityFilter tag", tag_gopher),
        ("TextExactDedup window tag", tag_dedup),
        ("fineweb_style_recipe.yaml build", lambda: build_recipe("fineweb_style_recipe.yaml")),
        ("gopher_style_recipe.yaml build", lambda: build_recipe("gopher_style_recipe.yaml")),
    ]

    print(f"{'subject':35s} {'composed':>10s} {'twin':>10s} {'speedup':>8s}")
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
        print(f"{label:35s} {s*1000:9.1f}ms {f*1000:9.1f}ms {s/f:7.1f}x")


if __name__ == "__main__":
    main()
