"""Interleaved A/B for the round-12 SECOND twin batch: word_shingles +
hash64_from_md5 SQL-text fast paths (the MinHash/ngram/decontamination
plan-build cost diag_r12_planbuild2 attributed to MinHashLSHDeduplicator).

Same methodology as diag_r12_twin_ab.py: composed and fast passes
alternate inside one process; per-mode minima survive the host's
episodic slow mode.

Usage: python scripts/diag_r12_twin_ab2.py [reps-per-mode]
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
    """Force ONLY the new twins (word_shingles / hash64_from_md5) onto
    their composed paths — the refiner/word_occurrences twins shipped
    earlier this round stay ON in both modes, so the recipe-build rows
    measure THIS change alone. Composed is forced by wrapping string
    column names in F.col() before the real function sees them (the
    exact dispatch the fast path takes for Column inputs)."""
    from pyspark.sql import functions as F

    import mega_data_factory_spark.functions.hashing as H
    import mega_data_factory_spark.functions.text as T
    import mega_data_factory_spark.operators.dedup as D

    real_ws, real_h = T.word_shingles, H.hash64_from_md5

    def ws(col, n=3):
        return real_ws(F.col(col) if isinstance(col, str) else col, n)

    def h64(col, *, seed=None):
        return real_h(F.col(col) if isinstance(col, str) else col, seed=seed)

    patched = [(T, "word_shingles", ws), (H, "hash64_from_md5", h64),
               (D, "word_shingles", ws), (D, "hash64_from_md5", h64)]
    saved = [(m, n, getattr(m, n)) for m, n, _ in patched]
    for m, n, fn in patched:
        setattr(m, n, fn)
    try:
        yield
    finally:
        for m, n, fn in saved:
            setattr(m, n, fn)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-twin-ab2", cpus=cpus)
    spark.range(1).count()

    from pyspark.sql import functions as F

    import mega_data_factory_spark.functions.text as T
    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.operators.dedup import MinHashLSHDeduplicator
    from mega_data_factory_spark.plans.pipeline import Pipeline

    df = spark.range(10).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("some words repeated here for shingles #"), F.col("id")).alias(
            "text_redacted"
        ),
    )
    op = MinHashLSHDeduplicator(
        num_hashes=16, bands=4, id_col="doc_id", text_col="text_redacted"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    subjects = [
        # T.word_shingles resolved at CALL time so the composed_only patch
        # applies to this row too
        ("word_shingles expr", lambda: T.word_shingles("text_redacted", 3)),
        ("MinHash _band_ids", lambda: op._band_ids(df)),
        ("MinHash _band_pairs", lambda: op._band_pairs(df)),
    ]

    def build_recipe(name):
        pipe = Pipeline(PipelineConfig.from_yaml(os.path.join(repo, "configs", name)))
        out = pipe.build(spark)
        pipe.release_intermediates()
        return out

    subjects += [
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
