"""Split the MinHash join-dedup plan-build cost into its phases.

diag_r12_planbuild2 attributed ~half the recipe plan build to
MinHashLSHDeduplicator's _apply_join_dedup. This script times each
sub-phase (persist registration, word_shingles expr build, _band_ids
build, _band_pairs window/groupBy, the join + tag) on the same schema
the recipes use, min over reps.

Usage: python scripts/diag_r12_planbuild3.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark


def t(label, fn, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    print(f"  {label:45s} min {min(times)*1000:7.1f} ms")
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-planbuild3", cpus=cpus)
    spark.range(1).count()

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mega_data_factory_spark.functions.hashing import hash64_from_md5
    from mega_data_factory_spark.functions.text import word_shingles
    from mega_data_factory_spark.operators.dedup import MinHashLSHDeduplicator

    # yardstick
    t0 = time.perf_counter()
    c = F.lit(0)
    for _ in range(200):
        c = c + F.lit(1)
    yard = time.perf_counter() - t0
    print(f"py4j yardstick: {yard/200*1000:.2f} ms/call")

    df = spark.range(100).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("some words repeated here for shingles #"), F.col("id")).alias("text_redacted"),
    )
    op = MinHashLSHDeduplicator(num_hashes=16, bands=4, id_col="doc_id", text_col="text_redacted")

    t("word_shingles expr", lambda: word_shingles("text_redacted", 3), reps)
    t("hash64_from_md5 expr", lambda: hash64_from_md5(F.col("__s")), reps)

    def exploded_fn():
        return df.select(
            F.col(op.id_col),
            F.explode(F.array_distinct(word_shingles(op.text_col, op.shingle_n))).alias("__s"),
        ).select(F.col(op.id_col), hash64_from_md5(F.col("__s")).alias("__bh"))

    exploded = t("exploded select (shingle+hash+2 selects)", exploded_fn, reps)
    t("_band_ids total", lambda: op._band_ids(df), reps)
    t("_band_pairs total", lambda: op._band_pairs(df), reps)

    def persist_fn():
        d = df.select("*")  # fresh frame so persist registers anew
        d.persist()
        d.unpersist()
        return d

    t("persist+unpersist (fresh frame)", persist_fn, reps)

    # full _apply_join_dedup on a recipe-like wider frame
    from mega_data_factory_spark.plans.pipeline import Pipeline, _R
    from mega_data_factory_spark.operators.base import REJECTION_STRUCT_DDL

    wide = df.withColumn(_R, F.lit(None).cast(REJECTION_STRUCT_DDL))
    pipe = Pipeline.__new__(Pipeline)
    pipe._mid_cached = []
    pipe._expr_cache = {}

    def full_fn():
        op2 = MinHashLSHDeduplicator(num_hashes=16, bands=4, id_col="doc_id", text_col="text_redacted")
        out = pipe._apply_join_dedup(wide, op2)
        pipe.release_intermediates()
        return out

    t("_apply_join_dedup full", full_fn, reps)


if __name__ == "__main__":
    main()
