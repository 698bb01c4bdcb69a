"""Interleaved A/B for the round-12 FIFTH twin batch: the standalone
Deduplicator query path (apply/rejected — _ranked's three columns, the
rank filters and the rejection struct authored as SQL text) vs the
pre-batch composed construction, replicated verbatim from the old code
(the same reference tree the parity test pins against).

Usage: python scripts/diag_r12_twin_ab5.py [reps-per-mode]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-twin-ab5", cpus=cpus)
    spark.range(1).count()

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mega_data_factory_spark.operators.base import (
        REJECTION_DETAILS_COL,
        rejection_details,
    )
    from mega_data_factory_spark.operators.dedup import (
        KeyDeduplicator,
        TextExactDeduplicator,
    )

    df = spark.range(10).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.concat(F.lit("http://ex.com/"), F.col("id")).alias("url"),
    )

    def composed(op):
        # the pre-batch-5 apply()+rejected(), replicated verbatim
        w = Window.partitionBy(F.col("__dedup_key")).orderBy(F.col(op.order_col))
        ranked = (
            df.withColumn("__dedup_key", op._effective_key(df))
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__rep", F.first(F.col(op.id_col)).over(w))
        )
        surv = ranked.filter(F.col("__rn") == 1).drop("__dedup_key", "__rn", "__rep")
        rej = (
            ranked.filter(F.col("__rn") > 1)
            .withColumn(
                REJECTION_DETAILS_COL,
                rejection_details(
                    "duplicate", op.name, F.col("__dedup_key"), F.col("__rep").cast("string")
                ),
            )
            .drop("__dedup_key", "__rn", "__rep")
        )
        return surv, rej

    def twin(op):
        return op.apply(df), op.rejected(df)

    subjects = [
        ("TextExactDedup apply+rejected", lambda: TextExactDeduplicator()),
        (
            "KeyDedup(url,distinct) apply+rejected",
            lambda: KeyDeduplicator(["url"], order_col="doc_id", null_keys="distinct"),
        ),
    ]

    print(f"{'subject':40s} {'composed':>10s} {'twin':>10s} {'speedup':>8s}")
    for label, mk in subjects:
        slow_t, fast_t = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            composed(mk())
            slow_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            twin(mk())
            fast_t.append(time.perf_counter() - t0)
        s, f = min(slow_t), min(fast_t)
        print(f"{label:40s} {s*1000:9.1f}ms {f*1000:9.1f}ms {s/f:7.1f}x")


if __name__ == "__main__":
    main()
