"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized via a cheap count-collect (no driver-side row
transfer of the full result) and timed wall-clock after a warm-up of the
session itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

from mega_data_factory_spark.session import get_spark

HEADLINE = [
    # relational / aggregate surface
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_nation_revenue",
    "topk_orders",
    # curation pipeline surface (reference-shaped workload)
    "text_length_filter",
    "text_exact_dedup",
    "docs_token_stats",
    "curation_pipeline",
    # near-dedup + similarity
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "knn_topk_cosine",
    # events
    "events_hourly_agg",
    "events_sessionize",
    # joins + skew
    "events_asof_purchase_click",
    "events_salted_user_totals",
    "url_filter_full",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("mdf-spark-bench", cpus=cpus)
    from mega_data_factory_spark.plans import all_queries

    qs = all_queries()
    # Warm up the JVM + parquet footers with a trivial action.
    spark.range(1).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
