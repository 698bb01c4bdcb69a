"""Round-13 diag (r12 verdict Next #2): attribute the ML-fit scaling
inversion — the driver's r12 legs ran quality_classifier_1m and
semantic_dedup_kmeans FASTER at 8 cores than 32 (ratios 0.66), which is
physically implausible for compute-bound lines unless (a) the 32-core leg
was episode-contaminated, or (b) the lines are genuinely serial /
driver-bound (Lloyd's tiny-job storm, LR's owlqn driver updates) and more
task slots only add overhead.

Method: run each line ISOLATED in a fresh session at the given core count,
splitting the wall into its fit and apply/assign stages, and counting the
Spark jobs each stage launches (a serial job storm shows up as many jobs
whose per-job work is tiny — scheduler-bound, invariant in core count).
Invoke once with SPARK_GRAFT_CPUS=32 and once with 8; the two-point Amdahl
solve t(c) = s + p/c gives the serial seconds s per stage.

Usage: SPARK_GRAFT_CPUS=32 python scripts/diag_r13_mlfit.py [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from mega_data_factory_spark.session import get_spark, load_tables

    spark = get_spark("diag-r13-mlfit", cpus=cpus)
    spark.range(1).count()
    tables = load_tables(spark, SF_DIR, ("documents", "embeddings"))
    docs, emb = tables["documents"], tables["embeddings"]
    docs.count(), emb.count()  # warm footers/page cache

    out: dict[str, dict] = {"cpus": cpus, "sf_dir": SF_DIR}

    # ---- quality_classifier_1m: fit_weak (untimed in bench) vs apply ----
    import bench as _bench

    corpus_1m = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        _bench._word_soup(_bench.WORDS_1M, width=30, stride=3).alias("text"),
    )
    from mega_data_factory_spark.operators.classifier import QualityClassifier

    spam_words = ["casino", "jackpot", "winner", "bonus", "prize", "lottery",
                  "spam", "free", "click", "pills"]
    spam_df = spark.range(5000).select(
        _bench._word_soup(spam_words, width=30, stride=5).alias("text"))

    fit_s, apply_s = [], []
    fit_jobs = apply_jobs = 0
    for i in range(args.passes):
        j0 = _jobs(spark)
        t0 = time.perf_counter()
        clf = QualityClassifier(max_iter=20).fit_weak(docs, spam_df)
        fit_s.append(time.perf_counter() - t0)
        j1 = _jobs(spark)
        t0 = time.perf_counter()
        clf.apply(corpus_1m).filter(F.col("quality_score") >= 0.0).count()
        apply_s.append(time.perf_counter() - t0)
        j2 = _jobs(spark)
        fit_jobs, apply_jobs = j1 - j0, j2 - j1
    out["quality_classifier_1m"] = {
        "fit_sec": [round(x, 3) for x in fit_s],
        "apply_sec": [round(x, 3) for x in apply_s],
        "fit_jobs": fit_jobs,
        "apply_jobs": apply_jobs,
    }
    print(f"# classifier: fit {min(fit_s):.2f}s ({fit_jobs} jobs), "
          f"apply {min(apply_s):.2f}s ({apply_jobs} jobs)", file=sys.stderr)

    # ---- semantic_dedup_kmeans: KMeansIndex.fit vs semantic_dedup ----
    from mega_data_factory_spark.functions.vectors import l2_norm
    from mega_data_factory_spark.operators.clustering import (
        KMeansIndex,
        SemanticDeduplicator,
    )
    from mega_data_factory_spark.plans.dedup_queries import _vec_corpus

    corpus = _vec_corpus(spark, SF_DIR)
    corpus.count()
    kfit_s, kfull_s = [], []
    kfit_jobs = kfull_jobs = 0
    k_fitted = None
    filtered = corpus.filter(
        F.col("embedding").isNotNull() & (l2_norm("embedding") > 0)
    )
    for i in range(args.passes):
        # the operator fits its index inside _dup_pairs; replicate that fit
        # standalone with the IDENTICAL construction to split fit vs rest
        j0 = _jobs(spark)
        t0 = time.perf_counter()
        idx = KMeansIndex(
            k=None, cell_target_rows=4096, vec_col="embedding",
            normalize=True, init_mode="random", seed=42, max_iter=10,
        ).fit(filtered)
        kfit_s.append(time.perf_counter() - t0)
        j1 = _jobs(spark)
        k_fitted = idx.k_fitted
        d = SemanticDeduplicator(threshold=0.45, k=None, cell_target_rows=4096,
                                 id_col="vec_id")
        t0 = time.perf_counter()
        d.apply(corpus).select("vec_id").orderBy("vec_id").count()
        kfull_s.append(time.perf_counter() - t0)
        j2 = _jobs(spark)
        kfit_jobs, kfull_jobs = j1 - j0, j2 - j1
    out["semantic_dedup_kmeans"] = {
        "fit_sec": [round(x, 3) for x in kfit_s],
        "full_query_sec": [round(x, 3) for x in kfull_s],
        "dedup_minus_fit_sec": round(min(kfull_s) - min(kfit_s), 3),
        "fit_jobs": kfit_jobs,
        "full_jobs": kfull_jobs,
        "k_fitted": k_fitted,
    }
    print(f"# kmeans: fit {min(kfit_s):.2f}s ({kfit_jobs} jobs, k={k_fitted}), "
          f"full query {min(kfull_s):.2f}s ({kfull_jobs} jobs)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
