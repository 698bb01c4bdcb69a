"""Bisect the quality_classifier_1m bimodality (r7 Wrong #2, reproduced r8).

The same classifier line measures ~4-5 s in some full-bench runs and
~13 s in others (r7: 5.05 driver vs 13.31 sweep; r8: 3.91 vs 13.09 on the
same HEAD, same data, same host, min-of-2 both). This diag isolates the
session-state dependence: it times the block (untimed fit_weak + timed
apply/count, exactly bench.py's shape) in a fresh session, then re-times
it after running each candidate state-polluter the full bench executes
before the block (the HEADLINE loop's new gopher/skew lines, the
kmeans-family fit caches, leaked skew-join caches), printing timings and
the scoring job's executed-plan codegen markers at each step.

Usage: python scripts/diag_classifier.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark, load_tables  # noqa: E402


def classifier_line(spark, sf_dir, corpus_1m, docs_lm, tag):
    from pyspark.sql import functions as F

    from bench import WORDS_1M, _word_soup
    from mega_data_factory_spark.operators.classifier import QualityClassifier

    spam_words = ["casino", "jackpot", "winner", "bonus", "prize", "lottery", "spam", "free", "click", "pills"]
    spam_df = spark.range(5000).select(_word_soup(spam_words, width=30, stride=5).alias("text"))
    t0 = time.perf_counter()
    clf = QualityClassifier(max_iter=20).fit_weak(docs_lm, spam_df)
    fit_s = time.perf_counter() - t0
    passes = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = clf.apply(corpus_1m).filter(F.col("quality_score") >= 0.0).count()
        passes.append(time.perf_counter() - t0)
    scored = clf.apply(corpus_1m)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # codegen marker is the `*(n)` node prefix in the simple tree string —
    # the literal word "WholeStageCodegen" NEVER appears there, only in
    # explain("formatted"). The original probe searched for the word and
    # read False on every plan (the r8 Wrong-#3 artifact; corrected by
    # scripts/diag_classifier_codegen.py, which found the scoring plan IS
    # codegen'd wherever Spark supports it).
    import re as _re

    codegen_spans = len(set(_re.findall(r"\*\((\d+)\)", plan)))
    print(
        f"{tag}: fit {fit_s:.2f}s apply {[round(p, 2) for p in passes]} "
        f"(n={n}) codegen_spans={codegen_spans} "
        f"arrow_nodes={plan.count('ArrowEvalPython')} batcheval={plan.count('BatchEvalPython')}",
        flush=True,
    )
    return min(passes)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("diag-classifier", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1).count()
    from pyspark.sql import functions as F

    from bench import WORDS_1M, _word_soup
    from mega_data_factory_spark.plans import all_queries

    docs_lm = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs_lm.count()
    corpus_1m = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"), _word_soup(WORDS_1M, width=30, stride=3).alias("text")
    )

    classifier_line(spark, sf_dir, corpus_1m, docs_lm, "fresh")

    qs = all_queries()
    for polluter in ("gopher_quality", "skew_split_join", "semantic_dedup_kmeans", "ivf_ann_topk"):
        fn = qs.get(polluter)
        if fn is None:
            continue
        for _ in range(2):
            fn(spark, sf_dir).count()
        classifier_line(spark, sf_dir, corpus_1m, docs_lm, f"after {polluter}")

    spark.catalog.clearCache()
    classifier_line(spark, sf_dir, corpus_1m, docs_lm, "after clearCache")


if __name__ == "__main__":
    main()
