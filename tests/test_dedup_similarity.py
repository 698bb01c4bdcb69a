"""Oracle-differential tests for near-dedup + similarity queries, plus
structural checks on the planted-duplicate detection."""

import pytest

from tests.conftest import SF_DIR_ORACLE, assert_query_matches_oracle

NAMES = [
    "minhash_lsh_dedup",
    "minhash_lsh_rejected",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "ngram_jaccard_rejected",
    "embedding_cosine_dedup",
    "knn_topk_cosine",
    "ann_lsh_bucket_knn",
    "embedding_norms",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)


def test_planted_duplicates_are_detected(spark):
    """The exact-in-disguise variants (+20000) must all be caught by
    minhash (identical shingle sets) and simhash (identical signature);
    the scaled vectors (+10000) must all be caught by cosine dedup."""
    from mega_data_factory_spark.plans.dedup_queries import (
        embedding_cosine_dedup,
        minhash_lsh_dedup,
        simhash_dedup,
    )

    mh = {r.doc_id for r in minhash_lsh_dedup(spark, SF_DIR_ORACLE).collect()}
    assert not any(i >= 20000 for i in mh), "exact variants must be deduped by minhash"

    sh = {r.doc_id for r in simhash_dedup(spark, SF_DIR_ORACLE).collect()}
    assert not any(i >= 20000 for i in sh), "exact variants must be deduped by simhash"

    cos = {r.vec_id for r in embedding_cosine_dedup(spark, SF_DIR_ORACLE).collect()}
    assert not any(i >= 10000 for i in cos), "scaled vectors must be deduped by cosine"


def test_near_duplicates_mostly_detected(spark):
    """Truncated near-dups (+10000, Jaccard ~0.8) should be largely caught
    by the Jaccard dedup at threshold 0.6 (short docs legitimately escape)."""
    from mega_data_factory_spark.plans.dedup_queries import ngram_jaccard_dedup

    surv = {r.doc_id for r in ngram_jaccard_dedup(spark, SF_DIR_ORACLE).collect()}
    planted = [i for i in surv if 10000 <= i < 20000]
    assert len(planted) < 25, f"most of the 50 planted near-dups should be caught, {len(planted)} escaped"


def test_multiprobe_lsh_improves_recall(spark):
    """Multi-probe LSH: probing 1-bit-flipped buckets recovers neighbors a
    single bucket misses; recall vs brute-force is monotone in nprobe."""
    from pyspark.sql import functions as F

    from mega_data_factory_spark.operators.similarity import BruteForceKNN, RandomProjectionLSH
    from mega_data_factory_spark.session import load_tables

    t = load_tables(spark, SF_DIR_ORACLE, ("embeddings",))
    emb = t["embeddings"]
    query = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 7)

    truth = {r.vec_id for r in BruteForceKNN(k=10).topk(corpus, query).collect()}
    lsh = RandomProjectionLSH(k=10)
    recalls = []
    for nprobe in (1, 4, 8):
        got = {r.vec_id for r in lsh.topk(corpus, query, nprobe=nprobe).collect()}
        recalls.append(len(got & truth) / len(truth))
    assert recalls == sorted(recalls), recalls  # monotone non-decreasing
    assert recalls[-1] >= recalls[0]
    # probing more buckets must return at least as many candidates
    n1 = lsh.topk(corpus, query, nprobe=1).count()
    n8 = lsh.topk(corpus, query, nprobe=8).count()
    assert n8 >= n1
