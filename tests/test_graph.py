"""Connected components + cluster-dedup policy: differential-tested
against a driver-side union-find oracle (the pair graph is the one
structure DuckDB can't express — recursive closure — so the oracle is
exact Python over the same edges)."""

import random

from pyspark.sql import functions as F


def _union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_and_island_components(spark):
    """Transitive chain 1-2-3-4 collapses to component 1; island 5-6 to 5."""
    from mega_data_factory_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long")
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_long_path_converges_fast(spark):
    """A 64-node path is the alternating algorithm's hard case (diameter
    63): it must still resolve within the O(log^2 n) round budget — naive
    min-propagation would need 63 rounds and trip the max_iter guard."""
    from mega_data_factory_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(63)], "src long, dst long")
    rows = connected_components(edges, max_iter=14).collect()
    assert {r.id for r in rows} == set(range(64))
    assert {r.component for r in rows} == {0}


def test_random_graph_matches_union_find(spark):
    """200 nodes, 150 random edges (many small components + isolated
    nodes): exact agreement with driver-side union-find."""
    from mega_data_factory_spark.operators.graph import connected_components

    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    expected = _union_find([e for e in edges if e[0] != e[1]])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == expected


def test_assign_components_covers_singletons(spark):
    """Rows absent from the pair graph become their own singleton
    component."""
    from mega_data_factory_spark.operators.graph import assign_components

    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "src long, dst long")
    got = {r.doc_id: r.component for r in assign_components(df, pairs).collect()}
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 2, 4: 4}


def test_keep_best_per_component(spark):
    """Cluster policy keeps the highest-quality member per duplicate
    cluster — NOT the min id (the pairwise first-wins answer) — and one
    survivor per transitive chain even for never-directly-paired ends."""
    from mega_data_factory_spark.operators.graph import keep_best_per_component

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.7), (20, 0.1)],
        "doc_id long, quality double",
    )
    # chain 1~2, 2~3 (2 has best quality); pair 10~11 (tie -> min id); 20 isolated
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    surv = {r.doc_id for r in keep_best_per_component(df, pairs, "quality").collect()}
    assert surv == {2, 10, 20}
    # ascending mode: worst quality wins (e.g. keep the SHORTEST doc)
    surv_asc = {
        r.doc_id
        for r in keep_best_per_component(df, pairs, "quality", descending=False).collect()
    }
    assert surv_asc == {1, 10, 20}


class _PairStub:
    """Minimal pair-emitting base: fixed (doc_id, __rep) pairs."""

    def __init__(self, pairs):
        self._pairs = pairs

    def _dup_pairs(self, df):
        return self._pairs


def test_cluster_deduplicator_keeps_best(spark):
    """Transitive chain 1~2~3 + pair 10~11: survivors are the best-quality
    member per cluster, rejected rows carry the best member as
    representative."""
    from pyspark.sql import functions as F

    from mega_data_factory_spark.operators.graph import ClusterDeduplicator

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.8), (20, 0.1)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(2, 1), (3, 2), (11, 10)], "doc_id long, __rep long")
    d = ClusterDeduplicator(_PairStub(pairs), "quality")
    assert {r.doc_id for r in d.apply(df).collect()} == {2, 11, 20}
    rej = {
        r.doc_id: r.rep
        for r in d.rejected(df)
        .select("doc_id", F.col("_rejection_details.representative_id").alias("rep"))
        .collect()
    }
    assert rej == {1: "2", 3: "2", 10: "11"}


def test_cluster_deduplicator_from_registry_name(spark):
    """YAML path: base resolved by registry name with nested params; on
    the planted corpus every MinHash cluster keeps exactly one member and
    survivors+rejected partition the corpus."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR_ORACLE
    from mega_data_factory_spark.operators.graph import ClusterDeduplicator, assign_components
    from mega_data_factory_spark.plans.dedup_queries import _doc_corpus

    corpus = _doc_corpus(spark, SF_DIR_ORACLE).withColumn(
        "quality", (F.xxhash64("text") % 1000).cast("double")
    )
    d = ClusterDeduplicator(
        "MinHashLSHDeduplicator",
        "quality",
        base_params={"num_hashes": 16, "bands": 4},
        id_col="doc_id",
    )
    surv = d.apply(corpus)
    n_total = corpus.count()
    assert surv.count() + d.rejected(corpus).count() == n_total
    # exactly one survivor per component
    pairs = d.base._dup_pairs(corpus).select(
        F.col("doc_id").alias("src"), F.col("__rep").alias("dst")
    )
    tagged = assign_components(surv, pairs, id_col="doc_id")
    per_comp = tagged.groupBy("component").count().collect()
    assert all(r["count"] == 1 for r in per_comp)


def test_cluster_deduplicator_rejects_key_dedup_base(spark):
    import pytest as _pytest

    from mega_data_factory_spark.operators.graph import ClusterDeduplicator

    with _pytest.raises(ValueError, match="pair-emitting"):
        ClusterDeduplicator("TextExactDeduplicator", "quality")


def test_components_from_real_dedup_pairs(spark):
    """End-to-end with a real operator: MinHash LSH pairs over the planted
    corpus resolve to clusters whose members all share their component's
    min id, and every rejected doc of the pairwise policy lands in a
    multi-member cluster."""
    from tests.conftest import SF_DIR_ORACLE
    from mega_data_factory_spark.operators.dedup import MinHashLSHDeduplicator
    from mega_data_factory_spark.operators.graph import assign_components
    from mega_data_factory_spark.plans.dedup_queries import _doc_corpus

    corpus = _doc_corpus(spark, SF_DIR_ORACLE)
    d = MinHashLSHDeduplicator(num_hashes=16, bands=4, id_col="doc_id")
    pairs = d._band_pairs(corpus).select(
        F.col("doc_id").alias("src"), F.col("__rep").alias("dst")
    )
    tagged = assign_components(corpus, pairs, id_col="doc_id")
    sizes = tagged.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    multi = {r.component for r in sizes.filter(F.col("n") > 1).collect()}
    rejected = {r.src for r in pairs.select("src").distinct().collect()}
    comp_of = {r.doc_id: r.component for r in tagged.collect()}
    assert rejected, "planted corpus must produce dup pairs"
    for doc in rejected:
        assert comp_of[doc] in multi
        assert comp_of[doc] <= doc


def test_cluster_deduplicator_through_pipeline(spark):
    """The YAML path end-to-end: a Pipeline stage running
    ClusterDeduplicator must tag cluster losers as duplicates with the
    best member as representative, and rejection accounting must
    reconcile (nothing dropped, nothing double-counted)."""
    from pyspark.sql import functions as F

    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    cfg = PipelineConfig.from_dict(
        {
            "pipeline": {
                "name": "cluster_dedup",
                "id_col": "doc_id",
                "source": {"table": "cluster_dedup_src"},
                "operators": [
                    {
                        "name": "ClusterDeduplicator",
                        "params": {
                            "base": "SharedSpanDeduplicator",
                            "base_params": {"span_tokens": 5},
                            "quality_col": "quality",
                            "id_col": "doc_id",
                        },
                    }
                ],
            }
        }
    )
    span = " ".join(f"tok{i}" for i in range(5))
    rows = [
        (1, f"first doc carries the shared span {span} in the middle", 0.3),
        (2, f"second doc different framing but same {span} verbatim body", 0.9),
        (3, f"third doc again embeds {span} with extra trailing words", 0.5),
        (4, "an unrelated document with plenty of its own words here", 0.1),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, quality double").createOrReplaceTempView(
        "cluster_dedup_src"
    )
    pipe = Pipeline(cfg)
    tagged = pipe.build(spark)
    out = tagged.select(
        "doc_id",
        F.col("_rejection_details.reason").alias("reason"),
        F.col("_rejection_details.representative_id").alias("rep"),
    ).collect()
    got = {r.doc_id: (r.reason, r.rep) for r in out}
    assert len(got) == 4  # accounting intact
    assert got[2] == (None, None) and got[4] == (None, None)  # best + unrelated survive
    assert got[1] == ("duplicate", "2") and got[3] == ("duplicate", "2")


def test_cluster_dedup_rejects_non_duplicate_base(spark):
    """Bases whose _dup_pairs __rep is not a representative id (the
    decontamination filter emits a shared-span COUNT) must fail at
    construction, not silently merge ids with counts into components."""
    import pytest as _pytest

    from mega_data_factory_spark.operators.graph import ClusterDeduplicator

    with _pytest.raises(ValueError, match="rejection_reason='contaminated'"):
        ClusterDeduplicator(
            "DecontaminationFilter",
            "quality",
            base_params={"benchmark": "some_view"},
        )
