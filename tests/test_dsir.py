"""DSIR importance resampling vs an exact DuckDB mirror (fit on a
target/raw split of the real documents corpus, score, Gumbel-top-k
resample), plus behavioral checks. Registry sits at the driver's 50-row
cap, so the differential bar lives here (same compare as the driver)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql

# the SQL mirror (feature hashing -> smoothed log-ratios -> per-doc sum)
# is SHARED with the registered dsir_select driver row so it cannot drift
from mega_data_factory_spark.plans.curation import dsir_feats_ctes as _feats_ctes

TARGET_SOURCES = ("src0", "src1", "src2")
B, K = 512, 1.0  # small bucket space: plenty of collisions, still fast SQL
N_SELECT = 60


def _target_raw(spark):
    from mega_data_factory_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_ORACLE, ("documents",))["documents"]
    target = docs.filter(F.col("source").isin(*TARGET_SOURCES))
    return docs, target


def test_dsir_logweight_matches_oracle(spark):
    """Fit target = three sources, raw = whole corpus; every document's
    summed hashed-n-gram log-ratio matches the DuckDB formulation."""
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer

    docs, target = _target_raw(spark)
    s = DsirImportanceScorer(n_buckets=B, add_k=K).fit(target, docs)
    out = s.apply(docs).select("doc_id", "dsir_logweight").orderBy("doc_id")
    pred = "source IN " + str(tuple(TARGET_SOURCES))
    sql = f"""
WITH {_feats_ctes(pred).strip()}
SELECT d.doc_id, per_doc.dsir_logweight
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
ORDER BY d.doc_id
"""
    assert_df_matches_sql(out, sql, name="dsir_logweight")


def test_dsir_gumbel_resample_matches_oracle(spark):
    """The full select path: score + stable-hash Gumbel noise + exact
    global top-N — the kept set and weights match DuckDB's window rank
    formulation row for row."""
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer, DsirResampler

    docs, target = _target_raw(spark)
    s = DsirImportanceScorer(n_buckets=B, add_k=K).fit(target, docs)
    kept = (
        DsirResampler(N_SELECT)
        .apply(s.apply(docs))
        .select("doc_id", "dsir_logweight")
        .orderBy("doc_id")
    )
    pred = "source IN " + str(tuple(TARGET_SOURCES))
    sql = f"""
WITH {_feats_ctes(pred).strip()},
adj AS (
  SELECT d.doc_id, per_doc.dsir_logweight,
         per_doc.dsir_logweight + (-ln(-ln(
           (((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#dsir-gumbel'), 1, 15))::BIGINT >> 8)
             + 0.5) / 4503599627370496.0)))) AS a
  FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
),
ranked AS (
  SELECT doc_id, dsir_logweight,
         row_number() OVER (ORDER BY a DESC NULLS LAST, doc_id) AS rn
  FROM adj
)
SELECT doc_id, dsir_logweight FROM ranked WHERE rn <= {N_SELECT} ORDER BY doc_id
"""
    assert_df_matches_sql(kept, sql, name="dsir_resample")


def test_target_like_docs_outweigh_raw(spark):
    """The point of the method: documents resembling the target corpus get
    a higher importance weight than documents resembling the raw tail."""
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer

    target = spark.createDataFrame(
        [(i, "the careful study of distant galaxies and dark matter") for i in range(20)],
        "doc_id long, text string",
    )
    raw = target.union(
        spark.createDataFrame(
            [(100 + i, "click here buy cheap pills free offer now") for i in range(80)],
            "doc_id long, text string",
        )
    )
    probe = spark.createDataFrame(
        [
            (1, "study of galaxies and matter"),
            (2, "buy cheap pills now"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    s = DsirImportanceScorer(n_buckets=1024).fit(target, raw)
    got = {r.doc_id: r.dsir_logweight for r in s.apply(probe).collect()}
    assert got[1] > got[2], got
    assert got[3] is None and got[4] is None  # no features -> no evidence


def test_score_is_partition_invariant(spark):
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer

    docs, target = _target_raw(spark)
    s = DsirImportanceScorer(n_buckets=B).fit(target, docs)
    a = {r.doc_id: r.dsir_logweight for r in s.apply(docs).collect()}
    b = {r.doc_id: r.dsir_logweight for r in s.apply(docs.repartition(13)).collect()}
    assert a == b


def test_save_load_roundtrip_and_bucket_guard(spark, tmp_path):
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer

    docs, target = _target_raw(spark)
    s = DsirImportanceScorer(n_buckets=B).fit(target, docs)
    path = str(tmp_path / "ratios")
    s.save(path)
    loaded = DsirImportanceScorer(n_buckets=B, ratio_path=path)
    a = {r.doc_id: r.dsir_logweight for r in s.apply(docs).collect()}
    b = {r.doc_id: r.dsir_logweight for r in loaded.apply(docs).collect()}
    assert a == b
    with pytest.raises(ValueError, match="n_buckets"):
        DsirImportanceScorer(n_buckets=B * 2, ratio_path=path).apply(docs)
    # bigrams flag must match the fit too: unigram-only features summed
    # against unigram+bigram ratios would mis-score silently
    with pytest.raises(ValueError, match="bigrams"):
        DsirImportanceScorer(n_buckets=B, bigrams=False, ratio_path=path).apply(docs)


def test_scorer_id_col_constructor(spark):
    """id_col is a constructor parameter so the bare Pipeline apply(df)
    path can score corpora not keyed by doc_id."""
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer

    docs, target = _target_raw(spark)
    renamed = docs.withColumnRenamed("doc_id", "item_id")
    s = DsirImportanceScorer(n_buckets=B, id_col="item_id").fit(target, renamed)
    a = {r.item_id: r.dsir_logweight for r in s.apply(renamed).collect()}
    b = {
        r.doc_id: r.dsir_logweight
        for r in DsirImportanceScorer(n_buckets=B).fit(target, docs).apply(docs).collect()
    }
    assert a == b


def test_gumbel_uniform_strictly_inside_unit_interval():
    """The 52-bit cut keeps (h + 0.5) / 2^52 exact and < 1.0 even at the
    maximum hash value — at 53 bits, ties-to-even rounds the top value to
    u = 1.0 and ln(-ln(u)) blows up (NULL in Spark, an ERROR in DuckDB)."""
    from mega_data_factory_spark.operators.dsir import _UNIFORM_SHIFT, _UNIFORM_SPACE

    top = (1 << (60 - _UNIFORM_SHIFT)) - 1
    u = (top + 0.5) / _UNIFORM_SPACE
    assert 0.0 < u < 1.0
    # exactness: the float round-trips the integer numerator
    assert u * _UNIFORM_SPACE == top + 0.5


def test_resampler_contract(spark):
    """Exactly n_select survivors (ties impossible: distinct gumbel),
    deterministic across calls, top-k mode keeps the heaviest docs, and
    validation rejects bad params."""
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer, DsirResampler

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "doc_id long, dsir_logweight double"
    )
    r = DsirResampler(25)
    kept1 = sorted(x.doc_id for x in r.apply(df).collect())
    kept2 = sorted(x.doc_id for x in DsirResampler(25).apply(df.repartition(9)).collect())
    assert len(kept1) == 25 and kept1 == kept2
    # gumbel=False = plain deterministic top-k by weight (tie -> low id)
    topk = sorted(x.doc_id for x in DsirResampler(15, gumbel=False).apply(df).collect())
    want = sorted(
        i for i, _ in sorted(((i, i % 7) for i in range(100)), key=lambda t: (-t[1], t[0]))[:15]
    )
    assert topk == want
    with pytest.raises(ValueError, match="n_select"):
        DsirResampler(0)
    with pytest.raises(ValueError, match="n_buckets"):
        DsirImportanceScorer(n_buckets=0)
    with pytest.raises(ValueError, match="add_k"):
        DsirImportanceScorer(add_k=0.0)
    with pytest.raises(ValueError, match="fit"):
        DsirImportanceScorer().apply(df)


def test_registry_and_yaml_construction(spark, tmp_path):
    """Both operators construct through the registry (the YAML path); the
    scorer lazy-loads a persisted ratio table."""
    from mega_data_factory_spark.operators.dsir import DsirImportanceScorer
    from mega_data_factory_spark.registry import OPERATORS

    docs, target = _target_raw(spark)
    path = str(tmp_path / "ratios")
    DsirImportanceScorer(n_buckets=B).fit(target, docs).save(path)
    scorer = OPERATORS.create(
        "DsirImportanceScorer", {"n_buckets": B, "ratio_path": path}
    )
    out = scorer.apply(docs.limit(20))
    assert "dsir_logweight" in out.columns and out.count() == 20
    r = OPERATORS.create("dsir_resampler", {"n_select": 5})
    assert r.apply(out).count() == 5
