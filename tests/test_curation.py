"""Oracle-differential tests for the curation operator surface."""

import pytest

from tests.conftest import assert_query_matches_oracle

CURATION = [
    "dataset_split_mix",
    "curation_funnel_by_source",
    "text_exact_dedup",
    "orders_first_per_customer",
    "orders_dedup_rejected",
    "text_analysis",
    "ngram_perplexity",
    "sequence_packing",
    "text_cleanup",
    "url_rule_filters",
    "curation_pipeline",
    "curation_rejection_summary",
]


@pytest.mark.parametrize("name", CURATION)
def test_curation_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)


@pytest.mark.parametrize("fn_name,oracle_name", [
    ("text_length_filter", "TEXT_LENGTH_ORACLE"),
    ("docs_token_stats", "_token_stats_oracle"),
])
def test_consolidated_rows_keep_oracle_bar(spark, fn_name, oracle_name):
    """text_length_filter / docs_token_stats are consolidated out of the
    driver window (covered there via curation_pipeline/text_analysis) but
    keep the identical differential bar here."""
    from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql
    import mega_data_factory_spark.plans.curation as cur

    fn = getattr(cur, fn_name)
    oracle = getattr(cur, oracle_name)
    sql = oracle() if callable(oracle) else oracle
    assert_df_matches_sql(fn(spark, SF_DIR_ORACLE), sql, name=fn_name)


def test_repetition_stats_matches_oracle(spark):
    """Gopher repetition signals over the real documents corpus, mirrored
    exactly in DuckDB list HOFs (registry slot full -> pytest-level oracle,
    same compare as the driver)."""
    from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql
    from mega_data_factory_spark.operators.refiners import RepetitionStatsRefiner
    from mega_data_factory_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_ORACLE, ("documents",))["documents"]
    out = RepetitionStatsRefiner().apply(docs).select("doc_id", "dup_word_ratio", "top_bigram_ratio").orderBy("doc_id")
    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    sql = f"""
WITH ws AS (SELECT doc_id, string_split({norm}, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id, w,
    CASE WHEN len(w) >= 2
      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      ELSE [] END AS b
  FROM ws)
SELECT doc_id,
  ROUND(CASE WHEN len(w) > 0 THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) ELSE 0.0 END, 6) AS dup_word_ratio,
  ROUND(CASE WHEN len(b) > 0
    THEN CAST(list_max(list_transform(list_distinct(b), x -> len(list_filter(b, y -> y = x)))) AS DOUBLE) / len(b)
    ELSE 0.0 END, 6) AS top_bigram_ratio
FROM bg ORDER BY doc_id
"""
    assert_df_matches_sql(out, sql, name="repetition_stats")


def test_repetition_stats_flags_repetitive_doc(spark):
    from mega_data_factory_spark.operators.refiners import RepetitionStatsRefiner

    rows = [
        (1, "spam spam spam spam spam spam"),
        (2, "eight unique words in this perfectly normal sentence"),
    ]
    out = {r.doc_id: r for r in RepetitionStatsRefiner().apply(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[1].dup_word_ratio > 0.8 and out[1].top_bigram_ratio == 1.0
    assert out[2].dup_word_ratio == 0.0 and out[2].top_bigram_ratio < 0.2


def test_pii_redact_matches_oracle(spark):
    """PII counts + redaction on a synthetic corpus, identical VALUES rows
    fed to both engines; replacement order (email -> phone -> ip) mirrored."""
    from tests.conftest import assert_df_matches_sql
    from mega_data_factory_spark.operators.refiners import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        PiiRedactRefiner,
    )

    rows = [
        (1, "contact alice.smith+spam@example.co.uk or call 555-123-4567 now"),
        (2, "server at 192.168.0.1 and 10.0.0.255, no mail here"),
        (3, "two mails: a@b.io c.d@e-f.org and phone 123 456 7890"),
        (4, "clean text with digits 12345 and a dot. nothing else"),
        (5, "edge: not-an-ip 1.2.3 and almost-phone 12-345-6789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = PiiRedactRefiner().apply(df).select(
        "doc_id", "pii_email_count", "pii_phone_count", "pii_ip_count", "text_redacted"
    ).orderBy("doc_id")
    values = ", ".join(f"({i}, '{t}')" for i, t in rows)
    sql = f"""
WITH corpus(doc_id, text) AS (VALUES {values})
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS pii_email_count,
  CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS pii_phone_count,
  CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS INT) AS pii_ip_count,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_PHONE}', '<PHONE>', 'g'), '{PII_IPV4}', '<IP>', 'g') AS text_redacted
FROM corpus ORDER BY doc_id
"""
    assert_df_matches_sql(out, sql, name="pii_redact")


H64 = "CAST(('0x' || substr(md5({v}), 1, 15)) AS BIGINT)"


def test_dataset_split_matches_oracle(spark):
    """DatasetSplitRefiner: hash-bucket split assignment is reproducible in
    ANSI SQL (the whole point — partition-independent, engine-independent
    splits), verified value-for-value against DuckDB on real documents."""
    from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql
    from mega_data_factory_spark.operators.sampling import DatasetSplitRefiner

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    r = DatasetSplitRefiner({"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id")
    out = r.apply(docs).select("doc_id", "split").orderBy("doc_id")
    # mirror the refiner's default salt ("split" — distinct from the
    # sampler's "mix" so composed sample+split flows decorrelate)
    b = H64.format(v=f"CAST(doc_id AS VARCHAR) || '#{r.salt}'") + " % 10000"
    sql = f"""
SELECT doc_id,
  CASE WHEN {b} < 8000 THEN 'train' WHEN {b} < 9000 THEN 'val' ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""
    assert_df_matches_sql(out, sql, name="dataset_split")
    # sanity: ratios are roughly honored on 500 docs
    from pyspark.sql import functions as F

    frac = {x["split"]: x["n"] for x in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert frac["train"] > 300 and frac["val"] > 10 and frac["test"] > 10


def test_weighted_sampler_matches_oracle(spark):
    """WeightedSourceSampler: per-source deterministic mixing ratios match
    the SQL mirror exactly; weight 0.0 removes a source entirely and the
    survivor set is identical run-to-run (no rand())."""
    from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql
    from mega_data_factory_spark.operators.sampling import WeightedSourceSampler

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    s = WeightedSourceSampler({"src1": 0.5, "src2": 0.0}, default_weight=1.0, id_col="doc_id")
    out = s.apply(docs).select("doc_id", "source").orderBy("doc_id")
    b = H64.format(v=f"CAST(doc_id AS VARCHAR) || '#{s.salt}'") + " % 10000"
    sql = f"""
SELECT doc_id, source FROM documents
WHERE {b} < (CASE WHEN source = 'src2' THEN 0 WHEN source = 'src1' THEN 5000 ELSE 10000 END)
ORDER BY doc_id
"""
    assert_df_matches_sql(out, sql, name="weighted_sampler")
    rows = out.collect()
    assert not any(r.source == "src2" for r in rows)
    # deterministic: second run yields the identical survivor set
    again = {r.doc_id for r in s.apply(docs).select("doc_id").collect()}
    assert again == {r.doc_id for r in rows}
