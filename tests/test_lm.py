"""NgramPerplexityScorer vs an exact DuckDB mirror of the add-k bigram
model (fit + score on the real documents corpus), plus behavioral checks.
Registry sits at the driver's 50-row cap, so the differential bar lives
here (same compare as the driver)."""

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql

NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


def _oracle(add_k: float, min_count: int) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
grams AS (
  SELECT doc_id, ws[i.i] AS w1, ws[i.i + 1] AS w2
  FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) i
),
big AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM grams GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
),
ctx AS (SELECT w1, COUNT(*) AS c1 FROM grams GROUP BY 1),
vocab AS (
  SELECT COUNT(DISTINCT wrd) + 1 AS v
  FROM (SELECT unnest(ws) AS wrd FROM w) u WHERE wrd != ''
),
lp AS (
  SELECT g.doc_id,
         ln((COALESCE(b.c12, 0) + {add_k}) / (COALESCE(c.c1, 0) + {add_k} * vocab.v)) AS l
  FROM grams g
  LEFT JOIN big b ON g.w1 = b.w1 AND g.w2 = b.w2
  LEFT JOIN ctx c ON g.w1 = c.w1
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, ROUND(AVG(l), 6) AS doc_logprob, ROUND(EXP(-AVG(l)), 6) AS perplexity
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id, p.doc_logprob, p.perplexity
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


@pytest.mark.parametrize("add_k,min_count", [(0.1, 1), (0.5, 2)])
def test_perplexity_matches_oracle(spark, add_k, min_count):
    """Self-fit on the 500-doc corpus, score the same corpus: every
    doc_logprob/perplexity matches the DuckDB formulation (incl. the
    min_count-pruned model, whose context counts stay uncut)."""
    from mega_data_factory_spark.operators.lm import NgramPerplexityScorer
    from mega_data_factory_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_ORACLE, ("documents",))["documents"]
    s = NgramPerplexityScorer(add_k=add_k, min_count=min_count).fit(docs)
    out = s.apply(docs).select("doc_id", "doc_logprob", "perplexity").orderBy("doc_id")
    assert_df_matches_sql(out, _oracle(add_k, min_count), name="ngram_perplexity")


def test_in_domain_scores_better_than_gibberish(spark):
    """The point of the filter: text resembling the training corpus must
    get lower perplexity than shuffled-vocabulary gibberish."""
    from mega_data_factory_spark.operators.lm import NgramPerplexityScorer
    from mega_data_factory_spark.session import load_tables

    docs = load_tables(spark, SF_DIR_ORACLE, ("documents",))["documents"]
    s = NgramPerplexityScorer().fit(docs)
    sample = docs.select("text").first()["text"]
    words = sample.split()
    gibberish = " ".join(reversed(words))
    probe = spark.createDataFrame(
        [(1, sample), (2, gibberish), (3, "one-token"), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.perplexity for r in s.apply(probe).collect()}
    assert got[1] < got[2], got
    assert got[3] is None and got[4] is None  # <2 tokens -> no score


def test_unfitted_and_bad_params_raise(spark):
    from mega_data_factory_spark.operators.lm import NgramPerplexityScorer

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="fit"):
        NgramPerplexityScorer().apply(df)
    with pytest.raises(ValueError, match="add_k"):
        NgramPerplexityScorer(add_k=0.0)
    with pytest.raises(ValueError, match="min_count"):
        NgramPerplexityScorer(min_count=0)
