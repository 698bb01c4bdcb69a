"""TokenBudgetSelector: bucketed selection must EXACTLY match the global
cumulative-window formulation (held differentially against DuckDB)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _oracle_ids(rows, budget):
    """DuckDB global-cumsum reference: ids kept under the budget."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, score DOUBLE, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return {
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM (
              SELECT doc_id,
                     sum(n_tokens) OVER (ORDER BY score DESC NULLS LAST, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t
            ) WHERE cum <= ?
            """,
            [budget],
        ).fetchall()
    }


def _spark_ids(spark, rows, budget, **kw):
    from mega_data_factory_spark.operators.selection import TokenBudgetSelector

    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    sel = TokenBudgetSelector(budget, score_col="score", token_col="n_tokens", **kw)
    return {r.doc_id for r in sel.apply(df).collect()}


@pytest.mark.parametrize("buckets", [1, 7, 8192])
def test_matches_global_cumsum(spark, buckets):
    """Bucketed two-phase selection == global window, at every bucket
    count (buckets=1 degenerates to the pure window path; ties on score
    share a bucket by construction)."""
    import random

    rng = random.Random(42)
    rows = [
        (i, round(rng.random(), 2), rng.randint(50, 500))  # 2dp -> many exact ties
        for i in range(2000)
    ]
    for budget in (1, 5_000, 100_000, 10**9):
        assert _spark_ids(spark, rows, budget, buckets=buckets) == _oracle_ids(rows, budget), (
            f"mismatch at budget={budget} buckets={buckets}"
        )


def test_null_scores_rank_last(spark):
    """NULL scores = NULLS LAST on both engines: unscored docs are only
    admitted after every scored doc (the classifier/perplexity scorers
    legitimately emit NULL for degenerate docs)."""
    import random

    rng = random.Random(3)
    rows = [
        (i, None if i % 5 == 0 else round(rng.random(), 2), rng.randint(50, 500))
        for i in range(1000)
    ]
    for budget in (10_000, 120_000, 10**9):
        for kw in ({"buckets": 64}, {"buckets": 64, "score_bounds": (0.0, 1.0)}):
            assert _spark_ids(spark, rows, budget, **kw) == _oracle_ids(rows, budget), (
                f"mismatch at budget={budget} kw={kw}"
            )
    # all-null scores: pure id-order prefix, never the whole corpus
    all_null = [(i, None, 100) for i in range(10)]
    assert _spark_ids(spark, all_null, 350) == {0, 1, 2}


def test_tagged_pipeline_accounting(spark, tmp_path):
    """Inside a tagged Pipeline the selector must (a) exclude already-
    rejected rows from the budget and (b) TAG over-budget rows so they
    reach the rejected sink — never silently drop them."""
    from mega_data_factory_spark.config import PipelineConfig, SinkConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    # 10 docs, 100 tokens each; filter rejects scores < 0.5 (docs 0-4);
    # budget 250 then keeps the 2.5 best SURVIVORS (docs 9, 8), cutting
    # 7, 6, 5 — if rejected rows consumed budget nothing would survive
    rows = [(i, float(i) / 10, 100) for i in range(10)]
    spark.createDataFrame(rows, "doc_id long, score double, n_tokens long").createOrReplaceTempView(
        "tb_src"
    )
    cfg = PipelineConfig.from_dict(
        {
            "pipeline": {
                "name": "tb_budget",
                "id_col": "doc_id",
                "source": {"table": "tb_src"},
                "stages": [
                    {"name": "f", "operators": [
                        {"name": "NumericRangeFilter", "params": {"column": "score", "lo": 0.5}},
                    ]},
                    {"name": "cut", "operators": [
                        {"name": "TokenBudgetSelector",
                         "params": {"budget_tokens": 250, "score_col": "score",
                                    "token_col": "n_tokens"}},
                    ]},
                ],
            }
        }
    )
    cfg.sink = SinkConfig(path=str(tmp_path / "out"))
    cfg.rejected_sink = SinkConfig(path=str(tmp_path / "rej"))
    res = Pipeline(cfg).run(spark)
    kept = spark.read.parquet(str(tmp_path / "out"))
    rej = spark.read.parquet(str(tmp_path / "rej"))
    assert {r.doc_id for r in kept.collect()} == {8, 9}
    # every input row is accounted for: kept + rejected == input
    assert kept.count() + rej.count() == 10 == res.input_records
    reasons = {
        r.doc_id: r["_rejection_details"]["reason"] for r in rej.collect()
    }
    assert reasons[7] == "budget_exceeded" and reasons[5] == "budget_exceeded"
    assert reasons[0] == "filtered"  # the filter's tag survives untouched


def test_edge_cases(spark):
    from mega_data_factory_spark.operators.selection import TokenBudgetSelector

    # constant score: one bucket, pure id-order prefix
    rows = [(i, 0.5, 100) for i in range(10)]
    assert _spark_ids(spark, rows, 350) == {0, 1, 2}
    # empty input passes through
    df = spark.createDataFrame([], "doc_id long, score double, n_tokens long")
    out = TokenBudgetSelector(100, score_col="score", token_col="n_tokens").apply(df)
    assert out.count() == 0
    with pytest.raises(ValueError, match="budget_tokens"):
        TokenBudgetSelector(0)
    with pytest.raises(ValueError, match="buckets"):
        TokenBudgetSelector(10, buckets=0)


def test_score_bounds_skips_scan_and_clamps(spark):
    """Declared bounds (classifier probabilities are [0,1]) must give the
    same selection — including rows OUTSIDE the declared bounds, which
    clamp into edge buckets but keep their true-score order within the
    boundary window."""
    import random

    rng = random.Random(7)
    rows = [(i, round(rng.uniform(-0.2, 1.2), 3), rng.randint(50, 500)) for i in range(1000)]
    for budget in (5_000, 50_000):
        got = _spark_ids(spark, rows, budget, buckets=64, score_bounds=(0.0, 1.0))
        assert got == _oracle_ids(rows, budget), f"mismatch at budget={budget}"
    from mega_data_factory_spark.operators.selection import TokenBudgetSelector

    with pytest.raises(ValueError, match="score_bounds"):
        TokenBudgetSelector(10, score_bounds=(1.0, 0.0))


def test_yaml_constructible(spark):
    from mega_data_factory_spark.registry import OPERATORS

    sel = OPERATORS.create(
        "TokenBudgetSelector",
        {"budget_tokens": 1000, "score_col": "score", "token_col": "n_tokens"},
    )
    rows = [(i, float(i), 400) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    assert {r.doc_id for r in sel.apply(df).collect()} == {9, 8}  # 800 <= 1000 < 1200
