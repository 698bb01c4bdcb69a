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
                     sum(n_tokens) OVER (ORDER BY score DESC, doc_id
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
