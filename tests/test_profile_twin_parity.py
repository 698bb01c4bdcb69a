"""Structural parity for the round-13 ColumnProfiler SQL-text fast path.

profile() composes ~30 Column calls per aggregated column plus ~8 per
unpivot entry — ~2000 py4j round trips ≈ 2.1 s of pure driver latency for
a 16-column table (scripts/diag_r13b_profile_build.py). The twin
(`_profile_sql`) renders the IDENTICAL Catalyst trees as SQL text in three
selectExpr round trips. This module pins, for every parameterization the
twin claims to spell:

  * analyzed-plan equality with the composed-Column construction
    (`_profile_composed`), modulo expression ids — any drift in literals,
    casts, aggregate choice, sampling projection, or unpivot shape fails
    the diff;
  * value equality on a mixed-type fixture (numeric, string incl. quotes/
    backslashes/NULL, decimal, timestamp, boolean);
  * the refusal cases (backtick-carrying names, a pre-existing
    ``__profile_sample`` column, non-32-bit sample mod) fall back to the
    composed path.
"""

from __future__ import annotations

import datetime
import re
from decimal import Decimal

import pytest

from mega_data_factory_spark.operators.profiling import SAMPLE_COL, ColumnProfiler


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _formatted(df) -> str:
    # the formatted plan prints literals through sql() (e.g. `1L`), so it
    # catches literal-TYPE drift that analyzed toString masks (Literal(1,
    # int) and Literal(1L, long) both print as `1` there — the exact-mode
    # percentile frequency argument was exactly such a case)
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _norm(plan: str) -> str:
    plan = re.sub(r"#\d+", "#N", plan)
    return re.sub(r"plan_id=\d+", "plan_id=N", plan)


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [
        (1, 10.5, Decimal("3.14"), "alpha", datetime.datetime(2024, 1, 1, 8, 0), True),
        (2, -0.25, Decimal("2.00"), "it's a 'quoted' back\\slash", datetime.datetime(2024, 6, 1, 9, 30), False),
        (3, None, Decimal("9.99"), None, None, None),
        (4, 7.0, None, "Tür déjà …", datetime.datetime(2023, 12, 31, 23, 59), True),
        (5, 7.0, Decimal("3.14"), "", datetime.datetime(2024, 1, 1, 8, 0), False),
    ]
    schema = (
        "k long, x double, d decimal(10,2), s string, ts timestamp, b boolean"
    )
    return spark.createDataFrame(rows, schema)


PROFILERS = [
    pytest.param(lambda: ColumnProfiler(), id="default-sketch"),
    pytest.param(lambda: ColumnProfiler(approx=False), id="exact"),
    pytest.param(lambda: ColumnProfiler(percentile_sample_mod=1), id="sketch-unsampled"),
    pytest.param(lambda: ColumnProfiler(percentiles=(0.999,)), id="p99.9"),
    pytest.param(lambda: ColumnProfiler(percentiles=()), id="no-percentiles"),
    pytest.param(lambda: ColumnProfiler(["x", "s"]), id="column-subset"),
    pytest.param(
        lambda: ColumnProfiler(distinct_rsd=0.1, approx_percentile_accuracy=500),
        id="custom-sketch-params",
    ),
]


@pytest.mark.parametrize("make", PROFILERS)
def test_profile_twin_analyzed_plan_parity(spark, fixture_df, make):
    prof = make()
    cols = prof._selected(fixture_df)
    fast = prof._profile_sql(fixture_df, cols)
    assert fast is not None, "twin unexpectedly refused a spellable parameterization"
    composed = prof._profile_composed(fixture_df, cols)
    assert _norm(_analyzed(fast)) == _norm(_analyzed(composed))
    assert _norm(_formatted(fast)) == _norm(_formatted(composed))


@pytest.mark.parametrize("make", PROFILERS)
def test_profile_twin_value_parity(spark, fixture_df, make):
    prof = make()
    cols = prof._selected(fixture_df)
    fast = prof._profile_sql(fixture_df, cols)
    composed = prof._profile_composed(fixture_df, cols)
    key = lambda r: (r["column"], r["stat"])  # noqa: E731
    a = sorted([tuple(str(v) for v in r) for r in fast.collect()])
    b = sorted([tuple(str(v) for v in r) for r in composed.collect()])
    assert a == b
    assert prof.profile(fixture_df).columns == ["column", "stat", "value", "text"]


def test_profile_twin_refuses_backtick_names(spark):
    df = spark.range(3).selectExpr("id AS `a``b`")
    prof = ColumnProfiler()
    # the twin must refuse rather than mis-parse; the composed path it
    # falls back to has never supported backtick names either (F.col on
    # such a name raises) — behavior unchanged from the pre-twin code
    assert prof._profile_sql(df, prof._selected(df)) is None
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        prof.profile(df).collect()


def test_profile_twin_refuses_sample_col_collision(spark):
    df = spark.range(3).selectExpr("id", f"(id % 2 = 0) AS `{SAMPLE_COL}`")
    prof = ColumnProfiler(columns=["id"])
    assert prof._profile_sql(df, prof._selected(df)) is None
    assert prof.profile(df).count() > 0
    # without sampling the collision is irrelevant and the twin engages
    prof2 = ColumnProfiler(columns=["id"], percentile_sample_mod=1)
    assert prof2._profile_sql(df, prof2._selected(df)) is not None


def test_profile_twin_refuses_wide_sample_mod(spark):
    df = spark.range(3).selectExpr("id")
    prof = ColumnProfiler(percentile_sample_mod=2**40)
    assert prof._profile_sql(df, prof._selected(df)) is None
    assert prof.profile(df).count() > 0
