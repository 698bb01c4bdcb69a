"""Driver row for the column profiler (operators/profiling.py).

Exact mode is the oracle-checkable configuration: count_distinct and
interpolated percentiles have precise ANSI equivalents, so every stat the
profiler emits — decimal-derived means included — is hash-compared
against DuckDB. The sketch mode (HLL + sampled percentile summaries, the
100 TB default) is inherently approximate and holds its bar in
tests/test_profiling.py (error-envelope assertions vs exact) and the
bench's ``column_profile`` line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mega_data_factory_spark.session import load_tables

PROFILE_COLS = [("o_totalprice", "num"), ("o_orderstatus", "str"), ("o_orderdate", "other")]
PCTS = (0.25, 0.5, 0.75)


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-aggregate exact profile of a numeric, a string, and a
    timestamp column of orders, unpivoted in-plan to the long
    ``(column, stat, value, text)`` form."""
    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    t = load_tables(spark, sf_dir, ("orders",))
    p = ColumnProfiler([c for c, _ in PROFILE_COLS], percentiles=PCTS, approx=False)
    return p.profile(t["orders"]).orderBy("column", "stat")


def _column_profile_oracle() -> str:
    """DuckDB mirror generated from the SAME stat layout as the profiler
    (one SELECT per stat row, unioned — the long form)."""
    parts: list[str] = []

    def add(col: str, stat: str, value: str = "NULL", text: str = "NULL") -> None:
        # "column" is a reserved word in DuckDB -> quoted alias
        parts.append(
            f'SELECT \'{col}\' AS "column", \'{stat}\' AS stat, '
            f"CAST({value} AS DOUBLE) AS value, CAST({text} AS VARCHAR) AS text FROM orders"
        )

    for col, kind in PROFILE_COLS:
        add(col, "count", f"COUNT({col})")
        add(col, "nulls", f"COUNT(*) - COUNT({col})")
        add(col, "distinct", f"COUNT(DISTINCT {col})")
        if kind == "num":
            add(col, "min", f"MIN({col})")
            add(col, "max", f"MAX({col})")
            add(col, "mean",
                f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({col}), 6)")
            for p in PCTS:
                add(col, f"p{int(p * 100)}",
                    f"ROUND(quantile_cont(CAST({col} AS DOUBLE), {p}), 6)")
        elif kind == "str":
            add(col, "min_len", f"MIN(LEN({col}))")
            add(col, "max_len", f"MAX(LEN({col}))")
            add(col, "avg_len",
                f"ROUND(CAST(SUM(CAST(LEN({col}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({col}), 6)")
            add(col, "min", text=f"MIN({col})")
            add(col, "max", text=f"MAX({col})")
        else:
            add(col, "min", text=f"CAST(MIN({col}) AS VARCHAR)")
            add(col, "max", text=f"CAST(MAX({col}) AS VARCHAR)")
    body = " UNION ALL ".join(parts)
    return f'SELECT * FROM ({body}) ORDER BY "column", stat'


QUERIES = {"column_profile": column_profile}
ORACLE = {"column_profile": _column_profile_oracle()}
