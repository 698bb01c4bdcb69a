"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper."""

from __future__ import annotations

import os

import duckdb
import pytest

from mega_data_factory_spark.session import TABLES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def pytest_collection_modifyitems(config, items):
    """Adversarial-order hook: session-state bugs (e.g. the round-9
    Observation-poisoned classifier fit) can hide behind pytest's default
    alphabetical file order. ``MDF_TEST_ORDER=reverse`` reverses the
    collected order; ``MDF_TEST_ORDER=<int>`` applies a seeded shuffle of
    whole modules (modules stay contiguous so module-scoped fixtures are
    built once each, but the cross-module order — where the poisoning
    lives, via the session-scoped SparkSession — is scrambled).
    scripts/run_adversarial_order.sh runs both modes once per round."""
    mode = os.environ.get("MDF_TEST_ORDER")
    if not mode:
        return
    if mode == "reverse":
        items.reverse()
        return
    import random

    modules: dict[str, list] = {}
    for it in items:
        modules.setdefault(it.nodeid.split("::", 1)[0], []).append(it)
    keys = sorted(modules)
    random.Random(int(mode)).shuffle(keys)
    items[:] = [it for k in keys for it in modules[k]]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mdf-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the test tables registered as views —
    mirrors the driver's harness."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def assert_query_matches_oracle(spark, name: str, sf_dir: str = SF_DIR_ORACLE, rel_tol: float = 0.0):
    """Run queries()[name] on Spark and oracle_sql()[name] on DuckDB and
    compare row-count, sorted-column names, and values (exact, or to rel_tol
    for floats). Mimics the driver's CORRECTNESS gate. Queries rotated out
    of the 50-row driver window (plans.retired_queries) keep this exact bar."""
    from mega_data_factory_spark.plans import all_oracles, all_queries, retired_oracles, retired_queries

    qs = {**all_queries(), **retired_queries()}
    oracles = {**all_oracles(), **retired_oracles()}
    assert_df_matches_sql(qs[name](spark, sf_dir), oracles[name], sf_dir, rel_tol=rel_tol, name=name)


def assert_df_matches_sql(sdf, oracle_sql: str, sf_dir: str = SF_DIR_ORACLE, *, rel_tol: float = 0.0, name: str = "query"):
    """Driver-style compare for a DataFrame + oracle SQL pair that need not
    be in the registry (unregistered/consolidated queries keep this bar)."""
    import math
    from decimal import Decimal

    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(oracle_sql)
    duck_cols_raw = [d[0] for d in res.description]
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = [tuple(row[i] for i in order) for row in res.fetchall()]
    con.close()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    def norm(v):
        if isinstance(v, Decimal):
            return v
        if isinstance(v, float):
            return v
        return v

    s_sorted = sorted(spark_rows, key=_row_key)
    d_sorted = sorted(duck_rows, key=_row_key)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, (a, b) in zip(spark_cols, zip(sr, dr)):
            a, b = norm(a), norm(b)
            if isinstance(a, float) and isinstance(b, (float, int, Decimal)):
                b = float(b)
                if rel_tol:
                    assert math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9), f"{name} row {i} col {c}: {a!r} != {b!r}"
                else:
                    assert a == b or (math.isnan(a) and math.isnan(b)), f"{name} row {i} col {c}: {a!r} != {b!r}"
            elif isinstance(a, Decimal) or isinstance(b, Decimal):
                assert Decimal(str(a)) == Decimal(str(b)), f"{name} row {i} col {c}: {a!r} != {b!r}"
            else:
                assert a == b, f"{name} row {i} col {c}: {a!r} != {b!r} ({type(a)} vs {type(b)})"


def _row_key(row):
    return tuple((v is None, str(v)) for v in row)
