"""Oracle-differential tests for set ops, semi/anti joins, salted agg —
plus plan-shape regression tests pinning the scale posture (pushdown,
broadcast, no stray shuffles) that `.explain()` audits promised."""

import pytest

from tests.conftest import assert_query_matches_oracle

SETOPS = [
    "customer_semi_anti_join",
    "nations_setops",
    "events_salted_user_totals",
]


@pytest.mark.parametrize("name", SETOPS)
def test_setops_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)


# ------------------------------------------------------------- plan shapes


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q1_scan_pushes_filter_and_prunes_columns(spark):
    """The lineitem scan must push the shipdate predicate into parquet and
    read only the 7 referenced columns (of 10+) — SURVEY §4's 'push down
    and prune' requirement, checked on the physical plan."""
    from mega_data_factory_spark.plans.relational import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_q5_broadcasts_dimension_tables(spark):
    """region/nation/customer/supplier are dims: the join tree must contain
    broadcast joins, and the big fact side must not be broadcast."""
    from mega_data_factory_spark.plans.relational import q5_region_nation_revenue

    plan = _plan(q5_region_nation_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    """Top-k must compile to TakeOrderedAndProject (per-partition top-k +
    merge), never a global sort of the full table."""
    from mega_data_factory_spark.plans.relational import topk_orders

    plan = _plan(topk_orders(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan


def test_exact_dedup_single_shuffle(spark):
    """Keyed dedup = exactly one exchange, keyed on the dedup key (the
    shuffle IS the reference's bucketed seen-set, backend.py:95-220)."""
    from mega_data_factory_spark.plans.curation import text_exact_dedup

    import re

    plan = _plan(text_exact_dedup(spark, "/root/testdata/sf0.001"))
    n_hash = plan.count("hashpartitioning(")
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    # one hash shuffle for the dedup key; the only other exchange is the
    # final presentation orderBy (range partitioning)
    assert n_hash == 1, f"expected 1 key shuffle, plan has {n_hash}"
    assert n_exchanges <= 2, f"unexpected extra exchanges: {n_exchanges}"


def test_salted_totals_two_phase(spark):
    """Salted aggregation: the (user_id, salt) partial and the user_id merge
    are two separate hash aggregations in the plan."""
    from mega_data_factory_spark.plans.setops import events_salted_user_totals

    plan = _plan(events_salted_user_totals(spark, "/root/testdata/sf0.001"))
    assert plan.count("HashAggregate") >= 4  # partial+final for each phase


def test_no_query_plans_a_cartesian_product(spark):
    """Sweep every registered query: none may compile to a non-broadcast
    CartesianProduct (the plan shape that dies first at scale). Broadcast
    nested-loop joins (deliberate, e.g. single-query kNN) are allowed."""
    from mega_data_factory_spark.plans import all_queries

    offenders = []
    for name, fn in all_queries().items():
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_no_query_plans_a_rowwise_python_udf(spark):
    """Sweep every registered AND retired query through the plan lint
    (plans/lint.py — the same audit `validate --lint` runs on user
    configs): none may compile to a row-at-a-time Python UDF
    (BatchEvalPython — pickled per-row transfer, the 10-100x slow path)
    or a CartesianProduct. Arrow-batched Python (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) is the engine's sanctioned
    Python tier."""
    from mega_data_factory_spark.plans import all_queries, retired_queries
    from mega_data_factory_spark.plans.lint import lint_plan

    offenders = []
    for name, fn in {**all_queries(), **retired_queries()}.items():
        res = lint_plan(_plan(fn(spark, "/root/testdata/sf0.001")))
        if not res["ok"]:
            offenders.append((name, res["failures"]))
    assert not offenders, offenders
