"""Oracle-differential tests for window/grouping/percentile/join queries."""

import pytest

from tests.conftest import assert_query_matches_oracle

NAMES = [
    "customer_order_ranks",
    "lineitem_running_revenue",
    "orders_daily_moving_avg",
    "grouping_sets_orders",
    "customer_spend_distribution",
    "events_asof_purchase_click",
    "parts_price_range_join",
    "url_filter_full",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, name):
    assert_query_matches_oracle(spark, name)


def test_asof_join_semantics(spark):
    """Hand-built frame: ties at equal ts match; missing history -> NULL."""
    from mega_data_factory_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 5, "c")], "id int, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 9, 90.0), (2, 21, 210.0)], "id int, ts int, v double"
    )
    out = {r.tag: r.v_asof for r in asof_join(
        left.withColumnRenamed("id", "k"),
        right.withColumnRenamed("id", "k"),
        on="k", left_ts="ts", right_ts="ts", right_payload=["v"],
    ).collect()}
    assert out["a"] == 100.0  # tie at ts=10 matches (right sorts first)
    assert out["b"] is None  # only future right rows for key 2
    assert out["c"] is None  # key 3 has no right rows


def test_range_join_bucket_edges(spark):
    """Matches across bucket boundaries are found (the b±1 explode)."""
    from mega_data_factory_spark.operators.joins import range_join
    import pyspark.sql.functions as F

    left = spark.createDataFrame([(1, 0.999), (2, 5.0)], "lk int, lv double")
    right = spark.createDataFrame([(10, 1.001), (20, 99.0)], "rk int, rv double")
    out = range_join(left, right, left_val="lv", right_val="rv", max_distance=0.01).select("lk", "rk").collect()
    assert [(r.lk, r.rk) for r in out] == [(1, 10)]  # 0.999 vs 1.001 straddles the bucket edge
