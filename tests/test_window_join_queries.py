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
    "bloom_pruned_join",
    "skew_split_join",
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


def _skew_fixture(spark):
    import pyspark.sql.functions as F

    # power-law left: one whale key with 20k rows, 50 uniform keys with 40
    # rows each, plus NULL-keyed rows; right dim has 3 rows per key, some
    # left keys absent (left-join NULL payloads), plus NULL-keyed right rows
    left = (
        spark.range(20_000).select(F.lit("whale").alias("k"), F.col("id").alias("lv"))
        .unionByName(
            spark.range(2_000).select(
                F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
                (F.col("id") + 100_000).alias("lv"),
            )
        )
        .unionByName(spark.range(7).select(F.lit(None).cast("string").alias("k"), (F.col("id") + 900_000).alias("lv")))
    )
    right = (
        spark.range(3).select(F.lit("whale").alias("k"), F.col("id").alias("rv"))
        .unionByName(
            spark.range(120).select(
                # k0..k39 present (3 rows each); k40..k49 absent from right
                F.concat(F.lit("k"), (F.col("id") % 40).cast("string")).alias("k"),
                (F.col("id") + 500).alias("rv"),
            )
        )
        .unionByName(spark.range(2).select(F.lit(None).cast("string").alias("k"), (F.col("id") + 777).alias("rv")))
    )
    return left, right


def test_skew_split_join_matches_plain(spark):
    """The hot/cold branches partition the left rows, so the union must be
    EXACTLY the plain join — inner and left, NULL keys included (preserved
    under left, dropped under inner)."""
    from mega_data_factory_spark.operators.joins import skew_split_join

    left, right = _skew_fixture(spark)

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    for how in ("inner", "left"):
        plain = rows(left.join(right, on="k", how=how))
        split = rows(skew_split_join(left, right, "k", how=how, hot_threshold=1_000))
        assert split == plain, how
    # explicit hot_keys skips the frequency pass, same result
    assert rows(skew_split_join(left, right, "k", hot_keys=["whale"])) == rows(
        left.join(right, on="k")
    )
    # nothing hot -> plain join passthrough
    assert rows(skew_split_join(left, right, "k", hot_threshold=10**9)) == rows(
        left.join(right, on="k")
    )


def test_skew_split_join_plan_shape(spark):
    """The 100 TB evidence: with auto-broadcast off (forcing the plain plan
    to shuffle), the split plan still broadcasts the hot sliver — hot-key
    rows never ride a shuffle — while the cold residual shuffle-joins."""
    from mega_data_factory_spark.operators.joins import skew_split_join

    left, right = _skew_fixture(spark)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            skew_split_join(left, right, "k", hot_threshold=1_000)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_skew_split_join_guards(spark):
    import pytest as _pytest
    import pyspark.sql.functions as F

    from mega_data_factory_spark.operators.joins import skew_split_join

    left, right = _skew_fixture(spark)
    with _pytest.raises(ValueError, match="how="):
        skew_split_join(left, right, "k", how="full")
    # every key "hot" -> the sliver IS the table: fail loud
    with _pytest.raises(ValueError, match="max_hot_keys"):
        skew_split_join(left, right, "k", hot_threshold=1, max_hot_keys=5)
    # broadcast build side too big -> fail loud with the measured count
    with _pytest.raises(ValueError, match="max_hot_right_rows"):
        skew_split_join(left, right, "k", hot_keys=["whale"], max_hot_right_rows=1)


def test_skew_split_join_null_in_hot_keys(spark):
    """A None inside a caller-supplied hot_keys list must not poison the
    NOT-IN cold predicate (which would silently drop every cold row from
    a LEFT join)."""
    from mega_data_factory_spark.operators.joins import skew_split_join

    left, right = _skew_fixture(spark)

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    for how in ("inner", "left"):
        assert rows(skew_split_join(left, right, "k", how=how, hot_keys=["whale", None])) == rows(
            left.join(right, on="k", how=how)
        ), how
