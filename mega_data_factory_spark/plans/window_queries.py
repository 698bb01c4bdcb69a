"""Window-function, grouping-sets, and exact-percentile queries — analytic
surface beyond the reference (SURVEY §2.6-2.7 'absent in reference'), all
oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mega_data_factory_spark.session import load_tables

DEC = "decimal(18,6)"
DECW = "decimal(38,6)"
# grouping_sets' grand total uses the round(dec,2)->double emission (see
# plans/relational.py _dec_sum — corpus-scale sums diverge by 1 ulp in the
# raw decimal->double conversion between engines). The PER-ENTITY sums here
# (running revenue per order, daily totals, per-customer spend) keep the
# plain 6dp cast: their magnitude is bounded by one entity, exactly
# double-representable far past any realistic scale.


def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: ranking window (single shuffle on
    custkey; at scale AQE splits skewed customers)."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rnk")
    )


CUSTOMER_RANKS_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM ranked WHERE rnk <= 3
ORDER BY o_custkey, rnk
"""


def lineitem_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-order revenue by line number (frame-bounded running sum
    over exact decimals).

    The window order is a TOTAL order: the synthetic lineitem does not
    guarantee (l_orderkey, l_linenumber) uniqueness (found at the 10x
    scale dir), and a running sum under a partial order is nondeterministic
    — ties on the full key are exact duplicate rows, whose prefix sums are
    order-invariant as a multiset."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice", "l_discount", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 1000)
        .withColumn("running_revenue", F.sum(rev).over(w).cast(DECW).cast("double"))
        .select("l_orderkey", "l_linenumber", "running_revenue")
        .orderBy("l_orderkey", "l_linenumber", "running_revenue")
    )


RUNNING_REVENUE_ORACLE = """
SELECT l_orderkey, l_linenumber,
  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_extendedprice, l_discount, l_partkey, l_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS running_revenue
FROM lineitem WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber, running_revenue
"""


def orders_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily order totals: aggregate then slide —
    the two-level (pre-agg + window) shape that keeps window state small."""
    t = load_tables(spark, sf_dir, ("orders",))
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast(DECW).alias("daily_total"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn(
            "moving_avg_7d",
            F.round(F.sum("daily_total").over(w).cast("double") / F.count(F.lit(1)).over(w), 6),
        )
        .select(
            # emit as timestamp: Spark DATE -> python datetime.date objects
            # vs DuckDB DATE -> pandas datetime64 would hash differently
            F.col("day").cast("timestamp").alias("day"),
            F.col("daily_total").cast("double").alias("daily_total"),
            "moving_avg_7d",
        )
        .orderBy("day")
        .limit(100)
    )


MOVING_AVG_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS daily_total
  FROM orders GROUP BY 1
)
SELECT CAST(day AS TIMESTAMP) AS day, CAST(daily_total AS DOUBLE) AS daily_total,
  ROUND(CAST(SUM(daily_total) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS moving_avg_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
LIMIT 100
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS aggregate via the SQL entry point (status-only,
    priority-only, grand total)."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per market segment: quartile (ntile),
    percent_rank and cume_dist of each customer's total spend — completes
    the analytic-window family (ranking + distribution functions).
    One shuffle for the per-customer aggregate, one for the segment window.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    spend = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast(DECW).alias("spend"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_mktsegment", "spend")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("spend"), F.col("c_custkey"))
    return (
        spend.withColumn("quartile", F.ntile(4).over(w))
        .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
        .withColumn("cume", F.round(F.cume_dist().over(w), 6))
        .orderBy("c_mktsegment", "spend", "c_custkey")
        # window ranks computed over the exact decimal; only the emitted
        # column is coerced to double for engine-neutral hashing
        .withColumn("spend", F.col("spend").cast("double"))
    )


SPEND_DISTRIBUTION_ORACLE = """
WITH spend AS (
  SELECT c_custkey, c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
)
SELECT c_custkey, c_mktsegment, CAST(spend AS DOUBLE) AS spend,
       ntile(4)       OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist()    OVER w, 6) AS cume
FROM spend
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend, c_custkey)
ORDER BY c_mktsegment, spend, c_custkey
"""


QUERIES = {
    "lineitem_running_revenue": lineitem_running_revenue,
    # Rotation wave 8 (round 10): re-promoted after three retired rounds
    # (swap-for-freshness — events_hourly_agg's slot carries this row).
    "customer_order_ranks": customer_order_ranks,
}

ORACLE = {
    "lineitem_running_revenue": RUNNING_REVENUE_ORACLE,
    "customer_order_ranks": CUSTOMER_RANKS_ORACLE,
}

# Rotated out of the driver window in round 7 (slot carries the
# sentence_chunks row): ranking windows are driver-covered by
# customer_spend_distribution (rank/ntile/percent_rank/cume_dist family);
# the pytest differential bar stays via plans.retired_queries
# (tests/test_window_join_queries.py). Round 9 (rotation wave 6):
# orders_daily_moving_avg retires — running/moving frame windows stay
# driver-covered by lineitem_running_revenue (rows-between frames on the
# same engine path); its slot carries plans/curation.py's
# stratified_quota row.
RETIRED_QUERIES = {
    "orders_daily_moving_avg": orders_daily_moving_avg,
    # Rotation wave 9 (round 11): customer_spend_distribution retires
    # after ten straight hash-green rounds — the window-distribution
    # family (ntile/percent_rank/cume_dist) keeps its exact oracle bar
    # here while rank-family windows stay driver-covered by
    # customer_order_ranks; its slot carries the re-promoted
    # cube_status_priority row (plans/relational.py).
    "customer_spend_distribution": customer_spend_distribution,
    # Rotation wave 11 (round 13): grouping_sets_orders retires after
    # eleven straight hash-green rounds — the grouping-analytics family
    # (CUBE / ROLLUP / GROUPING SETS + grouping_id) stays driver-covered by
    # cube_status_priority (plans/relational.py, re-promoted wave 9; cube
    # is the superset spelling of the same Expand mechanism); its slot
    # carries the re-promoted simhash_near_dedup row
    # (plans/dedup_queries.py).
    "grouping_sets_orders": grouping_sets_orders,
}
RETIRED_ORACLE = {
    "orders_daily_moving_avg": MOVING_AVG_ORACLE,
    "customer_spend_distribution": SPEND_DISTRIBUTION_ORACLE,
    "grouping_sets_orders": GROUPING_SETS_ORACLE,
}
