"""Set operations, semi/anti joins, and skew-salted aggregation.

SURVEY §2.7: the reference has no relational set ops (union appears only as
stream concatenation, framework/operator.py:411-430; the blocklist check
url_filter.py:217-234 is morally a broadcast anti-join). This module gives
the engine the full set-op surface with DuckDB oracles, plus a two-phase
salted aggregation that demonstrates the skew-mitigation pattern with
semantics identical to the plain groupBy (oracle-checked).

Scale notes:
  * semi/anti joins against a small dim side are broadcast — no shuffle of
    the big side; against a big side they shuffle on the join key and AQE
    picks the strategy.
  * intersect/except compile to aggregate + join under Catalyst (we use
    explicit distinct-join forms so the plan is visible and hintable).
  * salted aggregation splits each hot key into SALT subkeys for the first
    (heavy) partial aggregate, then re-aggregates the SALT partials — the
    second shuffle moves one row per (key, salt), bounding any single
    reducer at 1/SALT of the hottest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mega_data_factory_spark.session import load_tables


def customer_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi AND anti join in one driver row (consolidated from two r5 rows
    to stay under the registry's 50-row cap), tagged by ``op``:

      * ``anti_no_recent_order`` — left anti join: customers with no order
        since mid-1997; the date filter is pushed below the join so the
        anti side shrinks before the shuffle.
      * ``semi_high_value`` — left semi join: customers with >= 1 order
        over 400k (the reference's blocklist-membership shape,
        url_filter.py:217-234, inverted).

    Both branches project identical columns so the union validates the
    full customer payload through each join type."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cols = ["c_custkey", "c_mktsegment", "c_acctbal"]
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
    anti = (
        t["customer"]
        .join(recent, t["customer"].c_custkey == recent.o_custkey, "left_anti")
        .select(F.lit("anti_no_recent_order").alias("op"), *cols)
    )
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    semi = (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select(F.lit("semi_high_value").alias("op"), *cols)
    )
    return anti.unionByName(semi).orderBy("op", "c_custkey")


CUSTOMER_SEMI_ANTI_ORACLE = """
SELECT * FROM (
  SELECT 'anti_no_recent_order' AS op, c_custkey, c_mktsegment, c_acctbal
  FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01')
  UNION ALL
  SELECT 'semi_high_value' AS op, c_custkey, c_mktsegment, c_acctbal
  FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
)
ORDER BY op, c_custkey
"""


def nations_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT and INTERSECT in one driver row (consolidated from two r5
    rows), tagged by ``op``:

      * ``except_high_balance`` — ``DataFrame.subtract`` (distinct
        semantics): nations that have customers but no high-balance
        (> 9000) supplier; per-side counts are NULL.
      * ``intersect`` — nations present on both sides, with per-side
        counts off one aggregate each."""
    t = load_tables(spark, sf_dir, ("customer", "supplier", "nation"))
    cn = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    sn_all = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    sn_high = t["supplier"].filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    nation = t["nation"].select(F.col("n_nationkey").alias("nationkey"), "n_name")
    diff = (
        cn.subtract(sn_high)
        .join(nation, "nationkey")
        .select(
            F.lit("except_high_balance").alias("op"),
            "nationkey",
            "n_name",
            F.lit(None).cast("long").alias("n_customers"),
            F.lit(None).cast("long").alias("n_suppliers"),
        )
    )
    counts = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .join(
            t["supplier"].groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count(F.lit(1)).alias("n_suppliers")),
            "nationkey",
        )
    )
    both = (
        cn.intersect(sn_all)
        .join(counts, "nationkey")
        .join(nation, "nationkey")
        .select(F.lit("intersect").alias("op"), "nationkey", "n_name", "n_customers", "n_suppliers")
    )
    return diff.unionByName(both).orderBy("op", "nationkey")


NATIONS_SETOPS_ORACLE = """
SELECT * FROM (
  SELECT 'except_high_balance' AS op, n_nationkey AS nationkey, n_name,
         CAST(NULL AS BIGINT) AS n_customers, CAST(NULL AS BIGINT) AS n_suppliers
  FROM nation
  WHERE n_nationkey IN (
    SELECT c_nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
  )
  UNION ALL
  SELECT 'intersect' AS op, nationkey, n_name, n_customers, n_suppliers FROM (
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1
  ) c
  JOIN (
    SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1
  ) s USING (nationkey)
  JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n USING (nationkey)
  WHERE nationkey IN (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
)
ORDER BY op, nationkey
"""


SALT = 16


def events_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the (Zipfian) events user_id key:
    phase 1 aggregates (user_id, salt) partials, phase 2 merges the SALT
    partials per user. Result is identical to a plain groupBy (the oracle
    is the unsalted SQL); the plan bounds the hottest reducer to ~1/SALT
    of the hottest key's rows. Two leaderboards off the ONE aggregate:
    top-50 spenders by total value and top-10 most active by count.
    """
    # load_events_us handles either physical ts encoding (ns-longs or native
    # micros); ts/us are never selected here so they're pruned from the scan.
    from mega_data_factory_spark.session import load_events_us

    ev = load_events_us(spark, sf_dir).withColumn("__salt", (F.xxhash64("event_id") % SALT))
    partial = ev.groupBy("user_id", "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("__v"),
    )
    totals = partial.groupBy("user_id").agg(
        F.sum("__n").alias("n_events"),
        # round(dec, 2) -> double: engine-identical at any magnitude (see
        # plans/relational.py _dec_sum)
        F.round(F.sum("__v").cast("decimal(38,6)"), 2).cast("double").alias("total_value"),
    )
    by_value = (
        totals.orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(50)
        .select(F.lit("by_value").alias("ranking"), "user_id", "n_events", "total_value")
    )
    by_count = (
        totals.orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(10)
        .select(F.lit("by_count").alias("ranking"), "user_id", "n_events", "total_value")
    )
    return by_value.unionByName(by_count).orderBy("ranking", "user_id")


SALTED_TOTALS_ORACLE = """
WITH totals AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_value
  FROM events
  GROUP BY user_id
)
SELECT * FROM (
  SELECT 'by_value' AS ranking, user_id, n_events, total_value
  FROM totals ORDER BY total_value DESC, user_id LIMIT 50
)
UNION ALL
SELECT * FROM (
  SELECT 'by_count' AS ranking, user_id, n_events, total_value
  FROM totals ORDER BY n_events DESC, user_id LIMIT 10
)
ORDER BY ranking, user_id
"""


QUERIES = {
    # Rotation wave 8 (round 10): RE-promoted after two retired rounds —
    # with the promotion queue drained, rotation's job is keeping
    # "retired" from meaning "unwatched by the driver": long-retired rows
    # cycle back into the window while long-green veterans take their
    # place at the pytest bar (topk_orders's slot carries this row).
    "nations_setops": nations_setops,
}

ORACLE = {
    "nations_setops": NATIONS_SETOPS_ORACLE,
}

# Rotation wave 9 (round 11): events_salted_user_totals retires after ten
# straight hash-green rounds — the salted-aggregation rewrite keeps its
# exact oracle bar here while skew handling stays driver-covered by
# skew_split_join (hot-key census + split join, the same skew family);
# its slot carries the re-promoted events_json_props row (plans/events.py).
RETIRED_QUERIES = {
    "events_salted_user_totals": events_salted_user_totals,
    # Rotation wave 10 (round 12): customer_semi_anti_join retires after
    # eleven straight hash-green rounds — LEFT SEMI / LEFT ANTI stay
    # driver-covered by url_filter_full's broadcast anti-join and
    # bloom_pruned_join (plans/join_queries.py) while the exact oracle
    # bar stays here; its slot carries the re-promoted
    # events_first_per_user_type row (plans/events.py).
    "customer_semi_anti_join": customer_semi_anti_join,
}
RETIRED_ORACLE = {
    "events_salted_user_totals": SALTED_TOTALS_ORACLE,
    "customer_semi_anti_join": CUSTOMER_SEMI_ANTI_ORACLE,
}
