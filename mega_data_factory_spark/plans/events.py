"""Event-stream analytics queries (batch form) with DuckDB oracles.

All event-time logic runs on **microsecond bigints** derived by
``session.load_events_us`` (adaptive to the parquet's physical timestamp
encoding, == DuckDB ``epoch_us(ts)``), keeping every comparison exact and
engine-neutral. The streaming variants of these queries (watermarked
tumbling windows, session windows) live in streaming/.

Scale notes: hourly rollup is a single partial-aggregated shuffle keyed on
(hour, type); sessionization shuffles once on user_id and sorts within
partitions — the canonical "segment by gap then aggregate" plan that holds
at any scale where one user's events fit an executor (they do: AQE splits
pathological users only if a single key exceeds partition limits, at which
point session windows via applyInPandasWithState are the streaming answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mega_data_factory_spark.session import load_events_us

DEC = "decimal(18,6)"
DECW = "decimal(38,6)"
# sum emission = round(decimal_sum, 2) -> double: see plans/relational.py
# _dec_sum for why the decimal-space HALF_UP round is required for
# engine-identical doubles at corpus-scale magnitudes.
HOUR_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events_us(spark, sf_dir)


def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time rollup by type (the batch form of the
    watermarked streaming window)."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hour_start_us", (F.col("us") - (F.col("us") % HOUR_US)))
        .groupBy("hour_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast(DECW), 2).cast("double").alias("sum_value"),
        )
        .orderBy("hour_start_us", "event_type")
    )


HOURLY_ORACLE = f"""
SELECT (epoch_us(ts) - (epoch_us(ts) % {HOUR_US})) AS hour_start_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min of
    user inactivity. Output: one row per session with bounds and exact
    value totals. Single shuffle on user_id; lag + running-sum windows."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "new_session",
            F.when(F.col("prev_us").isNull() | ((F.col("us") - F.col("prev_us")) > SESSION_GAP_US), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(run))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.round(F.sum(F.col("value").cast(DEC)).cast(DECW), 2).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       MIN(us) AS session_start_us, MAX(us) AS session_end_us,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type profile: counts, exact sums, distinct users, derived
    average, and exact interpolated percentiles — the metrics aggregate
    shape (reference per-operator stats, operator.py:119-184) plus the
    distribution columns, all in ONE groupBy (one shuffle). Spark
    ``percentile`` and DuckDB ``quantile_cont`` use the same interpolated
    definition but different FP expression forms, which drift by 1 ulp at
    some row counts (seen at the 10x scale dir) — both sides round to 6dp.
    ``percentile_approx``/t-digest is the approximate scale path."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast(DECW), 2).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.95), 6).alias("p95"),
            F.round(F.percentile("value", 0.99), 6).alias("p99"),
        )
        .withColumn("avg_value", F.round(F.col("sum_value") / F.col("n_events"), 6))
        .orderBy("event_type")
    )


TYPE_STATS_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99,
       ROUND(CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) / COUNT(*), 6) AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type): the generic keyed-dedup operator on a
    genuinely streaming-shaped table (earliest microsecond, then event_id)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "us")
        .orderBy("user_id", "event_type")
    )


FIRST_PER_USER_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
)
SELECT user_id, event_type, event_id, us FROM ranked WHERE rn = 1
ORDER BY user_id, event_type
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction over the ``props`` JSON-string column (SURVEY
    §2.8: the reference's nested-path partition-key extraction,
    parquet_writer.py:57-93, over dict-or-JSON-string): pull ``$.k``,
    bucket it, count per bucket. get_json_object evaluates inside codegen —
    no UDF, and only the two referenced columns are scanned."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "event_type")
        .withColumn("k_bucket", F.col("k") - (F.col("k") % 10))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("k_bucket")
    )


JSON_PROPS_ORACLE = """
SELECT CAST(props->>'$.k' AS BIGINT) - (CAST(props->>'$.k' AS BIGINT) % 10) AS k_bucket,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types
FROM events
GROUP BY 1
ORDER BY 1
"""


def events_user_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type next to the
    exact count — the 100 TB cardinality path (no exact distinct shuffle;
    sketches merge associatively). No SQL oracle: HLL sketches are
    engine-specific, so the driver records rows-only; the test suite
    asserts <=5% relative error against the exact count."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


# events_type_stats is consolidated OUT of the driver window: every stat
# family it exercises is driver-covered elsewhere (counts + decimal sums +
# derived averages by q1_pricing_summary, time-bucketed aggregation by
# events_hourly_agg, count_distinct and exact interpolated percentiles by
# column_profile's exact mode). It keeps the SAME oracle-differential bar
# in tests/test_events.py::test_type_stats_matches_oracle. The freed slot
# carries the dsir_select row (plans/curation.py).
QUERIES = {
    "events_sessionize": events_sessionize,
    "events_user_approx_distinct": events_user_approx_distinct,
    # Rotation wave 9 (round 11): events_json_props RE-promoted after two
    # retired rounds (wave 5) — JSON-path extraction rotates back under
    # the driver's eye; its slot comes from events_salted_user_totals
    # (plans/setops.py) moving to the pytest bar.
    "events_json_props": events_json_props,
    # Rotation wave 10 (round 12): events_first_per_user_type RE-promoted
    # after five retired rounds (wave 3, the longest-retired row) — its
    # slot comes from customer_semi_anti_join (plans/setops.py)
    # moving to the pytest bar.
    "events_first_per_user_type": events_first_per_user_type,
    # Rotation wave 10 (round 12): events_hourly_agg RE-promoted after two
    # retired rounds (wave 8); its slot comes from doc_chunks
    # (plans/curation.py) moving to the pytest bar.
    "events_hourly_agg": events_hourly_agg,
}

ORACLE = {
    "events_sessionize": SESSIONIZE_ORACLE,
    "events_json_props": JSON_PROPS_ORACLE,
    "events_first_per_user_type": FIRST_PER_USER_ORACLE,
    "events_hourly_agg": HOURLY_ORACLE,
}

RETIRED_QUERIES = {}
RETIRED_ORACLE = {}
