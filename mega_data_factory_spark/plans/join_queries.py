"""As-of join, range join, and full-URL-filter queries with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mega_data_factory_spark.operators.filters import UrlFilter
from mega_data_factory_spark.operators.joins import asof_join, range_join
from mega_data_factory_spark.session import load_events_us, load_tables


def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the user's most recent click at-or-before it
    (point-in-time correctness — the classic feature-store/as-of lookup).
    Union-window implementation: ONE shuffle on user_id, no range explosion.
    """
    ev = load_events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "us", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "us", F.col("event_id").alias("click_event_id"), F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="us",
        right_ts="us",
        right_payload=["click_event_id", "click_value"],
        suffix="",
        # duplicate-ts clicks exist in replicated/real corpora: the largest
        # click_event_id wins deterministically (mirrored in the oracle)
        right_order="click_event_id",
    )
    return out.orderBy("event_id")


ASOF_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS click_event_id, value AS click_value
  FROM events WHERE event_type = 'click'
),
ranked AS (
  SELECT p.event_id, p.user_id, p.us, p.value, c.click_event_id, c.click_value,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.us DESC, c.click_event_id DESC) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.us <= p.us
)
SELECT event_id, user_id, us, value, click_event_id, click_value
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


PRICE_DISTANCE = 0.05


def parts_price_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs priced within $0.05 of each other: bucketized range join
    (equi-join on price buckets + exact filter — no O(n^2) theta join)."""
    t = load_tables(spark, sf_dir, ("part",))
    base = t["part"].select("p_partkey", "p_retailprice")
    left = base.select(F.col("p_partkey").alias("a_key"), F.col("p_retailprice").alias("a_price"))
    right = base.select(F.col("p_partkey").alias("b_key"), F.col("p_retailprice").alias("b_price"))
    pairs = range_join(
        left,
        right,
        left_val="a_price",
        right_val="b_price",
        max_distance=PRICE_DISTANCE,
        extra_cond=F.col("a_key") < F.col("b_key"),
    )
    return (
        pairs.select("a_key", "b_key", F.round(F.abs(F.col("a_price") - F.col("b_price")), 2).alias("price_diff"))
        .orderBy("a_key", "b_key")
    )


RANGE_JOIN_ORACLE = f"""
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       ROUND(ABS(a.p_retailprice - b.p_retailprice), 2) AS price_diff
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND ABS(a.p_retailprice - b.p_retailprice) <= {PRICE_DISTANCE}
ORDER BY a_key, b_key
"""


URL_BLOCKLIST = ["src3.example.com", "blocked.example"]
URL_WEIGHTS = {"casino": 0.5, "poker": 0.4}


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic URLs over documents: subdomains, blocklisted
    parents, weighted words in query strings."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"]
    sub = F.when(F.col("doc_id") % 7 == 0, F.lit("sub.")).otherwise(F.lit(""))
    tld = F.when(F.col("doc_id") % 5 == 0, F.lit(".blocked.example")).otherwise(F.lit(".example.com"))
    q = F.when(F.col("doc_id") % 11 == 0, F.lit("?q=casino+poker")).otherwise(F.lit(""))
    url = F.concat(F.lit("http://"), sub, F.col("source"), tld, F.lit("/p/"), F.col("doc_id").cast("string"), q)
    return d.select("doc_id", url.alias("url"))


URL_CORPUS_SQL = """
SELECT doc_id,
  'http://' || (CASE WHEN doc_id % 7 = 0 THEN 'sub.' ELSE '' END) || source ||
  (CASE WHEN doc_id % 5 = 0 THEN '.blocked.example' ELSE '.example.com' END) ||
  '/p/' || CAST(doc_id AS VARCHAR) ||
  (CASE WHEN doc_id % 11 = 0 THEN '?q=casino+poker' ELSE '' END) AS url
FROM documents
"""


def url_filter_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete reference URLFilter (url_filter.py:107-321): domain
    blocklist with parent-suffix matching + weighted word score, over
    synthesized URLs."""
    docs = _doc_urls(spark, sf_dir)
    f = UrlFilter(blocked_domains=URL_BLOCKLIST, word_weights=URL_WEIGHTS, threshold=0.5)
    return f.apply(docs).select("doc_id", "url").orderBy("doc_id")


def _url_oracle() -> str:
    # suffix-walk membership == exact match or '.<blocked>' suffix
    blocked = " OR ".join(
        f"(domain = '{b}' OR domain LIKE '%.{b}')" for b in URL_BLOCKLIST
    )
    # word score: single words casino(0.5)/poker(0.4); both appear together in
    # the planted query string -> score = 0.8*0.5 + least(0.9/3, 0.2) = 0.6
    wc_casino = "coalesce(len(regexp_extract_all(lower(url), '\\bcasino\\b')), 0)"
    wc_poker = "coalesce(len(regexp_extract_all(lower(url), '\\bpoker\\b')), 0)"
    m_casino = f"(CASE WHEN {wc_casino} > 0 THEN 0.5 ELSE 0.0 END)"
    m_poker = f"(CASE WHEN {wc_poker} > 0 THEN 0.4 ELSE 0.0 END)"
    score = (
        f"(CASE WHEN greatest({m_casino}, {m_poker}) > 0 "
        f"THEN 0.8 * greatest({m_casino}, {m_poker}) + least(({m_casino} + {m_poker}) / 3.0, 0.2) "
        f"ELSE 0.0 END)"
    )
    return f"""
WITH corpus AS ({URL_CORPUS_SQL.strip()}),
with_domain AS (
  SELECT doc_id, url,
    lower((CASE WHEN doc_id % 7 = 0 THEN 'sub.' ELSE '' END) || source ||
          (CASE WHEN doc_id % 5 = 0 THEN '.blocked.example' ELSE '.example.com' END)) AS domain
  FROM documents JOIN corpus USING (doc_id)
)
SELECT doc_id, url FROM with_domain
WHERE NOT ({blocked}) AND {score} < 0.5
ORDER BY doc_id
"""


BLOOM_BAL_MIN = 5000.0


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bloom_pruned_left_join`` (operators/bloom.py) end to end: orders
    left-joined to the high-balance customer slice through the Bloom
    pre-filter. The operator's contract — row-for-row equal to the plain
    left join whenever the right side is key-unique (customer is) — makes
    the oracle the plain ANSI LEFT JOIN: a false NEGATIVE anywhere in the
    fit/probe path would mis-route a matching order to the miss branch
    (NULL right columns) and hash-mismatch; false positives only cost
    pruning efficiency and are cut by the real join. Raw column passthrough
    (no arithmetic) keeps the compare exact. FPR/pruning invariants hold
    their own bar in tests/test_bloom.py."""
    from mega_data_factory_spark.operators.bloom import bloom_pruned_left_join

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    left = t["orders"].select("o_orderkey", "o_custkey", "o_orderstatus")
    right = (
        t["customer"]
        .filter(F.col("c_acctbal") >= BLOOM_BAL_MIN)
        .select(F.col("c_custkey").alias("o_custkey"), "c_acctbal", "c_mktsegment")
    )
    out = bloom_pruned_left_join(left, right, on="o_custkey", fpp=0.01)
    return out.select("o_orderkey", "o_custkey", "o_orderstatus", "c_acctbal", "c_mktsegment").orderBy(
        "o_orderkey"
    )


BLOOM_JOIN_ORACLE = f"""
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, r.c_acctbal, r.c_mktsegment
FROM orders o
LEFT JOIN (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_acctbal >= {BLOOM_BAL_MIN}
) r ON o.o_custkey = r.c_custkey
ORDER BY o.o_orderkey
"""


def skew_split_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``skew_split_join`` (operators/joins.py) end to end: purchase events
    left-joined to per-user event totals through the hybrid hot/cold join.
    The operator's contract — the hot broadcast branch and the residual
    shuffle branch partition the left rows by key, so their union equals
    the plain join row-for-row — makes the oracle the plain ANSI LEFT JOIN
    (the bloom_pruned_join oracle design): a row mis-routed between
    branches, double-counted by overlapping predicates, or dropped by the
    NULL-key guards would hash-mismatch. ``hot_threshold`` is the p999 of
    per-user purchase counts, so the hot set is the top ~0.1% whales at
    ANY scale or key distribution — the power-law fixtures push their
    whales over it (hot branch genuinely exercised), while a flat
    distribution yields zero hot keys (plain-join fallback) instead of
    tripping the operator's ``max_hot_keys`` guard, which an
    above-the-MEAN threshold would do (every above-average user is "hot"
    on a flat corpus). The threshold only routes rows between branches —
    the union is threshold-invariant, so the oracle hash is too."""
    from mega_data_factory_spark.operators.joins import skew_split_join

    ev = load_events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "value")
    totals = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total"))
    counts = purchases.groupBy("user_id").agg(F.count(F.lit(1)).alias("__c"))
    # approxQuantile returns [] on an EMPTY frame (a corpus with zero
    # purchase rows) — fall back to thr=1 (plain-join path, zero hot keys)
    # instead of IndexError-ing the gate/bench/parity sweep
    q = counts.approxQuantile("__c", [0.999], 0.001)
    thr = max(1, int(q[0])) if q else 1
    out = skew_split_join(purchases, totals, on="user_id", how="left", hot_threshold=thr)
    return out.select("event_id", "user_id", "value", "user_total").orderBy("event_id")


SKEW_JOIN_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY user_id
)
SELECT p.event_id, p.user_id, p.value, t.user_total
FROM p LEFT JOIN t ON p.user_id = t.user_id
ORDER BY p.event_id
"""


QUERIES = {
    "events_asof_purchase_click": events_asof_purchase_click,
    "bloom_pruned_join": bloom_pruned_join,
    "skew_split_join": skew_split_join_purchases,
    "url_filter_full": url_filter_full,
    # Rotation wave 8 (round 10): re-promoted after three retired rounds
    # (swap-for-freshness — text_exact_dedup's slot carries this row).
    "parts_price_range_join": parts_price_range_join,
}

ORACLE = {
    "events_asof_purchase_click": ASOF_ORACLE,
    "bloom_pruned_join": BLOOM_JOIN_ORACLE,
    "skew_split_join": SKEW_JOIN_ORACLE,
    "url_filter_full": _url_oracle(),
    "parts_price_range_join": RANGE_JOIN_ORACLE,
}

RETIRED_QUERIES = {}
RETIRED_ORACLE = {}
