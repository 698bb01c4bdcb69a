"""Custom join operators Spark's API lacks as primitives: as-of join and
range join — expressed as compositions of existing DataFrame ops (the
preferred strategy per the build brief), not UDFs.

As-of join (time-series point-in-time lookup): for each left row, the most
recent right row with ``right.ts <= left.ts`` within the same key.

Implementation is the union-window trick — the scalable formulation:
  1. tag left rows (side=1) and right rows (side=0), union on a common
     schema with right's payload columns nulled on the left side;
  2. one shuffle: window over (key) ordered by (ts, side) with
     ``last_value(payload, ignorenulls) over rows unbounded preceding``
     carries the latest right payload forward onto each left row;
  3. keep side=1 rows.
One hash-shuffle on the key, no range explosion, no skew beyond the key's
own distribution — this holds at any scale where a key's rows fit a
partition's sort spill budget (AQE skew handling otherwise).

Range join: inequality-banded join via bucketized equi-join pre-filter:
joining on ``floor(value/width)`` buckets (left matches right buckets
b-1..b+1) turns an O(n*m) theta-join into an equi-join with a bounded
candidate set, then the exact range predicate filters. This is the standard
bucketed range-join optimization (Spark's own range-join hints on
Databricks do the same).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
    right_order: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row (per ``on`` key)
    whose ``right_ts <= left_ts``; NULLs when no such row. Ties on equal
    timestamps: the right row sorts BEFORE the left row (side 0 < 1), so a
    right row at exactly left_ts matches it.

    ``right_order`` makes the choice among MULTIPLE right rows with the
    same timestamp deterministic: the one with the LARGEST value of that
    column wins (without it the window order is partial over such ties and
    the carried payload is plan-dependent — found when duplicate-timestamp
    events appeared in the 10x scale corpus). Pass the right side's unique
    id whenever timestamps can collide.
    """
    lcols = left.columns
    tie = F.col(right_order) if right_order is not None else F.lit(0)
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__payload"),
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in lcols]).alias("__row"),
    )
    unioned = l_tagged.unionByName(
        r_tagged.withColumn("__row", F.lit(None).cast(l_tagged.schema["__row"].dataType))
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ats"), F.col("__side"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in lcols if c != on],
        F.col(on),
        *[F.col(f"__last.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out.select(*lcols, *[f"{c}{suffix}" for c in right_payload])


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    how: str = "inner",
    hot_keys: list | None = None,
    hot_threshold: int = 1_000_000,
    max_hot_keys: int = 10_000,
    max_hot_right_rows: int = 5_000_000,
) -> DataFrame:
    """Hybrid hot/cold join for POWER-LAW keys (whale users, megadomains —
    the distribution every web corpus has): rows whose key is "hot" take a
    broadcast hash join against just the hot sliver of ``right``; everything
    else takes the ordinary shuffle join with the hot keys REMOVED from both
    shuffled sides. The branches partition the left rows by key, so their
    union is exactly the plain join's result (differentially tested).

    Why this beats leaning on AQE alone at 100 TB: AQE's skew-join rule
    (OptimizeSkewedJoin) splits an oversized post-shuffle partition into
    finer tasks, but every hot-key row of BOTH sides still rides the full
    shuffle — a key owning 5% of a 100 TB fact table is 5 TB of network no
    matter how the reducers are split (and for LEFT joins AQE may not split
    the non-preserved side at all). Here hot-key rows never shuffle: the
    hot branch is a map-side broadcast hash join, and the residual shuffle
    is lighter by exactly the skew. The price is one extra key-frequency
    pass — map-side combined, so its shuffle carries at most
    ``distinct-keys-per-partition`` rows, never the data.

    ``hot_keys``: pass the known whales to skip the frequency pass.
    Otherwise keys with > ``hot_threshold`` left rows are discovered with
    one ``groupBy(key).count()``. The left plan is evaluated by the
    frequency pass AND by each branch's filter — persist an expensive
    upstream left before calling (the cost note every multi-action
    operator here carries); the right side's hot sliver is cached
    internally. Guards fail loud rather than degrade:
    more than ``max_hot_keys`` hot keys (isin/broadcast list must stay
    driver-small) or more than ``max_hot_right_rows`` hot-side right rows
    (the broadcast build side must fit executors) raise with the measured
    number. ``how`` is ``inner`` or ``left``; NULL left keys never match
    and route through the cold branch (preserved under ``left``, dropped
    under ``inner`` — plain-join semantics either way).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports how='inner'|'left', got {how!r}")
    key = F.col(on)
    if hot_keys is None:
        # isNotNull BEFORE the limit: a hot NULL key (routinely the most
        # skewed key in crawl data) must not consume an overflow-guard slot
        # and let real hot keys truncate silently past max_hot_keys
        hot_rows = (
            left.filter(key.isNotNull())
            .groupBy(on).agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > hot_threshold)
            .select(on)
            .limit(max_hot_keys + 1)
            .collect()
        )
        hot_keys = [r[on] for r in hot_rows]
    else:
        # a None in a caller-supplied list poisons BOTH branch predicates
        # (NOT-IN-with-NULL: ~isin([..None..]) is NULL for every
        # non-member), silently dropping all cold rows — strip it; NULL
        # keys always route cold
        hot_keys = [k for k in hot_keys if k is not None]
    if len(hot_keys) > max_hot_keys:
        raise ValueError(
            f"{len(hot_keys)}+ keys exceed hot_threshold={hot_threshold} — "
            f"past max_hot_keys={max_hot_keys} the 'hot sliver' IS the table; "
            "raise hot_threshold (skew salting wants a handful of whales)"
        )
    if not hot_keys:
        return left.join(right, on=on, how=how)
    # right_hot is guard-bounded small — cache it so the count guard, the
    # broadcast build, and any downstream action reuse one computation of
    # the (possibly expensive) right plan's hot sliver
    right_hot = right.filter(key.isin(hot_keys)).cache()
    n_hot_right = right_hot.count()
    if n_hot_right > max_hot_right_rows:
        raise ValueError(
            f"hot keys match {n_hot_right} right rows > max_hot_right_rows="
            f"{max_hot_right_rows}; the broadcast build side would not fit — "
            "raise hot_threshold or pre-aggregate the right side"
        )
    # NULL-safe cold predicate: isin(NULL) is NULL, and a bare ~isin would
    # silently drop NULL-keyed left rows from a LEFT join
    cold_pred = key.isNull() | ~key.isin(hot_keys)
    hot_branch = left.filter(key.isin(hot_keys)).join(F.broadcast(right_hot), on=on, how=how)
    # ~isin drops NULL right keys too (NULL predicate -> filtered): correct,
    # since a NULL key matches nothing under inner/left join semantics
    cold_branch = left.filter(cold_pred).join(right.filter(~key.isin(hot_keys)), on=on, how=how)
    return hot_branch.unionByName(cold_branch)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_val: str,
    max_distance: float,
    bucket_width: float | None = None,
    extra_cond: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``|left_val - right_val| <= max_distance``
    via bucketized equi-join: each side buckets by floor(val/width); the left
    explodes to its bucket and both neighbors, the equi-join on bucket bounds
    candidates, the exact predicate filters. ``bucket_width`` defaults to
    ``max_distance`` (guarantees all matches land in adjacent buckets)."""
    width = bucket_width or max_distance
    lb = F.floor(F.col(left_val) / F.lit(width)).cast("long")
    l = left.withColumn("__b", F.explode(F.array(lb - 1, lb, lb + 1)))
    r = right.withColumn("__b", F.floor(F.col(right_val) / F.lit(width)).cast("long"))
    cond = F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(max_distance)
    if extra_cond is not None:
        cond = cond & extra_cond
    return l.join(r, on="__b").filter(cond).drop("__b")
