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
