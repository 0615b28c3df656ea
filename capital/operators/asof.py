"""As-of (backward-looking temporal) joins and working-day lookups.

The reference's semantically richest query is a correlated scalar
subquery: "the most recent non-holiday calendar date strictly before
today" (reference: dags/brz_kr_etf_daily/brz_kr_etf_daily.py:21-33).
This module generalizes it into two engine operators:

- :func:`previous_working_day` — the exact reference semantics over a
  calendar dimension, as a window computation.
- :func:`asof_join` — a scalable generic backward as-of join
  (left row ← latest right row with ``right.time <= left.time`` per
  key), built as union + window rather than a correlated subquery.

Scale design: the union+window formulation shuffles each side **once**
on (key) and sorts within partitions by time — the same cost profile as
a sort-merge join, with no row explosion. A correlated-subquery or
range-join formulation explodes to |left|×|right-per-key| intermediate
rows; at 100 TB that is the difference between one shuffle and a
cartesian blowup. Skewed keys are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def previous_working_day(
    calendar: DataFrame,
    date_col: str = "date",
    holiday_col: str = "is_market_holiday",
) -> DataFrame:
    """Attach ``previous_working_day`` to each calendar row.

    For every date: the latest strictly-earlier date that is not a
    market holiday — the window rewrite of the reference's correlated
    ``(SELECT MAX(d2.date) ... WHERE d2.date < d.date AND NOT
    d2.is_market_holiday)``.

    The calendar is a broadcast-sized dimension, so the single
    unpartitioned ordered window is intentional; do not apply this to
    fact-scale data (use :func:`asof_join` there).
    """
    w = (
        Window.orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_open = F.last(
        F.when(~F.col(holiday_col), F.col(date_col)), ignorenulls=True
    ).over(w)
    return calendar.withColumn("previous_working_day", prev_open)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    allow_exact_match: bool = True,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    Implementation (one shuffle per side, no row explosion):

    1. tag both sides and union on (key, time, side, payload);
    2. per key, order by (time, side-priority) and carry the last seen
       right-side payload forward with ``last(..., ignorenulls)``;
    3. keep only left rows.

    ``allow_exact_match=False`` makes ties strictly-before (right rows
    at the same timestamp are not visible), matching the reference's
    ``d2.date < d.date``.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    # Side priority: right rows sort before left rows at equal time when
    # exact matches are allowed (so the left row sees them), after when not.
    right_prio, left_prio = (0, 1) if allow_exact_match else (1, 0)

    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(left_prio).alias("__prio"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols).alias("s")).schema["s"].dataType
        ).alias("__right"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(right_prio).alias("__prio"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__left"),
        F.struct(*value_cols).alias("__right"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__prio")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__asof", F.last("__right", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__left").isNotNull()).select(
        "__left.*",
        *[F.col(f"__asof.{c}").alias(c) for c in value_cols],
    )
    return out


def max_where(df: DataFrame, target: Column, predicate: Column, alias: str) -> DataFrame:
    """Scalar MAX-with-predicate (reference A1 shape)."""
    return df.agg(F.max(F.when(predicate, target)).alias(alias))
