"""Ordered multi-step funnel conversion over an event stream.

The product-analytics staple the two-step attribution join
(``streaming/incremental.stream_stream_interval_join``) doesn't
cover: how many users complete step1 → step2 → … → stepK **in
order** (each step's event at-or-after the previous step's earliest
completion), and where does the funnel leak.

Semantics (the standard "earliest completion" funnel): per user,
``t₁ = min ts of step₁``; ``tᵢ = min ts of stepᵢ with ts ≥ tᵢ₋₁``.
A user converts through step i iff tᵢ exists. Using the *earliest*
qualifying event at each step is deterministic and monotone — adding
later events never un-converts a user.

Shape at scale: one filtered aggregation per step — step i's
aggregate is events(type=stepᵢ) joined to the (USER-sized) tᵢ₋₁
frame and min-reduced with map-side combine. K steps = K passes over
the (pruned, type-filtered) event scan and K user-sized shuffles; no
windows over the raw stream, no per-user sorting. The per-step
frames are exactly the funnel-analytics rollup a dashboard reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user earliest completion time of each step, in order:
    ``(user, t1, t2, …, tK)`` with NULL from the first uncompleted
    step onward. One row per user who completed step 1."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, F.col(f"t{i - 1}")), user_col)
            .filter(F.col(ts_col) >= F.col(f"t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The funnel rollup: one row per step —
    ``(step_idx, step, n_users, conv_from_first, conv_from_prev)``
    with rates as exact ratios rounded to 6 (both engines compute
    ``n_i/n_1`` on identical longs — same IEEE division)."""
    times = funnel_times(events, steps, user_col, type_col, ts_col)
    counts = times.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        r = counts.select(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"n{i}").alias("n_users"),
            F.round(F.col(f"n{i}") / F.col("n1"), 6).alias(
                "conv_from_first"
            ),
            F.round(
                F.col(f"n{i}") / F.col(f"n{max(i - 1, 1)}"), 6
            ).alias("conv_from_prev"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows
