"""Mergeable-sketch rollups (Apache DataSketches via Spark 4 SQL
functions): the pre-aggregation pattern that makes interactive
analytics feasible at 100 TB.

The idea: aggregate raw facts **once** into tiny mergeable sketch
blobs per (partition-key, group) — e.g. one HLL per (day, event_type)
— and answer every later query by merging sketches instead of
rescanning facts:

- distinct users over any date range → ``hll_union_agg`` over the
  range's daily sketches (KBs) instead of a 100 TB rescan;
- "p95 latency last quarter" → merge daily KLL sketches and query the
  quantile.

Error is bounded and configurable (HLL: ~1.04/√2^lgK ≈ 1.6 % at the
default lgK=12; KLL: ~1.7 % rank error at k=200), and sketches are
deterministic for a given input multiset, so rollup-then-merge equals
direct sketching of the union — the invariant the tests pin.

The exact twins live elsewhere in the engine (``a7_distinct_agg``,
``a9_exact_quantiles``); sketches are the scale path when the exact
forms' shuffles get too big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``key_col`` per (day, *group_cols) — the
    materialized rollup a daily job appends to the lake. Map-side
    partial aggregation reduces each task to one sketch blob per group
    before the exchange."""
    return (
        events.withColumn("day", F.to_date(F.col(ts_col)))
        .groupBy("day", *group_cols)
        .agg(
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias(
                "distinct_sketch"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def rollup_distinct(
    sketches: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Merge daily sketches up to ``group_cols`` and estimate distinct
    counts. Input is the (tiny) rollup table, not the facts — this is
    the query that replaces a full rescan."""
    return (
        sketches.groupBy(*group_cols)
        .agg(
            F.hll_union_agg(F.col(sketch_col)).alias("merged"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            *group_cols,
            F.hll_sketch_estimate("merged")
            .cast("long")
            .alias("approx_distinct"),
            "n_rows",
        )
    )


def daily_value_sketches(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    k: int = 200,
) -> DataFrame:
    """One KLL(double) quantile sketch of ``value_col`` per (day,
    *group_cols)."""
    return (
        events.filter(F.col(value_col).isNotNull())
        .withColumn("day", F.to_date(F.col(ts_col)))
        .groupBy("day", *group_cols)
        .agg(
            F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias(
                "value_sketch"
            )
        )
    )


def rollup_quantiles(
    sketches: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    group_cols: tuple[str, ...] = ("event_type",),
    sketch_col: str = "value_sketch",
) -> DataFrame:
    """Merge daily KLL sketches and read quantiles — approximate
    percentiles over any range without touching raw values."""
    # kll_sketch_merge_double is a pairwise scalar merge (no aggregate
    # form): gather each group's daily sketches and fold. Groups hold
    # O(days) KB-sized blobs, so the collect_list stays tiny even when
    # the underlying facts are petabytes — that's the whole point of
    # the rollup.
    merged = (
        sketches.groupBy(*group_cols)
        .agg(F.collect_list(sketch_col).alias("__sks"))
        .withColumn(
            "merged",
            F.aggregate(
                F.slice(
                    "__sks",
                    F.lit(2),
                    F.greatest(F.size("__sks") - 1, F.lit(0)),
                ),
                F.element_at("__sks", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ),
        )
    )
    cols = [
        F.round(
            F.kll_sketch_get_quantile_double(F.col("merged"), F.lit(q)), 6
        ).alias(f"q{int(q * 100)}")
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)
