"""Time-series regularization: per-key dense daily spine + LOCF.

The reference's domain is daily market data with holiday gaps
(`dags/brz_*_daily`, the prev-working-day as-of patterns); every
consumer of such a lake eventually needs the *resample* step —
"give me one row per (ticker, calendar day), carrying the last
observation forward" — so it is a first-class operator rather than a
per-query window idiom. Complements :mod:`capital.operators.asof`
(as-of joins BETWEEN two frames) and ``f14``'s zero-fill (which
fills with a constant, not the last observation).

Semantics: for each key, a dense daily spine spans the key's own
[min(date), max(date)] (or a caller-supplied spine); observed values
forward-fill (last observation carried forward); ``gap_days`` reports
the distance to the carried observation and ``is_observed`` marks
real rows. ``max_gap_days`` bounds the carry (a price quote from two
years ago is not a price) — beyond it the fill nulls out, the
monitoring-friendly behavior.

Shape at scale: ONE hash exchange of the raw rows by key up front —
``HashPartitioning(key)`` satisfies every downstream clustering
requirement (the (key, date) aggregate, the bounds aggregate, the
spine↔obs equi-join, the per-key window), so the whole pipeline runs
on a single shuffle with no re-exchange. The join is pinned to a
co-partitioned sort-merge (``hint("merge")``): without it Catalyst
broadcasts the observation side, which re-buys the join for the price
of building+probing a keys×days hashed relation per task AND forces a
fresh window exchange — measured 2.6 s vs 1.2 s at sf0.1, and at
100 TB the obs side outgrows any broadcast. The spine is a narrow
per-key ``sequence`` explode (keys × days rows — the OUTPUT size,
nothing quadratic). No driver work, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def regularize_daily(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    max_gap_days: int | None = None,
) -> DataFrame:
    """Per-key dense daily series with last-observation-carried-forward.

    Multiple observations on one (key, day) reduce with ``max`` (a
    deterministic, order-free tie-break; pre-aggregate upstream for a
    different policy). Returns one row per (key, date) in the key's
    observed span: ``(key, date, value, is_observed, gap_days)`` —
    ``value`` is the carried observation (null before the first
    observation, and beyond ``max_gap_days`` when set), ``gap_days``
    the age of the carried value (0 on observed days).
    """
    key = F.col(key_col)
    day = F.col(date_col).cast("date")
    obs = (
        df.select(key.alias("key"), day.alias("date"),
                  F.col(value_col).alias("__v"))
        .repartition(F.col("key"))
        .groupBy("key", "date")
        .agg(F.max("__v").alias("__v"))
    )
    bounds = obs.groupBy("key").agg(
        F.min("date").alias("__d0"), F.max("date").alias("__d1")
    )
    spine = bounds.select(
        "key",
        F.explode(
            F.sequence(F.col("__d0"), F.col("__d1"), F.expr("interval 1 day"))
        ).alias("date"),
    )
    joined = spine.join(obs.hint("merge"), ["key", "date"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy(F.asc("date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__v", ignorenulls=True).over(w)
    last_obs_date = F.last(
        F.when(F.col("__v").isNotNull(), F.col("date")), ignorenulls=True
    ).over(w)
    gap = F.datediff(F.col("date"), last_obs_date)
    value: Column = carried
    if max_gap_days is not None:
        value = F.when(gap <= int(max_gap_days), carried)
    return joined.select(
        F.col("key").alias(key_col),
        "date",
        value.alias(value_col),
        F.col("__v").isNotNull().alias("is_observed"),
        gap.alias("gap_days"),
    )


def ohlc_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Daily OHLC candles from tick-level observations — the other
    half of the resample family (:func:`regularize_daily` densifies a
    daily series; this reduces ticks TO the daily series). The
    reference ingests pre-built OHLCV panels (yfinance/Binance
    klines); this builds the same panel from raw ticks.

    Determinism: open/close are ``min_by``/``max_by`` over the
    composite ordering ``(ts, id)`` — the id breaks same-timestamp
    ties, so simultaneous ticks cannot make open/close
    partition-order-dependent (the a4 first-wins discipline; the SQL
    twin orders by ``[epoch_us(ts), id]``, the same lexicographic
    order). Open/high/low/close are PICKED raw values, never
    arithmetic — float-parity safe by construction; ``turnover``
    accumulates as DECIMAL.

    One map-side-combined aggregate per (key, day): no window, no
    sort, no shuffle beyond the grouped partials.
    """
    day = F.col(ts_col).cast("date")
    order = F.struct(F.col(ts_col), F.col(id_col))
    v = F.col(value_col)
    return (
        df.select(
            F.col(key_col).alias("key"),
            day.alias("date"),
            F.col(ts_col),
            F.col(id_col),
            v.alias("__v"),
        )
        .groupBy("key", "date")
        .agg(
            F.min_by("__v", order).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", order).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.col("__v").cast("decimal(28,6)"))
            .cast("double")
            .alias("turnover"),
        )
        .withColumnRenamed("key", key_col)
    )
