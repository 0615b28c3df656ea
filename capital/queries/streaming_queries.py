"""Event-time windowing surface (SURVEY.md §2.9) in batch-checkable
form: the same ``capital.streaming`` operators run on the static
``events`` table (Spark's window/session_window are engine-identical in
batch and streaming), so the driver's DuckDB oracle can check them.
Real stream execution (file source, AvailableNow, checkpoints,
watermarks) is exercised in tests/test_streaming.py.

Oracles cast ``ts`` to microsecond TIMESTAMP first — the engine floors
parquet's nanosecond timestamps to micros at load (capital.io), and gap
comparisons must happen at the same precision on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.queries.registry import query
from capital.streaming.incremental import session_windows, tumbling_counts


@query(
    "st_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
             AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def st_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows (the Interval enum cadences,
    dags/common/constants.py:4-13, as real windows)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


@query(
    "st_sliding_2h_1h",
    oracle="""
    WITH shifted AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
             event_type, value FROM events
      UNION ALL
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR,
             event_type, value FROM events)
    SELECT window_start,
           window_start + INTERVAL 2 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM shifted
    GROUP BY 1, 2, 3
    """,
)
def st_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): each event contributes to
    two windows — engine-extension surface over ``events``."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "st_interval_cadences",
    oracle="""
    SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS week_start,
           strftime(o_orderdate, '%Y%m') AS month_id,
           strftime(o_orderdate, '%Y') || 'Q' || CAST(quarter(o_orderdate) AS VARCHAR)
             AS quarter_id,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def st_interval_cadences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Interval enum cadences (daily/weekly/monthly/
    quarterly/yearly collection schedules, dags/common/constants.py:
    4-13) as one tumbling rollup: weekly grain with month/quarter/year
    labels derived in the same pass."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.date_format("o_orderdate", "yyyyMM").alias("month_id"),
        F.concat(
            F.date_format("o_orderdate", "yyyy"),
            F.lit("Q"),
            F.quarter("o_orderdate"),
        ).alias("quarter_id"),
        F.year("o_orderdate").alias("year"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "st_session_30m",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def st_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30 min). The oracle is the
    classic islands formulation; Spark's ``session_window`` merges
    events whose gap is strictly less than 30 min — hence ``>=`` starts
    a new session in the oracle."""
    return session_windows(load_table(spark, sf_dir, "events"), "30 minutes")


@query(
    "st_stream_join_attribution",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(epoch(date_trunc('second', CAST(p.ts AS TIMESTAMP)))
                - epoch(date_trunc('second', CAST(c.ts AS TIMESTAMP)))
             AS BIGINT) AS delay_sec
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP)
           <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
)
def st_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join in batch-checkable form: purchases
    attributed to a same-user click within the prior 30 minutes. The
    identical operator runs on real streams (watermarked, bounded
    state) in tests/test_streaming.py; batch and stream converge for
    inner joins."""
    from capital.io import parallelize_narrow
    from capital.streaming.incremental import stream_stream_interval_join

    # Single-file parquet = one input split, and a broadcast join
    # inherits the probe scan's split count — spread the probe side.
    ev = parallelize_narrow(load_table(spark, sf_dir, "events"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = stream_stream_interval_join(
        clicks, buys, on="user_id",
        left_ts="click_ts", right_ts="purchase_ts",
        within="30 minutes",
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            F.col("purchase_ts").cast("long")
            - F.col("click_ts").cast("long")
        ).alias("delay_sec"),
    )


@query(
    "st_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def st_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicatesWithinWatermark) in its
    batch-checkable form: surviving key set after duplicate-event
    suppression. Which *row* survives per key is arrival-order
    dependent in a stream, so the deterministic check is the key set;
    watermark/state-eviction behavior is exercised on a real stream in
    tests/test_streaming.py (test_stream_dedup_within_watermark)."""
    from capital.streaming.incremental import dedup_within_watermark

    ev = load_table(spark, sf_dir, "events")
    return dedup_within_watermark(ev, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
