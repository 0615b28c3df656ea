"""Calendar-dimension and as-of queries (SURVEY.md §2 UD4, J1/J2, W1/W2).

The oracle side rebuilds the same calendar with DuckDB's
``generate_series`` and the reference's original correlated-subquery
formulation of previous-working-day — so the window rewrite is checked
against the exact semantics it replaced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.operators.asof import asof_join, previous_working_day
from capital.operators.calendar import build_calendar
from capital.queries.registry import query

_START, _END = "2024-01-01", "2026-12-31"

# DuckDB twin of build_calendar(); dayofweek() in DuckDB is already
# 0=Sunday (the Redshift convention the engine normalizes to).
_CAL_CTE = f"""
  WITH cal AS (
    SELECT
      CAST(d AS DATE) AS date,
      CAST(year(d) AS INTEGER) AS year,
      CAST(quarter(d) AS INTEGER) AS quarter,
      CAST(month(d) AS INTEGER) AS month_num,
      CAST(day(d) AS INTEGER) AS day_of_month,
      CAST(dayofweek(d) AS INTEGER) AS day_of_week,
      strftime(d, '%Y') || 'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_id,
      strftime(d, '%Y%m') AS month_id,
      strftime(d, '%b') AS month_name,
      CASE dayofweek(d)
        WHEN 0 THEN '일요일' WHEN 1 THEN '월요일' WHEN 2 THEN '화요일'
        WHEN 3 THEN '수요일' WHEN 4 THEN '목요일' WHEN 5 THEN '금요일'
        ELSE '토요일' END AS day_name,
      dayofweek(d) IN (0, 6) AS is_market_holiday
    FROM (
      SELECT unnest(generate_series(DATE '{_START}', DATE '{_END}',
                    INTERVAL 1 DAY)) AS d
    )
  )
"""


@query("cal_dim_calendar", oracle=_CAL_CTE + "SELECT * FROM cal")
def cal_dim_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD4: procedural day-loop → one sequence/explode expression pipeline."""
    return build_calendar(spark, _START, _END)


@query(
    "w1_previous_working_day",
    oracle=_CAL_CTE
    + """
    SELECT d.date,
           (SELECT MAX(d2.date) FROM cal d2
            WHERE d2.date < d.date AND NOT d2.is_market_holiday)
             AS previous_working_day
    FROM cal d
    """,
)
def w1_previous_working_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/W1: the reference's correlated scalar subquery as a window.

    Cited reference semantics: dags/brz_kr_etf_daily/brz_kr_etf_daily.py:21-33.
    """
    cal = build_calendar(spark, _START, _END)
    return previous_working_day(cal).select("date", "previous_working_day")


@query(
    "j1_asof_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS event_date,
           (SELECT MAX(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
             AS last_orderdate
    FROM events e
    """,
)
def j1_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic backward as-of join: each event ← latest order of that
    customer at-or-before the event time (union+window, one shuffle per
    side — see capital/operators/asof.py scale notes)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("last_orderdate"),
        )
        # As-of wants the latest right row per (key, time); pre-reducing
        # duplicates per timestamp keeps the union small.
        .distinct()
    )
    joined = asof_join(
        events,
        orders.withColumn("t", F.col("last_orderdate")),
        on="user_id",
        left_time="ts",
        right_time="t",
        value_cols=["last_orderdate"],
        allow_exact_match=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("date").alias("event_date"),
        "last_orderdate",
    )


@query(
    "j2_semi_join_open_days",
    oracle=_CAL_CTE
    + """
    SELECT CAST(e.ts AS DATE) AS event_date, COUNT(*) AS n_events
    FROM events e
    WHERE EXISTS (
      SELECT 1 FROM cal c
      WHERE c.date = CAST(e.ts AS DATE) AND NOT c.is_market_holiday)
    GROUP BY CAST(e.ts AS DATE)
    """,
)
def j2_semi_join_open_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: calendar semi-join gate — keep only events on open-market days
    (reference gate: dags/brz_kr_etf_daily/tasks.py:13-27). The calendar
    side is broadcast: no shuffle of the fact table."""
    events = load_table(spark, sf_dir, "events")
    open_days = build_calendar(spark, _START, _END).filter(
        ~F.col("is_market_holiday")
    )
    gated = events.withColumn("event_date", F.col("ts").cast("date")).join(
        F.broadcast(open_days.select(F.col("date").alias("event_date"))),
        "event_date",
        "left_semi",
    )
    return gated.groupBy("event_date").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "w2_year_end_last_weekday",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           MAX(CASE WHEN dayofweek(o_orderdate) NOT IN (0, 6)
                    THEN CAST(o_orderdate AS DATE) END) AS last_weekday
    FROM orders
    GROUP BY year(o_orderdate)
    """,
)
def w2_year_end_last_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: last weekday order date per year (reference walks back from
    Dec 31 procedurally: dags/brz_kr_etf_daily/tasks_deprecated.py:35-42;
    here one conditional MAX aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    dow0 = F.dayofweek("o_orderdate") - F.lit(1)
    return orders.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.max(
            F.when(~dow0.isin(0, 6), F.col("o_orderdate").cast("date"))
        ).alias("last_weekday")
    )
