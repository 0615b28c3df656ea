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
from capital.operators.calendar import build_calendar, merge_holidays
from capital.queries.registry import query

_START, _END = "2024-01-01", "2026-12-31"

#: Deterministic KRX-style holiday fixture (2024–2025 Korean market
#: closures). Single source of truth: the XML the engine parses (F15
#: path), the Spark merge, and the oracle's VALUES list are all
#: generated from this constant, per the house llm_queries convention.
_HOLIDAYS = [
    ("2024-01-01", "신정"),
    ("2024-02-09", "설날"),
    ("2024-02-12", "대체공휴일"),
    ("2024-03-01", "삼일절"),
    ("2024-04-10", "국회의원선거일"),
    ("2024-05-01", "근로자의날"),
    ("2024-05-06", "대체공휴일"),
    ("2024-05-15", "부처님오신날"),
    ("2024-06-06", "현충일"),
    ("2024-08-15", "광복절"),
    ("2024-09-17", "추석"),
    ("2024-09-18", "추석"),
    ("2024-10-03", "개천절"),
    ("2024-10-09", "한글날"),
    ("2024-12-25", "성탄절"),
    ("2024-12-31", "연말휴장일"),
    ("2025-01-01", "신정"),
    ("2025-01-28", "설날"),
    ("2025-01-29", "설날"),
    ("2025-01-30", "설날"),
    ("2025-03-03", "대체공휴일"),
    ("2025-05-01", "근로자의날"),
    ("2025-05-05", "어린이날"),
    ("2025-05-06", "대체공휴일"),
    ("2025-06-06", "현충일"),
    ("2025-08-15", "광복절"),
    ("2025-10-03", "개천절"),
    ("2025-10-06", "추석"),
    ("2025-10-07", "추석"),
    ("2025-10-08", "대체공휴일"),
    ("2025-10-09", "한글날"),
    ("2025-12-25", "성탄절"),
    ("2025-12-31", "연말휴장일"),
]

_HOLIDAY_XML = (
    "<response><body><items>"
    + "".join(
        f"<item><locdate>{d.replace('-', '')}</locdate>"
        f"<dateName>{n}</dateName></item>"
        for d, n in _HOLIDAYS
    )
    + "</items></body></response>"
)

_HOLIDAY_VALUES = ",\n      ".join(
    f"(DATE '{d}', '{n}')" for d, n in _HOLIDAYS
)

#: Oracle twin of merge_holidays() on top of the calendar CTE.
_MERGED_CTE_TAIL = f"""
  , hol AS (
    SELECT * FROM (VALUES {_HOLIDAY_VALUES}) AS t(hdate, hname)
  ), hol1 AS (
    SELECT hdate, MIN(hname) AS holiday_name FROM hol GROUP BY hdate
  ), merged AS (
    SELECT c.date,
           c.day_of_week,
           (c.is_market_holiday OR h.hdate IS NOT NULL)
             AS is_market_holiday,
           h.holiday_name
    FROM cal c LEFT JOIN hol1 h ON c.date = h.hdate
  )
"""

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
    "cal_holiday_merged",
    oracle=_CAL_CTE + _MERGED_CTE_TAIL + "SELECT * FROM merged",
)
def cal_holiday_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real KRX holidays merged into the calendar: the weekend-only
    simplification (sql.py:72-75) ORed with the fetched holiday table
    (dags/brz_kr_market_holiday_daily/tasks.py:8-37) — exercising the
    F15 XML parse path end-to-end on a deterministic fixture."""
    from capital.sources.xml_holiday import holidays_to_dataframe

    cal = build_calendar(spark, _START, _END)
    hol = holidays_to_dataframe(spark, _HOLIDAY_XML)
    return merge_holidays(cal, hol).select(
        "date", "day_of_week", "is_market_holiday", "holiday_name"
    )


@query(
    "w1b_previous_open_day_merged",
    oracle=_CAL_CTE
    + _MERGED_CTE_TAIL
    + """
    SELECT d.date,
           (SELECT MAX(d2.date) FROM merged d2
            WHERE d2.date < d.date AND NOT d2.is_market_holiday)
             AS previous_working_day
    FROM merged d
    """,
)
def w1b_previous_open_day_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 re-verified against the holiday-merged calendar: previous
    *open market day* now skips real closures (e.g. the day before
    2024-02-12 설날 bridge resolves back to 2024-02-08), not just
    weekends — the discrepancy SURVEY §7 flags between the reference's
    two calendar models, answered on the merged truth."""
    from capital.sources.xml_holiday import holidays_to_dataframe

    cal = build_calendar(spark, _START, _END)
    merged = merge_holidays(cal, holidays_to_dataframe(spark, _HOLIDAY_XML))
    return previous_working_day(merged).select(
        "date", "previous_working_day"
    )


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


# --- time-series regularization (dense spine + LOCF) ---------------------

_TS_MAX_GAP = 30


@query(
    "ts_regularize_ffill",
    oracle=f"""
    WITH obs AS (
      SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS date,
             MAX(l_extendedprice) AS v
      FROM lineitem GROUP BY 1, 2),
    b AS (SELECT k, MIN(date) AS d0, MAX(date) AS d1 FROM obs GROUP BY k),
    spine AS (
      SELECT k, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                     AS DATE) AS date
      FROM b),
    j AS (
      SELECT spine.k, spine.date, obs.v
      FROM spine LEFT JOIN obs
        ON spine.k = obs.k AND spine.date = obs.date),
    f AS (
      SELECT k, date, v,
             LAST_VALUE(v IGNORE NULLS) OVER wcum AS carried,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN date END
                        IGNORE NULLS) OVER wcum AS lastd
      FROM j
      WINDOW wcum AS (PARTITION BY k ORDER BY date
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT k AS l_suppkey, date,
           CASE WHEN date - lastd <= {_TS_MAX_GAP} THEN carried END
             AS last_price,
           v IS NOT NULL AS is_observed,
           CAST(date - lastd AS INT) AS gap_days
    FROM f
    """,
)
def ts_regularize_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/resample.regularize_daily):
    one row per (supplier, calendar day) across each supplier's
    observed shipping span, daily max extended price carried forward
    up to 30 days (stale carries null out — a month-old price is not
    a price). The resample step every daily-market lake needs between
    sparse observations and window analytics; spine explode is narrow,
    the fill is one window per key."""
    from capital.operators.resample import regularize_daily

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice"
    )
    out = regularize_daily(
        li,
        key_col="l_suppkey",
        date_col="l_shipdate",
        value_col="l_extendedprice",
        max_gap_days=_TS_MAX_GAP,
    )
    return out.select(
        "l_suppkey",
        "date",
        F.col("l_extendedprice").alias("last_price"),
        "is_observed",
        F.col("gap_days").cast("int").alias("gap_days"),
    )


@query(
    "ts_ohlc_daily",
    oracle="""
    WITH t1 AS (
      SELECT event_type,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS date,
             CAST(ts AS TIMESTAMP) AS tss,
             arg_min(value, event_id) AS o_cand,
             arg_max(value, event_id) AS c_cand,
             MAX(value) AS hi, MIN(value) AS lo,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(28,6))) AS s
      FROM events GROUP BY 1, 2, 3)
    SELECT event_type, date,
           arg_min(o_cand, tss) AS open,
           MAX(hi) AS high,
           MIN(lo) AS low,
           arg_max(c_cand, tss) AS close,
           CAST(SUM(n) AS BIGINT) AS n_ticks,
           CAST(SUM(s) AS DOUBLE) AS turnover
    FROM t1 GROUP BY 1, 2
    """,
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles from tick-level events
    (operators/resample.ohlc_daily): open/close picked by the
    deterministic (ts, event_id) ordering (the oracle resolves it as
    a two-stage arg_min - DuckDB's arg_min takes only scalar
    orderings - which is the same lexicographic pick), high/low raw
    extrema,
    DECIMAL turnover — one map-side-combined aggregate, the panel
    the reference ingests pre-built from yfinance/Binance, built
    here from raw ticks."""
    from capital.operators.resample import ohlc_daily

    e = load_table(spark, sf_dir, "events")
    return ohlc_daily(
        e, key_col="event_type", ts_col="ts", value_col="value",
        id_col="event_id",
    )
