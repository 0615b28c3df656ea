"""Schema registry — the engine's replacement for the Glue catalog +
Redshift DDLs (SURVEY.md §1.3).

Bronze data arrives schemaless (JSON/CSV); the reference discovered
schemas with a one-shot Glue crawler and pinned them afterwards
(dags/slv_industry_code_daily/helpers.py:4-16). Here every silver
contract is an explicit ``StructType``; readers apply them with
checked, nullable-aware casts at the bronze→silver edge.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Silver dim_industry_code — mirrors the Redshift DDL at
#: glue_job_scripts/industry_code_glue_job.py:98.
INDUSTRY_CODE = T.StructType(
    [
        T.StructField("item_code", T.StringType(), False),
        T.StructField("item_name", T.StringType(), False),
        T.StructField("industry_code", T.StringType(), False),
        T.StructField("market", T.StringType(), False),
        T.StructField("issue_date", T.DateType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

#: dim_calendar — dags/slv_generate_calendar_yearly/sql.py:8-24.
CALENDAR = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("quarter", T.IntegerType(), False),
        T.StructField("month_num", T.IntegerType(), False),
        T.StructField("day_of_month", T.IntegerType(), False),
        T.StructField("day_of_week", T.IntegerType(), False),
        T.StructField("quarter_id", T.StringType(), False),
        T.StructField("month_id", T.StringType(), False),
        T.StructField("month_name", T.StringType(), False),
        T.StructField("day_name", T.StringType(), False),
        T.StructField("is_market_holiday", T.BooleanType(), False),
    ]
)

#: OHLCV long form — post-unpivot yfinance shape
#: (plugins/operators/yfinance_operator.py:101-113).
OHLCV = T.StructType(
    [
        T.StructField("Date", T.DateType(), False),
        T.StructField("Ticker", T.StringType(), False),
        T.StructField("Open", T.DoubleType(), True),
        T.StructField("High", T.DoubleType(), True),
        T.StructField("Low", T.DoubleType(), True),
        T.StructField("Close", T.DoubleType(), True),
        T.StructField("Volume", T.DoubleType(), True),
    ]
)

#: Binance klines — fixed 12-column array rows + 2 literal columns
#: (dags/brz_coin_daily/extractors.py:16-54).
COIN_KLINES = T.StructType(
    [
        T.StructField("Open_time", T.LongType(), False),
        T.StructField("Open", T.DoubleType(), True),
        T.StructField("High", T.DoubleType(), True),
        T.StructField("Low", T.DoubleType(), True),
        T.StructField("Close", T.DoubleType(), True),
        T.StructField("Volume", T.DoubleType(), True),
        T.StructField("Close_time", T.LongType(), False),
        T.StructField("Quote_asset_volume", T.DoubleType(), True),
        T.StructField("Number_of_trades", T.IntegerType(), True),
        T.StructField("Taker_buy_base_asset_volume", T.DoubleType(), True),
        T.StructField("Taker_buy_quote_asset_volume", T.DoubleType(), True),
        T.StructField("Ignore", T.StringType(), True),
        T.StructField("Symbol", T.StringType(), False),
        T.StructField("Name", T.StringType(), False),
    ]
)

#: Bond OHLC with derived maturity (dags/brz_bonds_daily/extractors.py:62-87).
BONDS = T.StructType(
    [
        T.StructField("bond_key", T.StringType(), False),
        T.StructField("Date", T.StringType(), False),
        T.StructField("Open", T.DoubleType(), True),
        T.StructField("High", T.DoubleType(), True),
        T.StructField("Low", T.DoubleType(), True),
        T.StructField("Close", T.DoubleType(), True),
        T.StructField("Volume", T.DoubleType(), True),
        T.StructField("Estimate", T.DoubleType(), True),
        T.StructField("matures_in", T.IntegerType(), True),
        T.StructField("category", T.StringType(), False),
    ]
)

#: NYT news articles, projected form (dags/brz_news_weekly/extractors.py:27-42).
NEWS = T.StructType(
    [
        T.StructField("abstract", T.StringType(), True),
        T.StructField("web_url", T.StringType(), True),
        T.StructField("headline_main", T.StringType(), True),
        T.StructField("pub_date", T.StringType(), True),
        T.StructField("section_name", T.StringType(), True),
        T.StructField("byline_original", T.StringType(), True),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
    ]
)

#: Raw nested NYT doc (pre-projection) — used by the news transform test.
NEWS_RAW = T.StructType(
    [
        T.StructField("abstract", T.StringType(), True),
        T.StructField("web_url", T.StringType(), True),
        T.StructField(
            "headline",
            T.StructType([T.StructField("main", T.StringType(), True)]),
            True,
        ),
        T.StructField("pub_date", T.StringType(), True),
        T.StructField("section_name", T.StringType(), True),
        T.StructField(
            "byline",
            T.StructType([T.StructField("original", T.StringType(), True)]),
            True,
        ),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField(
            "keywords",
            T.ArrayType(
                T.StructType([T.StructField("value", T.StringType(), True)])
            ),
            True,
        ),
    ]
)

#: events stream table (driver-generated; TESTDATA.md).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

REGISTRY: dict[str, T.StructType] = {
    "industry_code": INDUSTRY_CODE,
    "calendar": CALENDAR,
    "ohlcv": OHLCV,
    "coin_klines": COIN_KLINES,
    "bonds": BONDS,
    "news": NEWS,
    "news_raw": NEWS_RAW,
    "events": EVENTS,
}
