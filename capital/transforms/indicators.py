"""Macro-indicator transforms: BOK interval formats, coin klines epoch
conversion, GICS length routing, FX panel rename.

Each mirrors one reference extractor's semantics (citations inline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BOK ECOS TIME formats per collection interval
#: (plugins/operators/bank_of_korea_operator.py:147-168).
BOK_INTERVALS = ("daily", "monthly", "quarterly", "yearly")


def bok_time_string(date: Column, interval: str) -> Column:
    """F2: interval-dependent TIME strings — '20250113' / '202501' /
    '2025Q1' / '2025'."""
    if interval == "daily":
        return F.date_format(date, "yyyyMMdd")
    if interval == "monthly":
        return F.date_format(date, "yyyyMM")
    if interval == "quarterly":
        return F.concat(
            F.date_format(date, "yyyy"), F.lit("Q"), F.quarter(date)
        )
    if interval == "yearly":
        return F.date_format(date, "yyyy")
    raise ValueError(f"interval {interval!r} not in {BOK_INTERVALS}")


def cast_bok_values(raw: DataFrame) -> DataFrame:
    """BOK DATA_VALUE arrives as numeric-as-string; ``try_cast`` keeps
    ANSI mode strict elsewhere while nulling unparseable values here
    (nulls then surface via quality checks)."""
    return raw.withColumn(
        "DATA_VALUE", F.col("DATA_VALUE").try_cast("double")
    )


def coin_klines_enrich(raw: DataFrame) -> DataFrame:
    """F5: Binance epoch-millis → timestamps; dead ``Ignore`` column
    dropped at the scan (dags/brz_coin_daily/extractors.py:7-68)."""
    return (
        raw.drop("Ignore")
        .withColumn("open_ts", F.timestamp_millis(F.col("Open_time")))
        .withColumn("close_ts", F.timestamp_millis(F.col("Close_time")))
    )


#: GICS level by code length (dags/brz_industry_code_daily/
#: extractors.py:90-97).
GICS_LEVELS = {2: "sector", 4: "industry_group", 6: "industry", 8: "sub_industry"}


def classify_gics(codes: DataFrame, code_col: str = "code") -> DataFrame:
    """S5/F10: route codes to 4 category tables by length — one
    classification column + partitioned write replaces 4 manual lists."""
    ln = F.length(code_col)
    expr = F.lit(None).cast("string")
    for length, name in reversed(list(GICS_LEVELS.items())):
        expr = F.when(ln == length, name).otherwise(expr)
    return codes.withColumn("category", expr)


def rename_fx_panel(raw: DataFrame) -> DataFrame:
    """P5: Date → RecordDate (partition-key collision avoidance,
    dags/brz_exchange_rate_daily/extractors.py:25-27)."""
    return raw.withColumnRenamed("Date", "RecordDate")
