"""Market-data transforms: price panels, bonds, news, ETF gating.

Each function re-expresses one reference pipeline's semantics as a
narrow Catalyst plan; they compose with the sources (ingest) and
:mod:`capital.io` (ymd-partitioned sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: kospi/kosdaq → yfinance ticker suffixes
#: (plugins/operators/yfinance_operator.py:17).
MARKET_SUFFIX = {"kospi": "KS", "kosdaq": "KQ"}


def unpivot_price_panel(
    wide: DataFrame, id_cols: list[str], measure_cols: list[str]
) -> DataFrame:
    """P3: yfinance wide (field×ticker) panel → long rows.

    Twin of ``.stack(level=1).reset_index()`` (yfinance_operator.py:
    101-113); column names like ``Close_005930.KS`` split into
    (measure, ticker)."""
    # Ticker-bearing column names contain dots ("Close_005930.KS") —
    # quote them so the analyzer doesn't read a qualifier.
    long = wide.unpivot(
        [F.col(f"`{c}`") for c in id_cols],
        [F.col(f"`{c}`") for c in measure_cols],
        "field_ticker",
        "value",
    )
    split_at = F.instr("field_ticker", "_")
    return long.select(
        *id_cols,
        F.substring_index("field_ticker", "_", 1).alias("field"),
        F.substring(F.col("field_ticker"), split_at + 1, F.lit(10_000)).alias(
            "Ticker"
        ),
        "value",
    )


def yf_ticker(code, market):
    """F11: ``f"{code}.{MARKET_MAPPING[market]}"`` as a map-literal
    lookup (yfinance_operator.py:17,82). Unknown markets raise, like
    the reference's dict KeyError — concat_ws would otherwise silently
    emit a bare, wrong ticker."""
    mapping = F.create_map(
        *[F.lit(x) for kv in MARKET_SUFFIX.items() for x in kv]
    )
    suffix = F.element_at(mapping, market)
    checked = F.when(suffix.isNull(), F.raise_error(
        F.concat(F.lit("yf_ticker: unknown market "), market)
    )).otherwise(suffix)
    return F.concat_ws(".", code, checked)


def missing_tickers(requested: DataFrame, fetched: DataFrame) -> DataFrame:
    """J3/U3: requested − fetched-with-Close (yfinance_operator.py:
    118-127) as a left-anti join against non-null closes."""
    have = fetched.filter(F.col("Close").isNotNull()).select("Ticker")
    return requested.join(have, "Ticker", "left_anti")


def bonds_daily(bonds_raw: DataFrame) -> DataFrame:
    """Bond enrichment (dags/brz_bonds_daily/extractors.py:53-95):

    - F8 ``matures_in`` = int(key[-4:]) − int(key[-9:-5]);
    - A2 day key from the first 10 chars of the ISO timestamp;
    - F14 zero-fill for stub rows.
    """
    tail = lambda off: F.substring(F.col("bond_key"), -off, 4).cast("int")  # noqa: E731
    return (
        bonds_raw.withColumn("matures_in", tail(4) - tail(9))
        .withColumn("day", F.to_date(F.substring("Date", 1, 10)))
        .na.fill(0.0, ["Open", "High", "Low", "Close", "Volume", "Estimate"])
    )


def bonds_by_day(bonds: DataFrame) -> DataFrame:
    """A2: one output group per (category, day) — the regroup that
    becomes the ymd partition layout (extractors.py:87,92-95)."""
    return bonds.groupBy("category", "day").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.collect_list(
            F.struct("bond_key", "Open", "High", "Low", "Close")
        ).alias("records"),
    )


def project_news(raw: DataFrame) -> DataFrame:
    """P8/F13: nested NYT doc → 8 flat fields; ``keywords[].value``
    via a higher-order transform (dags/brz_news_weekly/
    extractors.py:27-42)."""
    return raw.select(
        "abstract",
        "web_url",
        F.col("headline.main").alias("headline_main"),
        "pub_date",
        "section_name",
        F.col("byline.original").alias("byline_original"),
        "word_count",
        F.transform("keywords", lambda k: k["value"]).alias("keywords"),
    )


def gate_on_open_market(
    facts: DataFrame, calendar: DataFrame, date_col: str
) -> DataFrame:
    """P10/J2: short-circuit on market holiday — rows survive only if
    their date joins an open calendar day (dags/brz_kr_etf_daily/
    tasks.py:13-27 + brz_kr_etf_daily.py:21-33)."""
    open_days = calendar.filter(~F.col("is_market_holiday")).select(
        F.col("date").alias(date_col)
    )
    return facts.join(F.broadcast(open_days), date_col, "left_semi")
