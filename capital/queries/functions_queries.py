"""Scalar-function surface (SURVEY.md §2.8): date extraction/formatting,
CASE ladders, string normalization, substring arithmetic, map-literal
lookup, JSON access, array transforms, epoch conversion.

All expressions are JVM-side Catalyst built-ins — no Python UDFs — so
they stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.queries.registry import query


@query(
    "f1_date_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
           CAST(month(o_orderdate) AS INTEGER) AS month_num,
           CAST(day(o_orderdate) AS INTEGER) AS day_of_month,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS day_of_week
    FROM orders
    """,
)
def f1_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: EXTRACT family with the DOW normalization hazard handled —
    Spark dayofweek is 1=Sunday, the engine (like Redshift,
    dags/slv_generate_calendar_yearly/sql.py:64-70) exposes 0=Sunday."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("year"),
        F.quarter("o_orderdate").alias("quarter"),
        F.month("o_orderdate").alias("month_num"),
        F.dayofmonth("o_orderdate").alias("day_of_month"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("day_of_week"),
    )


@query(
    "f2_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m') AS month_id,
           strftime(o_orderdate, '%b') AS month_name,
           strftime(o_orderdate, '%Y') || 'Q' || CAST(quarter(o_orderdate) AS VARCHAR)
             AS quarter_id,
           strftime(o_orderdate, '%Y%m%d') AS yyyymmdd
    FROM orders
    """,
)
def f2_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F7: TO_CHAR/strftime formats incl. the BOK interval formats
    (plugins/operators/bank_of_korea_operator.py:147-168) and the
    ``year||'Q'||quarter`` concat (sql.py:57)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMM").alias("month_id"),
        F.date_format("o_orderdate", "MMM").alias("month_name"),
        F.concat(
            F.date_format("o_orderdate", "yyyy"),
            F.lit("Q"),
            F.quarter("o_orderdate"),
        ).alias("quarter_id"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("yyyymmdd"),
    )


@query(
    "f4_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 1 DAY AS next_day,
           CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS week_before
    FROM orders
    """,
)
def f4_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: INTERVAL arithmetic (sql.py:78; timedelta hops,
    dags/brz_exchange_rate_daily/extractors.py:19)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 1).alias("next_day"),
        F.date_sub(d, 7).alias("week_before"),
    )


@query(
    "f5_epoch_millis",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS ts_millis,
           make_timestamp(epoch_ms(ts) * 1000) AS ts_roundtrip
    FROM events
    """,
)
def f5_epoch_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: epoch-millis conversion both directions (Binance klines,
    dags/brz_coin_daily/extractors.py:13)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_roundtrip"),
    )


@query(
    "f6_case_bucket",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN TRUE ELSE FALSE END
             AS is_weekend
    FROM orders
    """,
)
def f6_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: CASE WHEN ladders (Korean day-name / weekend-holiday flag,
    sql.py:63-75)."""
    o = load_table(spark, sf_dir, "orders")
    dow0 = F.dayofweek("o_orderdate") - F.lit(1)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("price_bucket"),
        F.when(dow0.isin(0, 6), True).otherwise(False).alias("is_weekend"),
    )


@query(
    "f8_substring_arith",
    oracle="""
    SELECT o_orderkey, bond_key,
           CAST(substring(bond_key, length(bond_key) - 3, 4) AS INTEGER)
             - CAST(substring(bond_key, length(bond_key) - 8, 4) AS INTEGER)
             AS matures_in
    FROM (
      SELECT o_orderkey,
             'kr_treasury_' || strftime(o_orderdate, '%Y') || '-'
               || CAST(CAST(year(o_orderdate) AS INTEGER)
                       + CAST(o_orderkey % 30 AS INTEGER) AS VARCHAR)
               AS bond_key
      FROM orders)
    """,
)
def f8_substring_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: maturity−issue years from the bond-key suffix
    (``int(key[-4:]) - int(key[-9:-5])``,
    dags/brz_bonds_daily/extractors.py:83)."""
    o = load_table(spark, sf_dir, "orders")
    bond_key = F.concat(
        F.lit("kr_treasury_"),
        F.date_format("o_orderdate", "yyyy"),
        F.lit("-"),
        (F.year("o_orderdate") + (F.col("o_orderkey") % 30).cast("int")).cast(
            "string"
        ),
    )
    keyed = o.select("o_orderkey", bond_key.alias("bond_key"))
    tail = lambda off: F.substring(  # noqa: E731
        F.col("bond_key"), -off, 4
    ).cast("int")
    return keyed.select(
        "o_orderkey",
        "bond_key",
        (tail(4) - tail(9)).alias("matures_in"),
    )


@query(
    "f9_normalize_strings",
    oracle="""
    SELECT p_partkey,
           lower(trim(p_name)) AS name_norm,
           replace(lower(p_type), ' ', '_') AS type_snake
    FROM part
    """,
)
def f9_normalize_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: strip/lower/snake_case normalization (crawled-header cleanup,
    dags/brz_bonds_meta_monthly/extractors.py:45-46)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.trim(F.col("p_name"))).alias("name_norm"),
        F.regexp_replace(F.lower("p_type"), " ", "_").alias("type_snake"),
    )


@query(
    "f10_length_classify",
    oracle="""
    SELECT p_partkey, CAST(length(p_name) AS INTEGER) AS name_len,
           CASE WHEN length(p_name) <= 15 THEN 'sector'
                WHEN length(p_name) <= 20 THEN 'industry_group'
                WHEN length(p_name) <= 25 THEN 'industry'
                ELSE 'sub_industry' END AS category
    FROM part
    """,
)
def f10_length_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10/S5: length-based routing of GICS codes into 4 category tables
    (dags/brz_industry_code_daily/extractors.py:90-97) as one
    filter-free classification column."""
    p = load_table(spark, sf_dir, "part")
    ln = F.length("p_name")
    return p.select(
        "p_partkey",
        ln.alias("name_len"),
        F.when(ln <= 15, "sector")
        .when(ln <= 20, "industry_group")
        .when(ln <= 25, "industry")
        .otherwise("sub_industry")
        .alias("category"),
    )


@query(
    "f11_map_literal_suffix",
    oracle="""
    SELECT c_custkey,
           c_name || '.' ||
           CASE c_mktsegment
             WHEN 'BUILDING' THEN 'KS' WHEN 'AUTOMOBILE' THEN 'KQ'
             WHEN 'MACHINERY' THEN 'NY' WHEN 'HOUSEHOLD' THEN 'LN'
             ELSE 'XX' END AS ticker
    FROM customer
    """,
)
def f11_map_literal_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: ticker-suffix mapping via a map literal
    (``f"{code}.{MARKET_MAPPING[market]}"``,
    plugins/operators/yfinance_operator.py:17,82)."""
    c = load_table(spark, sf_dir, "customer")
    mapping = F.create_map(
        F.lit("BUILDING"), F.lit("KS"),
        F.lit("AUTOMOBILE"), F.lit("KQ"),
        F.lit("MACHINERY"), F.lit("NY"),
        F.lit("HOUSEHOLD"), F.lit("LN"),
    )
    suffix = F.coalesce(
        F.element_at(mapping, F.col("c_mktsegment")), F.lit("XX")
    )
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("."), suffix).alias("ticker"),
    )


@query(
    "f12_json_access",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    """,
)
def f12_json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/P8: JSON field access on a string column (nested API payloads,
    dags/brz_news_weekly/extractors.py:24-42)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query(
    "f13_array_transform",
    oracle="""
    SELECT doc_id,
           CAST(length(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           array_to_string(
             list_transform(string_split(text, ' ')[1:4], x -> upper(x)), ' ')
             AS head_upper
    FROM documents
    """,
)
def f13_array_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: array projection with a lambda (``[k["value"] for k in
    keywords]``, dags/brz_news_weekly/extractors.py:38-40) — Catalyst
    higher-order functions, zero Python."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(
            F.transform(F.slice(toks, 1, 4), lambda x: F.upper(x)), " "
        ).alias("head_upper"),
    )
