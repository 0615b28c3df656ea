"""Headline analytical queries over the fact tables.

These are the engine's flagship query shapes — the aggregation/join/
filter pipeline the reference pushes to Redshift/Glue (SURVEY.md §3.2)
re-expressed as Catalyst plans. At 100 TB:

- `q1_pricing_summary` is a scan + partial-aggregate: one shuffle on a
  tiny (returnflag, linestatus) key space; map-side combine does ~all
  the work, so it scales linearly with input splits.
- dimension joins broadcast the small side explicitly (`F.broadcast`),
  so no shuffle of the fact table ever happens for dim enrichment.
- fact-fact joins shuffle on the join key once; AQE coalesces and
  handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.queries.registry import (
    decimal_avg,
    decimal_sum,
    ora_avg,
    ora_sum,
    query,
)

_CUTOFF = "2000-01-01 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {ora_sum("l_quantity", "sum_qty")},
      {ora_sum("l_extendedprice", "sum_base_price")},
      {ora_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
      {ora_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
      {ora_avg("l_quantity", "avg_qty")},
      {ora_avg("l_extendedprice", "avg_price")},
      {ora_avg("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (scan → partial agg → tiny shuffle).

    The seven DECIMAL(28,6) aggregates are the expensive part and they
    run SCAN-side (map partial agg), so the single-row-group local
    lineitem file (1–3 byte-range splits; a row group can't split) caps
    them at 3 cores — parallelize_narrow round-robins the projected
    rows first (round 14: 1.35 → 0.81 s at sf0.1; at 100 TB inputs
    carry thousands of row groups and the guard makes this a no-op)."""
    from capital.io import parallelize_narrow

    li = parallelize_narrow(
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        decimal_sum(F.col("l_quantity"), "sum_qty"),
        decimal_sum(F.col("l_extendedprice"), "sum_base_price"),
        decimal_sum(disc_price, "sum_disc_price"),
        decimal_sum(charge, "sum_charge"),
        decimal_avg(F.col("l_quantity"), "avg_qty"),
        decimal_avg(F.col("l_extendedprice"), "avg_price"),
        decimal_avg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      {ora_sum("l_extendedprice * (1 - l_discount)", "revenue")},
      CAST(o_orderdate AS DATE) AS orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + dim filter (TPC-H Q3 shape).

    customer is small relative to the facts → broadcast; the single
    shuffle is lineitem↔orders on orderkey.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy(
        "l_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        "o_orderpriority",
    ).agg(
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        )
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT
      n_name,
      {ora_sum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join through two broadcast dims (TPC-H Q5 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: range filter + correlated EXISTS as a left-semi
    join with a non-equi residual condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {ora_sum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue top-20. Decimal-exact
    revenue makes the ORDER BY deterministic across engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {ora_sum("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-aggregate; every predicate pushes to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            decimal_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue")
        )
    )
