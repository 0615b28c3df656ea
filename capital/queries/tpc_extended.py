"""Extended TPC-H-shaped relational pack (Q7/Q8/Q14/Q18/Q19/Q22).

Widens the engine's multi-join/analytic surface beyond the flagship
pack in :mod:`capital.queries.pricing`. Shapes are adapted to the
driver's tables: there is no ``partsupp``, nation names are
``NATION_<k>``, ``p_type`` carries single-word values, and ``customer``
has ``c_mktsegment`` where TPC-H Q22 uses phone country codes.

Scale posture per query is noted in each docstring — which sides
broadcast, where the one big shuffle lands, and what AQE is expected
to do. All money aggregates use the decimal-sum discipline from
:mod:`capital.queries.registry` so DuckDB parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.queries.registry import decimal_sum, ora_sum, query

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {ora_sum("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_REVENUE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Scale: nation (25 rows) and supplier broadcast; the only large
    shuffle is lineitem↔orders on orderkey. The nation-pair predicate
    lands on the broadcasted dims before the fact join, so the fact
    stream is pre-filtered by supp-nation membership.
    """
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").alias("l_year"),
    ).agg(decimal_sum(_rev(), "revenue"))


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume
                                    ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REVENUE} AS volume, n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier-nation's share of regional market volume.

    The deepest join tree in the pack (7 tables). Scale: part, supplier,
    nation×2 and region all broadcast — the physical plan is a chain of
    broadcast hash joins over the lineitem scan plus the one
    lineitem↔orders shuffle. The conditional share aggregate is a
    map-side partial agg on (year).
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    cust_in_region = (
        cust.join(
            F.broadcast(n1), cust.c_nationkey == n1.n_nationkey
        ).join(F.broadcast(region), n1.n_regionkey == region.r_regionkey)
    ).select("c_custkey")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
    )
    vol = _rev()
    share_vol = F.when(F.col("nation") == "NATION_3", vol).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            decimal_sum(share_vol, "num"),
            decimal_sum(vol, "den"),
        )
        .select(
            "o_year",
            F.round(F.col("num") / F.col("den"), 6).alias("mkt_share"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(100.0
                 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN {_REVENUE} ELSE 0 END
                                 AS DECIMAL(28,6))) AS DOUBLE)
                 / CAST(SUM(CAST({_REVENUE} AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share for one ship month.

    Scale: part broadcasts against the date-pruned lineitem scan; the
    result is a single global aggregate — partial aggregation reduces
    every partition to one row before the 1-row exchange.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    vol = _rev()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return joined.agg(
        decimal_sum(promo, "num"), decimal_sum(vol, "den")
    ).select(
        F.round(F.lit(100.0) * F.col("num") / F.col("den"), 6).alias(
            "promo_revenue"
        )
    )


_Q18_QTY = 150


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           {ora_sum("l_quantity", "total_qty")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY})
    GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE),
             o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders (HAVING semi-join).

    Scale: the qualifying-orderkey set comes from a groupBy on
    lineitem (map-side partials shrink it drastically); it then
    semi-joins the facts. Top-100 uses TakeOrderedAndProject — no
    global sort materialization.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey",
        "left_semi",
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
        )
        .agg(decimal_sum(F.col("l_quantity"), "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {ora_sum(_REVENUE, "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicate revenue
    (adapted: driver's part table has no container column).

    Scale: part broadcasts; the OR-of-ANDs predicate is evaluated
    post-join inside codegen. The single-row result needs no real
    shuffle beyond the 1-row partial-agg exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(decimal_sum(_rev(), "revenue"))


_Q22_SEGMENTS = ("BUILDING", "MACHINERY", "AUTOMOBILE")


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           {ora_sum("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_mktsegment IN {_Q22_SEGMENTS!r}
      AND c_acctbal > (
        SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_mktsegment IN {_Q22_SEGMENTS!r})
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-inactive customers per segment
    (adapted: market segment stands in for the phone country code).

    Scale: the scalar average is one tiny broadcast; NOT EXISTS is a
    left-anti join against the orders key projection — shuffles only
    the distinct custkeys, not the order rows.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*_Q22_SEGMENTS)
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.avg(F.col("c_acctbal").cast("decimal(28,6)"))
            .cast("double")
            .alias("avg_bal")
        )
    )
    orders_keys = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders_keys,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            decimal_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )
