"""Extended TPC-H-shaped relational pack
(Q7/Q8/Q12/Q13/Q14/Q15/Q17/Q18/Q19/Q21/Q22).

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
from capital.queries.registry import decimal_avg, decimal_sum, ora_sum, query

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
#: "Inactive" = no order since this date. The generator gives every
#: customer at least one order ever, so the classic unqualified
#: NOT EXISTS was vacuously empty at every SF (0 == 0 proved nothing);
#: the recency cutoff restores Q22's rich-but-inactive semantics with
#: real rows (3 segments at sf0.001/0.01/0.1).
_Q22_CUTOFF = "2000-01-01"


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           {ora_sum("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_mktsegment IN {_Q22_SEGMENTS!r}
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(c_acctbal)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_mktsegment IN {_Q22_SEGMENTS!r})
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= DATE '{_Q22_CUTOFF}')
    GROUP BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-inactive customers per segment
    (adapted: market segment stands in for the phone country code;
    inactive = no order since _Q22_CUTOFF).

    Scale: the scalar average is one tiny broadcast; NOT EXISTS is a
    left-anti join against the orders key projection — shuffles only
    the distinct custkeys, not the order rows.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*_Q22_SEGMENTS)
    )
    # decimal_avg discipline (exact decimal sum → double division), not
    # F.avg(decimal): Spark's decimal AVG rounds HALF_UP at scale+4
    # while DuckDB divides the exact sum as a double — boundary values
    # of the strict `>` comparison could flip between engines.
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(decimal_avg(F.col("c_acctbal"), "avg_bal"))
    )
    orders_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("date"))
        .select("o_custkey")
    )
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


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment lines split by order priority
    (adapted: ``l_linestatus`` stands in for the missing
    ``l_shipmode``; "late" = shipped after the order date).

    Scale: the one fact-fact shuffle on orderkey; the year predicate
    pushes to the lineitem scan; conditional counts are map-side
    partials — the exchange carries two longs per linestatus.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, inactive
    customers included (adapted: the priority filter stands in for the
    missing ``o_comment`` anti-pattern match — the point is the
    filter-inside-outer-join semantics, which must not drop
    order-less customers).

    Scale: one shuffle on custkey for the outer join + count, then a
    tiny re-aggregation on c_count (at most #distinct counts rows).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {ora_sum(_REVENUE, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1996-03-31 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue —
    the materialized-view + scalar-subquery shape.

    Scale: one shuffle to aggregate revenue per supplier (map-side
    partials over the date-pruned scan); the max is a one-row
    broadcast; equality on decimal-summed revenue is exact, so the
    tie semantics match the oracle bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-03-31 00:00:00").cast("timestamp"),
        )
    )
    revenue = li.groupBy(
        F.col("l_suppkey").alias("supplier_no")
    ).agg(decimal_sum(_rev(), "total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(
            F.broadcast(supp),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#21' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(l_quantity) * 0.2
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders for one
    brand/type bucket (adapted: ``p_type`` stands in for the missing
    ``p_container``) — the correlated-average-subquery shape.

    Scale: the brand/type filter prunes part to a small key set that
    **broadcasts**; per-part averages aggregate only the surviving
    lineitems (map-side partials on partkey), then rejoin broadcast.
    The full lineitem table is scanned once and never shuffled.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#21") & (F.col("p_type") == "SMALL")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    # Same decimal_avg discipline as q22: exact decimal sum, double
    # division, then *0.2 — bit-identical to the oracle's expression
    # order, so the strict `<` threshold cannot flip on boundaries.
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
            / F.count("l_quantity")
            * F.lit(0.2)
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "q21_returns_sole_blame",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_returns_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for returns on
    finished multi-supplier orders (adapted: ``l_returnflag = 'R'``
    stands in for the missing receipt/commit lateness columns) — the
    EXISTS + NOT-EXISTS double-correlation shape.

    Scale: both correlations decorrelate to semi/anti joins keyed on
    orderkey — the same key as the orders join, so AQE can reuse one
    exchange; supplier broadcasts. No per-row subquery execution
    survives in the physical plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cand = l1.join(
        orders, F.col("l1.l_orderkey") == F.col("o_orderkey")
    )
    cand = cand.join(
        l2,
        (F.col("l2_ok") == F.col("l1.l_orderkey"))
        & (F.col("l2_sk") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    cand = cand.join(
        l3,
        (F.col("l3_ok") == F.col("l1.l_orderkey"))
        & (F.col("l3_sk") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        cand.join(
            F.broadcast(supp),
            F.col("l1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
