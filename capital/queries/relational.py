"""Relational operator surface (SURVEY.md §2.2–2.7).

One oracle-paired query per operator family: projections & casts,
predicates, joins (semi/anti/broadcast-dim), aggregations (scalar-max,
group-by-day, first-wins, rollup/cube/distinct), sorts/top-k, and set
operations. Each docstring cites the reference behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from capital.io import load_table
from capital.operators.asof import max_where
from capital.operators.dedup import first_wins
from capital.operators.reshape import unpivot
from capital.queries.registry import decimal_sum, ora_sum, query


# --- §2.2 projections / filters -----------------------------------------


@query(
    "p1_project_cast",
    oracle="""
    SELECT l_orderkey AS item_code, l_linenumber AS line_no,
           CAST(l_shipdate AS DATE) AS ship_date,
           l_returnflag AS market
    FROM lineitem
    """,
)
def p1_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: the silver projection+cast (reference's only real Spark SQL,
    glue_job_scripts/industry_code_glue_job.py:38-47)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("item_code"),
        F.col("l_linenumber").alias("line_no"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.col("l_returnflag").alias("market"),
    )


@query(
    "p3_unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def p3_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: wide→long unpivot (yfinance panel stack,
    plugins/operators/yfinance_operator.py:101-113). Narrow op: no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return unpivot(
        li,
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="value",
    )


@query(
    "p4_literal_rename_project",
    oracle="""
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
           'KRX' AS exchange, s_acctbal AS account_balance
    FROM supplier
    """,
)
def p4_literal_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5/P7: literal-column attach + renames (symbol/name constants,
    dags/brz_coin_daily/extractors.py:48-49; Date→RecordDate rename,
    dags/brz_exchange_rate_daily/extractors.py:25-27)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("supplier_id"),
        F.col("s_name").alias("supplier_name"),
        F.lit("KRX").alias("exchange"),
        F.col("s_acctbal").alias("account_balance"),
    )


@query(
    "p9_notnull_filter",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE value IS NOT NULL AND event_type = 'purchase'
    """,
)
def p9_notnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P12: not-null + equality predicates, pushed to the scan
    (fetched-ticker detection, plugins/operators/yfinance_operator.py:118)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").isNotNull() & (F.col("event_type") == "purchase")
    ).select("event_id", "user_id", "value")


@query(
    "p12_partition_prunable_eq",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST(o_orderdate AS DATE) = DATE '1997-03-01'
    """,
)
def p12_partition_prunable_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: bound-param equality on the date key — the predicate shape
    that partition-prunes a ymd-partitioned lake table."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderdate").cast("date") == F.lit("1997-03-01").cast("date")
    ).select("o_orderkey", "o_totalprice")


@query(
    "p3b_pivot_wide",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY user_id
    """,
)
def p3b_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 inverse: long→wide pivot with explicit pivot values (skips
    the distinct-discovery scan — mandatory at scale)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.lit(1).alias("one")
    )
    kinds = ["click", "view", "purchase", "signup", "error"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # Empty cells: Spark pivot yields null, COUNT in SQL yields 0.
    return wide.na.fill(0, kinds)


# --- §2.3 joins ----------------------------------------------------------


@query(
    "j3_anti_join_missing",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def j3_anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/U3: requested-minus-fetched set difference as a left-anti join
    (missing-ticker diff, plugins/operators/yfinance_operator.py:118-127).

    The fetched side is the urgent-order customers: this generator
    gives every customer at least one order, so the unfiltered
    anti-join was vacuously empty (0 == 0 proves nothing); ~10% of
    customers have no urgent order at every SF, pinning real rows."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j4_dim_fanout_revenue",
    oracle=f"""
    SELECT p_brand,
           {ora_sum("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY p_brand
    """,
)
def j4_dim_fanout_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: dimension-driven fan-out — dim key set drives the fact work
    (ticker list from dim_industry_code, plugins/operators/
    yfinance_operator.py:47-82). Dim is broadcast: zero fact shuffle
    before the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "j5_registry_lookup",
    oracle="""
    SELECT n_name AS nation, r_name AS region, COUNT(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def j5_registry_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: config-registry lookup join — facts enriched from a small
    broadcast registry (bond URL registry, dags/brz_bonds_daily/
    extractors.py:54,80-87)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


# --- §2.4 aggregations ---------------------------------------------------


@query(
    "a1_scalar_max_pred",
    oracle="""
    SELECT MAX(CASE WHEN o_orderstatus = 'F' THEN CAST(o_orderdate AS DATE) END)
             AS last_finished_date
    FROM orders
    """,
)
def a1_scalar_max_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: scalar MAX with predicate (last open-market day,
    dags/brz_kr_etf_daily/brz_kr_etf_daily.py:26-29)."""
    orders = load_table(spark, sf_dir, "orders")
    return max_where(
        orders,
        F.col("o_orderdate").cast("date"),
        F.col("o_orderstatus") == "F",
        "last_finished_date",
    )


@query(
    "a2_events_by_day",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS n_events,
           {ora_sum("value", "total_value")}
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
)
def a2_events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: group-by-day regroup (bond records bucketed per day,
    dags/brz_bonds_daily/extractors.py:53-95) — the ymd partitioning
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("ts").cast("date").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum(F.col("value"), "total_value"),
    )


@query(
    "a4_first_wins_dedup",
    oracle="""
    SELECT user_id, ts, event_type, value FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def a4_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: first-value-wins per key (crawled-header fold,
    dags/brz_bonds_meta_monthly/extractors.py:44-49) via order-free
    ``min_by`` — no window sort. event_id tiebreaks equal timestamps
    so the winner is unique under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    return first_wins(
        ev,
        keys=["user_id"],
        order_col="ts",
        value_cols=["event_type", "value"],
        tiebreak_col="event_id",
    )


@query(
    "dedup_fuzzy_keys",
    memoize=False,
    oracle="""
    WITH keyed AS (
      SELECT c_custkey AS id, c_name,
             substr(c_name, 1, 15) AS block
      FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
    FROM keyed a JOIN keyed b
      ON a.block = b.block AND a.id < b.id
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_fuzzy_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy dedup: customer-name pairs within one
    Levenshtein edit, prefix-blocked and skew-chunked (see
    operators/dedup.fuzzy_key_pairs). Complements the exact and
    content-hash dedup tiers with edit-distance matching."""
    from capital.operators.dedup import fuzzy_key_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_key_pairs(
        cust, key_col="c_name", id_col="c_custkey",
        prefix_len=15, max_dist=1,
    )


def _zorder_oracle() -> str:
    from capital.operators.zorder import z_value_oracle_sql

    inner = z_value_oracle_sql(["o_custkey", "o_totalprice"], "orders")
    return f"SELECT o_orderkey, z_value FROM ({inner})"


@query("p15_zorder_key", oracle=_zorder_oracle())
def p15_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (o_custkey, o_totalprice):
    the multi-column data-skipping layout primitive (see
    operators/zorder.py — one scalar min/max broadcast + codegen'd bit
    interleave; zorder_write range-partitions on this key so every
    indexed column gets tight per-file min/max stats)."""
    from capital.operators.zorder import with_z_value

    orders = load_table(spark, sf_dir, "orders")
    return with_z_value(orders, ["o_custkey", "o_totalprice"]).select(
        "o_orderkey", "z_value"
    )


def _zorder_string_oracle() -> str:
    from capital.operators.zorder import z_value_oracle_sql

    inner = z_value_oracle_sql(
        ["o_orderpriority", "o_orderdate"],
        "orders",
        # o_orderdate is TIMESTAMP_NTZ in the driver's parquet.
        kinds={"o_orderpriority": "string", "o_orderdate": "timestamp"},
    )
    return f"SELECT o_orderkey, z_value FROM ({inner})"


@query("p16_zorder_string_key", oracle=_zorder_string_oracle())
def p16_zorder_string_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key over a (category string, date) pair — the
    reference's real layout key shape (ticker + ymd Hive partitions,
    plugins/operators/yfinance_operator.py:16). Strings go through a
    broadcast dictionary dense_rank, dates through epoch days
    (operators/zorder.py:_with_numeric_proxies); the interleave and
    oracle are generated from the same constants as p15."""
    from capital.operators.zorder import with_z_value

    orders = load_table(spark, sf_dir, "orders")
    return with_z_value(orders, ["o_orderpriority", "o_orderdate"]).select(
        "o_orderkey", "z_value"
    )


@query(
    "dedup_fuzzy_fullrecall",
    memoize=False,
    # Oracle is the UNBLOCKED brute force: full recall means the
    # engine's blocked output must equal it exactly. The length
    # prefilter only prunes pairs levenshtein would reject anyway.
    oracle="""
    WITH keyed AS (SELECT c_custkey AS id, c_name FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
    FROM keyed a JOIN keyed b
      ON a.id < b.id
      AND abs(length(a.c_name) - length(b.c_name)) <= 1
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_fuzzy_fullrecall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-false-negative fuzzy dedup: deletion-neighborhood (FastSS)
    blocking makes the blocked pair set provably complete, closing
    fuzzy_key_pairs' documented prefix-recall gap — the edit-distance
    analogue of dedup_simhash_fullrecall. (Segment-pigeonhole/PassJoin
    was rejected: constant key prefixes like ``Customer#…`` collapse
    segment 0 into one all-pairs block.) Verified against the unblocked
    O(n²) oracle."""
    from capital.operators.dedup import fuzzy_fullrecall_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_fullrecall_pairs(
        cust, key_col="c_name", id_col="c_custkey", max_dist=1
    )


@query(
    "a5_rollup_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def a5_rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set surface the reference lacked: ROLLUP, free on Catalyst
    (SURVEY.md §2.4 note)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "a6_cube_flags",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {ora_sum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a6_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the pricing flags (engine surface, SURVEY.md §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        decimal_sum(F.col("l_quantity"), "sum_qty")
    )


@query(
    "a7_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a7_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (engine surface; Catalyst expand + two-phase)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


# --- §2.6 sorts / top-k --------------------------------------------------


@query(
    "o1_top1_latest_order",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 1
    """,
)
def o1_top1_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: MAX-date subquery as ORDER BY … LIMIT 1 (dags/brz_kr_etf_daily/
    brz_kr_etf_daily.py:26-29). Spark runs this as TakeOrderedAndProject —
    no global sort materialized."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate")
        )
    )


@query(
    "o2_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def o2_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k with deterministic tiebreak (TakeOrderedAndProject:
    per-partition heaps + single merge, no global sort — the only
    scalable top-k at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(
        10
    ).select("o_orderkey", "o_totalprice")


# --- §2.7 set operations -------------------------------------------------


@query(
    "u1_union_distinct_nations",
    oracle="""
    SELECT n_nationkey AS nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION
    SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def u1_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union of record blocks, distinct (multi-block KRX payload,
    dags/brz_industry_code_daily/extractors.py:42-44)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct()


@query(
    "u2_union_all_pages",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def u2_union_all_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: union across pages/symbols preserving multiplicity
    (all_items.extend loops, dags/brz_kr_etf_daily/tasks.py:64-65)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    return urgent.unionByName(high).select("o_orderkey", "o_orderpriority")


@query(
    "u3_except_custkeys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def u3_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set difference (requested ids minus fetched ids — the
    missing-ticker diff, plugins/operators/yfinance_operator.py:119).

    Renamed/re-based from the nations variant: supplier nations cover
    every customer nation in this generator, so that difference was
    vacuously empty. Customers minus urgent-order customers is
    nonempty at every SF."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    fetched = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.subtract(fetched)  # EXCEPT DISTINCT (set semantics)


@query(
    "u4_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def u4_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect — unused by the reference, exposed for free (§2.7)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


# --- §2.5 windows (fact-scale) ------------------------------------------


@query(
    "w3_moving_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def w3_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average per customer (OHLCV analytics surface,
    SURVEY.md §2.5 note). Partitioned window: shuffles once on custkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_price"),
    )


@query(
    "w4_top_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
)
def w4_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking per key (engine analytic surface, §2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "w5_lag_delta",
    oracle="""
    SELECT o_orderkey, o_custkey,
           o_totalprice - LAG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS price_delta
    FROM orders
    """,
)
def w5_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead delta per key (daily price-change surface, §2.5)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias(
            "price_delta"
        ),
    )


@query(
    "w6_trailing_7day_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS trailing_7d_total
    FROM orders
    """,
)
def w6_trailing_7day_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window: trailing 7-day spend per customer — the
    event-time moving aggregate OHLCV analytics need. Spark's numeric
    rangeBetween over epoch-days == SQL RANGE INTERVAL 7 DAY (both
    inclusive, both include date peers)."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-7, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_total"),
    )


@query(
    "ud3_group_apply_rank",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS INTEGER) AS rank_in_user
    FROM events
    """,
)
def ud3_group_apply_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD3: per-group Python transform via ``applyInPandas`` — ranks
    each user's events by time in pandas. Integer outputs keep the
    Arrow path oracle-checkable; the JVM twin is a row_number window
    (prefer it in hot paths)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")

    def rank_group(pdf):
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["rank_in_user"] = (pdf.index + 1).astype("int32")
        return pdf[["event_id", "user_id", "rank_in_user"]]

    return ev.groupBy("user_id").applyInPandas(
        rank_group, schema="event_id long, user_id long, rank_in_user int"
    )


# --- §2.2 zero-fill (F14) -----------------------------------------------


@query(
    "f14_zero_fill_left_join",
    oracle=f"""
    SELECT c.c_custkey,
           COALESCE(t.total, CAST(0.0 AS DOUBLE)) AS total_spent,
           COALESCE(t.n, 0) AS n_orders
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, {ora_sum("o_totalprice", "total")}, COUNT(*) AS n
      FROM orders GROUP BY o_custkey) t
    ON c.c_custkey = t.o_custkey
    """,
)
def f14_zero_fill_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: null-default record fill after an outer join (zero-row OHLC
    stub, dags/brz_bonds_daily/extractors.py:60-75)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        decimal_sum(F.col("o_totalprice"), "total"),
        F.count(F.lit(1)).alias("n"),
    )
    return cust.join(
        totals, cust.c_custkey == totals.o_custkey, "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total_spent"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
    )


@query(
    "a9_exact_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``). The exact twin of the
    approx-sketch path: use this shape on grouped/dimension-sized data,
    ``approx_percentile`` (t-digest) when a full sort per group is too
    expensive at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    pair = F.expr("percentile(l_extendedprice, array(0.25, 0.75))")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        pair[0].alias("p25_price"),
        pair[1].alias("p75_price"),
    )


@query(
    "sk_hll_rollup_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_distinct,
           COUNT(*) AS n_rows,
           TRUE AS within_bound
    FROM (SELECT event_type, user_id FROM events)
    GROUP BY event_type
    """,
)
def sk_hll_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-HLL rollup (operators/sketches.py): daily per-type
    sketches merged to global distinct-user estimates — the
    pre-aggregation that answers range-distinct queries without
    rescanning facts. Hash-checkable form: the sketch blob itself is
    engine-specific, so the query emits the exact count plus a
    ``within_bound`` boolean asserting the estimate sits inside the
    documented 3-sigma HLL band (≈4.9 % at lgK=12); the oracle
    computes the exact side and asserts TRUE. Merge==direct invariants
    stay pinned in tests/test_sketches.py; exact twin a7_distinct_agg."""
    from capital.operators.sketches import distinct_rollup_checked

    ev = load_table(spark, sf_dir, "events")
    return distinct_rollup_checked(ev)


@query(
    "sk_kll_quantiles",
    oracle="""
    SELECT event_type,
           quantile_cont("value", 0.5) AS median_value,
           quantile_cont("value", 0.95) AS p95_value,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM events
    WHERE "value" IS NOT NULL
    GROUP BY event_type
    """,
)
def sk_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile-sketch rollup: daily value sketches merged, p50/p95
    read from the merged sketch. Hash-checkable form: emits exact
    percentiles (``percentile`` == DuckDB ``quantile_cont``, as in a9)
    plus booleans asserting the sketch estimates' measured exact rank
    is within the documented KLL rank band (±5 % ≈ 3x the k=200
    error); oracle asserts TRUE. Exact twin a9_exact_quantiles."""
    from capital.operators.sketches import quantile_rollup_checked

    ev = load_table(spark, sf_dir, "events")
    return quantile_rollup_checked(ev)


@query(
    "scd2_part_history",
    oracle="""
    WITH base AS (SELECT p_partkey, p_brand, p_retailprice FROM part)
    SELECT p_partkey, p_brand, p_retailprice,
           DATE '2024-01-01' AS valid_from,
           DATE '2024-06-01' AS valid_to
    FROM base WHERE p_partkey % 7 = 0
    UNION ALL
    SELECT p_partkey, p_brand, p_retailprice + 100,
           DATE '2024-06-01', CAST(NULL AS DATE)
    FROM base WHERE p_partkey % 7 = 0
    UNION ALL
    SELECT p_partkey, p_brand, p_retailprice,
           DATE '2024-01-01', CAST(NULL AS DATE)
    FROM base WHERE p_partkey % 7 <> 0
    UNION ALL
    SELECT p_partkey + 1000000, 'NEWCO', CAST(1.0 AS DOUBLE),
           DATE '2024-06-01', CAST(NULL AS DATE)
    FROM base WHERE p_partkey % 97 = 0
    """,
)
def scd2_part_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history (operators/scd.py): initialize the part
    dimension, apply a deterministic update batch (price change for
    key%7=0, a no-op re-send for key%7=1, brand-new keys for key%97=0)
    and return the full versioned table. The oracle derives the exact
    expected history from the same predicates — closed+reopened rows
    for real changes, untouched rows for no-ops and absentees, fresh
    open rows for new keys."""
    from capital.operators.scd import scd2_apply, scd2_init

    base = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    dim = scd2_init(base, "2024-01-01")
    changed = base.filter(F.col("p_partkey") % 7 == 0).withColumn(
        "p_retailprice", F.col("p_retailprice") + 100
    )
    noop = base.filter(F.col("p_partkey") % 7 == 1)
    new_keys = base.filter(F.col("p_partkey") % 97 == 0).select(
        (F.col("p_partkey") + 1_000_000).alias("p_partkey"),
        F.lit("NEWCO").alias("p_brand"),
        F.lit(1.0).alias("p_retailprice"),
    )
    updates = changed.unionByName(noop).unionByName(new_keys)
    return scd2_apply(
        dim,
        updates,
        keys=["p_partkey"],
        tracked=["p_brand", "p_retailprice"],
        batch_date="2024-06-01",
    )


@query(
    "j8_scd2_asof_lookup",
    oracle="""
    WITH base AS (SELECT p_partkey, p_retailprice FROM part),
    hist AS (
      SELECT p_partkey, p_retailprice,
             DATE '1992-01-01' AS valid_from, DATE '1996-01-01' AS valid_to
      FROM base WHERE p_partkey % 7 = 0
      UNION ALL
      SELECT p_partkey, p_retailprice + 100,
             DATE '1996-01-01', CAST(NULL AS DATE)
      FROM base WHERE p_partkey % 7 = 0
      UNION ALL
      SELECT p_partkey, p_retailprice,
             DATE '1992-01-01', CAST(NULL AS DATE)
      FROM base WHERE p_partkey % 7 <> 0
    )
    SELECT l_orderkey, l_linenumber, l_partkey,
           h.p_retailprice AS version_price,
           h.valid_from AS version_from
    FROM (SELECT l_orderkey, l_linenumber, l_partkey,
                 CAST(l_shipdate AS DATE) AS sd
          FROM lineitem WHERE l_partkey % 11 = 0) f
    JOIN hist h ON f.l_partkey = h.p_partkey
      AND f.sd >= h.valid_from
      AND (h.valid_to IS NULL OR f.sd < h.valid_to)
    """,
)
def j8_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup (operators/scd.scd2_asof_lookup):
    every lineitem joins the part-price VERSION valid at its ship
    date — prices change for key%7=0 parts on 1996-01-01, so facts
    straddling that date resolve to different versions of the same
    key. Broadcast equi-join with the interval as residual condition;
    at most one version matches per fact."""
    from capital.operators.scd import scd2_apply, scd2_asof_lookup, scd2_init

    base = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    dim = scd2_init(base, "1992-01-01")
    updates = base.filter(F.col("p_partkey") % 7 == 0).withColumn(
        "p_retailprice", F.col("p_retailprice") + 100
    )
    hist = scd2_apply(
        dim, updates, ["p_partkey"], ["p_retailprice"], "1996-01-01"
    ).withColumnRenamed("p_partkey", "l_partkey")
    facts = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 11 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.col("l_shipdate").cast("date").alias("sd"),
        )
    )
    out = scd2_asof_lookup(
        facts, hist, ["l_partkey"], "sd", how="inner", broadcast=True
    )  # history is dimension-sized here; hint keeps the audited plan
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.col("p_retailprice").alias("version_price"),
        F.col("valid_from").alias("version_from"),
    )


# --- deterministic grouped statistics (operators/stats.py) ---------------


@query(
    "a10_grouped_pearson",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_quantity * l_extendedprice
                           AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity * l_quantity
                           AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           floor(CASE WHEN (n * sxx - sx * sx) > 0e0
                       AND (n * syy - sy * sy) > 0e0
                      THEN (n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx)
                                  * (n * syy - sy * sy)) END
                 * 1e6 + 0.5e0) / 1e6 AS corr
    FROM m
    """,
)
def a10_grouped_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation from exact decimal moments
    (operators/stats.grouped_pearson): quantity vs extended price per
    return flag. Spark's native corr() reduces doubles in partition
    order and cannot be hash-pinned; the decimal-moment form is
    bit-identical on any engine/partitioning/retry."""
    from capital.operators.stats import grouped_pearson

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_pearson(
        li, "l_returnflag", "l_quantity", "l_extendedprice"
    )


@query(
    "a12_pairwise_corr",
    memoize=False,
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.event_type AS series_a, b.event_type AS series_b,
             a.v AS x, b.v AS y
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type),
    m AS (
      SELECT series_a, series_b,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM p GROUP BY series_a, series_b)
    SELECT series_a, series_b,
           CAST(n AS BIGINT) AS n,
           floor(CASE WHEN (n * sxx - sx * sx) > 0e0
                       AND (n * syy - sy * sy) > 0e0
                      THEN (n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx)
                                  * (n * syy - sy * sy)) END
                 * 1e6 + 0.5e0) / 1e6 AS corr
    FROM m
    """,
)
def a12_pairwise_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional correlation matrix (operators/stats.
    pairwise_correlation): daily per-event-type value sums aligned on
    day, every unordered series pair scored with exact-decimal-moment
    Pearson r over the days where BOTH series traded — the classic
    returns-correlation-matrix workload. Pair enumeration rides the
    skew-chunked within-key join (a fat cross-section cannot capsize
    one task); the moment aggregate is the a10-pinned formula on a
    composite (series_a, series_b) group. memoize=False: the chunked
    join's skew probe is an eager count job."""
    from capital.operators.stats import pairwise_correlation
    from capital.queries.registry import decimal_sum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(decimal_sum(F.col("value"), "v"))
    return pairwise_correlation(daily, "day", "event_type", "v")


@query(
    "a11_quantile_bins",
    oracle="""
    WITH ed AS (
      SELECT l_returnflag AS g,
             quantile_cont(l_extendedprice,
                           [0.25e0, 0.5e0, 0.75e0]) AS e
      FROM lineitem GROUP BY 1),
    b AS (
      SELECT l.l_returnflag,
             1 + CAST(l.l_extendedprice > e[1] AS INT)
               + CAST(l.l_extendedprice > e[2] AS INT)
               + CAST(l.l_extendedprice > e[3] AS INT) AS bin,
             l.l_extendedprice AS v
      FROM lineitem l JOIN ed ON l.l_returnflag = ed.g)
    SELECT l_returnflag,
           CAST(bin AS INT) AS bin,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
    FROM b GROUP BY 1, 2
    """,
)
def a11_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quantile discretizer (operators/stats.
    quantile_bins): per-return-flag quartile edges learned with exact
    percentiles (the a9-pinned equivalence), rows assigned by strict
    > comparisons (ties collapse low, deterministically), rolled up
    to per-bin counts + decimal price sums. The learned-binning
    ML-prep staple."""
    from capital.operators.stats import quantile_bins
    from capital.queries.registry import decimal_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    binned = quantile_bins(
        li, "l_extendedprice", 4, group_col="l_returnflag"
    )
    return binned.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        decimal_sum(F.col("l_extendedprice"), "sum_price"),
    )
