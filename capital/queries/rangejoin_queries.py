"""Range-join query surface: non-equi time-interval matching executed
as a bucketed equi-join (see :mod:`capital.operators.rangejoin`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table, parallelize_narrow
from capital.operators.rangejoin import point_in_interval_join
from capital.queries.registry import decimal_sum, query

_SAMPLE_MOD = 100
_WINDOW_DAYS = 30


@query(
    "j7_range_join_shipments",
    oracle=f"""
    WITH s AS (
      SELECT o_orderkey, o_orderdate FROM orders
      WHERE o_orderkey % {_SAMPLE_MOD} = 0)
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           COUNT(l_orderkey) AS n_shipments,
           coalesce(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(28,6))) AS DOUBLE), 0.0)
             AS revenue
    FROM s LEFT JOIN lineitem
      ON l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL {_WINDOW_DAYS} DAY
    GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
    """,
)
def j7_range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global shipping activity in the 30 days after each sampled
    order — a genuine point-in-interval join (no equi-key): every
    lineitem ship date against every sampled order's window.

    Scale: executes as a bucketed equi-join (bucket = 30-day epoch
    slot), shuffling O(points + 2×intervals) rows; the naive non-equi
    formulation would be a nested-loop over the full cross product.
    Zero-match orders are preserved by the F14 zero-fill pattern
    (left join + coalesce) rather than an outer range join.
    """
    orders = load_table(spark, sf_dir, "orders")
    sample = orders.filter(
        F.col("o_orderkey") % _SAMPLE_MOD == 0
    ).select(
        "o_orderkey",
        "o_orderdate",
        (
            F.col("o_orderdate")
            + F.expr(f"INTERVAL {_WINDOW_DAYS} DAYS")
        ).alias("window_end"),
    )
    # Single-file parquet scans as one split; with the interval side
    # broadcast there is no shuffle to restore parallelism, so the
    # join+agg would run on one core without this repartition.
    li = parallelize_narrow(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
        )
    )
    matched = point_in_interval_join(
        li,
        sample,
        point_col="l_shipdate",
        start_col="o_orderdate",
        end_col="window_end",
        bucket_days=_WINDOW_DAYS,
        broadcast_intervals=True,
    )
    per_order = matched.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )
    return (
        sample.select("o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
        .join(per_order, "o_orderkey", "left")
        .select(
            "o_orderkey",
            "orderdate",
            F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )
