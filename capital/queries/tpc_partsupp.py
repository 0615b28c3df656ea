"""TPC-H Q2/Q9/Q11/Q16/Q20 over a DERIVED ``partsupp``.

The driver's testdata has no ``partsupp`` table, which blocked the five
TPC-H queries that need ``ps_supplycost`` / ``ps_availqty``. Both
engines can, however, derive the *same* deterministic partsupp from the
tables that do exist: every part gets ``_SUPP_PER_PART`` suppliers by a
stride formula over the supplier count, with integer-arithmetic cost
and quantity columns. The Spark builder and the oracle CTE are
generated from the same constants below, so parity is exact — all
arithmetic is integer-valued (and the one division is by 100 on values
< 2^53), leaving no float-reduction ambiguity.

The point is the QUERY SHAPES, not the data: Q2's per-group min
equality join (correlated subquery decorrelated by hand on the Spark
side), Q9's four-way fact join with a computed measure, Q11's
group-vs-global HAVING, Q16's NOT-IN anti-join + COUNT DISTINCT, and
Q20's correlated quantity threshold — the hard relational surface the
engine was missing. Schema adaptations (no p_mfgr/s_address/s_comment
in the driver's reduced tables) are noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.queries.registry import ora_sum, query

#: partsupp derivation constants — shared by the Spark builder and the
#: oracle SQL fragment.
_SUPP_PER_PART = 4
_QTY_A, _QTY_B, _QTY_MOD = 47, 31, 9999
_COST_A, _COST_B, _COST_MOD = 13, 7, 99900

#: Oracle CTE body: ``ps`` with (ps_partkey, ps_suppkey, ps_availqty,
#: ps_supplycost); suppkeys are 1-based like the driver's supplier.
_PS_SQL = f"""
  ns AS (SELECT COUNT(*) AS n FROM supplier),
  ps AS (
    SELECT p_partkey AS ps_partkey,
           ((p_partkey + t.i * (ns.n // {_SUPP_PER_PART} + 1)) % ns.n) + 1
             AS ps_suppkey,
           CAST((p_partkey * {_QTY_A} + t.i * {_QTY_B}) % {_QTY_MOD} + 1
             AS INTEGER) AS ps_availqty,
           CAST((p_partkey * {_COST_A} + t.i * {_COST_B}) % {_COST_MOD}
             AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost
    FROM part, ns, (SELECT unnest(range(0, {_SUPP_PER_PART})) AS i) t)
"""


def synthetic_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of the ``ps`` oracle CTE. Narrow ×4 fan-out of
    part keys plus one broadcast scalar (supplier count) — at any
    scale this is a projection of ``part``, never a join."""
    part = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("__n")
    )
    pk = F.col("p_partkey")
    i = F.col("__i")
    return (
        part.select("p_partkey")
        .crossJoin(F.broadcast(n))
        .select(
            pk,
            F.col("__n"),
            F.explode(
                F.array(*[F.lit(k) for k in range(_SUPP_PER_PART)])
            ).alias("__i"),
        )
        .select(
            pk.alias("ps_partkey"),
            (
                (pk + i * (F.floor(F.col("__n") / _SUPP_PER_PART) + 1))
                % F.col("__n")
                + 1
            ).alias("ps_suppkey"),
            ((pk * _QTY_A + i * _QTY_B) % _QTY_MOD + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                ((pk * _COST_A + i * _COST_B) % _COST_MOD).cast("double")
                / 100.0
                + 1.0
            ).alias("ps_supplycost"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_SQL},
    eur AS (
      SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    mins AS (
      SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
      FROM eur GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part
    JOIN eur ON p_partkey = eur.ps_partkey
    JOIN mins ON mins.ps_partkey = p_partkey
            AND eur.ps_supplycost = mins.min_cost
    WHERE p_size <= 15 AND p_type = 'STANDARD'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: p_type stands in for the absent p_mfgr):
    the cheapest EUROPE supplier for each small (size<=15) STANDARD part.

    The spec's correlated MIN subquery is decorrelated by hand: one
    regional ps frame, a per-part min aggregate, an equality join back.
    Scale: supplier/nation/region broadcast; ps is a projection of
    part, so the min aggregate and the join-back shuffle on ps_partkey
    only — no fact table involved at all.
    """
    ps = synthetic_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    # ps embeds the supplier dataset (scalar count), so the join back
    # against supplier must alias-qualify to avoid self-join ambiguity.
    eur = (
        ps.alias("ps")
        .join(
            F.broadcast(supp.alias("s")),
            F.col("ps.ps_suppkey") == F.col("s.s_suppkey"),
        )
        .join(
            F.broadcast(nat.alias("n")),
            F.col("s.s_nationkey") == F.col("n.n_nationkey"),
        )
        .join(
            F.broadcast(reg.alias("r")),
            F.col("n.n_regionkey") == F.col("r.r_regionkey"),
        )
        .filter(F.col("r.r_name") == "EUROPE")
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mins = eur.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("__min_cost")
    )
    filtered_part = part.filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    return (
        eur.join(mins, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("__min_cost"))
        .join(F.broadcast(filtered_part), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    WITH {_PS_SQL}
    SELECT nation, o_year, {ora_sum("amount", "sum_profit")}
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - ps_supplycost * l_quantity AS amount
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN ps ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
      JOIN part ON p_partkey = l_partkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue minus supply cost) by supplier nation
    and order year for red parts.

    Scale: part/supplier/nation/ps broadcast (ps is 4×|part| narrow
    rows); the only big shuffle is lineitem↔orders on orderkey. The
    p_name filter prunes the broadcast part AND ps-join fan before the
    fact scan's join. Decimal-sum discipline on the profit measure.
    """
    from capital.queries.registry import decimal_sum

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    ps = synthetic_partsupp(spark, sf_dir)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(ps),
            (ps.ps_suppkey == li.l_suppkey) & (ps.ps_partkey == li.l_partkey),
        )
        .join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(decimal_sum(F.col("amount"), "sum_profit"))
    )


_Q11_FRACTION = 0.001


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_SQL},
    nat_ps AS (
      SELECT ps_partkey,
             ps_supplycost * ps_availqty AS value
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
    SELECT ps_partkey, {ora_sum("value", "part_value")}
    FROM nat_ps
    GROUP BY ps_partkey
    HAVING CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
         > (SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
            FROM nat_ps) * {_Q11_FRACTION}
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose NATION_7 stock value exceeds a fraction
    of that nation's total stock value — per-group aggregate compared
    against a global scalar.

    Scale: the global total is a one-row aggregate broadcast into the
    HAVING filter; group sums and the total both run decimal-exact so
    the threshold comparison cannot flake on reduction order. ps is a
    part projection: no fact scan.
    """
    ps = synthetic_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nat_ps = (
        ps.alias("ps")
        .join(
            F.broadcast(supp.alias("s")),
            F.col("ps.ps_suppkey") == F.col("s.s_suppkey"),
        )
        .join(
            F.broadcast(nat.alias("n")),
            F.col("s.s_nationkey") == F.col("n.n_nationkey"),
        )
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"),
        )
    )
    grouped = nat_ps.groupBy("ps_partkey").agg(
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("part_value")
    )
    total = nat_ps.agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            * F.lit(_Q11_FRACTION)
        ).alias("__threshold")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__threshold"))
        .select("ps_partkey", "part_value")
    )


@query(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {_PS_SQL}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: negative account balance stands in for the
    absent s_comment complaint filter): distinct supplier counts per
    (brand, type, size) excluding flagged suppliers.

    Scale: the excluded-supplier set is a broadcast anti-join (NOT IN
    over a non-null key column == left_anti); part broadcasts into the
    ps projection; one shuffle for the distinct-count aggregate.
    """
    ps = synthetic_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    flagged = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(flagged), "ps_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_PS_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM ps
      JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
        ON ps_partkey = p_partkey
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty > 0.2 * qty)
    SELECT s_name, n_name, s_acctbal
    FROM supplier
    JOIN excess ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: s_acctbal for the absent s_address, and the
    nation filter widened to a nation projection — the synthesized
    partsupp intersects only ~4% of lineitem's (part, supplier) pairs,
    so a single-nation cut left a 1-row vacuous result): suppliers
    holding more than a fifth of a year's shipped quantity of some
    small part.

    The spec's correlated scalar subquery (per (part, supplier)
    shipped total) decorrelates into one pre-aggregated shipped frame
    joined back — the only fact-table shuffle; quantities are
    integer-valued doubles so the raw SUM is order-exact. ps and the
    name-filtered part broadcast; the final supplier join is a
    broadcast semi-join via the distinct excess keys.
    """
    ps = synthetic_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
    )
    excess = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.2 * F.col("__qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(excess), supp.s_suppkey == F.col("ps_suppkey"))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name", "s_acctbal")
    )
