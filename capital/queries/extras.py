"""Remaining checkable surface: grouping sets, SQL entry point,
Arrow-vectorized Pandas UDF, BOK interval formatting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from capital.io import load_table, register_views
from capital.queries.registry import ora_sum, query
from capital.transforms.indicators import bok_time_string


@query(
    "a8_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {ora_sum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via Spark SQL —
    engine surface the reference's warehouse would provide."""
    register_views(spark, sf_dir, tables=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "s12_sql_entry",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def s12_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/S12: the warehouse SQL-result source — arbitrary SQL against
    registered engine tables (``RedshiftDataOperator(return_sql_result
    =True)`` becomes plain ``spark.sql``)."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
        """
    )


@query(
    "j6_correlated_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_name,
           (SELECT MAX(l.l_extendedprice) FROM lineitem l
            WHERE l.l_partkey = p.p_partkey) AS max_sold_price
    FROM part p
    """,
)
def j6_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + left outer join (the rewrite Redshift applies to the
    reference's J1, SURVEY.md §4 'Scalar-subquery decorrelation')."""
    register_views(spark, sf_dir, tables=("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_partkey, p_name,
               (SELECT MAX(l.l_extendedprice) FROM lineitem l
                WHERE l.l_partkey = p.p_partkey) AS max_sold_price
        FROM part p
        """
    )


@query(
    "f16_sorted_string_agg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
             AS statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def f16_sorted_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: collect_set → array_sort →
    array_join (order-free collection, explicit sort — safe under any
    partitioning)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set("l_linestatus")), ","
        ).alias("statuses")
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (engine surface, SURVEY.md
    §2.4 note), hash-checkable form: the estimate is engine-specific,
    so emit the exact count plus ``within_bound`` asserting the HLL++
    estimate is inside 3x the requested rsd (0.02 → 6 %); the oracle
    computes the exact side and asserts TRUE. Exact twin
    ``a7_distinct_agg``."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= F.lit(0.06) * F.col("exact_parts")
            ).alias("within_bound"),
        )
    )


def _token_count_arrow():
    """UD2: Arrow-vectorized scalar Pandas UDF (one pandas call per
    batch, never per row). Built lazily — ``pandas_udf`` needs an
    active session, which does not exist at import time."""

    @pandas_udf("int")
    def fn(texts: pd.Series) -> pd.Series:
        return texts.str.strip().str.split(r"\s+").str.len().astype("int32")

    return fn


@query(
    "ud2_pandas_udf_tokens",
    oracle=r"""
    SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
             AS n_tokens
    FROM documents
    """,
)
def ud2_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pandas-UDF escape hatch, oracle-checked: integer outputs are
    engine-portable, so this verifies the Arrow path end-to-end. (The
    JVM-native twin is ``text_token_count``; prefer it in hot paths.)"""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _token_count_arrow()("text").alias("n_tokens"))


@query(
    "f2b_bok_interval_formats",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m%d') AS time_daily,
           strftime(o_orderdate, '%Y%m') AS time_monthly,
           strftime(o_orderdate, '%Y') || 'Q' || CAST(quarter(o_orderdate) AS VARCHAR)
             AS time_quarterly,
           strftime(o_orderdate, '%Y') AS time_yearly
    FROM orders
    """,
)
def f2b_bok_interval_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: all four BOK ECOS TIME formats from one date column
    (plugins/operators/bank_of_korea_operator.py:147-168)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        bok_time_string(F.col("o_orderdate"), "daily").alias("time_daily"),
        bok_time_string(F.col("o_orderdate"), "monthly").alias("time_monthly"),
        bok_time_string(F.col("o_orderdate"), "quarterly").alias(
            "time_quarterly"
        ),
        bok_time_string(F.col("o_orderdate"), "yearly").alias("time_yearly"),
    )


# --- graph analytics: fixed-iteration PageRank --------------------------

_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_oracle() -> str:
    """Unrolled PageRank: fixed iterations make the loop plain SQL —
    one CTE per step, sharing the Spark operator's constants and its
    integer nano-rank accumulation (exact sums both engines) plus the
    floor-stable final rounding.

    Every numeric literal is written in scientific notation (``1e9``,
    ``0.5e0``): DuckDB types bare decimal-point literals as DECIMAL,
    and DECIMAL/INTEGER division follows decimal scale rules, not
    IEEE double — a silent 1-ulp divergence from the Spark operator
    (caught at sf0.01). The damped base uses the repr of the SAME
    Python double the operator bakes in (``1.0 - damping`` is
    0.15000000000000002, not the nearest double to 0.15)."""
    n_sql = "(SELECT n FROM nn)"
    base = f"{1.0 - _PR_DAMPING!r}e0 / {n_sql}"
    ctes = [
        """e0 AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    g AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od USING (src)),
    r0 AS (
      SELECT node,
             floor(1e0 / """ + n_sql + """ * 1e9 + 0.5e0) / 1e9 AS rank
      FROM nodes)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(f"""r{k} AS (
      SELECT nodes.node,
             floor(({base} + {_PR_DAMPING!r}e0
                    * (COALESCE(CAST(t.s AS DOUBLE), 0e0) / 1e9))
                   * 1e9 + 0.5e0) / 1e9 AS rank
      FROM nodes LEFT JOIN (
        SELECT g.dst AS node,
               SUM(CAST(floor(r.rank / g.outdeg * 1e9 + 0.5e0)
                        AS BIGINT)) AS s
        FROM g JOIN r{k - 1} r ON g.src = r.node
        GROUP BY g.dst) t ON nodes.node = t.node)""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, rank FROM r{_PR_ITERS}\n    "
    )


@query("graph_pagerank_trade", memoize=False, oracle=_pagerank_oracle())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the
    undirected customer↔supplier trade graph (distinct
    orders⋈lineitem pairs, both directions): entity-importance
    ranking, the iterative-algorithm family's second member next to
    pointer-jumping components. Integer nano-rank accumulation and
    floor-stable rounding make every iteration bit-identical across
    engines, so the 5-step loop unrolls into a hash-checked oracle.
    memoize=False: localCheckpoint materializes eagerly."""
    from capital.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)


# --- triangle counting on the thresholded co-purchase graph -------------


def _triangles_oracle() -> str:
    return """
    WITH cs AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    pairs AS MATERIALIZED (
      SELECT x.s AS s1, y.s AS s2, count(*) AS w
      FROM cs x JOIN cs y ON x.c = y.c AND x.s < y.s
      GROUP BY x.s, y.s),
    st AS (SELECT count(*) AS n, SUM(w) AS sw, SUM(w * w) AS sww
           FROM pairs),
    thr AS (
      SELECT CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)
             + 2e0 * sqrt(CAST(sww AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(sw AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)))
               AS t
      FROM st),
    e AS MATERIALIZED (SELECT s1, s2 FROM pairs, thr
          WHERE CAST(w AS DOUBLE) > t),
    deg AS MATERIALIZED (
      SELECT nd, count(*) AS degree
      FROM (SELECT s1 AS nd FROM e UNION ALL SELECT s2 AS nd FROM e)
      GROUP BY nd),
    rk AS MATERIALIZED (SELECT nd, degree,
                  degree * 4294967296 + nd AS rank_key
           FROM deg),
    ori AS MATERIALIZED (
      SELECT least(ra.rank_key, rb.rank_key) AS ru,
             greatest(ra.rank_key, rb.rank_key) AS rv
      FROM e JOIN rk ra ON e.s1 = ra.nd JOIN rk rb ON e.s2 = rb.nd),
    tri AS MATERIALIZED (
      SELECT o1.ru AS r1, o1.rv AS r2, o2.rv AS r3
      FROM ori o1
      JOIN ori o2 ON o1.ru = o2.ru AND o1.rv < o2.rv
      JOIN ori o3 ON o3.ru = o1.rv AND o3.rv = o2.rv),
    tcnt AS (
      SELECT rank_key, count(*) AS tc
      FROM (SELECT r1 AS rank_key FROM tri
            UNION ALL SELECT r2 FROM tri
            UNION ALL SELECT r3 FROM tri)
      GROUP BY rank_key)
    SELECT rk.nd AS node,
           CAST(rk.degree AS BIGINT) AS degree,
           CAST(COALESCE(tc, 0) AS BIGINT) AS triangles,
           floor(CASE WHEN rk.degree >= 2
                      THEN 2e0 * COALESCE(tc, 0)
                           / (rk.degree * (rk.degree - 1))
                      ELSE 0e0 END * 1e6 + 0.5e0) / 1e6
             AS clustering_coeff
    FROM rk LEFT JOIN tcnt ON rk.rank_key = tcnt.rank_key
    """


@query("graph_triangles_trade", memoize=False, oracle=_triangles_oracle())
def graph_triangles_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts + clustering coefficient
    (operators/graph.triangles — degree-ordered node-iterator,
    wedges through the skew-chunked pair join) over the co-purchase
    graph: suppliers joined when their distinct-customer overlap
    count exceeds mean + 2·stddev of all pair weights. The synthetic
    trade data makes every co-occurrence projection complete, so the
    scale-adaptive threshold (exact-integer moments → bit-identical
    scalar both engines) sparsifies to the statistically-heavy edges
    (sf0.01: 155 edges / 85 triangles; sf0.1: 12k / 5.7k). Pair
    weights come from the chunked per-customer pair enumeration —
    no all-pairs join at any stage. memoize=False: persists the
    (c, s) relation and the pair weights (each consumed twice:
    probe + enumeration, moments + filter); the operator persists
    its own edge/node-sized intermediates."""
    from capital.operators.graph import triangles
    from capital.operators.skew import chunked_pair_join

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    ).persist()
    # pairs feeds BOTH the moment aggregate and the edge filter —
    # persist it or the 10M-row per-customer enumeration runs twice.
    pairs = (
        chunked_pair_join(cs, block_cols=["c"], id_col="s")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("w"))
    ).persist()
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    mu = F.col("sw").cast("double") / F.col("n").cast("double")
    thr = mu + F.lit(2.0) * F.sqrt(
        F.col("sww").cast("double") / F.col("n").cast("double") - mu * mu
    )
    edges = (
        pairs.crossJoin(F.broadcast(stats))
        .filter(F.col("w").cast("double") > thr)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    out = triangles(edges)
    return out.select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.col("triangles").cast("long").alias("triangles"),
        "clustering_coeff",
    )


# --- label propagation communities on the co-purchase graph -------------

_LPA_ITERS = 4


def _lpa_oracle() -> str:
    """Unrolled synchronous LPA over the same thresholded co-purchase
    graph as the triangles oracle (shared construction text; every
    multi-referenced CTE MATERIALIZED per the round-9 re-evaluation
    gotcha). Each round: neighbor-label counts -> per-node max ->
    smallest-label tie-break."""
    ctes = ["""cs AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    pairs AS MATERIALIZED (
      SELECT x.s AS s1, y.s AS s2, count(*) AS w
      FROM cs x JOIN cs y ON x.c = y.c AND x.s < y.s
      GROUP BY x.s, y.s),
    st AS (SELECT count(*) AS n, SUM(w) AS sw, SUM(w * w) AS sww
           FROM pairs),
    thr AS (
      SELECT CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)
             + 2e0 * sqrt(CAST(sww AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(sw AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)))
               AS t
      FROM st),
    e AS MATERIALIZED (SELECT s1, s2 FROM pairs, thr
          WHERE CAST(w AS DOUBLE) > t),
    bothdir AS MATERIALIZED (
      SELECT s1 AS a, s2 AS b FROM e
      UNION ALL SELECT s2 AS a, s1 AS b FROM e),
    l0 AS MATERIALIZED (
      SELECT DISTINCT a AS node, a AS label FROM bothdir)"""]
    for i in range(1, _LPA_ITERS + 1):
        ctes.append(f"""n{i} AS MATERIALIZED (
      SELECT bd.b AS node, l.label, COUNT(*) AS c
      FROM bothdir bd JOIN l{i - 1} l ON bd.a = l.node
      GROUP BY bd.b, l.label),
    m{i} AS (SELECT node, MAX(c) AS mc FROM n{i} GROUP BY node),
    l{i} AS MATERIALIZED (
      SELECT n.node, MIN(n.label) AS label
      FROM n{i} n JOIN m{i} m ON n.node = m.node AND n.c = m.mc
      GROUP BY n.node)""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, label FROM l{_LPA_ITERS}\n    "
    )


@query("graph_lpa_trade", memoize=False, oracle=_lpa_oracle())
def graph_lpa_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (operators/graph.
    label_propagation, Raghavan et al. 2007) over the same mu+2sigma
    thresholded co-purchase graph as graph_triangles_trade: which
    supplier module does each node belong to. Deterministic
    (count desc, label asc) adoption unrolls the 4-round loop into
    the hash-checked oracle. memoize=False: per-round localCheckpoint
    is eager."""
    from capital.operators.graph import label_propagation
    from capital.operators.skew import chunked_pair_join

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    ).persist()
    pairs = (
        chunked_pair_join(cs, block_cols=["c"], id_col="s")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("w"))
    ).persist()
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    mu = F.col("sw").cast("double") / F.col("n").cast("double")
    thr = mu + F.lit(2.0) * F.sqrt(
        F.col("sww").cast("double") / F.col("n").cast("double") - mu * mu
    )
    edges = (
        pairs.crossJoin(F.broadcast(stats))
        .filter(F.col("w").cast("double") > thr)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return label_propagation(edges, iterations=_LPA_ITERS)


# --- snapshot diff (lake reconciliation) ---------------------------------


@query(
    "lake_snapshot_diff",
    oracle="""
    WITH old_s AS (
      SELECT o_orderkey AS k, o_totalprice AS price,
             o_orderstatus AS ostatus
      FROM orders WHERE o_orderkey % 7 <> 0),
    new_s AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1e0
                  ELSE o_totalprice END AS price,
             o_orderstatus AS ostatus
      FROM orders WHERE o_orderkey % 11 <> 0),
    j AS (
      SELECT COALESCE(o.k, n.k) AS k,
             o.k IS NOT NULL AS in_old,
             n.k IS NOT NULL AS in_new,
             array_concat(
               CASE WHEN o.price IS DISTINCT FROM n.price
                    THEN ['price'] ELSE [] END,
               CASE WHEN o.ostatus IS DISTINCT FROM n.ostatus
                    THEN ['ostatus'] ELSE [] END) AS cc
      FROM old_s o FULL OUTER JOIN new_s n ON o.k = n.k)
    SELECT k AS o_orderkey,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                WHEN len(cc) > 0 THEN 'changed'
                ELSE 'unchanged' END AS diff_status,
           COALESCE(array_to_string(
             CASE WHEN in_old AND in_new THEN cc ELSE [] END, ','), '')
             AS changed_cols
    FROM j
    WHERE NOT (in_old AND in_new AND len(cc) = 0)
    """,
)
def lake_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation (operators/diff.snapshot_diff):
    added / removed / changed rows between two order-table versions
    (deterministically derived: churned membership via modulus
    filters, a price bump on every fifth key), with the differing
    column NAMES so downstream recompute routes on a filter. The
    answer to the reference's costly-full-refresh tension; one
    full-outer key join, delta-only output."""
    from capital.operators.diff import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    old_s = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("ostatus"),
    )
    new_s = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.col("o_orderstatus").alias("ostatus"),
    )
    out = snapshot_diff(old_s, new_s, ["o_orderkey"])
    # Driver-facing outputs must be atomic (the canonicalizer cannot
    # sort array cells) — stringify the changed-column list.
    return out.select(
        "o_orderkey",
        "diff_status",
        F.array_join("changed_cols", ",").alias("changed_cols"),
    )
