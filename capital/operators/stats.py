"""Grouped statistics with cross-engine float determinism: Pearson
correlation and quantile binning.

Spark ships ``corr()`` — but a native float aggregate reduces in
partition order, so two runs (or two engines) disagree in the last
ulps and a hash-checked pipeline cannot pin it. These operators apply
the repo's decimal-moment discipline instead: every moment
(Σx, Σy, Σxy, Σx², Σy²) is an EXACT decimal sum of 6-decimal-quantized
terms, and the closed-form estimator is one fixed-shape double
expression of those exact moments — bit-identical on any engine, any
partitioning, any retry. The cost is quantization at the 6th decimal
of each TERM (documented; negligible against sampling noise for
analytics, and determinism is worth more than the 7th decimal in a
monitored pipeline).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from capital.operators.caching import CacheScope


def _dsum(col, alias):
    return (
        F.sum(col.cast("decimal(28,6)")).cast("double").alias(alias)
    )


def grouped_pearson(
    df: DataFrame,
    group_col: str | list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Pearson correlation from exact decimal moments:

    ``r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))``

    One map-side-combined aggregate per group; null when either
    variance term is ≤ 0 (constant column). Returns
    ``(group, n, corr)`` with ``corr`` stable-rounded to 6.
    ``group_col`` may be a list (composite group — the pairwise
    correlation matrix groups on both series ids)."""
    from capital.llm.text import round6_stable

    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    x, y = F.col(x_col), F.col(y_col)
    m = df.groupBy(*[F.col(g) for g in groups]).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        _dsum(x, "__sx"),
        _dsum(y, "__sy"),
        _dsum(x * y, "__sxy"),
        _dsum(x * x, "__sxx"),
        _dsum(y * y, "__syy"),
    )
    n = F.col("__n")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return m.select(
        *groups,
        n.cast("long").alias("n"),
        round6_stable(r).alias("corr"),
    )


def pairwise_correlation(
    df: DataFrame,
    key_col: str,
    series_col: str,
    value_col: str,
    chunk_target: int = 1024,
    total_rows_hint: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Correlation MATRIX across aligned series — the classic
    cross-sectional workload (pairwise correlation of per-day returns
    across tickers, of per-day event-type volumes, …): for every
    unordered series pair, Pearson r over the keys where BOTH series
    have a value (pairwise-complete observations — the standard
    pairwise-deletion convention).

    Contract: at most one row per (key, series) — pre-aggregate the
    panel first (a duplicate key would multiply through the pair
    enumeration).

    Shape: within-key pair enumeration through
    :func:`~capital.operators.skew.chunked_pair_join` (each key is a
    block — so a fat cross-section, thousands of series on one day,
    stays task-bounded instead of exploding one join task), then ONE
    map-side-combined decimal-moment aggregate per series pair
    (:func:`grouped_pearson` on the composite group). Output is the
    upper triangle (``series_a < series_b``), n keys per pair, r
    stable-rounded.
    """
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join

    panel = df.select(key_col, series_col, value_col)
    release_after_probe = False
    if total_rows_hint is None:
        # The skew probe is an eager count over the panel; persist so
        # the probe and the pair join share one evaluation of the
        # caller's (often aggregate-shaped) lineage. Thread the
        # caller's scope (CacheScope discipline); without one, release
        # right after the probe has run — an untracked persist here
        # leaks an InMemoryRelation per call into the shared
        # local-mode driver heap (round-11 advice). The post-release
        # consumption then re-evaluates the panel aggregate once,
        # which is the cheap side of this operator.
        panel = scoped_persist(panel, scope)
        release_after_probe = scope is None
    pairs = chunked_pair_join(
        panel,
        [key_col],
        series_col,
        payload_cols=[value_col],
        chunk_target=chunk_target,
        total_rows_hint=total_rows_hint,
    ).select(
        F.col("id_a").alias("series_a"),
        F.col("id_b").alias("series_b"),
        F.col(f"{value_col}_a").alias("__x"),
        F.col(f"{value_col}_b").alias("__y"),
    )
    if release_after_probe:
        # chunked_pair_join's probe (its only eager job) has run by
        # now; the returned plan stays valid — Spark recomputes the
        # unpersisted panel when the result is consumed.
        panel.unpersist()
    return grouped_pearson(pairs, ["series_a", "series_b"], "__x", "__y")


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    group_col: str | None = None,
) -> DataFrame:
    """Equal-frequency binning (quantile discretizer): learn the
    ``n_bins − 1`` interior exact-percentile edges (globally or per
    group), then assign ``bin = 1 + Σᵢ [value > edgeᵢ]`` — strict
    ``>`` so a value exactly ON an edge falls in the lower bin, and
    heavy ties collapse bins deterministically rather than splitting
    arbitrarily.

    Edges ride the a9-pinned ``percentile == quantile_cont``
    equivalence; the assignment is a broadcast join of the
    group-sized edge table + an integer sum of comparisons — no
    second shuffle of the rows. Adds ``bin`` (1-based int)."""
    probs = [i / n_bins for i in range(1, n_bins)]
    arr = "array(" + ", ".join(repr(p) for p in probs) + ")"
    if group_col is None:
        edges = df.agg(
            F.expr(f"percentile({value_col}, {arr})").alias("__edges")
        )
        joined = df.crossJoin(F.broadcast(edges))
    else:
        edges = df.groupBy(F.col(group_col).alias("__g")).agg(
            F.expr(f"percentile({value_col}, {arr})").alias("__edges")
        )
        joined = df.join(
            F.broadcast(edges), F.col(group_col) == F.col("__g")
        ).drop("__g")
    v = F.col(value_col)
    bin_expr = F.lit(1)
    for i in range(len(probs)):
        bin_expr = bin_expr + F.when(
            v > F.element_at("__edges", i + 1), 1
        ).otherwise(0)
    return joined.withColumn("bin", bin_expr.cast("int")).drop("__edges")


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-cell mutual-information terms between two categorical
    columns:

    ``term(x,y) = p(x,y) · ln( p(x,y) / (p(x)·p(y)) )``

    — the feature-relevance score behind curation questions like "is
    language confounded with source?" (a mixture rebalanced on one
    axis silently reshapes the other exactly when MI > 0). Reported
    per cell, like the PSI terms: WHICH (x, y) pairs carry the
    dependence is the actionable output; the scalar MI is one
    ``decimal_sum`` of the terms.

    Determinism: one map-side-combined (x, y) count; marginals and
    the total are window sums over that dimension-sized aggregate
    (exact integers). Each term is
    ``(n_xy/N) · ln((n_xy·N)/(n_x·n_y))`` — exact-integer products
    stay exact in doubles through 2⁵³, ``ln`` agrees across engines
    (the PSI precedent), terms stable-round to 6. Only observed
    cells appear (n_xy ≥ 1), so the log is always defined; absent
    cells contribute 0 to MI by the p·ln(p) limit and are correctly
    omitted.
    """
    from pyspark.sql import Window

    from capital.llm.text import round6_stable

    counts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    wx = Window.partitionBy("x").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wy = Window.partitionBy("y").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = (
        counts.withColumn("__nx", F.sum("n_xy").over(wx))
        .withColumn("__ny", F.sum("n_xy").over(wy))
        .withColumn("__n", F.sum("n_xy").over(wall))
    )
    term = (F.col("n_xy") / F.col("__n")) * F.log(
        (F.col("n_xy") * F.col("__n")) / (F.col("__nx") * F.col("__ny"))
    )
    return m.select(
        F.col("x").alias(x_col),
        F.col("y").alias(y_col),
        "n_xy",
        round6_stable(F.col("n_xy") / F.col("__n")).alias("p_xy"),
        round6_stable(term).alias("mi_term"),
    )
