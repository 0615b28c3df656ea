"""Distribution-drift monitoring between two data periods (PSI, KS).

A 100 TB ingestion pipeline needs a standing answer to "did this
week's data change shape?" — the Population Stability Index is the
standard categorical-drift score (banking/model-monitoring lineage):

``PSI = Σ_bins (p_now − p_ref) · ln(p_now / p_ref)``

with PSI < 0.1 read as stable, 0.1–0.25 as moderate drift, > 0.25 as
action-needed. The engine reports the PER-BIN terms (which bin moved
is the actionable output; the scalar total is one ``decimal_sum``
away and order-independent by the repo's float discipline).

Laplace smoothing (+0.5 per bin over K bins) keeps the log defined
when a category is absent from one period — absence IS the drift
signal, not a divide-by-zero.

Shape at scale: one map-side-combined count aggregation over
``(period, bin)`` (bins are low-cardinality by construction), then
dimension-sized arithmetic — the corpus is scanned once and never
shuffled beyond the tiny grouped partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    bin_col: str | Column,
    period_col: str | Column,
    ref_period: str,
    cur_period: str,
) -> DataFrame:
    """Per-bin PSI terms between two periods.

    ``bin_col`` — the categorical (or pre-bucketed) feature;
    ``period_col`` — evaluates to ``ref_period`` / ``cur_period``
    (rows in neither are ignored). Returns one row per bin seen in
    EITHER period: ``(bin, n_ref, n_cur, p_ref, p_cur, psi_term)``
    with probabilities and terms rounded to 6 decimals."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    p = F.col(period_col) if isinstance(period_col, str) else period_col
    counts = (
        df.select(b.alias("bin"), p.alias("__period"))
        .filter(F.col("__period").isin(ref_period, cur_period))
        .groupBy("bin")
        .agg(
            F.sum(
                F.when(F.col("__period") == ref_period, 1).otherwise(0)
            ).alias("n_ref"),
            F.sum(
                F.when(F.col("__period") == cur_period, 1).otherwise(0)
            ).alias("n_cur"),
        )
    )
    return psi_terms(counts)


def psi_terms(counts: DataFrame) -> DataFrame:
    """PSI arithmetic over a pre-built ``(bin, n_ref, n_cur)`` counts
    frame — the shared tail of the batch (:func:`psi_drift`) and
    stored-baseline (:func:`psi_against_baseline`) entry points, so the
    two paths are term-for-term identical by construction."""
    # Dimension-sized from here (K bins): unpartitioned totals are
    # over the aggregate, never the corpus.
    from pyspark.sql import Window

    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    totals = counts.withColumn("__tr", F.sum("n_ref").over(w)).withColumn(
        "__tc", F.sum("n_cur").over(w)
    ).withColumn("__k", F.count(F.lit(1)).over(w))
    p_ref = (F.col("n_ref") + 0.5) / (F.col("__tr") + 0.5 * F.col("__k"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("__tc") + 0.5 * F.col("__k"))
    return totals.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round(
            (F.round(p_cur, 6) - F.round(p_ref, 6))
            * F.log(F.round(p_cur, 6) / F.round(p_ref, 6)),
            6,
        ).alias("psi_term"),
    )


def baseline_histogram(df: DataFrame, bin_col: str | Column) -> DataFrame:
    """The stored-baseline half of the monitoring posture: a reference
    period's bin histogram ``(bin, n_ref)``, computed ONCE and persisted
    (parquet / warehouse table). Monitoring a 100 TB lake then never
    re-scans the reference period — the growing-lake pattern of the
    stored CDC/LSH indexes (llm/cdc.py): state is dimension-sized
    (K bins), the history corpus is cold."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )


def psi_against_baseline(
    cur: DataFrame, bin_col: str | Column, baseline: DataFrame
) -> DataFrame:
    """Per-bin PSI terms of a current batch against a STORED baseline
    histogram (``(bin, n_ref)``, from :func:`baseline_histogram`).

    Full-outer join on bin (absence in either side IS signal — the
    Laplace smoothing keeps its log defined), zero-filled, then the
    shared :func:`psi_terms` arithmetic: output is row-identical to
    ``psi_drift`` over the concatenated periods. Both sides of the
    join are K-bin dimension frames; the only corpus-sized work is the
    current batch's map-side-combined count."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    cur_counts = (
        cur.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    return psi_counts_against_baseline(cur_counts, baseline)


def psi_counts_against_baseline(
    cur_counts: DataFrame, baseline: DataFrame
) -> DataFrame:
    """Same as :func:`psi_against_baseline` but from a pre-aggregated
    ``(bin, n_cur)`` frame — the entry point for the incremental
    streaming monitor, whose per-batch partial counts are already
    bin histograms (``streaming/incremental.py::incremental_psi_run``)."""
    joined = baseline.join(cur_counts, "bin", "full_outer").select(
        "bin",
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )
    return psi_terms(joined)


def ks_drift(
    df: DataFrame,
    bin_col: str | Column,
    period_col: str | Column,
    ref_period: str,
    cur_period: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift between two periods, at bin
    resolution: ``D = max_bins |ECDF_ref − ECDF_cur|``.

    The drift family's second statistic next to PSI: PSI weights
    per-bin probability RATIOS (sensitive to tail bins moving), KS
    measures the largest CUMULATIVE displacement (sensitive to
    location/scale shifts that spread over many bins, each too small
    to trip a PSI term). ``bin_col`` must be ordinal (numeric bucket
    or lexicographically meaningful label) — the ECDF walks bins in
    ascending order, and for unordered categoricals KS is not defined
    (use PSI there).

    Same shape at scale as PSI: one map-side-combined ``(bin,
    period)`` count over the corpus, then windows over the K-bin
    aggregate. Exact integer cumulative counts; each CDF is one
    integer→double division, so both engines compute bit-identical
    doubles (no running float sums).

    Returns one row per bin: ``(bin, n_ref, n_cur, cdf_ref, cdf_cur,
    cdf_gap, ks_stat)`` — ``ks_stat`` (the max of the ROUNDED gaps,
    constant across rows) is the headline number, the per-bin gaps
    locate WHERE the distributions diverge."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    p = F.col(period_col) if isinstance(period_col, str) else period_col
    counts = (
        df.select(b.alias("bin"), p.alias("__period"))
        .filter(F.col("__period").isin(ref_period, cur_period))
        .groupBy("bin")
        .agg(
            F.sum(
                F.when(F.col("__period") == ref_period, 1).otherwise(0)
            ).alias("n_ref"),
            F.sum(
                F.when(F.col("__period") == cur_period, 1).otherwise(0)
            ).alias("n_cur"),
        )
    )
    return ks_terms(counts)


def ks_counts_against_baseline(
    cur_counts: DataFrame, baseline: DataFrame
) -> DataFrame:
    """KS against a STORED baseline histogram — the monitoring twin of
    :func:`psi_counts_against_baseline` (same full-outer zero-filled
    join, then the shared :func:`ks_terms` tail)."""
    joined = baseline.join(cur_counts, "bin", "full_outer").select(
        "bin",
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )
    return ks_terms(joined)


def ks_terms(counts: DataFrame) -> DataFrame:
    """KS arithmetic over a pre-built ``(bin, n_ref, n_cur)`` counts
    frame (the shared tail — batch and stored-baseline paths are
    term-for-term identical by construction).

    Cumulative counts are exact integer window sums in bin order;
    the two CDFs and their gap are scalar expressions of exact
    integers (``floor(x·10⁶+0.5)/10⁶``-rounded — these are genuine
    half-way-boundary candidates, both engines compute the same
    four IEEE ops). K-bin frames only: the single-partition window
    is over the aggregate, never the corpus."""
    from pyspark.sql import Window

    cum = Window.orderBy(F.asc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    full = Window.orderBy(F.asc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stable6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    # An all-zero side (absent period / fully zero-filled stored-
    # baseline join) must surface as NULL cdf/ks_stat, not a silent
    # NaN propagating into monitoring output.
    tot_ref = F.sum("n_ref").over(full)
    tot_cur = F.sum("n_cur").over(full)
    cdf_ref = F.when(
        tot_ref > 0,
        F.sum("n_ref").over(cum).cast("double") / tot_ref.cast("double"),
    )
    cdf_cur = F.when(
        tot_cur > 0,
        F.sum("n_cur").over(cum).cast("double") / tot_cur.cast("double"),
    )
    gapped = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        stable6(cdf_ref).alias("cdf_ref"),
        stable6(cdf_cur).alias("cdf_cur"),
        stable6(F.abs(cdf_cur - cdf_ref)).alias("cdf_gap"),
    )
    return gapped.withColumn("ks_stat", F.max("cdf_gap").over(full))
