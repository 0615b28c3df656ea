"""Per-group robust outlier detection (median/MAD z-scores).

Row-level anomaly flags — the record-granularity member of the
monitoring family (``operators/drift.py`` scores DISTRIBUTIONS;
this scores ROWS): a tick whose value sits ``k`` robust standard
deviations from its group's median is flagged, with the
median/MAD estimator immune to the very outliers it hunts (mean/
stddev z-scores famously mask a heavy tail — one 10⁶× spike
inflates σ until nothing is an outlier).

``robust_z = |x − median| / (c · MAD)`` with
``MAD = median(|x − median|)`` and ``c = 1.4826`` (the Gaussian
consistency constant, Rousseeuw & Croux 1993) so the threshold
reads in σ-equivalents.

Float parity: medians are exact linear-interpolation percentiles
(Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the a9-pinned
equivalence); the score is one fixed-shape float expression of
those, stable-rounded before the threshold compare. A
zero-MAD group (> half the group at one value) yields null scores
and no flags — the estimator carries no scale information there,
and silently flagging everything ≠ robust.

Shape at scale: two grouped percentile aggregates (grouped sorts —
use the approx-sketch path instead when groups are corpus-sized)
plus two broadcast-or-shuffle joins of the group-sized stats back
onto the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Gaussian consistency constant: MAD·1.4826 estimates σ.
MAD_CONSISTENCY = 1.4826


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Attach ``group_median``, ``robust_z`` (stable-rounded, null for
    zero-MAD groups) and ``is_outlier`` (``robust_z > k``; false when
    undefined) to every row."""
    from capital.llm.text import round6_stable

    g = F.col(group_col)
    v = F.col(value_col)
    med = df.groupBy(g.alias("__g")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(med, g == F.col("__g")).withColumn(
        "__ad", F.abs(v - F.col("__med"))
    )
    mad = dev.groupBy(F.col("__g").alias("__g2")).agg(
        F.expr("percentile(__ad, 0.5)").alias("__mad")
    )
    scored = dev.join(mad, F.col("__g") == F.col("__g2"))
    z = F.when(
        F.col("__mad") > F.lit(0.0),
        F.col("__ad") / (F.lit(MAD_CONSISTENCY) * F.col("__mad")),
    )
    return (
        scored.withColumn("group_median", F.col("__med"))
        .withColumn("robust_z", round6_stable(z))
        .withColumn(
            "is_outlier",
            F.coalesce(round6_stable(z) > F.lit(float(k)), F.lit(False)),
        )
        .drop("__g", "__g2", "__med", "__ad", "__mad")
    )
