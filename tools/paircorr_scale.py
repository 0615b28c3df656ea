#!/usr/bin/env python
"""Pairwise correlation matrix at a WIDE cross-section — the round-11
operator's design regime: S series aligned on K keys is C(S,2)·K pair
rows through the within-key chunked enumeration, far beyond the
5-series oracle fixture. Verifies the shape claim (pair volume =
matrix size × key count, task-bounded per key-chunk) and spot-checks
two planted relationships against closed-form values.

Fixture: 500 synthetic series × 120 keys (xxhash64 values), built
JVM-side; series s1 is a planted affine copy of s0 (r = 1) and s2 its
negation (r = −1); the rest are hash noise (|r| small).

Results recorded in DESIGN_SCALE.md (round 11).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_SERIES = 500
N_KEYS = 120


def build_panel(spark):
    from pyspark.sql import functions as F

    base = spark.range(N_SERIES * N_KEYS)
    k = (F.col("id") % N_KEYS).alias("k")
    s = F.concat(F.lit("s"), (F.col("id") / N_KEYS).cast("long")).alias(
        "series"
    )
    sid = (F.col("id") / N_KEYS).cast("long")
    noise = (
        F.pmod(F.xxhash64(F.col("id")), F.lit(10_000)) / F.lit(100.0)
    )
    base_series = (
        F.pmod(F.xxhash64(k.cast("long")), F.lit(10_000)) / F.lit(100.0)
    )
    v = (
        F.when(sid == 1, base_series * 2.0 + 5.0)       # r = +1 vs s0
        .when(sid == 2, base_series * -0.5 + 1.0)       # r = -1 vs s0
        .when(sid == 0, base_series)
        .otherwise(noise)
    )
    return base.select(k, s, v.alias("v"))


def main() -> None:
    from pyspark.sql import functions as F

    from capital.operators.stats import pairwise_correlation
    from capital.session import get_spark

    spark = get_spark("paircorr-scale")
    panel = build_panel(spark).persist()
    rows = panel.count()
    n_pairs_expected = N_SERIES * (N_SERIES - 1) // 2
    print(
        f"panel: {rows:,} rows ({N_SERIES} series x {N_KEYS} keys) -> "
        f"{n_pairs_expected:,} matrix cells, "
        f"{n_pairs_expected * N_KEYS:,} pair observations"
    )
    t0 = time.monotonic()
    out = pairwise_correlation(
        panel, "k", "series", "v", total_rows_hint=rows
    ).persist()
    n_out = out.count()
    dt = time.monotonic() - t0
    hist = out.agg(
        F.sum((F.abs(F.col("corr")) > 0.5).cast("long")),
        F.min("n"), F.max("n"),
    ).collect()[0]
    print(
        f"matrix: {n_out:,} cells in {dt:.1f} s; "
        f"{hist[0]} cells with |r| > 0.5; n per cell "
        f"{hist[1]}..{hist[2]}"
    )
    cells = {
        (r.series_a, r.series_b): r.corr
        for r in out.filter(
            F.col("series_a").isin("s0", "s1", "s2")
            & F.col("series_b").isin("s0", "s1", "s2")
        ).collect()
    }
    assert n_out == n_pairs_expected
    assert hist[1] == hist[2] == N_KEYS
    assert cells[("s0", "s1")] == 1.0
    assert cells[("s0", "s2")] == -1.0
    assert cells[("s1", "s2")] == -1.0
    print("planted relationships: s0~s1 = 1, s0~s2 = -1 — OK")


if __name__ == "__main__":
    main()
