#!/usr/bin/env python
"""SemDeDup at design scale: the round-10 verdict asked for measured
evidence that the COMPOSITION (k-means cells -> within-cell pair
stage -> prune) holds at 1M x 64-dim over ~1k cells, under a SKEWED
cell-size distribution — the k-means member already has its own 1M
reading (kmeans_scale.py); this measures the pair stage it bounds.

Fixture: 1M 64-dim vectors built JVM-side (the kmeans_scale fixture),
with a planted hot region — the last HOT_N vectors are one tight
near-duplicate cluster (base vector + +/-0.001 deterministic jitter),
so after clustering one cell swallows ~HOT_N + uniform-share rows and
its quadratic pair space dominates the run: exactly the boilerplate
skew the chunked pair join exists for. Uniform cells contribute the
background pair volume (~(n/k)^2/2 per cell); the hot cell alone is
~HOT_N^2/2 pairs, all task-bounded at ~chunk_target^2 comparisons.

Reports phase times (clustering vs pair+prune), the per-cell size
distribution (max / p99 / median), the pair-volume account, and
sanity checks: every vector flagged exactly once, the planted block
prunes to ~1 survivor, uniform cells keep ~everything (random 64-dim
cosines never reach 0.95).

Results recorded in DESIGN_SCALE.md (round 11).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.kmeans_scale import DIM, N_VECS, build_vectors  # noqa: E402

K = 1024
ITERS = 2
HOT_N = 20_000
THRESHOLD = 0.95


def build_skewed(spark):
    """kmeans_scale's uniform corpus with the last HOT_N vectors
    replaced by one tight near-dup cluster (deterministic jitter)."""
    from pyspark.sql import functions as F

    base = build_vectors(spark)
    hot_vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            # a fixed base direction + per-vector +/-0.001 jitter
            F.pmod(F.xxhash64(i), F.lit(1000)) / F.lit(500.0)
            - F.lit(1.0)
            + (
                F.pmod(F.xxhash64(F.col("vec_id") * DIM + i), F.lit(2000))
                / F.lit(1_000_000.0)
                - F.lit(0.001)
            )
        ),
    )
    return base.select(
        "vec_id",
        F.when(F.col("vec_id") >= N_VECS - HOT_N, hot_vec)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from capital.llm.kmeans import lloyd_kmeans, semdedup_flags
    from capital.session import get_spark

    spark = get_spark("semdedup-scale")
    vecs = build_skewed(spark).persist()
    n = vecs.count()
    print(f"corpus: {n:,} vectors x {DIM} dims, hot block {HOT_N:,}")

    # Phase attribution: clustering alone first (the pair stage is
    # then end-to-end minus this, same centroids by determinism).
    t0 = time.monotonic()
    assignments, _ = lloyd_kmeans(vecs, k=K, iterations=ITERS)
    cell_sizes = (
        assignments.groupBy("cell").count().orderBy(F.desc("count"))
    )
    top = cell_sizes.limit(3).collect()
    dist = assignments.groupBy("cell").count().agg(
        F.expr("percentile(count, 0.5)"),
        F.expr("percentile(count, 0.99)"),
        F.max("count"),
        F.count(F.lit(1)),
    ).collect()[0]
    dt_kmeans = time.monotonic() - t0
    print(
        f"k={K} iters={ITERS}: {dt_kmeans:.1f} s; "
        f"{int(dist[3]):,} cells populated, median {dist[0]:.0f}, "
        f"p99 {dist[1]:.0f}, max {int(dist[2]):,} "
        f"(top cells: {[(r.cell, r['count']) for r in top]})"
    )
    max_cell = int(dist[2])
    hot_pairs = max_cell * (max_cell - 1) // 2
    print(
        f"pair-volume account: hot cell ~{hot_pairs:,} pairs, "
        f"per-task bound ~{1024 * 1024:,} comparisons "
        f"(~{hot_pairs // (1024 * 1024):,} bounded tasks)"
    )

    t0 = time.monotonic()
    flags = semdedup_flags(
        vecs, k=K, iterations=ITERS, threshold=THRESHOLD
    ).persist()
    stats = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_kept").cast("long")).alias("kept"),
    ).collect()[0]
    dt_total = time.monotonic() - t0
    print(
        f"semdedup end-to-end: {dt_total:.1f} s "
        f"(pair+prune ~{dt_total - dt_kmeans:.1f} s after "
        f"{dt_kmeans:.1f} s clustering); "
        f"flagged {stats['n']:,} rows, kept {stats['kept']:,}"
    )

    hot = flags.filter(F.col("vec_id") >= N_VECS - HOT_N)
    hot_kept = hot.agg(F.sum(F.col("is_kept").cast("long"))).collect()[0][0]
    cold_kept = (
        flags.filter(F.col("vec_id") < N_VECS - HOT_N)
        .agg(F.sum(F.col("is_kept").cast("long")))
        .collect()[0][0]
    )
    print(f"planted hot block kept {hot_kept:,} of {HOT_N:,}; "
          f"uniform background kept {cold_kept:,} of {N_VECS - HOT_N:,}")
    assert stats["n"] == n
    assert hot_kept < HOT_N * 0.01  # near-dups pruned
    assert cold_kept > (N_VECS - HOT_N) * 0.999  # random cosines survive


if __name__ == "__main__":
    main()
