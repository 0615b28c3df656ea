#!/usr/bin/env python
"""Deterministic Lloyd's k-means at design scale: measured evidence
for the "K corpus scans + k×dim bounded collect per round" claim on a
million-vector corpus (the pagerank/triangles/LPA convention: every
iterative family carries a design-regime reading, not just the
2k-vector oracle fixture).

Fixture: 1M 64-dim vectors built JVM-side (spark.range + xxhash64
arithmetic — no driver data), values in [-1, 1). Times
``llm/kmeans.lloyd_kmeans`` (k=8, 3 rounds) end-to-end including the
final labeling pass, then sanity-checks the output: every vector
labeled, cells non-trivial, objective no worse than the init
assignment's.

Results recorded in DESIGN_SCALE.md (round 10).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_VECS = 1_000_000
DIM = 64
K = 8
ITERS = 3


def build_vectors(spark):
    from pyspark.sql import functions as F

    base = spark.range(N_VECS).withColumnRenamed("id", "vec_id")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("vec_id") * DIM + i), F.lit(100_000))
            / F.lit(50_000.0)
            - F.lit(1.0)
        ),
    )
    return base.select("vec_id", emb.alias("embedding"))


def main() -> None:
    from pyspark.sql import functions as F

    from capital.llm.kmeans import lloyd_kmeans
    from capital.session import get_spark

    spark = get_spark("kmeans-scale")
    vecs = build_vectors(spark).persist()
    n = vecs.count()
    print(f"corpus: {n:,} vectors x {DIM} dims")

    t0 = time.monotonic()
    out0, _ = lloyd_kmeans(vecs, k=K, iterations=0)
    sse0 = out0.agg(F.sum("dist2")).collect()[0][0]
    dt0 = time.monotonic() - t0
    print(f"init labeling only: {dt0:.1f} s, SSE {sse0:,.0f}")

    t0 = time.monotonic()
    out, cents = lloyd_kmeans(vecs, k=K, iterations=ITERS)
    stats = out.agg(
        F.count(F.lit(1)), F.countDistinct("cell"), F.sum("dist2")
    ).collect()[0]
    dt = time.monotonic() - t0
    print(
        f"k={K} iters={ITERS}: {dt:.1f} s "
        f"({(dt) / (ITERS + 1):.1f} s per assignment round), "
        f"labeled {stats[0]:,} rows into {stats[1]} cells, "
        f"SSE {stats[2]:,.0f}"
    )
    assert stats[0] == n
    assert stats[2] <= sse0 + 1e-3 * n  # Lloyd's monotone (quantized)
    print("objective-monotone vs init: OK")

    # Large-k regime (SemDeDup's thousands of clusters): auto mode
    # routes k*dim > MAX_LITERAL_TERMS through the Arrow GEMM kernel.
    K_BIG = 1024
    t0 = time.monotonic()
    out_b, _ = lloyd_kmeans(vecs, k=K_BIG, iterations=2, assign="auto")
    stats_b = out_b.agg(
        F.count(F.lit(1)), F.countDistinct("cell"), F.sum("dist2")
    ).collect()[0]
    dt_b = time.monotonic() - t0
    print(
        f"k={K_BIG} iters=2 (arrow GEMM): {dt_b:.1f} s "
        f"({dt_b / 3:.1f} s per assignment round), "
        f"{stats_b[1]:,} cells populated, SSE {stats_b[2]:,.0f}"
    )
    assert stats_b[0] == n
    assert stats_b[2] < stats[2]  # finer quantizer, lower objective


if __name__ == "__main__":
    main()
