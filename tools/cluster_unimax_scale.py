#!/usr/bin/env python
"""Cluster-UniMax at design scale (round-11 verdict #3): the bench row
`cur_cluster_unimax` runs >2x its toy anchor because it rides the
k-means stage floors; the claim to evidence is that the operator's OWN
stages — the doc->cell token aggregation and the water-filling
allocation — are (a) one linear join+agg whose per-row cost falls as
the job floors amortize and (b) a CLUSTER-COUNT-sized window whose
cost does not grow with the corpus at all. Clustering itself already
carries 1M-row evidence (tools/kmeans_scale.py: k=1024 Lloyd's rounds
at 13.5 s/round; tools/semdedup_scale.py end-to-end), so this run
uses ONE fixed-centroid assignment pass (the final labeling every
composition pays) and attributes Lloyd's iteration cost to that
record.

Fixture: the kmeans_scale synthetic 64-dim vectors at 125k and 1M
rows, k=1024 cells, per-doc token counts a deterministic 50..149
(token counting is a narrow per-row op of the text pipeline, not this
operator's cost). Phases per scale: assignment (Arrow GEMM), per-cell
token join+agg, UniMax allocation on the 1,024-row cell frame.

Sanity: every cell populated at 1M, global budget conservation
(sum alloc <= fraction * corpus tokens + per-cell epoch caps), and
the allocation output is exactly k rows.

Results recorded in DESIGN_SCALE.md (round 12).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.kmeans_scale import DIM  # noqa: E402

K = 1024
SCALES = (125_000, 1_000_000)
FRACTION = 0.3
EPOCHS = 4.0


def build_vectors(spark, n):
    from pyspark.sql import functions as F

    base = spark.range(n).withColumnRenamed("id", "vec_id")
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

    from capital.llm.assemble import unimax_allocation
    from capital.llm.kmeans import _assign_arrow, initial_centroids
    from capital.session import get_spark

    spark = get_spark(app_name="cluster-unimax-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n in SCALES:
        vecs = build_vectors(spark, n).repartition(32).persist()
        vecs.count()
        cents = initial_centroids(vecs, K)

        t0 = time.perf_counter()
        assigned = _assign_arrow(vecs, cents, "vec_id", "embedding").select(
            "vec_id", "cell"
        ).persist()
        n_assigned = assigned.count()
        t_assign = time.perf_counter() - t0

        docs = vecs.select(
            F.col("vec_id").alias("doc_id"),
            (F.pmod(F.xxhash64("vec_id"), F.lit(100)) + 50).alias(
                "n_tokens"
            ),
        )
        t0 = time.perf_counter()
        per_cell = (
            docs.join(
                assigned.select(F.col("vec_id").alias("doc_id"), "cell"),
                "doc_id",
            )
            .groupBy("cell")
            .agg(F.sum("n_tokens").alias("n_tokens"))
            .persist()
        )
        n_cells = per_cell.count()
        t_agg = time.perf_counter() - t0

        t0 = time.perf_counter()
        alloc = unimax_allocation(
            per_cell,
            budget_fraction=FRACTION,
            epoch_cap=EPOCHS,
            source_col="cell",
        ).collect()
        t_alloc = time.perf_counter() - t0

        total_tokens = sum(r.n_tokens for r in alloc)
        alloc_sum = sum(r.alloc_tokens for r in alloc)
        budget = FRACTION * EPOCHS * total_tokens  # fraction of capacity
        assert n_assigned == n, (n_assigned, n)
        assert len(alloc) == n_cells
        assert alloc_sum <= budget + 1, (alloc_sum, budget)
        for r in alloc:
            assert r.alloc_tokens <= EPOCHS * r.n_tokens + 1e-6
        sizes = sorted(r.n_tokens for r in alloc)
        print(
            f"n={n:>9,}  cells={n_cells:4d}  "
            f"assign={t_assign:6.2f}s  token-agg={t_agg:6.2f}s  "
            f"allocation={t_alloc:6.3f}s  "
            f"cell-tokens median={sizes[len(sizes) // 2]:,} "
            f"max={sizes[-1]:,}  alloc/budget={alloc_sum / budget:.3f}"
        )
        per_cell.unpersist()
        assigned.unpersist()
        vecs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
