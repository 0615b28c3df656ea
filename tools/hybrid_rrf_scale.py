#!/usr/bin/env python
"""Hybrid-RRF dense side at design scale (round-11 verdict #3): the
bench row `ret_hybrid_rrf` is a stage-count-floor disposition — 8
query-by-example texts over a 500-doc corpus pays ~10 sequential
local stage floors. The scale claim to evidence is the round-6 GEMM
lesson applied to the composition: at the DESIGN regime (hundreds of
queries, corpus >> toy) the dense ranker's per-query cost collapses
to the Arrow-GEMM floor and the RRF fusion stage is top-k-sized —
independent of the corpus entirely.

Fixture: kmeans_scale's synthetic 64-dim vectors at 250k and 1M rows;
512 query vectors (vec_id < 512, the cosine_topk_arrow design-regime
constant); candidate depth 20 per ranker (the query's _HYB_CAND),
fused to top-10. The second ranked list stands in for the lexical
side at the exact shape it feeds fusion (512 x 20 (query, doc, rank)
rows — rrf_fuse is ranker-agnostic and never sees corpus rows); the
lexical ranker's own scaling is recorded separately
(tools/bm25_index_scale.py).

Phases per scale: dense top-20 (Arrow GEMM, materialized via
toArrow), fusion over the two materialized lists. Sanity: 512 x 10
fused rows, dense ranks 1..20 per query, n_lists in {1, 2} with both
values present.

Results recorded in DESIGN_SCALE.md (round 12).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.cluster_unimax_scale import build_vectors  # noqa: E402

SCALES = (250_000, 1_000_000)
N_QUERIES = 512
CAND = 20
TOPK = 10


def main() -> None:
    from pyspark.sql import functions as F

    from capital.llm.retrieval import rrf_fuse
    from capital.llm.similarity import cosine_topk_arrow
    from capital.session import get_spark

    spark = get_spark(app_name="hybrid-rrf-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n in SCALES:
        vecs = build_vectors(spark, n).repartition(32).persist()
        vecs.count()
        queries = vecs.filter(F.col("vec_id") < N_QUERIES)

        t0 = time.perf_counter()
        dense = cosine_topk_arrow(vecs, queries, k=CAND).select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
        )
        dense_rows = dense.toArrow()
        t_dense = time.perf_counter() - t0
        assert dense_rows.num_rows == N_QUERIES * CAND

        # Materialize both fusion inputs so the fusion timing is the
        # fusion stage, not a dense-ranker re-execution.
        dense_m = spark.createDataFrame(dense_rows.to_pandas())
        lex_proxy = spark.range(N_QUERIES).select(
            F.col("id").alias("query_id"),
            F.explode(F.sequence(F.lit(1), F.lit(CAND))).alias("rank"),
        ).select(
            "query_id",
            F.pmod(
                F.xxhash64(F.col("query_id") * CAND + F.col("rank")),
                F.lit(n),
            ).alias("doc_id"),
            "rank",
        )
        # Min of two fusion passes: the first sample lands in the GC
        # shadow of the dense GEMM job (the bench.py min-of-N rule).
        t_fuse = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fused = rrf_fuse([dense_m, lex_proxy], topk=TOPK).toArrow()
            t_fuse = min(t_fuse, time.perf_counter() - t0)

        import collections

        assert fused.num_rows == N_QUERIES * TOPK
        nl = collections.Counter(fused.column("n_lists").to_pylist())
        assert set(nl) <= {1, 2} and len(nl) >= 1
        print(
            f"n={n:>9,}  dense-top{CAND}={t_dense:6.2f}s "
            f"({t_dense * 1000 / N_QUERIES:5.1f} ms/query)  "
            f"fusion={t_fuse:6.3f}s  n_lists={dict(nl)}"
        )
        vecs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
