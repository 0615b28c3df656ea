"""The Arrow/GEMM cosine kernel must agree with the oracle-checked
expression kernel — same neighbors, same ranks (float64 GEMM vs
sequential accumulation differ at ~1e-15, far below ranking gaps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.similarity import cosine_topk, cosine_topk_arrow


def test_arrow_kernel_matches_expression_kernel(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in cosine_topk_arrow(emb, queries, k=5).collect()
    )
    e = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in cosine_topk(emb, queries, k=5).collect()
    )
    assert len(a) == len(e) == 8 * 5
    for (qa, ra, na, sa), (qe, re_, ne, se) in zip(a, e):
        assert (qa, ra, na) == (qe, re_, ne)
        assert abs(sa - se) < 1e-6
