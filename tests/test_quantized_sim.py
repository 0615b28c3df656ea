"""int8-quantized similarity search: range invariants + recall vs the
exact float path."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.similarity import (
    cosine_topk,
    quantize_int8,
    quantized_cosine_topk,
)


def test_quantize_int8_range_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(emb)
    stats = q.select(
        F.min(F.array_min("qvec")).alias("lo"),
        F.max(F.array_max("qvec")).alias("hi"),
        F.min("qscale").alias("smin"),
    ).first()
    assert -127 <= stats.lo and stats.hi <= 127
    assert stats.smin > 0
    # Every vector's max-magnitude component quantizes to exactly ±127.
    extremes = q.select(
        F.greatest(F.array_max("qvec"), -F.array_min("qvec")).alias("m")
    )
    assert extremes.filter(F.col("m") != 127).count() == 0
    a = {r.vec_id: r.qvec for r in q.collect()}
    b = {r.vec_id: r.qvec for r in quantize_int8(emb).collect()}
    assert a == b


def test_quantized_topk_recall_vs_float(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, k=5)
    quant = quantized_cosine_topk(emb, queries, k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    qn = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & qn) / len(e)
    # int8 on 64 dims loses little; the driver corpus gives ~1.0.
    assert recall >= 0.85, f"recall@5 {recall}"
