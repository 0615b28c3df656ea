"""Sign-LSH recall at realistic settings (round-9 verdict ask #7).

The IVF/PQ paths carry recall evidence at production settings; this
pins the sign-LSH bucket path the same way. Sign-LSH theory
(Charikar 2002): a plane agrees on a pair with cosine s with
probability ``p(s) = 1 − arccos(s)/π``; a b-plane bucket collides
with ``p^b``; L OR-amplified tables hit with ``1 − (1 − p^b)^L``.
Empirical recall@k against the exact brute-force top-k must track
that expectation — and because bucket membership is exact-cosine
scored, recall@k IS the collision rate of the true neighbors (a
colliding true neighbor can never be displaced by a bucket-mate with
lower similarity).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.similarity import cosine_topk, lsh_bucket_topk

_K = 5
_PLANES = 8
_N_QUERIES = 32
_DIM = 64


def _recall_and_expectation(spark, sf_dir, n_tables):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    brute = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in cosine_topk(emb, queries, k=_K).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_bucket_topk(
            emb, queries, k=_K, n_planes=_PLANES, dim=_DIM,
            n_tables=n_tables,
        ).collect()
    }
    recall = len(set(brute) & got) / len(brute)
    # Analytic expectation over the actual true-neighbor similarities.
    probs = []
    for sim in brute.values():
        s = max(-1.0, min(1.0, sim))
        p = 1.0 - math.acos(s) / math.pi
        probs.append(1.0 - (1.0 - p**_PLANES) ** n_tables)
    return recall, sum(probs) / len(probs)


def test_single_table_recall_tracks_analytic_expectation(spark, sf_dir):
    """One 8-plane table: recall must sit within sampling noise of
    the Charikar collision expectation computed from the TRUE
    neighbor similarities (160 neighbor trials → σ ≈ 0.04)."""
    recall, expected = _recall_and_expectation(spark, sf_dir, n_tables=1)
    assert abs(recall - expected) < 0.15, (
        f"empirical recall {recall:.3f} vs analytic {expected:.3f}"
    )


def test_or_amplification_tracks_analytic_expectation(spark, sf_dir):
    """Four OR-amplified tables must track their own analytic
    collision expectation, above the single table's. (On THIS
    corpus's moderate-similarity kNN ground truth both expectations
    are low — sign-LSH is a near-dup method, not a general kNN
    method; the design-regime usability evidence is the planted-twin
    test below.)"""
    r1, e1 = _recall_and_expectation(spark, sf_dir, n_tables=1)
    r4, e4 = _recall_and_expectation(spark, sf_dir, n_tables=4)
    assert e4 > e1
    assert r4 >= r1, f"amplification did not lift recall: {r4} vs {r1}"
    assert abs(r4 - e4) < 0.15, f"recall {r4:.3f} vs analytic {e4:.3f}"


def _plant_twins(spark, emb, n_twins, eps=0.2, id_offset=100_000):
    """Perturbed copies of the first ``n_twins`` vectors: unit-ish
    deterministic noise at relative magnitude eps → cosine ≈
    1/√(1+eps²) ≈ 0.981 — the near-duplicate design regime."""
    import numpy as np

    rows = (
        emb.filter(F.col("vec_id") < n_twins)
        .select("vec_id", "embedding")
        .collect()
    )
    twins = []
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        rng = np.random.default_rng(int(r.vec_id) + 1234)
        noise = rng.standard_normal(v.shape)
        noise *= (np.linalg.norm(v) * eps) / np.linalg.norm(noise)
        twins.append(
            (int(r.vec_id) + id_offset, [float(x) for x in (v + noise)], -1)
        )
    return spark.createDataFrame(
        twins, "vec_id long, embedding array<float>, label int"
    )


def test_design_regime_recall_on_planted_near_duplicates(spark, sf_dir):
    """The operator's actual job (cosine_neardup_pairs blocks on these
    buckets at threshold 0.95): plant a ~0.98-cosine twin for each
    query; 4 OR-amplified 8-plane tables must retrieve it
    (analytic ≈ 0.97), a single table only sometimes (≈ 0.59)."""
    emb = load_table(spark, sf_dir, "embeddings")
    twins = _plant_twins(spark, emb, _N_QUERIES)
    corpus = emb.unionByName(twins)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)

    def twin_recall(n_tables):
        out = lsh_bucket_topk(
            corpus, queries, k=_K, n_planes=_PLANES, dim=_DIM,
            n_tables=n_tables,
        )
        hits = out.filter(
            F.col("neighbor_id") == F.col("query_id") + 100_000
        ).count()
        return hits / _N_QUERIES

    r1 = twin_recall(1)
    r4 = twin_recall(4)
    assert r4 > r1, f"amplification did not lift twin recall: {r4} vs {r1}"
    assert r4 >= 0.8, f"4-table design-regime recall {r4:.3f} < 0.8"


def test_multi_table_scores_each_pair_once(spark, sf_dir):
    """OR-amplified output must stay one row per (query, rank) with
    distinct neighbors — the pre-score dedup guarantees a pair
    colliding in several tables is ranked once."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    out = lsh_bucket_topk(
        emb, queries, k=_K, n_planes=_PLANES, dim=_DIM, n_tables=3
    )
    per_query = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("neighbor_id").alias("nd"),
        F.countDistinct("rank").alias("nr"),
    )
    bad = per_query.filter(
        (F.col("n") != F.col("nd")) | (F.col("n") != F.col("nr"))
    ).count()
    assert bad == 0
