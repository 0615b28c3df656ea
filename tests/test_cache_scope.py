"""Round-5 hygiene surfaces: deterministic cache release
(:class:`capital.operators.caching.CacheScope`), the GEMM query-set
collect guard, the packed-long bits guard, and the skew-probe fast
path's output equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capital.llm.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_fullrecall_pairs,
    simhash_neardup_pairs,
    verified_neardup_pairs,
)
from capital.llm.similarity import cosine_topk_arrow
from capital.operators.caching import CacheScope
from capital.operators.skew import chunked_pair_join


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog "),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )


def test_cache_scope_releases_lsh_frames(spark):
    sigs = minhash_signatures(_docs(spark), num_hashes=16)
    with CacheScope() as scope:
        pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4, scope=scope)
        pairs.count()  # consume while caches live
        tracked = scope.frames
        assert len(tracked) == 2  # signatures + banded index
        assert all(df.is_cached for df in tracked)
    # context exit released everything the call persisted
    assert all(not df.is_cached for df in tracked)


def test_cache_scope_releases_verified_pipeline(spark):
    with CacheScope() as scope:
        out = verified_neardup_pairs(
            _docs(spark), num_hashes=16, bands=4, rows_per_band=4, scope=scope
        )
        out.count()
        tracked = scope.frames
        assert len(tracked) == 3  # signatures, banded index, shingles
    assert all(not df.is_cached for df in tracked)


def test_cache_scope_release_is_idempotent(spark):
    scope = CacheScope()
    df = scope.persist(_docs(spark))
    df.count()
    scope.release()
    scope.release()
    assert not df.is_cached


def test_without_scope_behavior_unchanged(spark):
    """No scope -> frames persist as before (session-cache bounded)."""
    sigs = minhash_signatures(_docs(spark), num_hashes=16)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    pairs.count()
    # No scope -> the pipeline's persists stay session-cached (nothing
    # unpersisted them behind our back).
    cached = [
        t for t in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    assert len(cached) > 0
    spark.catalog.clearCache()


def test_gemm_query_collect_guard(spark):
    corpus = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(4)]).alias("embedding"),
    )
    queries = spark.range(7).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") + i).cast("double") for i in range(4)]).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="collects the query set"):
        cosine_topk_arrow(corpus, queries, k=2, max_queries=5)
    # At/under the cap the pipeline builds and runs.
    out = cosine_topk_arrow(corpus, queries, k=2, max_queries=7)
    assert out.count() == 14


def test_simhash_bits_guard():
    with pytest.raises(ValueError, match="63-bit"):
        simhash_neardup_pairs(None, bits=64)
    with pytest.raises(ValueError, match="63-bit"):
        # 64 divides into 4 segments, so only the packed-long guard fires.
        simhash_fullrecall_pairs(None, bits=64, max_hamming=3)


def test_probe_fast_path_matches_chunked(spark):
    """probe=True (plain join on unskewed blocks) and probe=False
    (always-chunked) must enumerate identical pair sets."""
    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") % 9).alias("block"),
        (F.col("id") * 2).alias("p"),
    )
    fast = chunked_pair_join(
        df, ["block"], "id", payload_cols=["p"], chunk_target=1024
    )
    chunked = chunked_pair_join(
        df, ["block"], "id", payload_cols=["p"], chunk_target=1024, probe=False
    )
    assert fast.subtract(chunked).count() == 0
    assert chunked.subtract(fast).count() == 0
    assert fast.count() == chunked.count() > 0


def test_probe_falls_through_when_skewed(spark):
    """A block larger than chunk_target must still take the chunked
    plan (the probe only skips chunking when the bound already holds)."""
    df = spark.range(200).select(
        F.col("id"), F.lit(0).alias("block")
    )
    out = chunked_pair_join(df, ["block"], "id", chunk_target=50)
    assert out.count() == 200 * 199 // 2
    # chunk metadata shows up in the skewed plan only
    plan_skewed = out._jdf.queryExecution().toString()
    assert "__c" in plan_skewed
    out_fast = chunked_pair_join(df, ["block"], "id", chunk_target=1024)
    plan_fast = out_fast._jdf.queryExecution().toString()
    assert "__c" not in plan_fast
