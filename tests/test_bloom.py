"""Distributed Bloom filter (capital/llm/bloom.py): the classic
guarantees — zero false negatives, bounded false positives — plus the
composition law the decontamination query relies on (prefilter + exact
join == exact join), and the broadcast-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.llm.bloom import (
    bloom_might_contain,
    bloom_prefilter,
    bloom_words,
)

_M, _K = 1 << 16, 3


def _members(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("g")
    )


def _strangers(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("stranger-"), F.col("id")).alias("g")
    )


def test_no_false_negatives(spark):
    members = _members(spark)
    words = bloom_words(members, "g", _M, _K)
    probed = bloom_might_contain(members, words, "g", _M, _K)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_false_positive_rate_bounded(spark):
    words = bloom_words(_members(spark), "g", _M, _K)
    probed = bloom_might_contain(_strangers(spark), words, "g", _M, _K)
    fp = probed.filter(F.col("might_contain")).count()
    # 500 keys * 3 hashes in 65536 bits -> theoretical FP ~ 1e-5;
    # allow generous slack for hash clustering.
    assert fp / 2000 < 0.02, fp


def test_prefilter_composition_equals_exact_join(spark):
    probe = _members(spark, 300).union(_strangers(spark, 1700))
    members = _members(spark, 500)
    exact = {r.g for r in probe.join(members, "g").collect()}
    via_bloom = {
        r.g
        for r in bloom_prefilter(probe, members, "g", "g", _M, _K)
        .join(members, "g")
        .collect()
    }
    assert via_bloom == exact
    assert len(exact) == 300


def test_probe_joins_are_broadcast(spark):
    words = bloom_words(_members(spark), "g", _M, _K)
    plan = (
        bloom_might_contain(_strangers(spark), words, "g", _M, _K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_words_table_is_bounded(spark):
    # 10k keys x 3 hashes can set at most m/64 words.
    many = spark.range(10_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("g")
    )
    assert bloom_words(many, "g", _M, _K).count() <= _M // 64


def test_incremental_merge_is_bit_identical(spark, tmp_path):
    """bit_or associativity: a filter grown from two batches equals
    the filter built over their union, bit for bit — so membership
    answers are EXACTLY the same, not approximately."""
    from capital.llm.bloom import merge_bloom_words, read_bloom, write_bloom

    a = _members(spark, 300)
    b = _strangers(spark, 400)  # disjoint second batch
    merged = merge_bloom_words(
        bloom_words(a, "g", _M, _K), bloom_words(b, "g", _M, _K)
    )
    at_once = bloom_words(a.union(b), "g", _M, _K)
    m = {(r.word_idx, r.word) for r in merged.collect()}
    o = {(r.word_idx, r.word) for r in at_once.collect()}
    assert m == o

    # Round-trips through parquet unchanged.
    path = str(tmp_path / "bloom")
    write_bloom(merged, path)
    rt = {(r.word_idx, r.word) for r in read_bloom(spark, path).collect()}
    assert rt == o
