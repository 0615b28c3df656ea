"""Fixed-iteration PageRank (operators/graph.py): mass conservation,
importance ordering, determinism, dangling-leak semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_star_ranks_hub_highest(spark):
    """Undirected star: the hub out-ranks every leaf; leaves tie."""
    pairs = []
    for leaf in "abcde":
        pairs += [("hub", leaf), (leaf, "hub")]
    ranks = {r.node: r.rank for r in pagerank(_edges(spark, pairs)).collect()}
    assert all(ranks["hub"] > ranks[leaf] for leaf in "abcde")
    leaf_ranks = {ranks[leaf] for leaf in "abcde"}
    assert len(leaf_ranks) == 1  # symmetry preserved exactly


def test_pagerank_mass_conserved_without_dangling(spark):
    """With every node having out-edges (undirected graph), total rank
    stays ~1 (only nano-quantization loss)."""
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")]
    total = (
        pagerank(_edges(spark, pairs))
        .agg(F.sum("rank").alias("t"))
        .collect()[0]
        .t
    )
    assert abs(total - 1.0) < 1e-6


def test_pagerank_dangling_leaks_documented_semantics(spark):
    """A directed sink keeps only receiving: its damped mass leaks
    (the documented simplification) — total rank < 1, sink still
    out-ranks the sources feeding it."""
    pairs = [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")]
    ranks = {r.node: r.rank for r in pagerank(_edges(spark, pairs)).collect()}
    assert ranks["sink"] > ranks["a"] == ranks["b"]
    assert sum(ranks.values()) < 1.0


def test_pagerank_deterministic_across_runs_and_layouts(spark):
    pairs = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    a = sorted(tuple(r) for r in pagerank(_edges(spark, pairs)).collect())
    b = sorted(
        tuple(r)
        for r in pagerank(_edges(spark, pairs).repartition(7)).collect()
    )
    assert a == b


def test_pagerank_broadcast_and_shuffle_paths_identical(spark):
    """broadcast_state=False (billion-node escape hatch) must produce
    the exact same ranks as the broadcast default."""
    pairs = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    a = sorted(tuple(r) for r in pagerank(_edges(spark, pairs)).collect())
    b = sorted(
        tuple(r)
        for r in pagerank(
            _edges(spark, pairs), broadcast_state=False
        ).collect()
    )
    assert a == b
