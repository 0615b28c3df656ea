"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

Companion to the pointer-jumping connected components
(``llm/clusters.py``): where components answer "which nodes belong
together", PageRank answers "which nodes matter" (Page et al. 1999) —
entity-importance ranking over a relationship graph (here the
customer↔supplier trade graph; in a data-pipeline setting, domain
link graphs for crawl prioritization).

Determinism discipline (the engine's float-parity rules, applied to
an iterative algorithm):

- per-edge contributions quantize to integer **nano-rank units**
  (``floor(p/out·10⁹ + 0.5)`` as BIGINT) and accumulate as longs —
  exact integer sums are order-independent, so Spark's arbitrary
  reduce order and a SQL engine's agree exactly;
- each iteration's rank passes through the cross-engine-stable
  ``floor(x·10⁹ + 0.5)/10⁹`` (see ``text.round6_stable`` — engine
  ``round()`` disagrees at half-way boundaries), so ranks are
  bit-identical across engines at EVERY iteration, and a fixed
  iteration count unrolls into plain SQL CTEs for the oracle.

Scale shape: rank state is NODE-sized (two columns); each iteration
is one broadcast-or-shuffle join of edges against ranks on ``src``
plus one map-side-combined groupBy on ``dst`` — the standard
distributed PageRank step. ``localCheckpoint`` truncates the lineage
per iteration (the connected-components lesson: an unrolled 5-join
plan re-analyzes and re-optimizes the whole chain each action).

Dangling nodes (no out-edges) leak their damped mass — the classic
simplification; documented rather than redistributed, identical on
both engines. Pass edges in BOTH directions for an undirected walk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round9_stable(col: Column) -> Column:
    """floor(x·10⁹ + 0.5)/10⁹ — same four IEEE ops on any engine (the
    round6_stable construction at rank precision)."""
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    broadcast_state: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list; returns
    ``(node, rank)`` with ranks rounded to 9 decimals.

    ``p₀ = 1/N``; ``p_{k+1}(v) = (1−d)/N + d·Σ_{u→v} p_k(u)/out(u)``
    with the determinism discipline from the module docstring. A
    fixed ``iterations`` (not a convergence test) keeps the operator
    a pure function of its input — reproducible and SQL-unrollable.

    ``broadcast_state=True`` (default) broadcasts the node-sized rank
    frame into each iteration's edge join, eliminating the edge-side
    shuffle — measured 6.8 → 5.6 s at sf0.1, and at scale it is the
    difference between shuffling the EDGE list K times and only
    shuffling node-sized contributions. Rank state is 2 columns ×
    nodes (a few GB even at 10⁸ nodes); set ``False`` for
    billion-node graphs where it outgrows executor memory — the plan
    degrades to a sort-merge join, output identical (tested)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = nodes.localCheckpoint(eager=True) if checkpoint else nodes
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    graph = e.join(outdeg, "src")
    graph = graph.localCheckpoint(eager=True) if checkpoint else graph

    base = float(1.0 - damping) / n
    ranks = nodes.withColumn(
        "rank", _round9_stable(F.lit(1.0) / F.lit(float(n)))
    )
    for _ in range(iterations):
        state = F.broadcast(ranks) if broadcast_state else ranks
        contribs = graph.join(state, graph["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            # integer nano-rank units: exact, order-independent sums
            F.floor(
                F.col("rank") / F.col("outdeg") * F.lit(1e9) + F.lit(0.5)
            ).alias("__c"),
        )
        summed = contribs.groupBy("node").agg(F.sum("__c").alias("__s"))
        if broadcast_state:
            summed = F.broadcast(summed)
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            _round9_stable(
                F.lit(base)
                + F.lit(float(damping))
                * (
                    F.coalesce(F.col("__s"), F.lit(0)).cast("double")
                    / F.lit(1e9)
                )
            ).alias("rank"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
