#!/usr/bin/env python
"""PageRank at design scale: measured evidence for the
zero-edge-shuffle claim on a multi-million-edge synthetic graph.

The sf0.1 trade graph (16k nodes / 90k edges) only measures Spark's
K-iteration stage floor; this fixture is the operator's design regime
(the `sim_cosine_topk_arrow` 512-query precedent: bench kernels where
they're built to run). Generates a deterministic hashed graph —
4M directed edges over 1M nodes with a 100-node hub set receiving 10%
of edges (skew: real link graphs have hubs) — entirely JVM-side
(spark.range + xxhash64, no driver data), then times
``operators/graph.pagerank`` for 5 iterations in both state modes:

- broadcast_state=True: edges NEVER shuffle — each iteration is
  BroadcastHashJoin(graph, ranks) + a map-side-combined node-sized
  groupBy;
- broadcast_state=False: the edge list shuffles per iteration
  (sort-merge join).

Round-9 finding: at 1M nodes the state outgrows broadcast economics
(min-of-2: 17.4 s broadcast vs 10.3 s shuffle — shipping a 1M-row
state to every task twice per iteration costs more than shuffling 4M
edges), while at 16k nodes broadcast wins (round 7: 6.8 → 5.6 s).
Hence the auto default: broadcast iff nodes × 24 B fits
spark.sql.autoBroadcastJoinThreshold — Catalyst's own join-side
policy, priced by the node count the algorithm already takes.

Also audits the per-iteration plan: with broadcast state the join
must be a BroadcastHashJoin (no Exchange on the graph side).

Results recorded in DESIGN_SCALE.md (round 9).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_NODES = 1_000_000
N_EDGES = 4_000_000
N_HUBS = 100
ITERATIONS = 5


def build_edges(spark):
    from pyspark.sql import functions as F

    base = spark.range(N_EDGES)
    src = F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
    # 10% of edges land on a 100-node hub set — the skew a crawl graph
    # has; the rest hash uniformly.
    dst_uniform = F.pmod(F.xxhash64(F.col("id") + F.lit(N_EDGES)), F.lit(N_NODES))
    dst = F.when(
        F.col("id") % 10 == 0,
        F.pmod(F.xxhash64(F.col("id") + F.lit(2 * N_EDGES)), F.lit(N_HUBS)),
    ).otherwise(dst_uniform)
    return base.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )


def main() -> None:
    from capital.operators.graph import pagerank
    from capital.session import get_spark

    spark = get_spark(app_name="pagerank-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # Materialize the fixture once so generation cost stays out of the
    # operator timing (both modes read the same cached edges).
    edges = build_edges(spark).persist()
    n_edges = edges.count()
    print(f"# fixture: {n_edges} edges over <= {N_NODES} nodes")

    # Plan audit: one un-truncated iteration must broadcast the rank
    # state into the edge join (no Exchange feeding the join's probe
    # side — the edge list never shuffles).
    probe = pagerank(
        edges, iterations=1, checkpoint=False, broadcast_state=True
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    n_bhj = plan.count("BroadcastHashJoin")
    assert n_bhj >= 1, f"expected BroadcastHashJoin in:\n{plan[:2000]}"
    print(f"# plan audit: {n_bhj} BroadcastHashJoin in 1-iteration plan")

    results = {}
    for mode in (True, False):
        t0 = time.perf_counter()
        out = pagerank(
            edges, iterations=ITERATIONS, broadcast_state=mode
        )
        n = out.toArrow().num_rows
        results[mode] = round(time.perf_counter() - t0, 2)
        print(
            f"# broadcast_state={mode}: {results[mode]}s "
            f"({n} ranked nodes, {ITERATIONS} iterations)"
        )
    print(
        {
            "edges": n_edges,
            "nodes_max": N_NODES,
            "iterations": ITERATIONS,
            "broadcast_sec": results[True],
            "shuffle_sec": results[False],
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
