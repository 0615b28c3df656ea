#!/usr/bin/env python
"""Label propagation at design scale: measured evidence for the
broadcast-vs-shuffle state decision on a million-node graph — the
same experiment `tools/pagerank_scale.py` ran for PageRank (round 9),
because LPA's per-round join has the identical shape: node-sized
label state joined against the edge list.

Fixture: the pagerank_scale graph — 4M directed edges over 1M nodes,
100-node hub set receiving 10% of edges, built JVM-side. Community
structure is irrelevant for the *cost* measurement (the join/agg
plans don't depend on label values), so reusing the deterministic
hashed graph keeps the two experiments comparable.

Times ``operators/graph.label_propagation`` for 4 rounds in both
state modes plus the auto default, and audits the per-round plan:
broadcast mode must show BroadcastHashJoin with no Exchange on the
edge side. Results recorded in DESIGN_SCALE.md (round 10).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.pagerank_scale import build_edges  # same deterministic graph

ITERATIONS = 4
RUNS = 2


def timed(label, fn):
    best = None
    for _ in range(RUNS):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {label}: {dt:.1f} s")
    return best, out


def main() -> None:
    from pyspark.sql import functions as F

    from capital.operators.graph import label_propagation
    from capital.session import get_spark

    spark = get_spark("lpa-scale")
    edges = build_edges(spark).persist()
    n_edges = edges.count()
    print(f"graph: {n_edges:,} edge rows")

    results = {}
    for mode, flag in (("shuffle", False), ("broadcast", True), ("auto", None)):
        print(f"mode={mode}:")
        best, labels = timed(
            mode,
            lambda flag=flag: label_propagation(
                edges, iterations=ITERATIONS, broadcast_state=flag
            ).agg(F.count(F.lit(1)), F.sum("label")).collect(),
        )
        results[mode] = (best, tuple(labels[0]))
    for mode, (best, sig) in results.items():
        print(f"{mode}: min-of-{RUNS} {best:.1f} s, (nodes, sum(label)) = {sig}")
    sigs = {sig for _, sig in results.values()}
    assert len(sigs) == 1, f"modes disagree: {results}"
    print("label-state identity across modes: OK")


if __name__ == "__main__":
    main()
