#!/usr/bin/env python
"""Triangle counting at design scale: measured evidence that the
degree-ordered orientation + skew-chunked wedge enumeration survives
hub skew (the claim in operators/graph.triangles' docstring).

The sf0.1 co-purchase graph (1k nodes / 12k edges) only measures the
stage floor; this fixture is the failure mode the orientation exists
for. Generates two deterministic hashed graphs JVM-side (spark.range
+ xxhash64, no driver data), 1M directed edge rows over ≤100k nodes
each:

- UNIFORM: endpoints hash uniformly — every raw degree ≈ 20;
- HUB: a 10-node hub set receives 20% of all edges — raw hub degree
  ≈ 20k, so a NAIVE per-node wedge enumeration would emit
  ~10 · (20k)²/2 ≈ 2·10⁹ wedges from the hubs alone (infeasible);
  degree-ordered orientation points every hub edge INTO the hub, so
  the hubs' ORIENTED out-degree is ~0 and total wedge output stays
  O(m^{3/2}) — the hub run must therefore land within a small factor
  of the uniform run, not 1000× away.

Reports wall clock (min of 2), max raw degree vs max oriented
out-degree, and triangle totals. Results recorded in DESIGN_SCALE.md
(round 9).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_EDGE_ROWS = 1_000_000
N_NODES = 100_000
N_HUBS = 10
HUB_FRACTION = 5  # 1-in-5 edge rows land on the hub set


def build_edges(spark, hubs: bool):
    from pyspark.sql import functions as F

    base = spark.range(N_EDGE_ROWS)
    src = F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
    dst_uniform = F.pmod(
        F.xxhash64(F.col("id") + F.lit(N_EDGE_ROWS)), F.lit(N_NODES)
    )
    if hubs:
        dst = F.when(
            F.col("id") % HUB_FRACTION == 0,
            F.pmod(
                F.xxhash64(F.col("id") + F.lit(2 * N_EDGE_ROWS)),
                F.lit(N_HUBS),
            ),
        ).otherwise(dst_uniform)
    else:
        dst = dst_uniform
    return base.select(
        src.cast("int").alias("src"), dst.cast("int").alias("dst")
    )


def degree_stats(edges):
    from pyspark.sql import functions as F

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = deg.select(
        "node", (F.col("d") * F.lit(2**32) + F.col("node")).alias("rank")
    )
    ra = ranked.select(F.col("node").alias("a"), F.col("rank").alias("ra"))
    rb = ranked.select(F.col("node").alias("b"), F.col("rank").alias("rb"))
    oriented_out = (
        und.join(ra, "a")
        .join(rb, "b")
        .select(F.least("ra", "rb").alias("ru"))
        .groupBy("ru")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    from pyspark.sql import Row

    max_raw = deg.agg(F.max("d")).first()[0]
    max_oriented = oriented_out.agg(F.max("od")).first()[0]
    n_edges = und.count()
    return n_edges, max_raw, max_oriented


def main() -> None:
    from capital.operators.caching import CacheScope
    from capital.operators.graph import triangles
    from capital.session import get_spark

    spark = get_spark(
        app_name="triangle-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    from pyspark.sql import functions as F

    for label, hubs in (("uniform", False), ("hub-skewed", True)):
        edges = build_edges(spark, hubs).persist()
        edges.count()
        n_edges, max_raw, max_oriented = degree_stats(edges)
        times = []
        total = None
        for _ in range(2):
            spark.catalog.clearCache()
            edges.persist().count()
            with CacheScope() as scope:
                t0 = time.time()
                out = triangles(edges, scope=scope)
                total = out.agg(
                    F.sum("triangles").alias("t"), F.count(F.lit(1)).alias("n")
                ).first()
                times.append(time.time() - t0)
        print(
            f"{label}: undirected_edges={n_edges} max_raw_degree={max_raw} "
            f"max_oriented_outdegree={max_oriented} "
            f"triangle_incidences={total['t']} nodes={total['n']} "
            f"wall_min={min(times):.2f}s walls={[f'{t:.2f}' for t in times]}"
        )
        edges.unpersist()


if __name__ == "__main__":
    main()
