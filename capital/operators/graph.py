"""Graph analytics on DataFrames: fixed-iteration PageRank and
degree-ordered triangle counting.

Companion to the pointer-jumping connected components
(``llm/clusters.py``): where components answer "which nodes belong
together", PageRank answers "which nodes matter" (Page et al. 1999) —
entity-importance ranking over a relationship graph (here the
customer↔supplier trade graph; in a data-pipeline setting, domain
link graphs for crawl prioritization) — and triangles/clustering
coefficients answer "how cohesive is each node's neighborhood"
(community structure in similarity graphs; spam/link-farm signals in
crawl graphs).

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

Dangling nodes (no out-edges) leak their damped mass by default —
identical on both engines, which keeps the unrolled SQL oracle
simple; ``redistribute_dangling=True`` applies the canonical
random-surfer fix in-plan (single-row pooled-mass broadcast, no
per-iteration driver action). Pass edges in BOTH directions for an
undirected walk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round9_stable(col: Column) -> Column:
    """floor(x·10⁹ + 0.5)/10⁹ — same four IEEE ops on any engine (the
    round6_stable construction at rank precision)."""
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _bytes_conf(spark, key: str, default: int) -> int:
    """Parse a Spark size conf ('10MB', '10485760', '10485760b')."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    units = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
    if raw.endswith("b"):
        raw = raw[:-1]
    mult = 1
    if raw and raw[-1] in units:
        mult = units[raw[-1]]
        raw = raw[:-1]
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


#: Approximate bytes per rank-state row (long node id + double rank +
#: row overhead) for the auto broadcast decision.
_STATE_ROW_BYTES = 24


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    broadcast_state: bool | None = None,
    checkpoint_dir: str | None = None,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list; returns
    ``(node, rank)`` with ranks rounded to 9 decimals.

    ``p₀ = 1/N``; ``p_{k+1}(v) = (1−d)/N + d·Σ_{u→v} p_k(u)/out(u)``
    with the determinism discipline from the module docstring. A
    fixed ``iterations`` (not a convergence test) keeps the operator
    a pure function of its input — reproducible and SQL-unrollable.

    ``broadcast_state`` picks the per-iteration join strategy; ranks
    are identical either way (tested), only the plan differs:

    - ``True``: broadcast the node-sized rank frame into each
      iteration's edge join — the edge list NEVER shuffles. Wins when
      state is broadcast-small: 6.8 → 5.6 s on the 16k-node sf0.1
      trade graph (round 7).
    - ``False``: shuffled join — the edge list shuffles K times. Wins
      when state outgrows broadcast economics: 10.3 vs 17.4 s on a
      1M-node / 4M-edge fixture (round 9, tools/pagerank_scale.py) —
      shipping a 1M-row state to every task twice per iteration costs
      more than the edge shuffle it saves at a 4:1 edge/node ratio.
    - ``None`` (default): auto — broadcast iff estimated state bytes
      (nodes × 24) fit ``spark.sql.autoBroadcastJoinThreshold``, the
      same policy Catalyst applies to join sides; the node count the
      algorithm needs anyway prices the decision, no extra job.

    ``checkpoint_dir``: reliable-storage checkpoint path for the
    per-iteration rank state (``io.plan_checkpointer``) — survives
    executor loss on a real cluster; default ``localCheckpoint`` is
    the single-node fast path. Ranks identical either way (tested).

    ``redistribute_dangling=True`` closes the classic dangling-mass
    leak: each iteration adds the dangling nodes' pooled damped mass
    back uniformly, ``p_{k+1}(v) += d·(Σ_dangling p_k(u))/N`` — the
    canonical random-surfer fix (Page et al. 1999 §2.6). Kept
    in-plan: the pooled mass is a single-row aggregate cross-joined
    onto the node-sized update (broadcast nested-loop on one row, the
    engine's scalar-attach pattern), so no per-iteration driver
    action and no edge-sized work. Stays integer-exact in nano-rank
    units; the per-node share floors, so total mass is conserved to
    < N nano-units per iteration (property-tested). Default ``False``
    preserves the documented leak semantics the unrolled SQL oracle
    pins."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    from capital.io import plan_checkpointer

    ckpt = (
        plan_checkpointer(edges.sparkSession, checkpoint_dir)
        if checkpoint
        else (lambda df: df)
    )
    nodes = ckpt(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if broadcast_state is None:
        threshold = _bytes_conf(
            edges.sparkSession,
            "spark.sql.autoBroadcastJoinThreshold",
            10 * 2**20,
        )
        broadcast_state = threshold > 0 and n * _STATE_ROW_BYTES <= threshold
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    graph = ckpt(e.join(outdeg, "src"))
    dangling = None
    if redistribute_dangling:
        # Iteration-invariant dangling-node set (no out-edges).
        dangling = ckpt(
            nodes.join(
                e.select(F.col("src").alias("node")).distinct(),
                "node",
                "left_anti",
            )
        )

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
        updated = nodes.join(summed, "node", "left")
        recv_nano = F.coalesce(F.col("__s"), F.lit(0))
        if redistribute_dangling:
            # Pooled dangling mass this iteration, nano-exact: a
            # single-row aggregate attached by broadcast cross join
            # (Cross BroadcastNestedLoopJoin on one build row — the
            # plan shape the engine's scalar-count attaches pin).
            pool = ranks.join(dangling, "node", "left_semi").agg(
                F.coalesce(
                    F.sum(
                        F.floor(F.col("rank") * F.lit(1e9) + F.lit(0.5))
                    ),
                    F.lit(0),
                ).alias("__dang")
            )
            updated = updated.crossJoin(F.broadcast(pool))
            recv_nano = recv_nano + F.floor(
                F.col("__dang") / F.lit(float(n))
            )
        ranks = updated.select(
            "node",
            _round9_stable(
                F.lit(base)
                + F.lit(float(damping))
                * (recv_nano.cast("double") / F.lit(1e9))
            ).alias("rank"),
        )
        if checkpoint:
            ranks = ckpt(ranks)
    return ranks


#: Rank packing stride: rank = degree · 2³² + node. Keeps the
#: (degree, node) lexicographic order as a single BIGINT comparison,
#: so the orientation and the wedge-pair ordering are plain long
#: equi-join/filter columns (codegen) instead of struct compares.
_RANK_STRIDE = 2**32


def triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    chunk_target: int = 1024,
    probe: bool = True,
    total_rows_hint: int | None = None,
    scope=None,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph, via degree-ordered orientation (the
    node-iterator of Schank & Wagner 2005; MapReduce form in Cohen
    2009 / Suri & Vassilvitskii 2011).

    Input edges may carry either or both directions and duplicates;
    they are canonicalized to one row per undirected edge (self-loops
    dropped). Node ids must be non-negative integers < 2³¹ (the
    packing contract below). Returns ``(node, degree, triangles,
    clustering_coeff)`` over every node incident to an edge, with
    ``clustering_coeff = 2·T / (d·(d−1))`` for ``d ≥ 2`` else 0,
    passed through the cross-engine-stable ``floor(x·10⁶ + 0.5)/10⁶``
    (exact-integer inputs, so engine ``round()`` half-way
    disagreements would otherwise bite).

    Scale shape: each undirected edge is oriented from its
    lower-(degree, node) endpoint to the higher — every triangle then
    materializes as exactly ONE wedge (two out-edges of its
    lowest-rank corner) closed by one oriented edge. Orientation
    bounds each pivot's oriented out-degree by O(√m), so total wedge
    output is O(m^{3/2}) regardless of hub skew (a raw hub of degree
    h would otherwise enumerate h²/2 wedges). The wedge enumeration
    is a quadratic-output block self-join, so it routes through
    :func:`capital.operators.skew.chunked_pair_join` (engine
    convention: AQE bounds join *input*, never a block's pair
    *output*); the closing-edge probe is a plain two-column long
    equi-join of wedges against the oriented edge list. Degrees are
    one map-side-combined count; the (degree, node) order is packed
    into one BIGINT (``degree·2³² + node``) so ranks never compare as
    structs inside the join.

    Multi-consumer discipline: ``und``/``ranked``/``oriented`` are
    each referenced 2–3 times downstream (rank joins, wedge
    self-join, closing probe, final attach). Without materialization
    the plan tree re-derives them per reference — multiplicatively
    (each of the closing join's two oriented scans rebuilds both rank
    joins…), measured 16 s vs 3 s on a 12k-edge graph. All three are
    edge/node-sized (never corpus-sized), so they are persisted here;
    pass a :class:`capital.operators.caching.CacheScope` to release
    them deterministically (else session-cache eviction bounds them —
    the library convention). The corner fan-out is one
    ``explode(array)``, not a 3-way union that would re-evaluate the
    triangle join three times.
    """
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = scoped_persist(
        e.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        scope,
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ranked = scoped_persist(
        deg.withColumn(
            "rank",
            F.col("degree") * F.lit(_RANK_STRIDE) + F.col("node"),
        ),
        scope,
    )
    ra = ranked.select(F.col("node").alias("a"), F.col("rank").alias("__ra"))
    rb = ranked.select(F.col("node").alias("b"), F.col("rank").alias("__rb"))
    oriented = scoped_persist(
        und.join(ra, "a")
        .join(rb, "b")
        .select(
            F.least("__ra", "__rb").alias("ru"),
            F.greatest("__ra", "__rb").alias("rv"),
        ),
        scope,
    )
    wedges = chunked_pair_join(
        oriented,
        block_cols=["ru"],
        id_col="rv",
        chunk_target=chunk_target,
        probe=probe,
        total_rows_hint=total_rows_hint,
    )
    closed = wedges.join(
        oriented.select(
            F.col("ru").alias("id_a"), F.col("rv").alias("id_b")
        ),
        ["id_a", "id_b"],
    )
    corners = closed.select(
        F.explode(F.array("ru", "id_a", "id_b")).alias("rank")
    )
    tri = corners.groupBy("rank").agg(F.count(F.lit(1)).alias("__t"))
    d = F.col("degree")
    coeff = F.when(
        d >= 2,
        F.lit(2.0) * F.col("triangles") / (d * (d - F.lit(1))),
    ).otherwise(F.lit(0.0))
    return (
        ranked.join(tri, "rank", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("__t"), F.lit(0)).alias("triangles"),
        )
        .withColumn(
            "clustering_coeff",
            F.floor(coeff * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6),
        )
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    checkpoint_dir: str | None = None,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) — community detection, the graph family's fourth member:
    components answer "connected?", PageRank "how central?",
    triangles "how cohesive locally?", LPA "which module?".

    Each node starts as its own label; every round it adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label — fully deterministic, so a fixed ``iterations`` unrolls
    into plain SQL for the oracle (the PageRank pattern; synchronous
    updates can oscillate on bipartite structures, which a fixed
    round count renders harmless and reproducible). Input edges are
    canonicalized and expanded to both directions; node ids must be
    non-negative integers (the tie-break negates them).

    Per round: one edge⋈labels join + one (node, label) count + one
    per-node max + the tie-break min — all map-side-combinable
    aggregates, label state is node-sized, lineage truncated per
    round (``checkpoint_dir`` for reliable storage).

    ``broadcast_state`` picks the per-round join strategy — the exact
    :func:`pagerank` economics (same node-sized state, same
    edge-vs-state join): ``True`` broadcasts the label frame so the
    edge list NEVER shuffles; ``False`` shuffles edges per round
    (sort-merge) — wins when the state outgrows broadcast; ``None``
    (default) auto — broadcast iff estimated state bytes (nodes × 24)
    fit ``spark.sql.autoBroadcastJoinThreshold``, priced by one
    node-count job before the loop. Measured at 1M nodes / 4M edges
    (``tools/lpa_scale.py``, DESIGN_SCALE.md round 10): broadcast
    wins 16.6 vs 24.6 s — unlike PageRank at the same scale, because
    LPA ships the state ONCE per round (PageRank broadcasts ranks
    AND the summed update, twice per iteration) — and the auto
    default picks it under the session's 64 MB threshold.
    """
    from capital.io import plan_checkpointer

    ckpt = (
        plan_checkpointer(edges.sparkSession, checkpoint_dir)
        if checkpoint
        else (lambda df: df)
    )
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        e0.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = ckpt(
        und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    )
    labels = ckpt(
        both.select(F.col("a").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
    )
    if broadcast_state is None:
        threshold = _bytes_conf(
            edges.sparkSession,
            "spark.sql.autoBroadcastJoinThreshold",
            10 * 2**20,
        )
        n = labels.count()  # one job, prices K join decisions
        broadcast_state = threshold > 0 and n * _STATE_ROW_BYTES <= threshold
    for _ in range(int(iterations)):
        state = labels.select(F.col("node").alias("a"), "label")
        if broadcast_state:
            state = F.broadcast(state)
        nb = both.join(state, "a").select(F.col("b").alias("node"), "label")
        cnts = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("__c")
        )
        mx = cnts.groupBy("node").agg(F.max("__c").alias("__mc"))
        labels = ckpt(
            cnts.join(mx, "node")
            .filter(F.col("__c") == F.col("__mc"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
    return labels
