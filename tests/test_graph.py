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


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir= (reliable-storage truncation, the cluster
    fault-tolerance mode) must produce bit-identical ranks to the
    localCheckpoint default."""
    pairs = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    a = sorted(tuple(r) for r in pagerank(_edges(spark, pairs)).collect())
    b = sorted(
        tuple(r)
        for r in pagerank(
            _edges(spark, pairs), checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    )
    assert a == b


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    """redistribute_dangling=True: total rank stays ~1 on a graph with
    a directed sink (the leak the default mode documents), ordering
    unchanged, and the redistribution is uniform — every node gains
    the same share."""
    pairs = [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")]
    leaky = {
        r.node: r.rank for r in pagerank(_edges(spark, pairs)).collect()
    }
    fixed = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, pairs), redistribute_dangling=True
        ).collect()
    }
    assert sum(leaky.values()) < 0.95  # the documented leak
    # Conservation: nano-floor loses < N nano-units per iteration.
    assert abs(sum(fixed.values()) - 1.0) < 1e-5
    # Importance ordering preserved; every rank strictly gained.
    assert fixed["sink"] > fixed["a"] == fixed["b"]
    assert all(fixed[k] > leaky[k] for k in leaky)


def test_pagerank_no_dangling_redistribution_is_noop(spark):
    """On a graph with no dangling nodes the redistribution term is
    exactly zero — both modes bit-identical."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    a = sorted(tuple(r) for r in pagerank(_edges(spark, pairs)).collect())
    b = sorted(
        tuple(r)
        for r in pagerank(
            _edges(spark, pairs), redistribute_dangling=True
        ).collect()
    )
    assert a == b


def test_pagerank_auto_state_mode_follows_broadcast_threshold(spark):
    """broadcast_state=None (default) prices the decision like
    Catalyst: small state → broadcast join in the iteration plan;
    with the broadcast threshold squeezed below the state size the
    auto mode must fall back to the shuffled join."""
    pairs = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    e = _edges(spark, pairs)

    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in _plan(
        pagerank(e, iterations=1, checkpoint=False)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
        assert "BroadcastHashJoin" not in _plan(
            pagerank(e, iterations=1, checkpoint=False)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# --- triangles (degree-ordered node-iterator) ---------------------------


from capital.operators.graph import triangles  # noqa: E402


def _int_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def _brute_triangles(pairs):
    """Per-node triangle counts by direct enumeration."""
    from itertools import combinations

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for e in und for n in e})
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {n: sum(n in e for e in und) for n in nodes}
    return und, deg, tri


def test_triangles_complete_k4(spark):
    """K4: every node has degree 3, sits in 3 triangles, coeff 1."""
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    rows = triangles(_int_edges(spark, pairs)).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.degree, r.triangles, r.clustering_coeff) == (3, 3, 1.0)


def test_triangles_star_and_path_have_none(spark):
    """Stars and paths are triangle-free; coeff 0 everywhere
    (including the degree-1 leaves, where the coeff is defined 0)."""
    star = [(0, i) for i in range(1, 8)]
    path = [(i, i + 1) for i in range(6)]
    for pairs in (star, path):
        out = triangles(_int_edges(spark, pairs)).collect()
        assert all(r.triangles == 0 for r in out)
        assert all(r.clustering_coeff == 0.0 for r in out)


def test_triangles_matches_bruteforce_on_random_graph(spark):
    """Deterministic pseudo-random graph vs direct enumeration —
    counts, degrees, and coefficients all match."""
    pairs = [((i * 7) % 29, (i * 13 + 5) % 29) for i in range(120)]
    und, deg, tri = _brute_triangles(pairs)
    rows = {r.node: r for r in triangles(_int_edges(spark, pairs)).collect()}
    assert set(rows) == set(deg)
    for n, r in rows.items():
        assert r.degree == deg[n]
        assert r.triangles == tri[n]
        d = deg[n]
        want = 0.0 if d < 2 else 2.0 * tri[n] / (d * (d - 1))
        import math

        assert math.isclose(
            r.clustering_coeff, math.floor(want * 1e6 + 0.5) / 1e6
        )


def test_triangles_input_canonicalization(spark):
    """Both directions, duplicates, and self-loops in the input edge
    list collapse to the same undirected graph."""
    base = [(0, 1), (1, 2), (0, 2)]
    noisy = base + [(b, a) for a, b in base] + base + [(1, 1), (2, 2)]
    a = sorted(map(tuple, triangles(_int_edges(spark, base)).collect()))
    b = sorted(map(tuple, triangles(_int_edges(spark, noisy)).collect()))
    assert a == b


def test_triangles_chunked_path_identical_to_plain(spark):
    """chunk_target=1 forces the skew-chunked wedge enumeration; the
    output must be identical to the probe-chosen plain join (the
    chunked_pair_join contract, re-pinned at the triangle level) —
    exercised on a hub-heavy graph where one pivot owns most wedges."""
    pairs = [(0, i) for i in range(1, 40)] + [
        (i, i + 1) for i in range(1, 39)
    ]
    e = _int_edges(spark, pairs)
    plain = sorted(map(tuple, triangles(e).collect()))
    chunked = sorted(
        map(tuple, triangles(e, chunk_target=1, probe=False).collect())
    )
    assert plain == chunked


# --- label propagation (community detection) ----------------------------


from capital.operators.graph import label_propagation  # noqa: E402


def test_lpa_separates_bridged_cliques(spark):
    """Two 4-cliques joined by one bridge edge resolve to two
    communities (hand-traced: converges by round 3 under the
    (count desc, label asc) tie-break)."""
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a + 10, b + 10) for a, b in c1]
    edges = _int_edges(spark, c1 + c2 + [(3, 10)])
    labels = {
        r.node: r.label
        for r in label_propagation(edges, iterations=4).collect()
    }
    assert {labels[n] for n in range(4)} == {0}
    assert {labels[n + 10] for n in range(4)} == {10}


def test_lpa_deterministic_across_layouts_and_modes(spark, tmp_path):
    pairs = [((i * 7) % 29, (i * 13 + 5) % 29) for i in range(80)]
    e = _int_edges(spark, pairs)
    a = sorted(map(tuple, label_propagation(e, iterations=3).collect()))
    b = sorted(
        map(
            tuple,
            label_propagation(e.repartition(5), iterations=3).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            label_propagation(
                e, iterations=3, checkpoint_dir=str(tmp_path / "ck")
            ).collect(),
        )
    )
    assert a == b == c
    nodes = {t[0] for t in a}
    assert all(lbl in nodes for _, lbl in a)  # labels are node ids
