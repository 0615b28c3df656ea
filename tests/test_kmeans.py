"""Deterministic Lloyd's k-means (capital/llm/kmeans.py): hand-checked
assignments, tie-breaks, empty-cell carry, objective monotonicity,
and interop with the IVF cell assigner."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.llm.kmeans import initial_centroids, lloyd_kmeans


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_hand_computed_two_blobs(spark):
    """Two tight 1-D blobs, k=2: init takes ids 0/1 (both in blob A),
    but one Lloyd's round pulls centroid 1 into blob B and the final
    labeling separates the blobs exactly."""
    rows = [
        (0, [0.0]), (1, [0.2]), (2, [0.1]),
        (3, [10.0]), (4, [10.2]), (5, [10.1]),
    ]
    out, cents = lloyd_kmeans(_vecs(spark, rows), k=2, iterations=3)
    got = {r.vec_id: r.cell for r in out.collect()}
    assert {got[0], got[1], got[2]} == {got[0]}  # blob A one cell
    assert {got[3], got[4], got[5]} == {got[3]}  # blob B one cell
    assert got[0] != got[3]
    # centroids converge to the blob means (quantized to 1e-6)
    flat = sorted(c[0] for c in cents)
    assert abs(flat[0] - 0.1) < 1e-9 and abs(flat[1] - 10.1) < 1e-9


def test_kmeans_tie_breaks_to_smallest_cell(spark):
    """A vector equidistant from two centroids lands in the smaller
    cell index — the determinism the oracle replicates."""
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    out, _ = lloyd_kmeans(_vecs(spark, rows), k=2, iterations=0)
    got = {r.vec_id: r.cell for r in out.collect()}
    # iterations=0: centroids are ids 0 and 1; vec 2 at distance 1
    # from both -> cell 0.
    assert got[2] == 0 and got[0] == 0 and got[1] == 1


def test_kmeans_empty_cell_keeps_centroid(spark):
    """A centroid that attracts nothing survives the update unchanged
    (COALESCE carry, both engines)."""
    rows = [(0, [0.0]), (1, [100.0]), (2, [0.1]), (3, [0.2])]
    out, cents = lloyd_kmeans(_vecs(spark, rows), k=2, iterations=2)
    # cell 1 holds only vec 1; cell 0 everything near zero.
    got = {r.vec_id: r.cell for r in out.collect()}
    assert got[1] == 1 and got[0] == got[2] == got[3] == 0
    assert abs(cents[1][0] - 100.0) < 1e-9


def test_kmeans_objective_monotone_on_corpus(spark, sf_dir):
    """Lloyd's invariant: total within-cluster SSE is non-increasing
    across iterations (quantization moves it by ≤1e-6·dim per round —
    tolerated)."""
    from capital.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sses = []
    for iters in (0, 1, 2, 3):
        out, _ = lloyd_kmeans(emb, k=4, iterations=iters)
        sses.append(out.agg(F.sum("dist2")).collect()[0][0])
    for a, b in zip(sses, sses[1:]):
        assert b <= a + 1e-3, sses


def test_kmeans_centroids_feed_ivf_assigner(spark, sf_dir):
    """The trained centroid table slots straight into the IVF cell
    assigner (same list-of-lists contract as train_centroids)."""
    from capital.io import load_table
    from capital.llm.ivf import assign_cells

    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    out, cents = lloyd_kmeans(emb, k=4, iterations=2)
    via_ivf = assign_cells(emb, cents)
    a = {r.vec_id: r.cell for r in out.collect()}
    b = {r.vec_id: r.cell for r in via_ivf.collect()}
    assert a == b


def test_initial_centroids_are_smallest_ids_in_order(spark):
    rows = [(5, [5.0]), (1, [1.0]), (3, [3.0]), (2, [2.0])]
    cents = initial_centroids(_vecs(spark, rows), 3)
    assert cents == [[1.0], [2.0], [3.0]]


def test_semdedup_prunes_within_cell_only(spark):
    """SemDeDup semantics: a near-duplicate pair inside one cluster
    keeps only the smaller id; near-dups that land in DIFFERENT
    clusters both survive (the paper's documented approximation —
    cell-scoped pairing is what bounds the pair space)."""
    from capital.llm.kmeans import semdedup_flags

    rows = [
        # blob A: three near-identical vectors (cos ~ 1)
        (0, [1.0, 0.0]), (1, [0.999, 0.001]), (2, [0.998, 0.002]),
        # blob B: far from A, two near-identical members
        (10, [0.0, 1.0]), (11, [0.001, 0.999]),
        # isolated direction
        (20, [-1.0, 0.5]),
    ]
    df = _vecs(spark, rows)
    out = {
        r.vec_id: r
        for r in semdedup_flags(
            df, k=2, iterations=3, threshold=0.99
        ).collect()
    }
    # blob A's smallest id survives; 1 and 2 are pruned.
    assert out[0].is_kept and not out[1].is_kept and not out[2].is_kept
    # blob B: 10 survives, 11 pruned (same cell, cos ≈ 1).
    assert out[10].is_kept and not out[11].is_kept
    assert out[20].is_kept
    # everyone is labeled; kept set is exactly {0, 10, 20}
    assert {i for i, r in out.items() if r.is_kept} == {0, 10, 20}


def test_kmeans_arrow_assignment_matches_literal(spark, sf_dir):
    """The large-k Arrow GEMM assignment kernel must produce the same
    clustering as the literal-expression path on the real corpus —
    same cells for every vector, same final centroids (the mean
    update runs on micro-unit integers either way), dist2 within
    rounding of each other (GEMM reassociates the float sums)."""
    from capital.io import load_table
    from capital.llm.kmeans import lloyd_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    lit_out, lit_cents = lloyd_kmeans(emb, k=4, iterations=2, assign="literal")
    arr_out, arr_cents = lloyd_kmeans(emb, k=4, iterations=2, assign="arrow")
    assert lit_cents == arr_cents  # quantized means are exact
    lit = {r.vec_id: (r.cell, r.dist2) for r in lit_out.collect()}
    arr = {r.vec_id: (r.cell, r.dist2) for r in arr_out.collect()}
    assert set(lit) == set(arr)
    for vid in lit:
        assert lit[vid][0] == arr[vid][0], vid
        assert abs(lit[vid][1] - arr[vid][1]) <= 1e-6, vid


def test_kmeans_auto_picks_arrow_past_literal_budget(spark):
    """auto mode must route k·dim > MAX_LITERAL_TERMS through the
    GEMM kernel (a plan with that many literal terms would bloat
    toward the janino limit) — verified by plan shape: the arrow
    path labels via MapInPandas, the literal path has no Python."""
    import contextlib
    import io

    from capital.llm.kmeans import MAX_LITERAL_TERMS, lloyd_kmeans

    dim = 32
    n = (MAX_LITERAL_TERMS // dim) + 8  # k beyond the literal budget
    rows = [(i, [float((i * 7 + j) % 13) for j in range(dim)])
            for i in range(n + 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, cents = lloyd_kmeans(df, k=n, iterations=0, assign="auto")
    assert len(cents) == n and n * dim > MAX_LITERAL_TERMS
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "MapInPandas" in buf.getvalue()
    assert out.count() == n + 4  # every vector labeled


def test_cluster_purity_hand_computed(spark):
    """Purity on constructed assignments: majority share per cell,
    ties broken to the SMALLEST label, zero-label cells impossible
    (inner join)."""
    from capital.llm.kmeans import cluster_purity

    assign = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i, 1) for i in range(4, 10)],
        "vec_id long, cell int",
    )
    labels = spark.createDataFrame(
        # cell 0: labels 7,7,3,3 -> tie at n=2 -> majority 3
        [(0, 7), (1, 7), (2, 3), (3, 3)]
        # cell 1: labels 5,5,5,5,2,9 -> majority 5 (4/6)
        + [(4, 5), (5, 5), (6, 5), (7, 5), (8, 2), (9, 9)],
        "vec_id long, label int",
    )
    out = {r.cell: r for r in cluster_purity(assign, labels).collect()}
    assert out[0].n_vecs == 4 and out[0].n_majority == 2
    assert out[0].majority_label == 3  # tie -> smallest label
    assert out[0].purity == 0.5
    assert out[1].n_vecs == 6 and out[1].majority_label == 5
    assert out[1].n_majority == 4
    assert abs(out[1].purity - 0.666667) < 1e-9


def test_clustering_nmi_perfect_and_degenerate(spark):
    """NMI on constructed assignments: a clustering that exactly
    reproduces the labels scores 1.0 (MI == both entropies); a
    single-cluster assignment has H(cell)=0 and NMI must be NULL,
    never a division error; an independent split scores ~0."""
    from capital.llm.kmeans import clustering_nmi

    labels = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "vec_id long, label int"
    )
    perfect = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "vec_id long, cell int"
    )
    r = clustering_nmi(perfect, labels).collect()[0]
    assert r.n_rows == 8
    assert abs(r.nmi - 1.0) < 1e-5
    assert abs(r.mi_nats - r.h_cell) < 1e-5

    single = spark.createDataFrame(
        [(i, 0) for i in range(8)], "vec_id long, cell int"
    )
    r1 = clustering_nmi(single, labels).collect()[0]
    assert r1.h_cell == 0.0 and r1.nmi is None

    # independent: cell = i // 4 splits orthogonally to label = i % 2
    indep = spark.createDataFrame(
        [(i, i // 4) for i in range(8)], "vec_id long, cell int"
    )
    r2 = clustering_nmi(indep, labels).collect()[0]
    assert abs(r2.mi_nats) < 1e-6 and abs(r2.nmi) < 1e-6
