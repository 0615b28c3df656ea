"""Deterministic Lloyd's k-means over embedding columns.

The engine already *uses* k-means (``llm/ivf.train_centroids`` wraps
MLlib for the IVF coarse quantizer), but MLlib's trainer is
rows-only-checkable: random init + float reduction order make its
centroids engine-private. This module is the ORACLE-PAIRED member —
a fixed-iteration Lloyd's with every source of nondeterminism pinned,
so the whole clustering unrolls into plain SQL (the PageRank/BPE
pattern) and a DuckDB twin reproduces assignments hash-exactly:

- **init**: the ``k`` vectors with the smallest ids, in id order —
  no RNG to coordinate across engines (k-means++ would need one);
- **assignment**: nearest centroid by squared L2, ties to the
  smallest cell index; distances are sequential ``zip_with``/
  ``aggregate`` folds in array order, the established ``list_sum``
  parity (``llm/ivf._dist2_to_center`` reused);
- **update**: per-cell per-dimension mean over MICRO-UNIT-quantized
  inputs — each component becomes the exact integer
  ``floor(x·1e6 + 0.5)`` (the round6_stable op set, identical IEEE
  ops both engines), integer sums are order-free, and the mean
  ``round6_stable((Σq/1e6)/n)`` re-rounds to 1e-6 — so the NEXT
  iteration's centroid inputs are bit-identical doubles on both
  engines. (A ``DECIMAL(28,6)`` cast of the float inputs was
  measured to disagree between engines on a handful of half-way
  values per corpus — the CLAUDE.md round() boundary gotcha — so
  the quantization must be the explicit floor form.) Rounding
  centroids to 1e-6 each round is a quantized Lloyd's: convergence
  behavior is unchanged at embedding scale, determinism is total;
- **empty cells** keep their previous centroid (COALESCE semantics
  on both sides).

Scale shape: each iteration is one corpus-scan assignment (k literal
distance folds — no join, centroids are broadcast literals) + one
map-side-combined (cell, dim) aggregate whose output is k×dim tiny
rows, collected to the driver (the bounded-metadata-read precedent:
IVF probed cells, BPE winners). K iterations = K scans + K
dimension-sized collects; at 100 TB persist the input once and the
per-round cost is the scan. SemDeDup (Abbas et al. 2023) composes
this with within-cell cosine pruning — see
``capital/queries/llm_queries.py`` ``dedup_semdedup_prune``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def initial_centroids(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic init: the ``k`` smallest-id vectors, in id order."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.asc(id_col))
        .limit(int(k))
        .collect()
    )
    return [[float(x) for x in r[1]] for r in rows]


def _mean_update(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
) -> list[list[float]]:
    """One Lloyd's update: per-cell per-dim means over micro-unit
    integer quantization (module contract), computed IN SPARK (one
    map-side-combined aggregate over (cell, dim); k×dim rows
    collected) so the values the driver bakes into the next
    iteration's literals are the exact doubles the SQL twin derives."""
    from capital.llm.text import round6_stable

    dim = len(centroids[0])
    q = F.floor(F.col("__v").cast("double") * F.lit(1e6) + F.lit(0.5))
    per_dim = (
        assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("__i", "__v")
        )
        .groupBy("cell", "__i")
        .agg(
            F.sum(q).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            "cell",
            "__i",
            round6_stable(
                F.col("__s").cast("double") / F.lit(1e6) / F.col("__n")
            ).alias("__m"),
        )
        .collect()
    )
    nxt = [list(c) for c in centroids]  # empty cells keep previous
    means: dict[int, list[float]] = {}
    for r in per_dim:
        means.setdefault(r["cell"], [0.0] * dim)[r["__i"]] = r["__m"]
    for cell, vals in means.items():
        nxt[cell] = vals
    return nxt


#: Literal-assignment budget: k centroid-distance folds of dim terms
#: each ride the plan as literal arrays; past ~10⁴ literal terms the
#: plan bloats toward the janino limit (the PQ lesson) and expression
#: build time dominates. Beyond it, assignment goes through the Arrow
#: GEMM kernel (`_assign_arrow`).
MAX_LITERAL_TERMS = 10_000


def _assign_arrow(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-k assignment kernel: one numpy GEMM per Arrow batch
    against the broadcast centroid matrix — ``dist² = ‖v‖² − 2·v@Cᵀ +
    ‖c‖²`` row-argmin (numpy argmin takes the FIRST minimum — the
    same smallest-cell tie rule as the struct-sort path). The
    SemDeDup-at-paper-scale regime (tens of thousands of clusters)
    where k·dim literal expressions cannot ride the plan. Float sums
    differ from the sequential fold in ulps, so this is the
    throughput twin — the literal path stays the oracle-checked one;
    equivalence on real data is pinned in tests/test_kmeans.py."""
    import numpy as np
    import pandas as pd  # noqa: F401 — pandas_udf type resolution

    c_mat = [list(map(float, c)) for c in centroids]

    def _assign(batches):
        import numpy as np
        import pandas as pd

        cm = np.asarray(c_mat, dtype="float64")          # k × dim
        c_sq = (cm * cm).sum(axis=1)                     # k
        for pdf in batches:
            v = np.asarray(pdf[vec_col].tolist(), dtype="float64")
            d2 = (
                (v * v).sum(axis=1, keepdims=True)
                - 2.0 * v @ cm.T
                + c_sq[None, :]
            )
            best = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": best.astype("int32"),
                    "__d2": d2[np.arange(len(best)), best],
                    vec_col: pdf[vec_col],  # pass-through for the mean update
                }
            )

    out_schema = (
        f"{id_col} long, cell int, __d2 double, {vec_col} array<double>"
    )
    return vectors.select(id_col, vec_col).mapInPandas(
        _assign, schema=out_schema
    )


def lloyd_kmeans(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "auto",
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iterations`` deterministic Lloyd's rounds; returns
    ``(assignments, centroids)`` where ``assignments`` is the corpus
    labeled against the FINAL centroids — ``(id, cell, dist2)`` with
    ``dist2`` round6-stable — and ``centroids`` the trained k×dim
    table (plain lists, broadcastable as literals into
    ``llm/ivf.assign_cells`` / ``write_ivf_index``).

    ``assign`` picks the per-round assignment kernel: ``"literal"``
    (k distance folds as plan literals — the oracle-checked path),
    ``"arrow"`` (numpy GEMM per Arrow batch — the large-k regime
    where k·dim literals cannot ride the plan; SemDeDup's tens of
    thousands of clusters), or ``"auto"`` (default): literal iff
    ``k·dim ≤ MAX_LITERAL_TERMS``. Both kernels use the same
    first-minimum tie rule; GEMM float sums differ from the
    sequential fold in ulps, so cross-kernel assignment equality is
    pinned on real data rather than guaranteed at ties
    (tests/test_kmeans.py)."""
    from capital.llm.ivf import _dist2_to_center, assign_cells
    from capital.llm.text import round6_stable

    if assign not in ("auto", "literal", "arrow"):
        raise ValueError(f"lloyd_kmeans: unknown assign mode {assign!r}")
    cents = initial_centroids(vectors, k, id_col, vec_col)
    dim = len(cents[0]) if cents else 0
    use_arrow = assign == "arrow" or (
        assign == "auto" and len(cents) * dim > MAX_LITERAL_TERMS
    )
    for _ in range(int(iterations)):
        if use_arrow:
            assigned = _assign_arrow(vectors, cents, id_col, vec_col)
        else:
            assigned = assign_cells(vectors, cents, vec_col=vec_col)
        cents = _mean_update(assigned, cents, vec_col)
    if use_arrow:
        final = _assign_arrow(vectors, cents, id_col, vec_col)
        return (
            final.select(
                F.col(id_col),
                "cell",
                round6_stable(F.col("__d2")).alias("dist2"),
            ),
            cents,
        )
    # Final labeling in ONE pass: nearest (d, i) struct, ties to the
    # smallest cell index (sort_array lexicographic — the assign_cells
    # rule), distance surfaced instead of discarded.
    dists = F.array(
        *[
            F.struct(
                _dist2_to_center(F.col(vec_col), c).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(cents)
        ]
    )
    best = F.sort_array(dists)[0]
    return (
        vectors.select(
            F.col(id_col),
            best["i"].alias("cell"),
            round6_stable(best["d"]).alias("dist2"),
        ),
        cents,
    )


def semdedup_flags(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope=None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding corpus,
    then prune near-duplicates WITHIN each cluster — the paper's
    scaling trick is exactly this composition: the quadratic pair
    space is bounded per cell instead of corpus-wide, and cells are
    embarrassingly parallel.

    Deterministic keep rule (oracle contract): a vector is dropped
    iff some SMALLER-id vector in its cell has cosine ≥ ``threshold``
    with it — the min-id-wins convention every dedup family member
    here uses. (The paper keeps the member least similar to the
    centroid; that variant changes one ORDER BY and is deliberately
    not the default because centroid distance is a float tie-break
    where ids are exact.)

    Returns one row per vector: ``(id, cell, is_kept)``.

    Scale shape: Lloyd's rounds as :func:`lloyd_kmeans`; the pair
    stage is one :func:`~capital.operators.skew.chunked_pair_join`
    keyed on the cell id (task-bounded even if one cell swallows the
    corpus), norms precomputed at keying, interpreted-fold dot (high
    dim + cell-bounded pair volume — the flat-column codegen dot's
    fixed cost is not amortized here; see cosine_neardup_pairs).
    """
    from capital.llm.similarity import _norm, cosine_with_norms
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join

    assignments, _cents = lloyd_kmeans(
        vectors, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    labeled = scoped_persist(
        vectors.select(
            F.col(id_col),
            F.col(vec_col),
            _norm(F.col(vec_col)).alias("nrm"),
        ).join(assignments.select(id_col, "cell"), id_col),
        scope,
    )
    n_rows = labeled.count()
    pairs = chunked_pair_join(
        labeled,
        ["cell"],
        id_col,
        payload_cols=[vec_col, "nrm"],
        total_rows_hint=n_rows,
    )
    dropped = (
        pairs.withColumn(
            "__cos",
            cosine_with_norms(
                F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b"),
                F.col("nrm_a"), F.col("nrm_b"),
            ),
        )
        .filter(F.col("__cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        labeled.select(id_col, "cell")
        .join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            "cell",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("is_kept"),
        )
    )


def cluster_purity(
    assignments: DataFrame,
    labeled: DataFrame,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster PURITY against ground-truth labels — the standard
    external clustering evaluation (purity = majority-label share per
    cluster): one row per cell with ``(cell, n_vecs, majority_label,
    n_majority, purity)``. Majority ties break on the SMALLEST label
    (staged max-then-min — the round-9 arg_max lesson: composite
    orderings must be two scalar stages so the SQL twin can follow).

    Monitors semantic-clustering quality over time (a purity drop on
    a labeled probe set flags centroid drift before SemDeDup/UniMax
    allocations degrade). Shape: one (cell, label) count aggregate
    (map-side combined), one cell-level rollup, one tie-break join —
    all cluster-count-sized after the first exchange.
    """
    from capital.llm.text import round6_stable

    lc = (
        assignments.select(F.col(id_col), F.col(cell_col))
        .join(labeled.select(F.col(id_col), F.col(label_col)), id_col)
        .groupBy(cell_col, label_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    mx = lc.groupBy(cell_col).agg(
        F.max("__n").alias("__mn"), F.sum("__n").alias("__nv")
    )
    return (
        lc.join(mx, cell_col)
        .filter(F.col("__n") == F.col("__mn"))
        .groupBy(cell_col, "__mn", "__nv")
        .agg(F.min(label_col).alias("majority_label"))
        .select(
            F.col(cell_col),
            F.col("__nv").cast("long").alias("n_vecs"),
            "majority_label",
            F.col("__mn").cast("long").alias("n_majority"),
            round6_stable(
                F.col("__mn").cast("double") / F.col("__nv")
            ).alias("purity"),
        )
    )


def clustering_nmi(
    assignments: DataFrame,
    labeled: DataFrame,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    label_col: str = "label",
) -> DataFrame:
    """Normalized mutual information between cluster assignments and
    ground-truth labels — the permutation-invariant companion to
    :func:`cluster_purity` (purity inflates as k grows; NMI =
    MI/√(H(cell)·H(label)) penalizes over-splitting). One row:
    ``(n_rows, mi_nats, h_cell, h_label, nmi)``.

    Float parity (the a13/PSI discipline): the (cell, label) count
    table is exact integers; each MI term
    ``(n_xy/N)·ln(n_xy·N/(n_x·n_y))`` and entropy term
    ``−(n_x/N)·ln(n_x/N)`` is one fixed-shape double expression of
    exact integers, stable-rounded to 6 and accumulated as
    DECIMAL(28,6) — order-free on any engine; NMI is one final
    double expression, null when either marginal entropy is 0 (a
    single cluster or single label carries no normalizable signal).

    Scale: ONE corpus-sized (cell, label) count (map-side combined),
    localCheckpointed because four scalar folds (MI, two entropies,
    N) read it — dimension-sized (≤ k × |labels| rows), so the
    barrier is metadata-cheap and stops the corpus aggregate from
    re-deriving multiplicatively (the round-9 multi-reference rule).
    """
    from capital.llm.text import round6_stable
    from capital.queries.registry import decimal_sum

    c = (
        assignments.select(F.col(id_col), F.col(cell_col).alias("__x"))
        .join(
            labeled.select(F.col(id_col), F.col(label_col).alias("__y")),
            id_col,
        )
        .groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__nxy"))
        .localCheckpoint(eager=False)  # consumed 4x below; lazy —
        # the first fold materializes it (round 16, one job fewer)
    )
    ntot = c.agg(F.sum("__nxy").alias("__n"))
    m = c.join(
        c.groupBy("__x").agg(F.sum("__nxy").alias("__nx")), "__x"
    ).join(c.groupBy("__y").agg(F.sum("__nxy").alias("__ny")), "__y")
    # Products widen to double BEFORE multiplying: n_xy·N and n_x·n_y
    # reach N² and overflow BIGINT at lake scale (ANSI Spark throws);
    # exact integers stay exact in doubles through 2⁵³ and the SQL
    # twin widens identically, so parity holds.
    mi_term = round6_stable(
        (F.col("__nxy") / F.col("__n"))
        * F.log(
            (F.col("__nxy").cast("double") * F.col("__n"))
            / (F.col("__nx").cast("double") * F.col("__ny"))
        )
    )
    mi = m.crossJoin(ntot).agg(decimal_sum(mi_term, "mi_nats"))

    def _entropy(key: str, alias: str):
        marg = c.groupBy(key).agg(F.sum("__nxy").alias("__nk"))
        term = round6_stable(
            -(F.col("__nk") / F.col("__n"))
            * F.log(F.col("__nk") / F.col("__n"))
        )
        return marg.crossJoin(ntot).agg(decimal_sum(term, alias))

    out = (
        ntot.select(F.col("__n").cast("long").alias("n_rows"))
        .crossJoin(mi)
        .crossJoin(_entropy("__x", "h_cell"))
        .crossJoin(_entropy("__y", "h_label"))
    )
    return out.select(
        "n_rows",
        "mi_nats",
        "h_cell",
        "h_label",
        F.when(
            (F.col("h_cell") > 0) & (F.col("h_label") > 0),
            round6_stable(
                F.col("mi_nats")
                / F.sqrt(F.col("h_cell") * F.col("h_label"))
            ),
        ).alias("nmi"),
    )
