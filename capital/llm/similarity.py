"""Similarity search over embedding columns (``array<float>``).

Two paths:

- :func:`cosine_topk` — brute-force exact top-k for a (broadcast) query
  set. Cost O(|queries| × |corpus| × dim) multiply-adds, all inside
  Catalyst higher-order functions (zip_with/aggregate — JVM, codegen).
  The right baseline, and the right *tool* whenever |queries| is small:
  at 1000 executors it is an embarrassingly parallel scan of the corpus.
- :func:`lsh_bucket_topk` — random-hyperplane (sign-LSH) bucketing: a
  deterministic hyperplane family hashes each vector to a short bit
  key; search compares only vectors sharing a bucket. Corpus side is
  hashed once (one narrow pass + shuffle on the bucket key); recall is
  traded via number of planes. The 100 TB path when |queries| is large.
  (Random-hyperplane LSH per Charikar, STOC 2002 — the same family IVF
  coarse quantizers approximate with learned centroids.)

Dot products run in double precision with sequential (array-order)
accumulation so results are bit-reproducible across engines.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from capital.operators.caching import CacheScope


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# NOTE on unrolling literal-weight dots: a flat 64-term
# element_at(vec,i)*w_i chain beats the interpreted fold 2x when
# measured as an isolated projection, but COMPOSED into the bucket
# join it regressed sign-LSH top-k 5x (1.6 s → 7.9 s at sf0.1):
# Catalyst re-inlines the 512-term key expression across join/filter
# projections and generated-code size explodes (same failure mode
# measured 27x on the IVF centroid array). Keep the fold for bucket
# keys; it is one pass per row and never the bottleneck.


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_with_norms(
    a: Column, b: Column, norm_a: Column, norm_b: Column
) -> Column:
    """Pair cosine from precomputed norms: identical float arithmetic
    to :func:`cosine` (same sequential sum-of-squares, just evaluated
    in an earlier projection), but the pair stage runs ONE interpreted
    fold (the dot) instead of three. Measured 2-3× on the bucket-join
    pair paths, where norms were being re-folded per candidate pair."""
    return _dot(a, b) / (norm_a * norm_b)


# NOTE: an unrolled 64-term element_at pair dot was also tried in the
# neardup pair projection (flat chain, same accumulation order) and
# measured 2.2× SLOWER than the fold there (2.6 s vs 1.2 s at sf0.1) —
# per-term null-check + array-bounds code dominates. The fold stays.


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` is broadcast; the corpus is scanned once. Self-matches
    (same id) are excluded. Ranking ties break on neighbor id for
    determinism.
    """
    from capital.io import parallelize_narrow

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = parallelize_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            cosine_with_norms(
                F.col("q_vec"), F.col("c_vec"),
                F.col("q_norm"), F.col("c_norm"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
        )
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane family.

    Components derive from a splitmix-style integer mix of
    (seed, plane, dim index) — no RNG state, reproducible everywhere.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = (seed * 1_000_003 + p * 10_007 + d) & 0xFFFFFFFF
            x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
            x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
            x = x ^ (x >> 16)
            row.append((x / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def sign_lsh_key(vec: Column | str, planes: list[list[float]]) -> Column:
    """Bit-string bucket key: sign of ⟨vec, plane⟩ per hyperplane.

    Built as ONE SQL string parsed JVM-side: the previous form
    constructed ``planes × dim`` ``F.lit`` Columns plus a lambda fold
    per plane through py4j — ~0.5 s of *driver* time per plan build at
    6×64 (measured; the dominant cost of the embedding-neardup query at
    small scale). Same expression tree after parsing, so execution and
    results are identical. Accepts the vector column's *name* (string)
    for the single-round-trip path; a Column falls back to composed
    construction for callers holding a derived expression.
    """
    if not isinstance(vec, str):
        bits = [
            F.when(
                _dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for plane in planes
        ]
        return F.concat(*bits)
    bit_exprs = []
    for plane in planes:
        weights = ",".join(repr(w) + "D" for w in plane)
        bit_exprs.append(
            f"CASE WHEN aggregate(zip_with(`{vec}`, array({weights}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, "
            f"(acc, v) -> acc + v) >= 0 THEN '1' ELSE '0' END"
        )
    return F.expr(f"concat({', '.join(bit_exprs)})")


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within sign-LSH buckets.

    With 8 planes the corpus splits into ≤256 buckets → ~256× fewer
    comparisons at equal recall for clustered data. Queries hash with
    the same plane family, then join on the bucket key.

    ``n_tables`` > 1 turns on OR-amplification (the Indyk–Motwani
    multi-table construction): L independent plane families, a
    candidate collides if it shares a bucket in ANY table —
    ``P(hit) = 1 − (1 − p^b)^L`` with ``p = 1 − θ/π`` per plane, so
    recall climbs toward 1 while per-table comparison savings stay.
    Corpus and queries each explode to L ``(table, bucket)`` rows
    (the corpus is hashed L times in one narrow pass — no extra
    scans); candidates dedup on the id pair BEFORE scoring so a
    multi-table collision scores exactly once. Recall-vs-bruteforce
    at realistic settings is pinned by tests/test_lsh_recall.py
    against the analytic expectation."""
    from capital.io import parallelize_narrow

    corpus = parallelize_narrow(corpus)
    families = [
        hyperplanes(dim, n_planes, seed=seed + 7919 * t)
        for t in range(n_tables)
    ]

    def _keyed(df: DataFrame, idc: str, side: str) -> DataFrame:
        base = df.select(
            F.col(id_col).alias(idc),
            F.col(vec_col).alias(f"{side}_vec"),
            _norm(F.col(vec_col)).alias(f"{side}_norm"),
            *[
                sign_lsh_key(vec_col, fam).alias(f"__b{t}")
                for t, fam in enumerate(families)
            ],
        )
        if n_tables == 1:
            return base.withColumnRenamed("__b0", "bucket").withColumn(
                "table_id", F.lit(0)
            )
        return base.select(
            idc,
            f"{side}_vec",
            f"{side}_norm",
            F.posexplode(
                F.array(*[F.col(f"__b{t}") for t in range(n_tables)])
            ).alias("table_id", "bucket"),
        )

    c = _keyed(corpus, "neighbor_id", "c")
    q = _keyed(queries, "query_id", "q")
    cand = c.join(F.broadcast(q), ["table_id", "bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    if n_tables > 1:
        # A pair colliding in several tables scores once: payloads
        # are functionally dependent on the ids, so keep-any is
        # deterministic.
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.withColumn(
        "cosine_sim",
        cosine_with_norms(
            F.col("q_vec"), F.col("c_vec"),
            F.col("q_norm"), F.col("c_norm"),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
        )
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    scope: CacheScope | None = None,
    flat_pair_dot: bool | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking.

    Pairs are only scored within a bucket (all ``n_planes`` signs
    equal); at 0.95+ cosine the vectors are nearly parallel, so bucket
    collision probability per plane is ≈1 − θ/π ≈ 0.90 — recall stays
    high while the pair space collapses. The bucket self-join goes
    through :func:`capital.operators.skew.chunked_pair_join`: an
    embedding corpus with a dominant mode (near-identical boilerplate
    vectors) concentrates in one bucket, and chunking bounds that
    bucket's quadratic pair output per task.

    Pair scoring strategy (round 10, ``flat_pair_dot``): when True,
    the vector is FLATTENED to ``dim`` double columns at keying time
    and the pair dot is an unrolled whole-stage-codegen sum with the
    same sequential accumulation order as the :func:`cosine_with_norms`
    fold — bit-identical doubles, ~7× per pair. Measured on a
    degenerate one-bucket corpus (5k 16-dim byte histograms → 12.5M
    candidate pairs): 18.5 → 2.7 s. When False, the array rides the
    join and the dot is the interpreted fold. The flat plan pays a
    FIXED plan/codegen cost that grows with ``dim`` (2·dim extra
    projections + a dim-term generated method): at 64-dim on the
    2k-row embeddings table that fixed cost is ~1.6 s against
    near-zero pair work — a measured 0.58 → 2.21 s regression — so
    ``None`` (default) picks flat iff ``dim <= 32``. The real
    criterion is pair volume, which isn't known before the join;
    callers expecting a dense bucket at high dim should pass True.
    (This refines the round-4 ``element_at``-unrolling negative
    result: that experiment kept the ARRAY through the join and paid
    per-term null/bounds checks — flat columns have no array access;
    what remains against unrolling is the fixed codegen cost.)
    """
    from capital.io import right_size_narrow
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join, plain_by_hint

    if flat_pair_dot is None:
        flat_pair_dot = int(dim) <= 32
    planes = hyperplanes(dim, n_planes)
    n_rows = vectors.count()  # also sizes the fan-out (metadata-cheap)
    if flat_pair_dot:
        vec_cols = [
            F.element_at(F.col(vec_col), i).alias(f"__e{i}")
            for i in range(1, int(dim) + 1)
        ]
        payload = [f"__e{i}" for i in range(1, int(dim) + 1)] + ["nrm"]
    else:
        vec_cols = [F.col(vec_col)]
        payload = [vec_col, "nrm"]
    keyed = right_size_narrow(vectors, n_rows=n_rows).select(
        F.col(id_col),
        *vec_cols,
        _norm(F.col(vec_col)).alias("nrm"),
        sign_lsh_key(vec_col, planes).alias("bucket"),
    )
    if not plain_by_hint(n_rows):
        # Skew probe + both join branches reuse the hashed corpus.
        # When the global count already bounds the pair space
        # (plain_by_hint), no probe job runs and the self-join's
        # exchange is reused — persisting would only add an eager
        # materialization job on a micro input.
        keyed = scoped_persist(keyed, scope)
    pairs = chunked_pair_join(
        keyed,
        ["bucket"],
        id_col,
        payload_cols=payload,
        total_rows_hint=n_rows,
    )
    if flat_pair_dot:
        dot = None
        for i in range(1, int(dim) + 1):
            term = F.col(f"__e{i}_a") * F.col(f"__e{i}_b")
            dot = term if dot is None else dot + term
        cos = dot / (F.col("nrm_a") * F.col("nrm_b"))
    else:
        cos = cosine_with_norms(
            F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b"),
            F.col("nrm_a"), F.col("nrm_b"),
        )
    return (
        pairs.withColumn("cosine_sim", cos)
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round("cosine_sim", 6).alias("cosine_sim"),
        )
    )


#: Hard ceiling on the GEMM path's driver-side query collect. 64k
#: queries × 1 KB/vector ≈ 64 MB on the driver and the same again
#: broadcast per executor — the regime where the broadcast-matrix
#: design stops being the right tool. Larger query sets should use
#: :func:`lsh_bucket_topk` (both sides distributed).
MAX_GEMM_QUERIES = 65_536


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_GEMM_QUERIES,
) -> DataFrame:
    """Vectorized twin of :func:`cosine_topk`: one numpy GEMM per Arrow
    batch against the broadcast query matrix, then the same windowed
    top-k.

    Why it exists: Catalyst higher-order functions (zip_with/aggregate)
    evaluate their lambda per element *interpreted* — they never enter
    whole-stage codegen — so the expression form pays ~100 ns/element.
    A mapInPandas stage turns each Arrow batch into a (batch × dim) @
    (dim × queries) matrix multiply at BLAS speed. Same shuffle
    profile as the expression form (corpus scan + per-query window);
    only the kernel changes. Measured at sf0.1 (2k-vector corpus):
    1.8× overall at 512 queries and ~4× on marginal per-query cost
    (expr +1.05 ms/query vs GEMM +0.25 ms/query) — fixed Python-worker
    overhead hides the win below ~100 queries, and the gap widens with
    |queries| × |corpus| × dim.

    The expression form remains the *oracle-checked* path (bit-exact
    sequential accumulation); this is the throughput path. Equivalence
    within float tolerance is pinned in tests/test_ivf.py-style recall
    tests (tests/test_arrow_sim.py).
    """
    from capital.io import parallelize_narrow

    # Deliberate driver-side collect: the query matrix ships to every
    # Arrow worker as a broadcast closure. Guarded so an oversized
    # query set fails loudly here instead of OOMing the driver mid-job.
    q_rows = (
        queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk_arrow collects the query set to the driver; "
            f"got >{max_queries} queries. Use lsh_bucket_topk (fully "
            f"distributed) for large query sets, or raise max_queries "
            f"deliberately."
        )
    q_ids = [r[0] for r in q_rows]
    q_mat = [list(map(float, r[1])) for r in q_rows]

    out_schema = (
        "query_id long, neighbor_id long, cosine_sim double"
    )

    def _score(batches):
        import numpy as np
        import pandas as pd

        qm = np.asarray(q_mat, dtype=np.float64)  # (Q, D)
        qn = np.linalg.norm(qm, axis=1)
        qn[qn == 0] = 1.0
        qids = np.asarray(q_ids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                # An empty Arrow batch would make cm shape (0,) and the
                # matmul raise; yield nothing instead.
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # (B, D)
            cn = np.linalg.norm(cm, axis=1)
            cn[cn == 0] = 1.0
            sims = (cm @ qm.T) / np.outer(cn, qn)  # (B, Q)
            b, q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, b),
                    "neighbor_id": np.tile(ids, q),
                    "cosine_sim": sims.T.ravel(),
                }
            )

    scored = (
        parallelize_narrow(corpus)
        .select(id_col, vec_col)
        .mapInPandas(_score, schema=out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
        )
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(v_i/s * 127)
    with s = max|v_i| — the standard compressed-ANN storage format (4×
    smaller vectors → 4× less scan, shuffle, and broadcast at 100 TB;
    Lloyd-free, so no training pass and fully deterministic).

    Emits ``qvec`` (array<int> in [-127, 127]) and ``qscale`` (double).
    Cosine needs no dequantization — the per-vector scales cancel — so
    downstream search runs on exact integer dot products. Replicable in
    any SQL engine: round() is half-away-from-zero on both Spark and
    DuckDB, and the int arithmetic is exact.
    """
    v = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)
    )
    q = F.transform(v, lambda x: F.round(x / scale * 127).cast("int"))
    return df.select(
        F.col(id_col), q.alias("qvec"), scale.alias("qscale")
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (long accumulator — 64 dims of
    127×127 products is far under 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search over int8-quantized vectors.

    Same plan shape as :func:`cosine_topk` (queries broadcast, one
    corpus scan, per-query window) but the score is computed from
    integer dot products: cos_q = dot(qa, qb) / (‖qa‖·‖qb‖) — the
    quantization scales cancel. Exact given the quantized vectors, so
    the whole path is integer-deterministic until the final division.
    """
    from capital.io import parallelize_narrow

    q = quantize_int8(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_q")
    )
    c = quantize_int8(
        parallelize_narrow(corpus), id_col, vec_col
    ).select(F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("q_c"))
    sim = _int_dot(F.col("q_q"), F.col("q_c")) / (
        F.sqrt(_int_dot(F.col("q_q"), F.col("q_q")))
        * F.sqrt(_int_dot(F.col("q_c"), F.col("q_c")))
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("qcos", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("qcos", 6).alias("qcos"),
        )
    )
