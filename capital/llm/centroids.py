"""Prototype-distance data pruning over embedding columns
(Sorscher et al. 2022, "Beyond neural scaling laws": the SSL
self-supervised prototype metric — distance to a cluster prototype
ranks example difficulty/typicality; pruning the most atypical tail
beats random subsampling at scale).

Engine twin: the ``label`` column plays the cluster assignment (any
grouping — k-means cell, source domain, IVF cell — slots in), the
prototype is the EXACT per-label centroid, and the prune candidates
are the bottom-k rows per label by cosine-to-prototype.

Shape (all Catalyst):

1. **Centroid fit**: positional explode of the vector column →
   ``(label, pos)`` mean aggregate. Map-side partial aggregation
   reduces the shuffle to ``labels × dim × partitions`` partial rows
   — never corpus-sized; components accumulate as DECIMAL(28,6)
   (order-independent float parity, the repo's never-SUM-raw-doubles
   discipline) and reassemble into an ordered array per label.
2. **Score**: the ``labels × dim`` centroid table **broadcasts**
   into the corpus scan — the cosine is a narrow per-row fold
   (sequential accumulation, matching the SQL twin's ``list_sum``
   order; see ``llm/similarity.py`` for why folds beat unrolled
   dots in composed plans).
3. **Prune**: bottom-k per label via a per-label window on the
   ROUNDED score (both engines rank the identical 6-decimal value;
   ties break on vec_id).

At 100 TB: one explode-aggregate pass (partials bounded by
labels×dim), one broadcast, zero corpus-sized shuffles. The centroid
table is the fitted artifact — persist it and scoring a new pool is
a single broadcast-join pass (the stored-index pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_centroids(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact per-group mean vector: ``(group_col, centroid)`` with
    ``centroid`` an array<double> in component order. Component means
    accumulate as DECIMAL(28,6) so partial-aggregation order cannot
    diverge from the SQL twin."""
    from capital.io import parallelize_narrow
    from capital.queries.registry import decimal_avg

    ex = parallelize_narrow(emb).select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    comp = ex.groupBy(group_col, "pos").agg(
        decimal_avg(F.col("v").cast("double"), "c")
    )
    return comp.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s.getField("c"),
        ).alias("centroid")
    )


def prototype_scores(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine of every row to its group's prototype:
    ``(id_col, group_col, proto_cos)`` with proto_cos rounded to 6
    (the sim-family precedent: round(…, 6) absorbs last-ulp
    accumulation differences between the fold and ``list_sum``)."""
    from capital.llm.similarity import cosine

    cen = label_centroids(emb, group_col, vec_col)
    return (
        emb.join(F.broadcast(cen), group_col)
        .select(
            id_col,
            group_col,
            F.round(cosine(F.col(vec_col), F.col("centroid")), 6).alias(
                "proto_cos"
            ),
        )
    )


def prototype_prune(
    emb: DataFrame,
    k: int,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The bottom-``k`` most-atypical rows per group — the prune
    candidates. Deterministic: ranks the rounded score, ties break on
    ``id_col``. Returns ``(group_col, id_col, proto_cos, rank)``."""
    w = Window.partitionBy(group_col).orderBy(
        F.col("proto_cos").asc(), F.col(id_col).asc()
    )
    return (
        prototype_scores(emb, group_col, vec_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, id_col, "proto_cos", "rank")
    )
