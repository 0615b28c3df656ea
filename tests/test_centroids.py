"""Prototype-distance pruning (llm/centroids.py): exact centroid
values, planted-outlier selection, and the broadcast/no-corpus-shuffle
plan properties."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from capital.llm.centroids import (
    label_centroids,
    prototype_prune,
    prototype_scores,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_centroid_exact_mean(spark):
    df = _df(
        spark,
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [3.0, 2.0]),
            (3, 1, [0.0, 4.0]),
        ],
    )
    cen = {r.label: r.centroid for r in label_centroids(df).collect()}
    assert cen[0] == pytest.approx([2.0, 1.0])
    assert cen[1] == pytest.approx([0.0, 4.0])


def test_planted_outlier_pruned_first(spark):
    # Label 0: a tight cluster along +x plus one vector along +y —
    # the outlier must rank 1 (lowest cosine to the prototype).
    rows = [(i, 0, [10.0, float(i % 3)]) for i in range(1, 9)]
    rows.append((99, 0, [0.0, 10.0]))
    pruned = prototype_prune(_df(spark, rows), k=1).collect()
    assert len(pruned) == 1
    assert pruned[0].vec_id == 99
    assert pruned[0].rank == 1


def test_scores_bounded_and_typical_rows_high(spark):
    rows = [(i, 0, [5.0, 0.1 * i]) for i in range(1, 6)]
    scores = prototype_scores(_df(spark, rows)).collect()
    assert all(-1.0 <= r.proto_cos <= 1.0 for r in scores)
    assert all(r.proto_cos > 0.99 for r in scores)


def test_plan_broadcasts_centroids_no_corpus_shuffle(spark, sf_dir):
    from capital.io import load_table

    spark.catalog.clearCache()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prototype_prune(
            load_table(spark, sf_dir, "embeddings"), k=5
        ).explain("formatted")
    plan = buf.getvalue()
    # The labels×dim centroid table broadcasts into the corpus scan;
    # the corpus relation itself is never exchanged for the score
    # (the only exchanges feed the centroid partial aggregate and the
    # tiny per-label window).
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
