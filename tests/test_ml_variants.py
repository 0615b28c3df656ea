from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capital.llm.ml_variants import (
    HAS_ML,
    ml_minhash_neardup_pairs,
    tfidf_features,
)

pytestmark = pytest.mark.skipif(not HAS_ML, reason="pyspark.ml unavailable")


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, "spark shuffles partitions across the cluster executors"),
        ],
        "doc_id long, text string",
    )


def test_ml_minhash_finds_known_neardups(spark):
    pairs = ml_minhash_neardup_pairs(
        _docs(spark), max_jaccard_distance=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found  # identical docs
    assert (1, 3) in found or (2, 3) in found  # one-word edit
    assert not any(4 in p for p in found)  # unrelated doc excluded


def test_tfidf_features_shape(spark):
    feats = tfidf_features(_docs(spark))
    rows = feats.collect()
    assert {r.doc_id for r in rows} == {1, 2, 3, 4}
    # Identical docs → identical vectors; distinct docs → different.
    by_id = {r.doc_id: r.tfidf for r in rows}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
