"""pyspark.ml-backed variants of the dedup/similarity operators.

The hand-rolled md5 constructions in :mod:`capital.llm.dedup` exist for
engine-portable determinism (DuckDB-checkable oracles). These variants
are the ``pyspark.ml`` library path (SURVEY.md §7 step 9) — JVM-side
feature transformers + the built-in ``MinHashLSH`` approx join — for
users who prefer the ML-pipeline API and don't need cross-engine
reproducibility. Both paths share the same blocking structure, so
either scales the same way.

Gated behind import so environments without pyspark.ml/numpy degrade
gracefully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import (
        HashingTF,
        IDF,
        MinHashLSH,
        RegexTokenizer,
    )

    HAS_ML = True
except ImportError:  # pragma: no cover
    HAS_ML = False


def _require_ml() -> None:
    if not HAS_ML:
        raise ImportError("pyspark.ml unavailable in this environment")


def ml_minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 16,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via ``pyspark.ml`` MinHashLSH approx similarity
    join (token-set features; distance = 1 − Jaccard)."""
    _require_ml()
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+"
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__features",
        numFeatures=num_features, binary=True,
    )
    feats = tf.transform(tok.transform(df)).filter(
        # MinHashLSH requires at least one non-zero feature.
        F.size("__toks") > 0
    )
    lsh = MinHashLSH(
        inputCol="__features", outputCol="__hashes",
        numHashTables=num_hash_tables, seed=42,
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        pairs.filter(
            F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}")
        )
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1 - F.col("jaccard_distance"), 6).alias("est_jaccard"),
        )
    )


def tfidf_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
) -> DataFrame:
    """TF-IDF document vectors (tokenize → hashed TF → IDF), the
    classical text-analysis representation for clustering/retrieval."""
    _require_ml()
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__toks", pattern=r"\s+"
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="__tf", numFeatures=num_features
    )
    tfd = tf.transform(tok.transform(df))
    idf = IDF(inputCol="__tf", outputCol="tfidf").fit(tfd)
    return idf.transform(tfd).select(id_col, "tfidf")
