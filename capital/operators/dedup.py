"""Relational dedup operators (reference A4 + engine surface).

The reference's only dedup is "first value wins per key" while folding
crawled HTML headers into a dict (reference: dags/brz_bonds_meta_
monthly/extractors.py:44-49). Generalized here; content-based text
dedup for LLM pipelines lives in :mod:`capital.llm.dedup`.

Scale note: all of these are single-shuffle groupBy aggregations with
map-side partial aggregation; ``first_wins`` uses ``min_by`` (an
order-free aggregate) rather than a window + filter, which would cost
a full sort within every partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_wins(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep, per key, each value from the row with the smallest
    ``order_col`` (deterministic "first wins", reference A4).

    ``min_by`` on ``order_col`` alone is nondeterministic when two rows
    tie; pass a unique ``tiebreak_col`` to pin the winner (ordering
    becomes the struct (order_col, tiebreak_col), and all value columns
    come from that single winning row).
    """
    order = (
        F.struct(F.col(order_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(order_col)
    )
    aggs = [F.min_by(c, order).alias(c) for c in value_cols]
    return df.groupBy(*keys).agg(F.min(order_col).alias(order_col), *aggs)


def drop_exact_duplicates(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal — Spark-native hash groupBy."""
    return df.dropDuplicates(subset)


def fuzzy_key_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    prefix_len: int = 15,
    max_dist: int = 1,
) -> DataFrame:
    """Entity-resolution pairs by edit distance: ids whose keys are
    within ``max_dist`` Levenshtein edits (near-identical tickers,
    typo'd entity names — the fuzzy-join complement to the exact
    first_wins dedup).

    Prefix blocking (first ``prefix_len`` chars) bounds the pair space
    like the SimHash prefix variant, with the same documented recall
    tradeoff: pairs differing inside the prefix are missed — run over
    rotated prefixes for full recall. The block self-join routes
    through :func:`capital.operators.skew.chunked_pair_join`, so one
    dominant prefix (fixed-format keys sharing a long constant head)
    cannot put its quadratic pair space on one task; the exact
    Levenshtein filter touches only blocked candidates.
    """
    from capital.operators.skew import chunked_pair_join

    keyed = df.select(
        F.col(id_col),
        F.col(key_col),
        F.substring(F.col(key_col), 1, prefix_len).alias("block"),
    )
    # Thresholded levenshtein (Spark 3.5+) runs the banded O(d·n)
    # algorithm and returns -1 past the bound — the candidate filter is
    # the hot loop, so the early exit matters at corpus scale.
    return (
        chunked_pair_join(keyed, ["block"], id_col, payload_cols=[key_col])
        .withColumn(
            "edit_dist",
            F.levenshtein(
                F.col(f"{key_col}_a"), F.col(f"{key_col}_b"), max_dist
            ),
        )
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )


def _deletion_variants(key: str) -> str:
    """SQL for the single-deletion closure of array column ``key``:
    every string obtainable by deleting exactly one character from any
    element, unioned with the input (so applying it j times yields the
    ≤j-deletion neighborhood)."""
    return f"""
    array_distinct(concat({key}, flatten(transform({key}, v ->
      transform(sequence(1, greatest(length(v), 1)), i ->
        concat(substring(v, 1, i - 1),
               substring(v, i + 1, length(v) - i)))))))
    """


def fuzzy_fullrecall_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance pairs with ZERO false negatives — the full-recall
    twin of :func:`fuzzy_key_pairs`, via deletion-neighborhood blocking
    (FastSS, Bocek et al. 2007; the same construction SymSpell uses).

    Soundness: take an optimal alignment of a pair within ``max_dist``
    edits and delete each side's non-matched positions (≤ ``max_dist``
    of them per side) — the surviving matched characters are identical
    strings. So every true pair shares at least one member of the
    ≤\\ ``max_dist``-deletion neighborhoods, and blocking on every
    variant misses nothing; the thresholded-levenshtein verify drops
    the false candidates.

    Why not segment pigeonhole (the SimHash-fullrecall construction):
    contiguous segments are worthless under a shared constant prefix —
    on ``Customer#...``-style keys every row collides on segment 0 and
    the candidate set degenerates to all O(n²) pairs (measured: >10 min
    at 15k keys). A deletion variant is the *whole key* minus
    ``max_dist`` characters, so it stays discriminative no matter how
    much constant structure keys share; hot variants (true duplicate
    clusters) still bound per-task via
    :func:`capital.operators.skew.chunked_pair_join`.

    Cost: ~``len^max_dist`` variant rows per key — the right trade for
    entity keys (tickers, names, codes ≤ ~64 chars) at ``max_dist`` 1-2.
    ``max_dist`` > 2 is rejected: the neighborhood explodes cubically
    and segment blocking (per-family) is the better tool there. The
    variant self-join shuffles (variant, id) rows only; keys re-attach
    after the id-pair dedup.
    """
    from capital.operators.skew import chunked_pair_join

    if max_dist > 2:
        raise ValueError(
            f"max_dist={max_dist}: deletion neighborhoods grow as "
            "len^max_dist; use <=2 (FastSS regime) or block by family"
        )
    keyed = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__key")
    )
    variants = "array(__key)"
    for _ in range(max_dist):
        variants = _deletion_variants(variants)
    exploded = keyed.select(
        F.col("__id"), F.explode(F.expr(variants)).alias("__variant")
    )
    cand = (
        chunked_pair_join(exploded, ["__variant"], "__id")
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(
            keyed.select(
                F.col("__id").alias("id_a"), F.col("__key").alias("__ka")
            ),
            "id_a",
        )
        .join(
            keyed.select(
                F.col("__id").alias("id_b"), F.col("__key").alias("__kb")
            ),
            "id_b",
        )
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("__ka"), F.col("__kb"), max_dist),
        )
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )
