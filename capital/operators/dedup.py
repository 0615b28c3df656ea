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
