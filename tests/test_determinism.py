"""Determinism under partitioning: order-sensitive-looking queries must
produce identical results regardless of parallelism (the property that
makes them safe on a real cluster where partitioning is arbitrary)."""

from __future__ import annotations

import pytest

from capital.queries import all_queries

_QUERIES = all_queries()

#: Queries whose shape could hide order-sensitivity: hash minima,
#: float accumulation, top-k with ties, window carry-forward.
_RISKY = [
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "q10_returned_items",
    "j1_asof_latest_order",
    "f16_sorted_string_agg",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(repr(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", _RISKY)
def test_result_stable_across_partitioning(spark, sf_dir, name):
    base = _canon(_QUERIES[name](spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try:
        odd = _canon(_QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == odd, name
