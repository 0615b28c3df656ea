"""Skew-mitigation operators for hot keys at cluster scale.

AQE's skew-join splitting (on by default, capital.session) handles
most skew at runtime. These operators cover the cases AQE cannot:
skewed **aggregations** (one reducer owns the hot key) and skewed
joins where the build side must be replicated.

Salting trades one extra (cheap, well-distributed) partial shuffle for
eliminating the straggler task — the classic two-phase aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    Phase 1 groups on (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials on
    the true keys. ``aggs`` maps output name → *mergeable* aggregate
    expression over phase-1 columns (sum/count/min/max; avg must be
    decomposed by the caller into sum+count).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    merge = {
        name: F.sum(f"__p_{name}")
        if "count" in name or "sum" in name or "n_" in name
        else F.max(f"__p_{name}")
        for name in aggs
    }
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge.items()]
    )


def salted_broadcast_left_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof fact↔dim join: salt the fact side, replicate the dim
    side once per salt bucket, join on (key, salt).

    Use when the dim is too large to broadcast outright but a hot fact
    key would overload one sort-merge partition. Replication factor is
    ``salt_buckets`` on the *small* side only.
    """
    salted_facts = facts.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_facts.join(replicated_dim, [on, "__salt"], "left").drop(
        "__salt"
    )
