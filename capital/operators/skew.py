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


#: Decomposable aggregates: phase-1 builder and phase-2 combiner.
#: (count partials merge with SUM; avg must be decomposed by the
#: caller into a sum and a count.)
_SALTED_FNS: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c if c is not None else F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    Phase 1 groups on (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials on
    the true keys with the combiner that matches each aggregate
    (sum/count→SUM of partials, min→MIN, max→MAX).

    ``aggs`` maps output name → ("sum"|"count"|"min"|"max", column);
    the column may be None for count(*).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _SALTED_FNS:
            raise ValueError(
                f"salted_agg: {name!r} uses {fn!r}; supported: "
                f"{sorted(_SALTED_FNS)} (decompose avg into sum+count)"
            )
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _SALTED_FNS[fn][0](col).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _SALTED_FNS[fn][1](f"__p_{name}").alias(name)
            for name, (fn, _col) in aggs.items()
        ]
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
