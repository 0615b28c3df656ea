"""Mergeable-sketch rollups (Apache DataSketches via Spark 4 SQL
functions): the pre-aggregation pattern that makes interactive
analytics feasible at 100 TB.

The idea: aggregate raw facts **once** into tiny mergeable sketch
blobs per (partition-key, group) — e.g. one HLL per (day, event_type)
— and answer every later query by merging sketches instead of
rescanning facts:

- distinct users over any date range → ``hll_union_agg`` over the
  range's daily sketches (KBs) instead of a 100 TB rescan;
- "p95 latency last quarter" → merge daily KLL sketches and query the
  quantile.

Error is bounded and configurable (HLL: ~1.04/√2^lgK ≈ 1.6 % at the
default lgK=12; KLL: ~1.7 % rank error at k=200), and sketches are
deterministic for a given input multiset, so rollup-then-merge equals
direct sketching of the union — the invariant the tests pin.

The exact twins live elsewhere in the engine (``a7_distinct_agg``,
``a9_exact_quantiles``); sketches are the scale path when the exact
forms' shuffles get too big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``key_col`` per (day, *group_cols) — the
    materialized rollup a daily job appends to the lake. Map-side
    partial aggregation reduces each task to one sketch blob per group
    before the exchange."""
    return (
        events.withColumn("day", F.to_date(F.col(ts_col)))
        .groupBy("day", *group_cols)
        .agg(
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias(
                "distinct_sketch"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def rollup_distinct(
    sketches: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Merge daily sketches up to ``group_cols`` and estimate distinct
    counts. Input is the (tiny) rollup table, not the facts — this is
    the query that replaces a full rescan."""
    return (
        sketches.groupBy(*group_cols)
        .agg(
            F.hll_union_agg(F.col(sketch_col)).alias("merged"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            *group_cols,
            F.hll_sketch_estimate("merged")
            .cast("long")
            .alias("approx_distinct"),
            "n_rows",
        )
    )


def daily_value_sketches(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    k: int = 200,
) -> DataFrame:
    """One KLL(double) quantile sketch of ``value_col`` per (day,
    *group_cols)."""
    return (
        events.filter(F.col(value_col).isNotNull())
        .withColumn("day", F.to_date(F.col(ts_col)))
        .groupBy("day", *group_cols)
        .agg(
            F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias(
                "value_sketch"
            )
        )
    )


def rollup_quantiles(
    sketches: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    group_cols: tuple[str, ...] = ("event_type",),
    sketch_col: str = "value_sketch",
) -> DataFrame:
    """Merge daily KLL sketches and read quantiles — approximate
    percentiles over any range without touching raw values."""
    # kll_sketch_merge_double is a pairwise scalar merge (no aggregate
    # form): gather each group's daily sketches and fold. Groups hold
    # O(days) KB-sized blobs, so the collect_list stays tiny even when
    # the underlying facts are petabytes — that's the whole point of
    # the rollup.
    merged = (
        sketches.groupBy(*group_cols)
        .agg(F.collect_list(sketch_col).alias("__sks"))
        .withColumn(
            "merged",
            F.aggregate(
                F.slice(
                    "__sks",
                    F.lit(2),
                    F.greatest(F.size("__sks") - 1, F.lit(0)),
                ),
                F.element_at("__sks", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ),
        )
    )
    cols = [
        F.round(
            F.kll_sketch_get_quantile_double(F.col("merged"), F.lit(q)), 6
        ).alias(f"q{int(q * 100)}")
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)


# HLL relative standard deviation at lgK: 1.04 / sqrt(2^lgK); the
# bound-check queries use 3 sigma (≈4.9 % at the default lgK=12).
def hll_rel_bound(lg_k: int = 12, sigmas: float = 3.0) -> float:
    return sigmas * 1.04 / (2.0 ** (lg_k / 2.0))


#: KLL normalized rank error at k=200 is ~1.65 % (99 % confidence);
#: 0.05 is a 3x band.
KLL_RANK_TOL = 0.05


def distinct_rollup_checked(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    lg_k: int = 12,
) -> DataFrame:
    """HLL rollup emitted in oracle-checkable form.

    The sketch estimate itself is engine-specific, but the *claim* the
    sketch makes — "within the documented HLL error bound of the exact
    distinct count" — is checkable: emit the exact count plus a
    ``within_bound`` boolean, and let the oracle compute the exact side
    and assert TRUE. A sketch regression (wrong merge, wrong lgK,
    corrupted blob) flips the boolean and fails the hash compare.
    Sketches are deterministic per input multiset, so this is not
    flaky. The exact twin costs a second fact scan — acceptable for a
    correctness gate; production reads only the rollup.
    """
    est = rollup_distinct(
        daily_distinct_sketches(events, key_col, ts_col, group_cols, lg_k),
        group_cols,
    )
    exact = events.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    bound = hll_rel_bound(lg_k)
    return (
        est.join(exact, list(group_cols))
        .select(
            *group_cols,
            "exact_distinct",
            "n_rows",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(bound) * F.col("exact_distinct")
            ).alias("within_bound"),
        )
    )


def quantile_rollup_checked(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    k: int = 200,
    rank_tol: float = KLL_RANK_TOL,
) -> DataFrame:
    """KLL rollup in oracle-checkable form: exact p50/p95 values (same
    ``percentile`` == ``quantile_cont`` parity as a9) plus booleans
    asserting the merged sketch's quantile estimates sit within the
    documented normalized-rank band. rank(q̂) is measured exactly as
    the ≤-fraction per group; counts divide exactly below 2^53."""
    est = rollup_quantiles(
        daily_value_sketches(events, value_col, ts_col, group_cols, k),
        (0.5, 0.95),
        group_cols,
    )
    v = F.col(value_col)
    nn = events.filter(v.isNotNull())
    pair = F.expr(f"percentile({value_col}, array(0.5, 0.95))")
    return (
        nn.join(est, list(group_cols))
        .groupBy(*group_cols)
        .agg(
            pair[0].alias("median_value"),
            pair[1].alias("p95_value"),
            (F.sum((v <= F.col("q50")).cast("long")) / F.count(F.lit(1)))
            .alias("__r50"),
            (F.sum((v <= F.col("q95")).cast("long")) / F.count(F.lit(1)))
            .alias("__r95"),
        )
        .select(
            *group_cols,
            "median_value",
            "p95_value",
            (F.abs(F.col("__r50") - 0.5) <= rank_tol).alias(
                "p50_within_bound"
            ),
            (F.abs(F.col("__r95") - 0.95) <= rank_tol).alias(
                "p95_within_bound"
            ),
        )
    )


# --- count-min sketch (heavy-hitter / frequency estimation) -------------


def cms_build(
    df: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies (Cormode &
    Muthukrishnan 2005) as a ``depth × width`` COUNT TABLE —
    ``(row, bucket, n)`` rows, ``depth·width`` of them total,
    regardless of corpus size.

    Each key increments one bucket per row (md5 bucket under a
    per-row seed — deterministic, so the sketch is a pure function of
    the input multiset and replays/engine swaps build the identical
    table; the DuckDB oracle reproduces it bit-for-bit). Estimation
    reads ``min_j table[j][bucket_j(key)]`` — an upper bound on the
    true count with error ≤ 2N/width at ~1−(1/2)^depth confidence.

    Scale shape: one narrow ``depth``-way explode, then groupBy on
    (row, bucket) — map-side combine collapses every task to at most
    ``depth·width`` partial rows before the exchange, exactly like
    the HLL/KLL rollups. Merging batches = summing tables
    (:func:`cms_merge`) — associative, so daily sketches roll up."""
    from capital.llm.assemble import hash_bucket

    rows = F.explode(
        F.array(*[F.lit(j) for j in range(depth)])
    ).alias("row")
    keyed = df.select(F.col(key_col).alias("__k")).select("__k", rows)
    bucket = F.lit(None).cast("long")
    for j in reversed(range(depth)):
        bucket = F.when(
            F.col("row") == j,
            hash_bucket(F.col("__k"), f"{seed}{j}", width),
        ).otherwise(bucket)
    return (
        keyed.withColumn("bucket", bucket)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min tables built with the same (depth, width,
    seed): bucket-wise sum — associative and commutative, so
    batch-built sketches equal the at-once build exactly."""
    from functools import reduce

    out = reduce(lambda a, b: a.unionByName(b), sketches)
    return out.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Frequency estimates for the probe keys: ``min`` over the
    ``depth`` bucket counts (0 when a bucket is empty — the key never
    occurred). The sketch is tiny (``depth·width`` rows) and
    broadcasts; probing never touches the original corpus."""
    from capital.llm.assemble import hash_bucket

    rows = F.explode(
        F.array(*[F.lit(j) for j in range(depth)])
    ).alias("row")
    keyed = probes.select(F.col(key_col)).select(key_col, rows)
    bucket = F.lit(None).cast("long")
    for j in reversed(range(depth)):
        bucket = F.when(
            F.col("row") == j,
            hash_bucket(F.col(key_col), f"{seed}{j}", width),
        ).otherwise(bucket)
    return (
        keyed.withColumn("bucket", bucket)
        .join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
    )
