"""Range (interval) join: points matched to time intervals without a
quadratic nested loop.

Spark has no native band/interval join strategy; a naive non-equi join
plans as BroadcastNestedLoopJoin (fine for a tiny side, catastrophic
for fact×fact). The scalable construction is *bucketing*:

1. pick a bucket width W comparable to the typical interval length;
2. each point lands in exactly one bucket (floor(t / W));
3. each interval is replicated to every bucket it overlaps —
   ceil(len/W)+1 rows, a small constant when W ≈ interval length;
4. equi-join on the bucket key (ordinary shuffled/broadcast hash
   join), then apply the exact range predicate as a residual filter.

Shuffle cost is O(points + intervals × buckets_per_interval) on a
dense integer key — never O(points × intervals). Each matching
(point, interval) pair meets in exactly one bucket (the point's), so
no post-join dedup is needed. This is the same blocking idea the
engine uses for LSH (hash buckets) and SimHash (prefix blocks),
applied to the time axis; interval-overlap variants appear in e.g.
Flink's and Trino's band-join rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DAY = 86400


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 30,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` where
    ``start <= point < end`` (half-open, the streaming-window
    convention).

    ``points`` and ``intervals`` must have disjoint column names.
    ``end - start`` may span any number of buckets; pick
    ``bucket_days`` near the typical interval length so replication
    stays ~2×.

    Set ``broadcast_intervals=True`` when the interval side is small
    (a sample, a calendar, an alert window list): the bucket key has
    only ``time_range / width`` distinct values, so a shuffled join on
    it caps parallelism at the bucket count and skews hot buckets —
    broadcasting keeps the big point side un-shuffled entirely
    (measured 5× at sf0.1). With two large sides, keep the shuffle and
    let AQE's skew-join splitting handle hot buckets.
    """
    # Buckets are computed from microsecond epochs (full timestamp
    # precision): with second-truncated epochs, an `end` with
    # fractional seconds landing exactly on a bucket boundary would
    # under-replicate the interval and silently drop matches in the
    # final bucket. Long arithmetic throughout — `div` on an exact
    # multiple, never floor(double /), which drifts past 2^53 µs.
    wus = bucket_days * _DAY * 1_000_000

    def floor_div(name: str):
        m = f"((({name} % {wus}) + {wus}) % {wus})"
        return F.expr(f"({name} - {m}) div {wus}")

    def micros(col: str):
        # unix_micros wants TIMESTAMP; DATE / TIMESTAMP_NTZ inputs go
        # through a cast (session tz is pinned UTC by tune_existing —
        # and the bucket key only needs a *consistent* epoch mapping
        # across both sides, the residual filter is exact).
        return F.unix_micros(F.col(col).cast("timestamp"))

    bucketed_points = (
        points.withColumn("__ep", micros(point_col))
        .withColumn("__bucket", floor_div("__ep"))
        .drop("__ep")
    )
    # Half-open interval: the end instant itself never matches, so the
    # last bucket that can contain a match is floor((end_µs - 1) / W).
    bucketed_intervals = (
        intervals.withColumn("__s", micros(start_col))
        .withColumn("__e", micros(end_col) - F.lit(1))
        .withColumn("__b0", floor_div("__s"))
        .withColumn("__b1", floor_div("__e"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.col("__b0"), F.greatest(F.col("__b1"), F.col("__b0"))
                )
            ),
        )
        .drop("__s", "__e", "__b0", "__b1")
    )
    if broadcast_intervals:
        bucketed_intervals = F.broadcast(bucketed_intervals)
    joined = bucketed_points.join(bucketed_intervals, "__bucket")
    return joined.filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    ).drop("__bucket")
