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
    width = F.lit(bucket_days * _DAY)
    p_bucket = F.floor(F.unix_timestamp(F.col(point_col)) / width)
    i_first = F.floor(F.unix_timestamp(F.col(start_col)) / width)
    # Half-open interval: the end instant itself never matches, so the
    # last bucket that can contain a match is floor((end - 1s) / W).
    i_last = F.floor((F.unix_timestamp(F.col(end_col)) - 1) / width)

    bucketed_points = points.withColumn("__bucket", p_bucket)
    bucketed_intervals = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(i_first, F.greatest(i_last, i_first))),
    )
    if broadcast_intervals:
        bucketed_intervals = F.broadcast(bucketed_intervals)
    joined = bucketed_points.join(bucketed_intervals, "__bucket")
    return joined.filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    ).drop("__bucket")
