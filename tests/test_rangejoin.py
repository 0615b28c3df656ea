"""Bucketed interval-join unit tests: exact boundary semantics and
bucket-replication correctness on hand-built rows, plus a plan audit
(no nested-loop join may appear)."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

from pyspark.sql import functions as F

from capital.operators.rangejoin import point_in_interval_join


def _join(spark, points, intervals, bucket_days=30):
    p = spark.createDataFrame(points, "pid long, t timestamp")
    iv = spark.createDataFrame(intervals, "iid long, s timestamp, e timestamp")
    out = point_in_interval_join(
        p, iv, point_col="t", start_col="s", end_col="e",
        bucket_days=bucket_days,
    )
    return sorted((r.pid, r.iid) for r in out.collect())


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_half_open_boundaries(spark):
    iv = [(1, _ts("2020-01-10 00:00:00"), _ts("2020-01-20 00:00:00"))]
    pts = [
        (1, _ts("2020-01-09 23:59:59")),  # before start -> out
        (2, _ts("2020-01-10 00:00:00")),  # start inclusive -> in
        (3, _ts("2020-01-15 12:00:00")),  # inside -> in
        (4, _ts("2020-01-20 00:00:00")),  # end exclusive -> out
    ]
    assert _join(spark, pts, iv) == [(2, 1), (3, 1)]


def test_interval_spanning_many_buckets_no_duplicates(spark):
    # 100-day interval over 30-day buckets: replicated to 4-5 buckets,
    # but each matching point must appear exactly once.
    iv = [(7, _ts("2020-01-01 00:00:00"), _ts("2020-04-20 00:00:00"))]
    pts = [(i, _ts(f"2020-0{m}-15 00:00:00")) for i, m in enumerate([1, 2, 3, 4])]
    got = _join(spark, pts, iv)
    assert got == [(0, 7), (1, 7), (2, 7), (3, 7)]


def test_overlapping_intervals_all_match(spark):
    iv = [
        (1, _ts("2020-01-01 00:00:00"), _ts("2020-02-01 00:00:00")),
        (2, _ts("2020-01-15 00:00:00"), _ts("2020-03-01 00:00:00")),
    ]
    pts = [(1, _ts("2020-01-20 00:00:00"))]
    assert _join(spark, pts, iv) == [(1, 1), (1, 2)]


def test_fractional_second_end_on_bucket_boundary(spark):
    # Regression: with second-truncated bucket epochs, an interval
    # whose end has fractional seconds just past an exact bucket
    # boundary T was only replicated up to bucket (T-1)/W, silently
    # dropping points in [T, end). Buckets are now microsecond-exact.
    day31 = _ts("2020-01-31 00:00:00")  # 30-day bucket boundary from 2020-01-01
    iv = [(1, _ts("2020-01-20 00:00:00"), day31.replace(microsecond=500_000))]
    pts = [
        (1, day31),  # in [T, end) -> must match
        (2, day31.replace(microsecond=499_999)),  # still < end -> match
        (3, day31.replace(microsecond=500_000)),  # == end, half-open -> out
    ]
    # bucket epoch origin is 1970-01-01; 2020-01-31 is not itself a
    # multiple of 30 days from epoch, so pick width 1 day instead:
    # every midnight is then a bucket boundary.
    assert _join(spark, pts, iv, bucket_days=1) == [(1, 1), (2, 1)]


def test_pre_epoch_points(spark):
    # Negative epochs: floor-division (not truncation) keeps points and
    # intervals in consistent buckets before 1970.
    iv = [(1, _ts("1969-12-01 00:00:00"), _ts("1970-01-15 00:00:00"))]
    pts = [(1, _ts("1969-12-15 06:00:00")), (2, _ts("1970-01-10 00:00:00"))]
    assert _join(spark, pts, iv) == [(1, 1), (2, 1)]


def test_plan_is_hash_join_not_nested_loop(spark):
    p = spark.createDataFrame(
        [(1, _ts("2020-01-01 00:00:00"))], "pid long, t timestamp"
    )
    iv = spark.createDataFrame(
        [(1, _ts("2020-01-01 00:00:00"), _ts("2020-01-05 00:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    df = point_in_interval_join(p, iv, "t", "s", "e")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
