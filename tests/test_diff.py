"""Snapshot diff (operators/diff.py): status classification, null-safe
change detection, changed-column naming, delta-only output."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.operators.diff import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, price double, qty int")


def test_snapshot_diff_classifies_all_statuses(spark):
    old = _snap(spark, [(1, 10.0, 1), (2, 20.0, 2), (3, 30.0, 3)])
    new = _snap(spark, [(2, 20.0, 2), (3, 33.0, 3), (4, 40.0, 4)])
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {1, 3, 4}  # unchanged key 2 dropped
    assert out[1].diff_status == "removed" and out[1].changed_cols == []
    assert out[4].diff_status == "added" and out[4].changed_cols == []
    assert out[3].diff_status == "changed"
    assert out[3].changed_cols == ["price"]
    full = {
        r.k: r.diff_status
        for r in snapshot_diff(
            old, new, ["k"], include_unchanged=True
        ).collect()
    }
    assert full[2] == "unchanged"


def test_snapshot_diff_null_safe_and_multi_column(spark):
    old = spark.createDataFrame(
        [(1, None, 1), (2, 5.0, 2)], "k long, price double, qty int"
    )
    new = spark.createDataFrame(
        [(1, 9.0, 9), (2, None, 2)], "k long, price double, qty int"
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1].changed_cols == ["price", "qty"]  # declaration order
    assert out[2].changed_cols == ["price"]  # value -> null is a change


def test_snapshot_diff_compare_cols_subset(spark):
    old = _snap(spark, [(1, 10.0, 1)])
    new = _snap(spark, [(1, 10.0, 99)])
    assert (
        snapshot_diff(old, new, ["k"], compare_cols=["price"]).count() == 0
    )
    out = snapshot_diff(old, new, ["k"], compare_cols=["qty"]).collect()
    assert out[0].diff_status == "changed" and out[0].changed_cols == ["qty"]
