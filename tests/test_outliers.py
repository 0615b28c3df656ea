"""Robust MAD outliers (operators/outliers.py): hand-computed scores,
masking resistance vs mean/stddev, zero-MAD degenerate groups."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capital.operators.outliers import MAD_CONSISTENCY, mad_outliers


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def test_mad_outliers_hand_computed(spark):
    """values 1..7 plus a 100.0 spike: median 4.5, MAD 2.0 — the spike
    scores (95.5)/(1.4826*2) ≈ 32.2, nothing else crosses 3.5."""
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    out = mad_outliers(_df(spark, [("a", v) for v in vals]), "g", "v")
    rows = {r.v: r for r in out.collect()}
    assert rows[100.0].is_outlier
    assert sum(r.is_outlier for r in rows.values()) == 1
    want = (100.0 - 4.5) / (MAD_CONSISTENCY * 2.0)
    assert math.isclose(rows[100.0].robust_z, round(want, 6), abs_tol=1e-6)
    assert rows[4.0].group_median == 4.5


def test_mad_resists_masking_where_stddev_fails(spark):
    """Two enormous spikes inflate stddev until neither is 3.5 sigma
    from the mean — the MAD flags both anyway (the estimator's whole
    point)."""
    base = [float(i) for i in range(1, 30)]
    spikes = [1e6] * 4
    df = _df(spark, [("a", v) for v in base + spikes])
    flagged = {
        r.v for r in mad_outliers(df, "g", "v").collect() if r.is_outlier
    }
    assert 1e6 in flagged
    # classical z-score on the same data masks them
    import statistics

    mean = statistics.mean(base + spikes)
    sd = statistics.pstdev(base + spikes)
    assert all(abs(s - mean) / sd < 3.5 for s in spikes)


def test_mad_zero_mad_group_flags_nothing(spark):
    """>half the group at one value => MAD 0 => undefined scores, no
    flags (not everything-flagged)."""
    df = _df(spark, [("a", 5.0)] * 6 + [("a", 9.0)])
    out = mad_outliers(df, "g", "v").collect()
    assert all(not r.is_outlier for r in out)
    assert all(r.robust_z is None for r in out)


def test_mad_groups_independent(spark):
    df = _df(spark, [("a", v) for v in [1.0, 2.0, 3.0, 50.0]]
             + [("b", v) for v in [100.0, 110.0, 120.0]])
    out = mad_outliers(df, "g", "v").collect()
    assert {r.v for r in out if r.is_outlier} == {50.0}
    assert all(r.g == "a" for r in out if r.is_outlier)
