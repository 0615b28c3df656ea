"""Time-series regularization (operators/resample.py): dense spine,
LOCF semantics, gap bounding, per-key independence."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from capital.operators.resample import regularize_daily


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "k string, d date, v double"
    )


def _d(s):
    return datetime.date.fromisoformat(s)


def test_regularize_fills_gaps_locf(spark):
    rows = [
        ("A", _d("2024-01-01"), 10.0),
        ("A", _d("2024-01-04"), 20.0),
    ]
    out = {
        r.date.isoformat(): r
        for r in regularize_daily(_obs(spark, rows), "k", "d", "v").collect()
    }
    assert sorted(out) == [f"2024-01-0{i}" for i in range(1, 5)]
    assert [out[f"2024-01-0{i}"].v for i in range(1, 5)] == [
        10.0, 10.0, 10.0, 20.0,
    ]
    assert [out[f"2024-01-0{i}"].gap_days for i in range(1, 5)] == [0, 1, 2, 0]
    assert [out[f"2024-01-0{i}"].is_observed for i in range(1, 5)] == [
        True, False, False, True,
    ]


def test_regularize_max_gap_nulls_stale_carries(spark):
    rows = [
        ("A", _d("2024-01-01"), 10.0),
        ("A", _d("2024-01-05"), 20.0),
    ]
    out = {
        r.date.isoformat(): r.v
        for r in regularize_daily(
            _obs(spark, rows), "k", "d", "v", max_gap_days=1
        ).collect()
    }
    assert out == {
        "2024-01-01": 10.0,
        "2024-01-02": 10.0,   # gap 1 — still carried
        "2024-01-03": None,   # gap 2 — too stale
        "2024-01-04": None,
        "2024-01-05": 20.0,
    }


def test_regularize_same_day_duplicates_take_max(spark):
    rows = [
        ("A", _d("2024-01-01"), 10.0),
        ("A", _d("2024-01-01"), 30.0),
        ("A", _d("2024-01-02"), 5.0),
    ]
    out = sorted(
        (r.date.isoformat(), r.v)
        for r in regularize_daily(_obs(spark, rows), "k", "d", "v").collect()
    )
    assert out == [("2024-01-01", 30.0), ("2024-01-02", 5.0)]


def test_regularize_keys_independent_and_layout_invariant(spark):
    rows = [
        ("A", _d("2024-01-01"), 1.0),
        ("A", _d("2024-01-03"), 2.0),
        ("B", _d("2024-02-10"), 9.0),
    ]
    df = _obs(spark, rows)
    a = sorted(map(tuple, regularize_daily(df, "k", "d", "v").collect()))
    b = sorted(
        map(tuple, regularize_daily(df.repartition(5), "k", "d", "v").collect())
    )
    assert a == b
    keys = {t[0] for t in a}
    assert keys == {"A", "B"}
    # B's spine is one day — its own span, not A's.
    assert sum(1 for t in a if t[0] == "B") == 1


# --- OHLC daily candles ---------------------------------------------------


def test_ohlc_daily_hand_computed(spark):
    import datetime as dt

    from capital.operators.resample import ohlc_daily

    rows = [
        ("T", dt.datetime(2024, 1, 1, 9, 0), 1, 10.0),
        ("T", dt.datetime(2024, 1, 1, 12, 0), 2, 30.0),
        ("T", dt.datetime(2024, 1, 1, 16, 0), 3, 5.0),
        ("T", dt.datetime(2024, 1, 1, 17, 0), 4, 20.0),
        ("T", dt.datetime(2024, 1, 2, 9, 0), 5, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    out = {
        r.date.isoformat(): r
        for r in ohlc_daily(df, "k", "ts", "v", "id").collect()
    }
    d1 = out["2024-01-01"]
    assert (d1.open, d1.high, d1.low, d1.close) == (10.0, 30.0, 5.0, 20.0)
    assert d1.n_ticks == 4 and d1.turnover == 65.0
    d2 = out["2024-01-02"]
    assert (d2.open, d2.high, d2.low, d2.close) == (7.0, 7.0, 7.0, 7.0)


def test_ohlc_daily_same_timestamp_tiebreak_on_id(spark):
    """Two ticks at the identical timestamp: open is the lower id,
    close the higher — partition layout must not matter."""
    import datetime as dt

    from capital.operators.resample import ohlc_daily

    t = dt.datetime(2024, 1, 1, 9, 0)
    rows = [("T", t, 2, 99.0), ("T", t, 1, 11.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    for frame in (df, df.repartition(4)):
        r = ohlc_daily(frame, "k", "ts", "v", "id").collect()[0]
        assert (r.open, r.close) == (11.0, 99.0)
