"""Ordered funnel conversion (operators/funnel.py): order
enforcement, earliest-completion semantics, drop-off arithmetic."""

from __future__ import annotations

from capital.operators.funnel import funnel_conversion, funnel_times


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_enforces_event_order(spark):
    from datetime import datetime as dt

    rows = [
        # u1: clean view -> click -> purchase
        (1, "view", dt(2024, 1, 1, 10)),
        (1, "click", dt(2024, 1, 1, 11)),
        (1, "purchase", dt(2024, 1, 1, 12)),
        # u2: purchase BEFORE view/click chain -> stops at click
        (2, "purchase", dt(2024, 1, 1, 9)),
        (2, "view", dt(2024, 1, 1, 10)),
        (2, "click", dt(2024, 1, 1, 11)),
        # u3: view only
        (3, "view", dt(2024, 1, 1, 10)),
        # u4: click/purchase but never viewed -> not in funnel at all
        (4, "click", dt(2024, 1, 1, 10)),
        (4, "purchase", dt(2024, 1, 1, 11)),
    ]
    t = {
        r.user_id: r
        for r in funnel_times(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert set(t) == {1, 2, 3}
    assert t[1].t3 is not None
    assert t[2].t2 is not None and t[2].t3 is None
    assert t[3].t2 is None and t[3].t3 is None

    conv = {
        r.step: r
        for r in funnel_conversion(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert conv["view"].n_users == 3
    assert conv["click"].n_users == 2
    assert conv["purchase"].n_users == 1
    assert abs(conv["purchase"].conv_from_first - round(1 / 3, 6)) < 1e-9
    assert conv["purchase"].conv_from_prev == 0.5


def test_funnel_same_timestamp_counts_as_ordered(spark):
    """ts >= prev: a step completed at the exact same instant as the
    previous step's earliest completion still converts (the standard
    at-or-after convention)."""
    from datetime import datetime as dt

    rows = [
        (1, "view", dt(2024, 1, 1, 10)),
        (1, "click", dt(2024, 1, 1, 10)),
    ]
    t = funnel_times(_events(spark, rows), ["view", "click"]).collect()
    assert t[0].t2 is not None
