"""Property tests (SURVEY.md §5.4): calendar invariants, unpivot
round-trip, dedup idempotence, as-of join vs brute force."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from capital.operators.asof import asof_join, previous_working_day
from capital.operators.calendar import build_calendar
from capital.operators.dedup import drop_exact_duplicates, first_wins
from capital.operators.reshape import pivot_wide, unpivot

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(year=st.integers(min_value=1990, max_value=2100))
@_slow
def test_calendar_invariants(spark, year):
    cal = build_calendar(spark, f"{year}-01-01", f"{year}-12-31").collect()
    is_leap = year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
    assert len(cal) == (366 if is_leap else 365)
    for row in cal:
        # DOW 0=Sunday matches Python's (weekday()+1)%7
        assert row.day_of_week == (row.date.weekday() + 1) % 7
        # weekend ⟺ market holiday (the reference's simplification)
        assert row.is_market_holiday == (row.day_of_week in (0, 6))
        assert row.quarter_id == f"{year}Q{(row.date.month - 1) // 3 + 1}"


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 50),
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(-1e6, 1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
@_slow
def test_unpivot_pivot_roundtrip(spark, rows):
    df = spark.createDataFrame(rows, "id int, a double, b double")
    long = unpivot(df, ["id"], ["a", "b"], "k", "v")
    wide = pivot_wide(long, ["id"], "k", "v", pivot_values=["a", "b"])
    orig = {r.id: (r.a, r.b) for r in df.collect()}
    back = {r.id: (r.a, r.b) for r in wide.collect()}
    assert orig == back


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.text(max_size=5)),
        min_size=1,
        max_size=40,
    )
)
@_slow
def test_first_wins_and_dedup_idempotent(spark, rows):
    # Make (key, order) unique so "first" is well defined.
    seen, uniq = set(), []
    for k, o, v in rows:
        if (k, o) not in seen:
            seen.add((k, o))
            uniq.append((k, o, v))
    df = spark.createDataFrame(uniq, "k int, o int, v string")
    fw = first_wins(df, ["k"], "o", ["v"])
    expected = {}
    for k, o, v in uniq:
        if k not in expected or o < expected[k][0]:
            expected[k] = (o, v)
    got = {r.k: (r.o, r.v) for r in fw.collect()}
    assert got == expected
    # Idempotence: dedup of a dedup is itself.
    dd = drop_exact_duplicates(df)
    assert drop_exact_duplicates(dd).count() == dd.count()


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=20, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(0, 9)),
        min_size=0, max_size=20,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
@_slow
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(left, "k int, t int")
    rdf = spark.createDataFrame(right, "k int, rt int, payload int")
    out = asof_join(
        ldf, rdf, on="k", left_time="t", right_time="rt",
        value_cols=["payload"], allow_exact_match=True,
    )
    got = {(r.k, r.t): r.payload for r in out.collect()}
    for k, t in left:
        cands = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None
        assert got[(k, t)] == expected, (k, t)


def test_previous_working_day_bruteforce(spark):
    cal = build_calendar(spark, "2024-01-01", "2024-03-31")
    rows = {r.date: r for r in previous_working_day(cal).collect()}
    dates = sorted(rows)
    open_days = [d for d in dates if not rows[d].is_market_holiday]
    for d in dates:
        expected = max((o for o in open_days if o < d), default=None)
        assert rows[d].previous_working_day == expected, d
    assert rows[datetime.date(2024, 1, 1)].previous_working_day is None
