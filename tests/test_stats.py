"""Grouped deterministic stats (operators/stats.py): Pearson from
decimal moments, equal-frequency quantile binning."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capital.operators.stats import grouped_pearson, quantile_bins


def test_pearson_perfect_and_anti_correlation(spark):
    rows = [("a", float(i), 2.0 * i) for i in range(1, 20)] + [
        ("b", float(i), -3.0 * i + 100) for i in range(1, 20)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_pearson(df, "g", "x", "y").collect()}
    assert out["a"].corr == 1.0 and out["a"].n == 19
    assert out["b"].corr == -1.0


def test_pearson_matches_reference_and_null_on_constant(spark):
    xs = [float((i * 7) % 13) for i in range(50)]
    ys = [x * 0.5 + float((i * 3) % 5) for i, x in enumerate(xs)]
    rows = [("a", x, y) for x, y in zip(xs, ys)] + [
        ("c", float(i), 4.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_pearson(df, "g", "x", "y").collect()}
    import statistics

    want = statistics.correlation(xs, ys)
    # terms quantize at 1e-6 before summing — tolerance well above that
    assert math.isclose(out["a"].corr, want, abs_tol=1e-4)
    assert out["c"].corr is None  # constant y: no variance, no corr


def test_quantile_bins_equal_frequency(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v double"
    )
    out = quantile_bins(df, "v", 4).collect()
    counts = {}
    for r in out:
        counts[r.bin] = counts.get(r.bin, 0) + 1
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}
    by_v = {r.v: r.bin for r in out}
    assert by_v[1.0] == 1 and by_v[100.0] == 4
    assert by_v[25.0] == 1 and by_v[26.0] == 2  # edge 25.75


def test_quantile_bins_ties_collapse_low_and_groups_independent(spark):
    rows = [("a", 5.0)] * 20 + [("b", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_bins(df, "v", 4, group_col="g").collect()
    a_bins = {r.bin for r in out if r.g == "a"}
    assert a_bins == {1}  # all-tied values collapse into bin 1
    b_counts = {}
    for r in out:
        if r.g == "b":
            b_counts[r.bin] = b_counts.get(r.bin, 0) + 1
    assert b_counts == {1: 5, 2: 5, 3: 5, 4: 5}


# --- mutual information ---------------------------------------------------


def test_mutual_information_independent_is_zero(spark):
    """A product distribution: every term ~0."""
    from capital.operators.stats import mutual_information

    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = mutual_information(df, "x", "y").collect()
    assert len(out) == 4
    assert all(abs(r.mi_term) < 1e-9 for r in out)


def test_mutual_information_deterministic_function_gives_entropy(spark):
    """y = f(x) bijective, uniform over 4 values: MI = H(X) = ln 4."""
    import math

    from capital.operators.stats import mutual_information

    rows = [(f"x{i}", f"y{i}") for i in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = mutual_information(df, "x", "y").collect()
    total = sum(r.mi_term for r in out)
    assert math.isclose(total, math.log(4), abs_tol=1e-5)
    assert all(r.p_xy == 0.25 for r in out)


def test_mutual_information_symmetric(spark):
    from capital.operators.stats import mutual_information

    rows = [("a", "p")] * 30 + [("a", "q")] * 10 + [("b", "q")] * 20
    df = spark.createDataFrame(rows, "x string, y string")
    xy = sum(r.mi_term for r in mutual_information(df, "x", "y").collect())
    yx = sum(
        r.mi_term
        for r in mutual_information(
            df.select(F.col("y").alias("x"), F.col("x").alias("y")), "x", "y"
        ).collect()
    )
    assert abs(xy - yx) < 1e-9 and xy > 0.01


def test_pairwise_correlation_matches_hand_computed(spark):
    """Three aligned series: A and B perfectly correlated, C
    anti-correlated with A; D overlaps A on only two keys (pairwise
    deletion) — constant over that overlap, so corr is null."""
    import math

    rows = []
    for k in range(1, 6):
        rows += [
            (k, "A", float(k)),
            (k, "B", 2.0 * k + 1.0),
            (k, "C", -3.0 * k),
        ]
    rows += [(1, "D", 7.0), (2, "D", 7.0)]
    df = spark.createDataFrame(rows, "k long, series string, v double")
    from capital.operators.stats import pairwise_correlation

    out = {
        (r.series_a, r.series_b): r
        for r in pairwise_correlation(df, "k", "series", "v").collect()
    }
    assert set(out) == {
        ("A", "B"), ("A", "C"), ("B", "C"), ("A", "D"), ("B", "D"),
        ("C", "D"),
    }
    assert out[("A", "B")].corr == 1.0 and out[("A", "B")].n == 5
    assert out[("A", "C")].corr == -1.0
    assert out[("B", "C")].corr == -1.0
    # D is constant over its 2-key overlap: zero variance -> null
    assert out[("A", "D")].n == 2 and out[("A", "D")].corr is None
    assert not math.isnan(out[("A", "D")].corr or 0.0)


def test_pairwise_correlation_chunked_equals_plain(spark):
    """Forcing the chunked within-key pair enumeration must not
    change the matrix (a fat cross-section is just a skewed block)."""
    from capital.operators.stats import pairwise_correlation

    rows = [
        (k, f"s{j}", float((k * 7 + j * 3) % 11))
        for k in range(1, 9)
        for j in range(6)
    ]
    df = spark.createDataFrame(rows, "k long, series string, v double")
    plain = sorted(
        map(tuple, pairwise_correlation(
            df, "k", "series", "v", total_rows_hint=48
        ).collect())
    )
    chunked = sorted(
        map(tuple, pairwise_correlation(
            df, "k", "series", "v", chunk_target=2
        ).collect())
    )
    assert plain == chunked and len(plain) == 15  # C(6,2)
