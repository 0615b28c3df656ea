"""Z-order clustering: Morton-key correctness against a Python
reference, and the actual payoff — per-file min/max ranges narrow
enough that multi-column predicates can skip most files."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from capital.operators.zorder import (
    Z_BITS,
    effective_bits,
    with_z_value,
    zorder_write,
)


def _morton(xs: list[int], bits: int = Z_BITS) -> int:
    z = 0
    for j, x in enumerate(xs):
        for i in range(bits):
            z |= ((x >> i) & 1) << (i * len(xs) + j)
    return z


def test_z_value_matches_python_reference(spark):
    # Values chosen so min/max normalization is the identity on
    # [0, 65535] — the interleave itself is what's under test.
    pts = [(0, 0), (65535, 65535), (1, 2), (12345, 54321), (40000, 7)]
    rows = [(i, a, b) for i, (a, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.z_value
        for r in with_z_value(df, ["x", "y"]).select("id", "z_value").collect()
    }
    for i, (a, b) in enumerate(pts):
        assert got[i] == _morton([a, b]), (i, a, b)


def test_z_value_string_dictionary_rank_matches_python(spark):
    """String columns z-order via dictionary dense_rank (broadcast
    join back); the z value must equal the Python Morton key over
    (rank scaled, numeric scaled)."""
    names = ["KRX", "AAPL", "TSLA", "005930.KS", "BTC"]
    rows = [(i, names[i % len(names)], i * 1000) for i in range(25)]
    df = spark.createDataFrame(rows, "id long, ticker string, v long")
    got = {
        r.id: r.z_value
        for r in with_z_value(df, ["ticker", "v"]).select("id", "z_value").collect()
    }
    ranks = {t: i for i, t in enumerate(sorted(set(names)))}
    top = (1 << Z_BITS) - 1
    r_max, v_max = len(ranks) - 1, 24 * 1000

    def scale(x: int, hi: int) -> int:
        return min(max(int(x / hi * top), 0), top)

    for i, t, v in rows:
        expect = _morton([scale(ranks[t], r_max), scale(v, v_max)])
        assert got[i] == expect, (i, t, v)


def test_z_value_date_and_timestamp_proxies(spark):
    """date → epoch days, timestamp(_ntz) → epoch micros; order is
    preserved so the scaled rank equals the numeric twin's."""
    df = spark.createDataFrame(
        [(i, f"2024-01-{i + 1:02d}", i * 10) for i in range(10)],
        "id long, d string, v long",
    ).select(
        "id", F.to_date("d").alias("d"),
        F.to_timestamp(F.col("d")).alias("t"), "v",
    )
    via_date = {
        r.id: r.z_value
        for r in with_z_value(df, ["d", "v"]).select("id", "z_value").collect()
    }
    via_ts = {
        r.id: r.z_value
        for r in with_z_value(df, ["t", "v"]).select("id", "z_value").collect()
    }
    numeric = {
        r.id: r.z_value
        for r in with_z_value(
            df.withColumn("n", F.unix_date("d")), ["n", "v"]
        ).select("id", "z_value").collect()
    }
    assert via_date == numeric
    # Evenly spaced days: micros scaling lands on the same ranks.
    assert via_ts == numeric


def test_z_value_null_string_ranks_lowest(spark):
    df = spark.createDataFrame(
        [(0, None, 5), (1, "a", 5), (2, "b", 5)],
        "id long, s string, v long",
    )
    out = {
        r.id: r.z_value
        for r in with_z_value(df, ["s", "v"]).select("id", "z_value").collect()
    }
    # NULL takes rank 0 — same bucket as the lowest ranked value.
    assert out[0] == out[1] < out[2]


def test_zorder_write_string_column_narrows_ranges(spark, tmp_path):
    """(ticker, day) layout — the reference's key shape. Each z file
    must own a narrow band of the ticker dictionary AND of the day
    range; a hash layout sees ~every ticker in every file."""
    n = 64
    df = spark.range(n * n).select(
        F.format_string("T%03d", (F.col("id") % n).cast("int")).alias(
            "ticker"
        ),
        (F.col("id") / n).cast("long").alias("day"),
    )
    z_path = str(tmp_path / "z")
    zorder_write(df, z_path, ["ticker", "day"], num_files=16)

    spans = []
    ds = pq.ParquetDataset(z_path)
    for frag in ds.fragments:
        md = frag.metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == "ticker" and c.statistics is not None:
                    smin = int(c.statistics.min.lstrip("T"))
                    smax = int(c.statistics.max.lstrip("T"))
                    lo = smin if lo is None else min(lo, smin)
                    hi = smax if hi is None else max(hi, smax)
        if lo is not None:
            spans.append((hi - lo) / (n - 1))
    assert spans
    # 16 z files over a 64x64 (ticker, day) grid: each file's ticker
    # band should cover ~1/4 of the dictionary, far under full range.
    assert sum(spans) / len(spans) < 0.5, spans


def test_z_value_constant_column_is_safe(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(7).alias("c"), (F.col("id") * 3).alias("v")
    )
    out = with_z_value(df, ["c", "v"]).select("z_value").collect()
    assert len(out) == 10  # span=0 branch: rank 0, no divide-by-zero


def test_z_value_monotone_per_axis(spark):
    """Fixing every other coordinate, the Morton key is monotone in
    each remaining coordinate (on the identity-scaled rank domain) —
    the property range predicates rely on for skipping."""
    top = (1 << Z_BITS) - 1
    xs = [0, 1, 7, 255, 4096, 40000, top]
    rows = (
        [(i, x, 12345) for i, x in enumerate(xs)]
        + [(100 + i, 0, x) for i, x in enumerate(xs)]
        + [(200, 0, 0), (201, top, top)]  # pin the scaling bounds
    )
    df = spark.createDataFrame(rows, "id long, x long, y long")
    z = {
        r.id: r.z_value
        for r in with_z_value(df, ["x", "y"]).select("id", "z_value").collect()
    }
    x_series = [z[i] for i in range(len(xs))]
    y_series = [z[100 + i] for i in range(len(xs))]
    assert x_series == sorted(x_series)
    assert y_series == sorted(y_series)


def test_four_column_z_stays_nonnegative(spark):
    """16 bits x 4 cols would reach the sign bit; effective_bits drops
    to 15 and every z value stays non-negative."""
    import pytest

    from capital.operators.zorder import z_interleave

    assert effective_bits(4) == 15
    assert effective_bits(2) == 16
    with pytest.raises(ValueError, match="sign"):
        z_interleave([F.lit(1).cast("long")] * 4, bits=16)

    df = spark.range(100).select(
        F.col("id").alias("a"),
        (F.col("id") * 7 % 100).alias("b"),
        (F.col("id") * 13 % 100).alias("c"),
        (F.col("id") * 31 % 100).alias("d"),
    )
    mn = (
        with_z_value(df, ["a", "b", "c", "d"])
        .agg(F.min("z_value"))
        .collect()[0][0]
    )
    assert mn >= 0


def test_zorder_write_narrows_file_ranges(spark, tmp_path):
    """Cluster a 2-D grid on both axes and compare per-file min/max
    spans against a hash-partitioned layout: the z layout must give
    every file a small bounding box on BOTH columns (that is the data
    skipping), while hash partitioning leaves ~full-range files."""
    n = 128
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )
    z_path = str(tmp_path / "zsorted")
    naive_path = str(tmp_path / "naive")
    zorder_write(df, z_path, ["x", "y"], num_files=16)
    df.repartition(16).write.parquet(naive_path)

    def avg_span_frac(path: str, col: str) -> float:
        spans = []
        ds = pq.ParquetDataset(path)
        for frag in ds.fragments:
            md = frag.metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        smin, smax = c.statistics.min, c.statistics.max
                        lo = smin if lo is None else min(lo, smin)
                        hi = smax if hi is None else max(hi, smax)
            if lo is not None:
                spans.append((hi - lo) / (n - 1))
        assert spans, f"no stats found under {path}"
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        z_span = avg_span_frac(z_path, col)
        naive_span = avg_span_frac(naive_path, col)
        # Hash layout: every file sees ~the full range (span ≈ 1).
        # 16 z-range files over a 2-D grid: each owns ~1/4 of each
        # axis; assert a conservative 2× improvement.
        assert naive_span > 0.9, (col, naive_span)
        assert z_span < naive_span / 2, (col, z_span, naive_span)


def test_string_rank_preserves_lexicographic_order_hypothesis(spark):
    """Property: for ANY set of strings, the single-column z value
    orders exactly like the strings themselves (dictionary dense_rank
    is order-preserving; min/max scaling is monotone)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
        unique=True,
    )

    @given(ks=keys)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def prop(ks):
        df = spark.createDataFrame(
            [(i, k) for i, k in enumerate(ks)], "id long, s string"
        )
        z = {
            r.id: r.z_value
            for r in with_z_value(df, ["s"]).select("id", "z_value").collect()
        }
        order_by_string = sorted(range(len(ks)), key=lambda i: ks[i])
        order_by_z = sorted(range(len(ks)), key=lambda i: (z[i], ks[i]))
        assert order_by_string == order_by_z, (ks, z)

    prop()


def test_z_interleave_rejects_too_many_columns(spark):
    import pytest

    from capital.operators.zorder import z_interleave

    with pytest.raises(ValueError, match="1..4"):
        z_interleave([F.lit(1).cast("long")] * 5)
