"""Z-order clustering: Morton-key correctness against a Python
reference, and the actual payoff — per-file min/max ranges narrow
enough that multi-column predicates can skip most files."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from capital.operators.zorder import Z_BITS, with_z_value, zorder_write


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


def test_z_value_constant_column_is_safe(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(7).alias("c"), (F.col("id") * 3).alias("v")
    )
    out = with_z_value(df, ["c", "v"]).select("z_value").collect()
    assert len(out) == 10  # span=0 branch: rank 0, no divide-by-zero


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
