"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4).

Writing both sides of a recurring join bucketed on the join key lets
every future join read co-partitioned data — no Exchange on either
side. At 100 TB this converts the nightly fact↔fact join from the
dominant shuffle into a local zip of bucket files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables; with matching bucket specs the plan
    contains no Exchange (verified in tests/test_scale_ops.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
