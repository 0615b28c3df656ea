"""Data-quality checks — the reference's operational runtime assertions
as engine-level operators (SURVEY.md §5).

The reference enforces correctness operationally: empty-result raises
(dags/brz_industry_code_daily/extractors.py:58-59), HTTP status checks,
parameter validation (plugins/operators/bank_of_korea_operator.py:
127-145), record-count reconciliation vs API totals (84-98), and
requested-vs-fetched diffs (plugins/operators/yfinance_operator.py:
118-127). Here each becomes a reusable check returning the input
DataFrame (chainable) or raising :class:`QualityError`.

Scale note: every check is one aggregate or anti-join — no collect of
data rows to the driver, only scalar check results.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class QualityError(AssertionError):
    """A data-quality contract was violated."""


def assert_non_empty(df: DataFrame, name: str = "dataset") -> DataFrame:
    """Empty-result guard (extractors raise on no data)."""
    if df.isEmpty():
        raise QualityError(f"{name}: expected non-empty result")
    return df


def assert_count_equals(df: DataFrame, expected: int, name: str = "dataset") -> DataFrame:
    """Record-count reconciliation vs an external total (A3)."""
    actual = df.count()
    if actual != expected:
        raise QualityError(f"{name}: count {actual} != expected {expected}")
    return df


def assert_values_in(
    df: DataFrame, column: str, allowed: Iterable[str], name: str = "dataset"
) -> DataFrame:
    """P13 membership validation (interval/stat-name enums)."""
    allowed = list(allowed)
    bad = df.filter(~F.col(column).isin(allowed) | F.col(column).isNull())
    sample = [r[column] for r in bad.select(column).distinct().limit(5).collect()]
    if sample:
        raise QualityError(
            f"{name}.{column}: values {sample} outside allowed {allowed}"
        )
    return df


def assert_schema_conforms(
    df: DataFrame, expected: StructType, name: str = "dataset"
) -> DataFrame:
    """Silver-contract conformance: every expected field present with
    the expected type (the DDL NOT NULL/type pins, sql.py:8-24)."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for field in expected.fields:
        if field.name not in actual:
            problems.append(f"missing column {field.name}")
        elif actual[field.name] != field.dataType:
            problems.append(
                f"{field.name}: {actual[field.name].simpleString()}"
                f" != {field.dataType.simpleString()}"
            )
    if problems:
        raise QualityError(f"{name}: schema mismatch: {problems}")
    return df


def assert_no_nulls(
    df: DataFrame, columns: Iterable[str], name: str = "dataset"
) -> DataFrame:
    """NOT NULL constraint check, one pass for all columns."""
    columns = list(columns)
    counts = df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in columns
        ]
    ).collect()[0]
    bad = {c: counts[c] for c in columns if counts[c]}
    if bad:
        raise QualityError(f"{name}: null values present: {bad}")
    return df


def missing_keys(
    requested: DataFrame, fetched: DataFrame, key: str
) -> DataFrame:
    """Requested-minus-fetched diff as a DataFrame (the yfinance
    missing-ticker warning, J3); caller decides warn vs raise."""
    return requested.select(key).distinct().join(
        fetched.select(key).distinct(), key, "left_anti"
    )
