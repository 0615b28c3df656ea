"""Wide↔long reshape operators.

The reference unpivots yfinance's wide (field × ticker) panel to long
with pandas ``.stack(level=1)`` (reference: plugins/operators/
yfinance_operator.py:101-113). Here it is Spark's native ``unpivot``
(a zero-shuffle narrow transformation — each input row expands to
k output rows locally) and its inverse ``pivot``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: list[str],
    values: list[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long. Narrow op: no shuffle, scales with input splits."""
    return df.unpivot(ids, values, var_name, value_name)


def pivot_wide(
    df: DataFrame,
    ids: list[str],
    pivot_col: str,
    value_col: str,
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """Long → wide. Pass ``pivot_values`` when known: it removes the
    extra distinct-value discovery job (one full scan) — mandatory
    hygiene at 100 TB."""
    grouped = df.groupBy(*ids)
    p = grouped.pivot(pivot_col, pivot_values) if pivot_values else grouped.pivot(pivot_col)
    return p.agg(F.first(value_col))
