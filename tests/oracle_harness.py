"""Local replica of the driver's DuckDB-oracle comparison.

Canonicalizes both result sets (columns sorted by name, rows sorted by
stringified values) and compares cell-by-cell: exact for non-floats,
tight tolerance for floats. The engine's decimal-sum discipline should
make even float aggregates bit-identical; the tolerance only absorbs
representation noise (e.g. float32 embeddings upcast differently).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

REL_TOL = 1e-9


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _sort_key(row):
    return tuple(repr(c) for c in row)


def canonicalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return cols, out


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _cells_equal(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=1e-9)
    return a == b


def compare(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = [tuple(r) for r in duck_rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    _, s_canon = canonicalize(s_cols, s_rows)
    _, d_canon = canonicalize(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        if not _cells_equal(sr, dr):
            problems.append(f"row {i} differs:\n  spark={sr}\n  duck ={dr}")
            if len(problems) >= 5:
                problems.append("... (truncated)")
                break
    return problems
