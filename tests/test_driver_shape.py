"""Driver-canonicalizer contract for every oracle-paired query.

The driver compares Spark vs DuckDB by converting both results to
pandas, sorting columns by name, sorting rows by all columns, and
hashing values. Two output shapes break that silently or loudly:

- **Non-atomic Spark columns** (array/map/struct): pandas
  ``sort_values`` factorizes cell values; numpy arrays are unhashable
  and the whole driver row errors out (round-2 ``mm_frame_features``).
- **DuckDB HUGEINT / unsigned aggregates** (e.g. ``SUM(int)`` is
  HUGEINT): pandas renders them float64 while Spark emits int64, so
  the value hash sees ``368.0`` vs ``368`` (round-2
  ``asm_pack_chunks``).

Every oracle-paired query must therefore emit only atomic Spark types,
and every oracle only signed-≤64-bit / non-HUGEINT DuckDB types.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from capital.queries import all_oracles, all_queries

_ORACLES = all_oracles()
_QUERIES = all_queries()

_BAD_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}


def _is_bad_duck_type(t: object) -> bool:
    """Types whose pandas conversion diverges from a Spark column in
    the driver's value hash: HUGEINT/unsigned (→ float64/object), and
    DECIMAL with precision > 18 (DuckDB hands pandas a float64/object
    column where Spark emits decimal/int64). The engine convention is
    to finish every oracle aggregate with an explicit CAST to
    BIGINT/DOUBLE, so any surviving wide DECIMAL is a bug."""
    s = str(t)
    if s in _BAD_DUCK_TYPES:
        return True
    if s.startswith("DECIMAL"):
        try:
            precision = int(s.split("(", 1)[1].split(",", 1)[0])
        except (IndexError, ValueError):
            return True
        return precision > 18
    return False


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_spark_output_is_atomic(name, spark, sf_dir):
    schema = _QUERIES[name](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic driver-facing columns {bad} — the driver's "
        "pandas canonicalizer cannot sort array/map/struct cells; explode "
        "or stringify them"
    )


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_hashable(name, duck):
    rel = duck.sql(_ORACLES[name])
    bad = {
        c: str(t)
        for c, t in zip(rel.columns, rel.types)
        if _is_bad_duck_type(t)
    }
    assert not bad, (
        f"{name}: oracle emits {bad} — DuckDB HUGEINT/unsigned/wide-"
        "DECIMAL becomes float64/object in pandas and diverges from "
        "Spark's column in the driver's value hash; CAST(... AS "
        "BIGINT/DOUBLE) in the oracle"
    )
