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

import glob
import json
import os
import re

import pytest
from pyspark.sql import types as T

from capital.queries import _DRIVER_PRIORITY, all_oracles, all_queries

_ORACLES = all_oracles()
_QUERIES = all_queries()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


#: A query's driver evidence may be at most this many rounds old
#: before the rotation MUST put it in the next gate's 50-slot window.
#: Round-14 capacity policy (round-13 verdict ask #2): 197 paired
#: queries hit the 50x4=200 ceiling (199 after the two round-14 rows
#: landed), so the cap is 5 (ceiling 250, slack 51) — a full rotation
#: of ~200 queries takes exactly 4 gates,
#: so age-5 keeps one round of scheduling slack, and every query is
#: still locally DuckDB-verified at sf0.001 EVERY round by
#: test_oracle_parity.py regardless of the window. Must match
#: tools/rotate_gate.py::MAX_EVIDENCE_AGE.
_MAX_EVIDENCE_AGE = 5
_GATE_SLOTS = 50


def _latest_green_rounds() -> tuple[int, dict[str, int]]:
    """Latest hash-green driver round per query, from CORRECTNESS_r*.json."""
    latest: dict[str, int] = {}
    top = 0
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        top = max(top, rnd)
        with open(path) as fh:
            try:
                records = json.load(fh)
            except ValueError:
                continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return top, latest


def test_rotation_freshness():
    """The round-8 stall: `_DRIVER_PRIORITY` wasn't rewritten, so the
    gate re-verified 50 already-green queries while eight others aged
    past four rounds unchecked. This pins the rotation contract: every
    oracle-bearing query whose latest hash-green driver evidence is
    `_MAX_EVIDENCE_AGE`-or-more rounds behind the newest CORRECTNESS
    record (including never-checked new queries) must sit inside the
    next gate's 50-slot window."""
    top, latest = _latest_green_rounds()
    if top == 0:
        pytest.skip("no CORRECTNESS_r*.json records yet")
    window = set(_DRIVER_PRIORITY[:_GATE_SLOTS])
    # The window must be well-formed before it can be trusted.
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY)), (
        "duplicate names in _DRIVER_PRIORITY waste gate slots"
    )
    unknown = [n for n in _DRIVER_PRIORITY if n not in _QUERIES]
    assert not unknown, f"_DRIVER_PRIORITY names not registered: {unknown}"
    stale = sorted(
        name
        for name in _ORACLES
        # Upcoming gate is round top+1; a query left out of its window
        # would reach evidence age (top + 1 - latest) — beyond the cap
        # exactly when latest <= top - _MAX_EVIDENCE_AGE.
        if latest.get(name, 0) <= top - _MAX_EVIDENCE_AGE
        and name not in window
    )
    assert not stale, (
        f"queries with driver evidence older than {_MAX_EVIDENCE_AGE} "
        f"rounds are outside the next gate's {_GATE_SLOTS}-slot window: "
        f"{stale} — rewrite _DRIVER_PRIORITY"
    )


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
