"""Mirror of the driver's correctness gate: every registered query with
an oracle must match DuckDB on the same tables (sf0.001 locally)."""

from __future__ import annotations

import pytest

from capital.queries import all_oracles, all_queries
from tests.oracle_harness import compare

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    rel = duck.sql(_ORACLES[name])
    problems = compare(sdf, rel)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.columns
