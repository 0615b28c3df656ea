"""The engine's checkable query surface (SURVEY.md §2 inventory).

Importing this package registers every query module; the driver
contract in ``__spark_entry__.py`` re-exports
:func:`all_queries` / :func:`all_oracles`.
"""

from __future__ import annotations

from importlib import import_module

from capital.queries.registry import (  # noqa: F401
    QueryFn,
    registered_oracles,
    registered_queries,
)

#: Query modules; each import registers its queries as a side effect.
_MODULES = [
    "capital.queries.pricing",
    "capital.queries.relational",
    "capital.queries.tpc_extended",
    "capital.queries.rangejoin_queries",
    "capital.queries.calendar_queries",
    "capital.queries.functions_queries",
    "capital.queries.llm_queries",
    "capital.queries.assemble_queries",
    "capital.queries.streaming_queries",
    "capital.queries.extras",
]

for _m in _MODULES:
    try:
        import_module(_m)
    except Exception as _exc:  # noqa: BLE001
        # A broken module must not take the whole driver surface down;
        # surface the failure loudly and keep the other packs alive.
        import sys as _sys

        print(f"capital.queries: FAILED to load {_m}: {_exc}", file=_sys.stderr)


def all_queries() -> dict[str, QueryFn]:
    return registered_queries()


def all_oracles() -> dict[str, str]:
    return registered_oracles()
