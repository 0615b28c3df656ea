"""Registry pairing each engine query with its DuckDB oracle SQL.

Every operator from SURVEY.md §2 that the engine claims as done gets:

- a named callable ``(spark, sf_dir) -> DataFrame`` built with the
  engine's library modules, and
- (when SQL-expressible) an ANSI-SQL oracle string DuckDB runs against
  the same parquet tables; the driver hash-compares the two.

Column names are the contract: every computed column is aliased
identically in the Spark plan and the oracle SQL, because the driver
sorts columns by name before hashing values.

Float discipline: SUM/AVG over doubles are order-dependent in IEEE
arithmetic, and Spark and DuckDB will reduce in different orders. Both
sides therefore cast to DECIMAL *before* summing (exact, associative)
and cast the final aggregate back to DOUBLE — see
:func:`capital.queries.registry.decimal_sum`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def query(
    name: str, oracle: str | None = None, memoize: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Register an engine query, optionally with its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).

    ``memoize=False`` marks builders that are not pure plan
    constructions — they ``persist()`` intermediates, run eager work
    (KMeans fit, localCheckpoint iteration, driver-side collect of a
    query set) — so handing back the same DataFrame would replay cached
    data instead of the computation. Those rebuild on every call.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Sessions arrive from the driver unconfigured; SQL conf is
            # runtime-settable, so pin the correctness-critical bits.
            # (Runs before the plan cache too: the first build must
            # analyze under engine conf — e.g. UTC is captured into
            # timestamp expressions at analysis time.)
            from capital.session import tune_existing

            tune_existing(spark)
            if not memoize:
                return fn(spark, sf_dir)
            # Memoize the built plan: a registered pure query is a
            # (spark, sf_dir) → DataFrame builder, and re-analysis of
            # literal-heavy plans costs up to ~1.5 s of driver time per
            # call (measured on the sign-LSH hyperplane plan at sf0.1 —
            # execution itself was 0.1 s). A DataFrame is an immutable
            # plan, so handing back the same object is semantically
            # identical; keyed by (applicationId, sessionUUID) so new
            # sessions — including newSession() siblings, whose runtime
            # SQL conf differs — always rebuild under their own conf.
            from capital.session import session_cache_key

            app, sess = session_cache_key(spark)
            key = (app, sess, sf_dir, name)
            cached = _PLAN_CACHE.get(key)
            if cached is not None:
                return cached
            # Evict entries from stopped applications (dead appIds
            # never hit again; keeps many-session processes bounded).
            # Sibling sessions of the live app are kept.
            for stale in [k for k in _PLAN_CACHE if k[0] != app]:
                del _PLAN_CACHE[stale]
            df = fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
            return df

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return wrapped

    return deco


def clear_plan_cache() -> None:
    """Drop every memoized plan so the next call of each query builds
    a FRESH DataFrame. Benchmark-critical (round 12): re-executing the
    SAME DataFrame object reuses its shuffle files and skips whole
    stages (measured q1 0.05 s vs 1.75 s fresh at sf0.1) — a timed
    pass that hits this cache measures stage-skipping, not the query.
    The memoization itself stays right for the driver gate and
    repeated analytical use, where replaying identical results IS the
    semantics; only timing must bust it."""
    _PLAN_CACHE.clear()


def registered_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def registered_oracles() -> dict[str, str]:
    return dict(_ORACLES)


def decimal_sum(col: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent SUM over a double column.

    Casting each value to DECIMAL(28, scale) makes the reduction exact
    and associative, so Spark's partial aggregation order cannot diverge
    from DuckDB's. The oracle twin is
    ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double").alias(alias)


def decimal_avg(col: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum divided by count."""
    return (
        F.sum(col.cast(f"decimal(28,{scale})")).cast("double") / F.count(col)
    ).alias(alias)


def ora_sum(expr: str, alias: str, scale: int = 6) -> str:
    """Oracle-SQL twin of :func:`decimal_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE) AS {alias}"


def ora_avg(expr: str, alias: str, scale: int = 6) -> str:
    """Oracle-SQL twin of :func:`decimal_avg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
