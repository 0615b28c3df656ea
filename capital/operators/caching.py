"""Deterministic release for library-level ``persist()`` calls.

Several library functions (LSH banding, shingle verification, embedding
blocking) persist intermediates that the *returned* lazy DataFrame still
references — so they cannot unpersist before the caller consumes the
result. Inside the engine's query layer that is bounded by session-cache
eviction (``capital.io.clear_engine_cache``), but as plain library calls
the cached frames would otherwise accumulate in a long-running app's
executors (local mode: the shared driver heap).

:class:`CacheScope` is the explicit handle: pass one to the function,
consume the result, then ``release()`` (or use it as a context manager).
Functions accept ``scope=None`` and keep the previous
session-cache-bounded behavior when no scope is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects the DataFrames a library call persists so the caller
    can unpersist them once the call's result has been consumed.

    >>> with CacheScope() as scope:
    ...     pairs = lsh_candidate_pairs(sigs, scope=scope)
    ...     pairs.write.parquet(out)   # consume while caches are live
    ... # scope.release() ran; no frames left cached
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` and track it for release."""
        df.persist()
        self._frames.append(df)
        return df

    @property
    def frames(self) -> list[DataFrame]:
        return list(self._frames)

    def release(self) -> None:
        """Unpersist every tracked frame (idempotent)."""
        while self._frames:
            self._frames.pop().unpersist()

    def __enter__(self) -> CacheScope:
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def scoped_persist(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """Persist ``df`` through ``scope`` when given, else directly —
    the one-liner library functions call at every persist site."""
    return scope.persist(df) if scope is not None else df.persist()
