"""Arbitrary stateful streaming on the Spark 4 ``transformWithState``
API (``transformWithStateInPandas``) — the successor to
``applyInPandasWithState`` used in :mod:`capital.streaming.stateful`.

Why both exist in the engine: ``applyInPandasWithState`` is the
GA-since-3.4 path; ``transformWithState`` adds composable typed state
(value/list/map), per-state TTL, and timers, and is the forward path
for operators like cross-batch dedup with expiring keys. The engine
exposes the same running-totals semantics on both so either API can be
benchmarked against the other.

Scale: identical posture to the old API — state lives in the
(RocksDB-backed) state store partitioned by grouping key; a micro-batch
touches only the keys it contains; TTL bounds state growth for
unbounded key domains (the 100 TB/day concern).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:
    import pandas as pd

#: Output schema shared with the old-API twin (plus max_value, which
#: exercises a second state field).
OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"

_STATE_SCHEMA = "n long, total double, mx double"


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, sum, max) across micro-batches.

    ``ttl_ms`` (optional) expires idle keys — the knob that keeps
    state bounded when the key domain is unbounded.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState(
            "stats", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total, mx = (
            self._stats.get() if self._stats.exists() else (0, 0.0, float("-inf"))
        )
        for pdf in rows:
            vals = pdf["value"].dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        self._stats.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [None if mx == float("-inf") else mx],
            }
        )

    def close(self) -> None:
        pass


def protobuf_available() -> bool:
    """``transformWithState`` streams state over a protobuf channel; the
    worker needs ``google.protobuf`` at runtime. Gate callers on this
    instead of crashing the streaming query mid-batch (environments
    without protobuf should use the
    :mod:`capital.streaming.stateful` twin)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats_per_user(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """``transformWithState`` twin of
    :func:`capital.streaming.stateful.running_totals_per_user`."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStatsProcessor(ttl_ms=ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
