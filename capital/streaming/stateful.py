"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 engine-extension surface).

The reference's closest concept is per-key incremental accumulation
across daily runs (pagination totals, job bookmarks). Here it is a real
arbitrary-stateful operator: per-key running aggregates maintained in
the state store across micro-batches, Arrow-batched on the Python side.

Scale: state is partitioned by key in the state store (RocksDB-backed
on a real cluster); each micro-batch touches only the keys present in
the batch. This is the pattern for sessionization, dedup-across-time,
and running feature aggregates at 100 TB/day ingest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    On a streaming DataFrame this uses the state store; each batch
    emits the updated totals for the users it touched.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
