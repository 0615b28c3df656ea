"""Slowly-changing-dimension (type 2) history maintenance.

The reference's silver dimensions are daily FULL refreshes (the
industry-code job rewrites ~6M rows, flagged costly at
dags/slv_industry_code_daily/industry_code_daily.py:15); the engine's
``io.upsert_jdbc`` gives latest-wins merges. SCD2 is the third shape —
keep every version with a validity interval — and is plain DataFrame
algebra:

- a dimension row is ``(keys…, attrs…, valid_from, valid_to)`` with
  ``valid_to IS NULL`` marking the open (current) version;
- applying a batch of updates effective at ``batch_date``:
  * open rows whose key arrives with CHANGED tracked attributes close
    (``valid_to = batch_date``) and a new open version is appended;
  * open rows whose key arrives unchanged, or does not arrive, stay;
  * unseen keys append as brand-new open versions;
  * already-closed history rows pass through untouched.

Shape at scale: ONE join of the open slice against the batch on the
dimension key (broadcast when the batch is a daily increment), a
null-safe tracked-column comparison, and unions — no window, no
global sort. Re-applying the identical batch is a no-op (the changed
set is empty), so crash-replay converges like the keyed upsert.
Comparisons use ``eqNullSafe`` so NULL→value and value→NULL attribute
transitions count as changes.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def scd2_init(
    snapshot: DataFrame, effective_date: str
) -> DataFrame:
    """Open an initial SCD2 table from a full snapshot: every row
    becomes the current version as of ``effective_date``."""
    return snapshot.withColumn(
        VALID_FROM, F.lit(effective_date).cast("date")
    ).withColumn(VALID_TO, F.lit(None).cast("date"))


def _same(tracked: list[str], left: str, right: str) -> Column:
    """Null-safe equality across all tracked columns."""
    terms = [
        F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
        for c in tracked
    ]
    return functools.reduce(lambda a, b: a & b, terms)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    batch_date: str,
) -> DataFrame:
    """Apply one batch of updates to an SCD2 table; returns the new
    full history. ``updates`` carries ``keys + tracked`` (one row per
    key — enforce upstream with first_wins/dropDuplicates); ``dim``
    is a prior :func:`scd2_init`/``scd2_apply`` output."""
    if not keys or not tracked:
        raise ValueError("scd2_apply needs non-empty keys and tracked")
    cols = keys + tracked
    closed_history = dim.filter(F.col(VALID_TO).isNotNull())
    open_rows = dim.filter(F.col(VALID_TO).isNull()).alias("o")
    # Explicit presence marker: absence after the left join is read
    # from this column, never inferred from tracked-column NULLs — so
    # an update that legitimately nullifies EVERY tracked attribute is
    # a change, not a silent drop.
    upd = updates.select(
        *cols, F.lit(True).alias("__in_batch")
    ).alias("u")

    joined = open_rows.join(upd, keys, "left")
    absent = F.col("u.__in_batch").isNull()
    # Keep the open row when the key didn't arrive or arrived
    # unchanged; close-and-reopen otherwise.
    stays = _same(tracked, "o", "u") | absent
    keep_open = joined.filter(stays).select("o.*")
    to_close = joined.filter(~stays)
    closed_now = to_close.select("o.*").withColumn(
        VALID_TO, F.lit(batch_date).cast("date")
    )
    new_versions = to_close.select(
        *[F.col(f"o.{k}").alias(k) for k in keys],
        *[F.col(f"u.{c}").alias(c) for c in tracked],
    )
    brand_new = upd.drop("__in_batch").join(
        open_rows.select(*[F.col(f"o.{k}").alias(k) for k in keys]),
        keys,
        "left_anti",
    )
    opened = scd2_init(new_versions.unionByName(brand_new), batch_date)
    return (
        closed_history.unionByName(keep_open)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current snapshot: open versions only, validity dropped."""
    return dim.filter(F.col(VALID_TO).isNull()).drop(VALID_FROM, VALID_TO)


def scd2_asof_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
    how: str = "left",
    broadcast: bool | None = None,
) -> DataFrame:
    """Temporal dimension lookup: join each fact to the dimension
    VERSION valid at the fact's timestamp
    (``valid_from <= ts < valid_to``, open version unbounded).

    Plan shape at scale: when the history table is dimension-sized (a
    few versions per member) it broadcasts and the equi-key hash join
    carries the interval predicate as its residual condition — no
    fact-side shuffle, no range explosion (each fact matches at most
    one version because validity intervals partition time per key).

    ``broadcast``: ``True`` forces the broadcast hint (caller KNOWS
    the history is small); ``False`` forbids it (fact-sized "dim" —
    degrade to a shuffled sort-merge join instead of a driver OOM);
    ``None`` (default, safe) adds no hint and lets Catalyst/AQE decide
    from measured sizes — small histories still broadcast at runtime
    via the autoBroadcastJoinThreshold, oversized ones never do.
    """
    f = facts.alias("f")
    d = dim.alias("d")
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"f.{k}") == F.col(f"d.{k}") for k in keys],
    )
    ts = F.col(f"f.{ts_col}")
    cond = (
        cond
        & (ts >= F.col(f"d.{VALID_FROM}"))
        & (F.col(f"d.{VALID_TO}").isNull() | (ts < F.col(f"d.{VALID_TO}")))
    )
    dim_cols = [c for c in dim.columns if c not in keys]
    right = F.broadcast(d) if broadcast else d
    return f.join(right, cond, how).select(
        "f.*", *[F.col(f"d.{c}").alias(c) for c in dim_cols]
    )
