"""Snapshot diff: keyed added/removed/changed between table versions.

The lake-operations answer to "what did yesterday's load change?" —
the reconciliation step behind the reference's full-refresh-vs-
incremental tension (`dags/slv_industry_code_daily/industry_code_
daily.py:15` flags the 6M-row full refresh as costly precisely
because nobody knows what changed). Composes with SCD2
(``operators/scd.py`` consumes exactly this delta) and the keyed
JDBC upsert.

One full-outer join on the key; change detection is null-safe
column-wise inequality (a value appearing/disappearing IS a change);
``changed_cols`` names the differing columns in declaration order so
downstream routing (re-embed only if ``text`` changed; re-price only
if ``price`` changed) is a filter, not a re-diff.

Scale: the join is the only shuffle (both sides on the key — AQE
handles skew); emitted rows are only the delta (``unchanged`` rows
drop by default), so a 0.1%-churn day costs 0.1% of a snapshot in
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots by key: one row per key present in either,
    with ``diff_status`` ∈ added / removed / changed (/ unchanged)
    and ``changed_cols`` (empty for added/removed — the row-level
    event subsumes the columns).

    ``compare_cols`` defaults to all shared non-key columns of
    ``old``. Comparison is null-safe (``IS DISTINCT FROM``), so
    null→value and value→null both count as changes.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in new.columns and c not in key_cols
        ]
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, key_cols, "full_outer")
    empty = F.array().cast("array<string>")
    changed_cols = F.concat(
        *[
            F.when(
                ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                F.array(F.lit(c)),
            ).otherwise(empty)
            for c in compare_cols
        ]
    ) if compare_cols else empty
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *key_cols,
        status.alias("diff_status"),
        F.when(in_old & in_new, changed_cols)
        .otherwise(empty)
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("diff_status") != "unchanged")
    return out
