"""Lazy plan-barrier semantics (round 16).

``io.plan_checkpointer``'s localCheckpoint path is LAZY: the first
downstream action materializes the checkpoint, and Spark's
end-of-job fill-in covers partial actions (``take`` computes only
the leading partitions; LocalRDDCheckpointData then launches a job
for the missing ones) — so a barrier probed with ``take(1)`` and
later consumed in full must still return complete, correct results.
These tests pin exactly that contract, which the v2 funnel's
pair-graph probe and every iterative trainer now rely on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import plan_checkpointer


def test_lazy_barrier_partial_then_full_action(spark):
    ckpt = plan_checkpointer(spark, None)
    df = ckpt(
        spark.range(0, 10_000, 1, 8).withColumn(
            "v", F.col("id") * 2
        )
    )
    # Partial action first (the funnel's pairs probe shape): only the
    # leading partition(s) are computed by the take itself.
    assert len(df.limit(1).take(1)) == 1
    # Full consumption must see every row — the fill-in job persisted
    # the rest.
    assert df.count() == 10_000
    assert df.agg(F.sum("v")).first()[0] == 9_999 * 10_000

    # The barrier truncates the plan immediately (eager or lazy): the
    # analyzed plan is a scan of an existing RDD, not the original
    # range+project tree.
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in analyzed or "ExistingRDD" in analyzed


def test_lazy_barrier_multi_consumer_identical(spark):
    ckpt = plan_checkpointer(spark, None)
    base = ckpt(
        spark.range(0, 1000, 1, 4).select(
            F.col("id"), F.pmod(F.col("id"), F.lit(7)).alias("k")
        )
    )
    a = base.groupBy("k").count().orderBy("k").collect()
    b = base.groupBy("k").count().orderBy("k").collect()
    assert a == b
    assert sum(r["count"] for r in a) == 1000
