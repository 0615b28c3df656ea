from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.schemas import EVENTS
from capital.sources.rest import TokenBucket, page_windows_udtf
from capital.streaming.incremental import incremental_with_dead_letter


def test_page_windows_udtf(spark):
    PageWindows = page_windows_udtf()
    spark.udtf.register("page_windows", PageWindows)
    rows = spark.sql("SELECT * FROM page_windows(257, 100)").collect()
    assert [(r.page, r.start_offset, r.end_offset) for r in rows] == [
        (0, 0, 99), (1, 100, 199), (2, 200, 256),
    ]


def test_token_bucket_throttles():
    clock = {"t": 0.0}
    sleeps: list[float] = []

    def fake_clock():
        return clock["t"]

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    tb = TokenBucket(rate=2.0, capacity=1, clock=fake_clock, sleeper=fake_sleep)
    tb.acquire()          # burst token, no sleep
    tb.acquire()          # must wait ~0.5s at 2 req/s
    tb.acquire()
    assert sleeps and abs(sleeps[0] - 0.5) < 1e-9
    assert len(sleeps) == 2


def test_dead_letter_routing(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    dlq = str(tmp_path / "dlq")
    ev = load_table(spark, sf_dir, "events")
    # Inject 5 ancient events among the fresh ones.
    ancient = ev.limit(5).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 400 DAYS")
    )
    ev.unionByName(ancient).coalesce(1).write.mode("append").parquet(src)

    q = incremental_with_dead_letter(
        spark, src, EVENTS, sink, dlq, str(tmp_path / "ckpt"),
        max_age="60 days",
    )
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == ev.count()
    assert spark.read.parquet(dlq).count() == 5

    # Replay with a fresh checkpoint (crash-before-commit): the batch
    # overwrites its own __batch partition — no duplicates.
    q2 = incremental_with_dead_letter(
        spark, src, EVENTS, sink, dlq, str(tmp_path / "ckpt2"),
        max_age="60 days",
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == ev.count()
    assert spark.read.parquet(dlq).count() == 5
