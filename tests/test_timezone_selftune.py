"""The driver harness hands the engine an arbitrarily-configured
session; the registry wrapper must self-tune (tune_existing) before
building plans. Non-UTC session timezone is the probe that breaks
every timestamp query if the pin is lost."""

from __future__ import annotations

from capital.queries import all_oracles, all_queries
from tests.oracle_harness import compare


def test_timestamp_query_survives_non_utc_session(spark, duck, sf_dir):
    from capital.queries.registry import _PLAN_CACHE

    queries, oracles = all_queries(), all_oracles()
    # Plans memoized by earlier tests were analyzed under UTC and would
    # mask a lost pin — force fresh analysis under the KST session.
    _PLAN_CACHE.clear()
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        for name in ("st_tumbling_hourly", "a2_events_by_day"):
            sdf = queries[name](spark, sf_dir)
            problems = compare(sdf, duck.sql(oracles[name]))
            assert not problems, f"{name} under KST session:\n" + "\n".join(
                problems
            )
        # The wrapper pinned UTC for plan analysis (and leaves it set —
        # engine conf, not a save/restore).
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
