#!/usr/bin/env python
"""Dump ``explain("formatted")`` for headline queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` (suffix via
``$PLAN_SUFFIX``, default ``before``) for each named query (default:
the full bench headline set). Building a composition query (the
curation funnels) executes its eager barriers, so the dump reflects
the same plan the bench times. ``clearCache()`` before each build so
a previous query's persisted frame cannot reshape the audited plan
(the round-10 plan-equality-cache trap).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from capital.io import clear_engine_cache
    from capital.queries import all_queries
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark

    spark = get_spark(app_name="capital-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = sys.argv[2:] or bench.headline_names(queries)

    for name in names:
        clear_engine_cache(spark)
        clear_plan_cache()
        try:
            df = queries[name](spark, sf_dir)
            qe = df._jdf.queryExecution()
            txt = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")
        except Exception as exc:  # noqa: BLE001 - keep dumping the rest
            txt = f"PLAN BUILD FAILED: {exc}\n"
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
