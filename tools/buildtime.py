#!/usr/bin/env python
"""Split each headline query's bench time into BUILD vs EXECUTE.

Build = calling the registered query function (Python DataFrame
construction: py4j round-trips per Column/expr, plus any eager work
the function does internally — barrier probes, model collects).
Execute = toArrow() on the returned frame (analysis + optimization +
jobs + result transfer).

bench.py rebuilds plans every pass (the round-12 stage-skip fix), so
build time is paid in full in every recorded pass. Wall-clock on this
host drifts between windows, but a query whose BUILD dominates its
total is a driver-side target regardless of window (round 16,
guide §7.3: single-threaded driver work).

Usage: python tools/buildtime.py [--sf DIR] [name ...]
(default: the full headline set)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    # Validate up front (r16 ADVICE): passes < 1 would leave both
    # columns empty and divide by zero in the TOTAL line, and an
    # unknown name should fail before the full warm-up pass runs.
    if args.passes < 1:
        ap.error("--passes must be >= 1")

    from bench import headline_names
    from capital.io import clear_engine_cache
    from capital.queries import all_queries
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark

    queries = all_queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="capital-buildtime")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names or headline_names(queries)

    # warm-up pass (codegen, broadcast, page cache), then clear
    for name in names:
        queries[name](spark, args.sf).toArrow()
    clear_engine_cache(spark)
    clear_plan_cache()

    build: dict[str, float] = {}
    execute: dict[str, float] = {}
    for p in range(args.passes):
        for name in names if p % 2 == 0 else list(reversed(names)):
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf)
            t1 = time.perf_counter()
            df.toArrow()
            t2 = time.perf_counter()
            b, e = t1 - t0, t2 - t1
            if name not in build or b + e < build[name] + execute[name]:
                build[name], execute[name] = b, e
        clear_engine_cache(spark)
        clear_plan_cache()

    rows = sorted(build, key=lambda n: -build[n])
    print(f"{'query':36s} {'build':>7s} {'exec':>7s} {'total':>7s} build%")
    for n in rows:
        t = build[n] + execute[n]
        print(
            f"{n:36s} {build[n]:7.3f} {execute[n]:7.3f} {t:7.3f}"
            f" {100 * build[n] / t:5.1f}%"
        )
    tb, te = sum(build.values()), sum(execute.values())
    print(
        f"{'TOTAL':36s} {tb:7.3f} {te:7.3f} {tb + te:7.3f}"
        f" {100 * tb / (tb + te):5.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
