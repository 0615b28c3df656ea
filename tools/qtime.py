#!/usr/bin/env python
"""Ad-hoc per-query timing probe (not part of the bench contract).

Usage: python tools/qtime.py [--sf DIR] [--n N] [--conf k=v ...]
           [--mode collect|arrow|both] name [name ...]

Runs each named query with one warm-up + N timed repetitions (cache
cleared between), reporting the min. ``--mode both`` times both
``collect()`` and ``toArrow()`` to separate plan execution cost from
driver-side Row materialization.
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--mode", default="collect",
                    choices=["collect", "arrow", "both"])
    args = ap.parse_args()

    from capital.io import clear_engine_cache
    from capital.queries import all_queries
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="qtime", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in args.names:
        fn = queries[name]
        fn(spark, args.sf).collect()  # warm-up
        clear_engine_cache(spark)
        clear_plan_cache()  # round 12: a cached plan reruns on its old
        # shuffle files and times stage-skipping, not the query
        mins: dict[str, float] = {}
        for _ in range(args.n):
            for mode in (
                ["collect", "arrow"] if args.mode == "both" else [args.mode]
            ):
                t0 = time.perf_counter()
                df = fn(spark, args.sf)
                if mode == "collect":
                    n_rows = len(df.collect())
                else:
                    n_rows = df.toArrow().num_rows
                dt = time.perf_counter() - t0
                mins[mode] = min(mins.get(mode, 1e9), dt)
                clear_engine_cache(spark)
                clear_plan_cache()
        desc = "  ".join(f"{m}={t:.3f}s" for m, t in mins.items())
        print(f"{name}: {desc}  ({n_rows} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
