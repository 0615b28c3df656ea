#!/usr/bin/env python
"""Full-surface sf0.1 parity audit with honest per-query Spark
timings (round 12): run EVERY oracle-paired query on Spark and its
SQL twin on DuckDB at a given sf, hash-compare (the driver's
comparison replica), and record the Spark wall per query with the
plan cache busted per call (the round-12 stage-skipping rule — a
memoized object would time shuffle-file reuse, not the query).

Usage: python tools/parity_audit.py [--sf DIR] [--out FILE]
Writes one JSON object: {name: {"ok": bool, "sec": float,
"problems": [...]}} plus a summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/parity_audit.json")
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    import duckdb

    from capital.queries import all_oracles, all_queries
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark
    from oracle_harness import compare

    spark = get_spark(app_name="parity-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    qs, ors = all_queries(), all_oracles()
    names = args.names or sorted(ors)
    results: dict[str, dict] = {}
    fails = 0
    for name in names:
        clear_plan_cache()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf)
            problems = compare(sdf, con.sql(ors[name]))
        except Exception as exc:  # noqa: BLE001 - keep the audit going
            problems = [f"EXCEPTION: {exc}"]
        sec = round(time.perf_counter() - t0, 3)
        ok = not problems
        fails += 0 if ok else 1
        results[name] = {"ok": ok, "sec": sec, "problems": problems[:3]}
        print(f"{'OK  ' if ok else 'FAIL'} {sec:8.3f}s  {name}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(
        f"# audited {len(names)} queries at {args.sf}: "
        f"{len(names) - fails} ok, {fails} failed -> {args.out}"
    )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
