#!/usr/bin/env python
"""Event-log job-timeline profiler for a registered query (round 16,
guide §7.1/§7.3 made scriptable — no live UI in this sandbox).

Runs the named query warm (one throwaway pass, caches cleared — the
bench methodology), with ``spark.eventLog.enabled`` pointed at a temp
dir, then parses the JSON event log and prints, for the timed pass:

- per-job wall (submission → job end), description, stage count/ids;
- the DRIVER GAP before each job (time since the previous job ended —
  Catalyst planning, collects, py4j, broadcast builds that never
  become jobs);
- a summary: total wall, Σ job wall, Σ gap, and the overlap credit
  (Σ job wall − union wall of the job intervals, >0 when concurrent
  jobs back-fill).

Usage: python tools/joblog.py [--sf DIR] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    logdir = tempfile.mkdtemp(prefix="sparklog_")
    from capital.io import clear_engine_cache
    from capital.queries import all_queries
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark

    spark = get_spark(
        app_name="joblog",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[args.name]

    fn(spark, args.sf).collect()  # warm-up
    clear_engine_cache(spark)
    clear_plan_cache()

    sc = spark.sparkContext
    t0 = time.perf_counter()
    # Timed pass boundary marker: a trivial job whose description we
    # can find in the log (cheap — one 1-element local collect).
    sc.setJobDescription("__joblog_mark_start__")
    sc.parallelize([0], 1).count()
    sc.setJobDescription(None)
    df = fn(spark, args.sf)
    n = df.toArrow().num_rows
    wall = time.perf_counter() - t0
    print(f"timed pass: {wall:.3f}s wall, {n} rows")

    # flush the event log
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    spark.stop()

    # Spark 4 writes a rolling eventlog-v2 DIRECTORY per app.
    logfiles = []
    for root, _dirs, files in os.walk(logdir):
        for f in files:
            if f.startswith("events") or f.startswith("local-"):
                logfiles.append(os.path.join(root, f))
    jobs = {}
    order = []
    lines = []
    for lf in sorted(logfiles):
        if lf.endswith(".zstd"):
            import zstandard

            with open(lf, "rb") as fh:
                data = zstandard.ZstdDecompressor().stream_reader(fh).read()
            lines.extend(data.decode("utf-8", "replace").splitlines())
        else:
            with open(lf, errors="replace") as fh:
                lines.extend(fh)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get(
                        "spark.job.description",
                        props.get("callSite.short", ""),
                    ),
                    "stages": len(ev.get("Stage IDs", [])),
                }
                order.append(jid)
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]

    # find the marker job; report everything after it
    start_idx = 0
    for i, jid in enumerate(order):
        if "__joblog_mark_start__" in (jobs[jid]["desc"] or ""):
            start_idx = i + 1
    timed = [jobs[j] for j in order[start_idx:] if "end" in jobs[j]]
    if not timed:
        print("no jobs found after marker")
        return

    t_base = timed[0]["start"]
    prev_end = t_base
    tot_job = 0.0
    tot_gap = 0.0
    print(f"{'job':>4} {'gap_ms':>8} {'wall_ms':>8} {'stg':>4}  desc")
    for i, j in enumerate(timed):
        gap = max(0, j["start"] - prev_end)
        w = j["end"] - j["start"]
        tot_job += w
        tot_gap += gap
        desc = (j["desc"] or "")[:90]
        print(f"{i:>4} {gap:>8} {w:>8} {j['stages']:>4}  {desc}")
        prev_end = max(prev_end, j["end"])

    # union wall of job intervals
    ivs = sorted((j["start"], j["end"]) for j in timed)
    union = 0
    cs, ce = ivs[0]
    for s, e in ivs[1:]:
        if s > ce:
            union += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    union += ce - cs
    span = timed[-1]["end"] - t_base
    print(
        f"\njobs={len(timed)}  span={span/1000:.3f}s  "
        f"sum_job={tot_job/1000:.3f}s  union_job={union/1000:.3f}s  "
        f"sum_gap(driver)={tot_gap/1000:.3f}s  "
        f"overlap_credit={(tot_job-union)/1000:.3f}s"
    )


if __name__ == "__main__":
    main()
