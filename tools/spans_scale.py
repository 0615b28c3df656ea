#!/usr/bin/env python
"""Fixed-window substring span dedup at 1x-30x the sf0.1 corpus.

Replica-tagged replication (the round-2 methodology: every token
suffixed with its replica id — identical within-replica duplicate
structure, zero cross-replica windows), so per-level dup counts must
grow exactly N-fold. Pins the production JVM broadcast-join shape —
the round-14 kernel-probe experiment inverted at 30x precisely
because its dup-gram set is corpus-derived (see BASELINE round 14 /
CLAUDE.md); this tool is the regression guard for that lesson.

Results recorded in DESIGN_SCALE.md (round 14).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 30)


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import clear_engine_cache, load_table
    from capital.llm.dedup import substring_dup_spans
    from capital.session import get_spark
    from multiscale_scale import replicate_tagged

    spark = get_spark(app_name="spans-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    variants = (
        ("string-keyed", dict()),
        ("hash-keyed  ", dict(hash_keyed_count=True)),
    )
    base = None
    for n in SCALES:
        rep = replicate_tagged(spark, docs, n)
        for label, kw in variants:
            t0 = time.perf_counter()
            agg = substring_dup_spans(rep, **kw).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_dup_windows").alias("w"),
                F.sum("n_dup_spans").alias("s"),
                F.sum("dup_tokens").alias("t"),
            ).collect()[0]
            dt = time.perf_counter() - t0
            got = (int(agg["rows"]), int(agg["w"]), int(agg["s"]),
                   int(agg["t"]))
            print(f"{n:3d}x {label}: rows/dup_windows/dup_spans/"
                  f"dup_tokens = {got}, {dt:6.2f}s")
            if n == 1 and base is None:
                base = got
            else:
                assert got == tuple(v * n for v in base), (n, got, base)
            clear_engine_cache(spark)
        print(f"{n}x: both variants exact {n}x the 1x counts — linear")


if __name__ == "__main__":
    main()
