#!/usr/bin/env python
"""Repetition-signal kernel (with_repetition) at 1x-30x the sf0.1 corpus.

with_repetition is PER-DOCUMENT (no corpus-derived state at all, unlike
the reverted round-14 spans/multiscale kernel probes), so plain
replication under fresh doc_ids is an EXACT invariant: every replica's
(dup_bigram_frac, top_token_frac) equals the 1x doc's values, hence the
micro-unit sums grow exactly N-fold. Sums are compared in exact integer
micro-units (round(frac*1e6) as BIGINT) so the assertion is order-free.

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

    from bm25_index_scale import replicate

    from capital.io import clear_engine_cache, load_table
    from capital.llm.text import with_repetition
    from capital.session import get_spark

    spark = get_spark(app_name="repetition-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    base = None
    for n in SCALES:
        rep = replicate(spark, docs, n)
        t0 = time.perf_counter()
        agg = with_repetition(rep).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.round(F.col("dup_bigram_frac") * 1e6).cast("long"))
            .alias("dup_u"),
            F.sum(F.round(F.col("top_token_frac") * 1e6).cast("long"))
            .alias("top_u"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        got = (int(agg["rows"]), int(agg["dup_u"]), int(agg["top_u"]))
        print(f"{n:3d}x: rows/dup_micro/top_micro = {got}, {dt:6.2f}s")
        if n == 1:
            base = got
        else:
            assert got == tuple(v * n for v in base), (n, got, base)
            print(f"{n}x: every sum exactly {n}x the 1x sums — linear")
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
