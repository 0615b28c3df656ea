#!/usr/bin/env python
"""Naive Bayes classifier at 1x-30x (round 15): the EXACT invariant.

Plain replication multiplies every model count by N (token counts,
class masses, doc counts) while per-document term frequencies are
unchanged. With the Laplace pseudo-count scaled to alpha = N, every
log term is the SAME rational number — ln((N·c + N)/(N·D + N·V)) =
ln((c+1)/(D+V)) — computed from exact integers, so every per-document
score6 and prediction must be BIT-identical across scales (asserted).
(With alpha FIXED the smoothing weakens as counts grow — predictions
legitimately drift toward the unsmoothed MLE; that is NB behavior,
not an engine property, which is why the guard scales alpha.)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 30)


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import clear_engine_cache, load_table
    from capital.llm.nbayes import nb_classify, nb_train
    from capital.session import get_spark

    spark = get_spark(app_name="nbayes-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    base = None
    for n in SCALES:
        if n == 1:
            rep = docs
        else:
            r = spark.range(n).withColumnRenamed("id", "__r")
            rep = docs.crossJoin(F.broadcast(r)).select(
                (F.col("doc_id") * n + F.col("__r")).alias("doc_id"),
                "lang", "text",
            )
        t0 = time.perf_counter()
        model = nb_train(rep)
        out = nb_classify(rep, model, alpha=float(n))
        # fold replicas back to the original doc identity.
        folded = sorted(
            map(tuple, out.select(
                (F.col("doc_id") if n == 1
                 else (F.col("doc_id") - F.col("doc_id") % n) / n)
                .cast("long").alias("orig"),
                "nb_pred", "score6",
            ).distinct().collect())
        )
        dt = time.perf_counter() - t0
        print(f"{n:3d}x: {len(folded)} distinct (doc, pred, score6) "
              f"rows, {dt:6.2f}s")
        if n == 1:
            base = folded
        else:
            assert folded == base, "NB decisions moved under replication"
            print(f"  predictions AND score6 bit-identical at {n}x "
                  f"(alpha = {n})")
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
