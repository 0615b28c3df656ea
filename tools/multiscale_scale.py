#!/usr/bin/env python
"""Multi-scale substring ladder at 1x-30x the sf0.1 corpus — the
round-2 dedup-scaling methodology applied to round 10's
``llm/dedup.substring_dup_multiscale`` (round-10 verdict ask #7):
per-level corpus-wide duplicate counts and the island merge must
scale LINEARLY in documents, because the ladder's work is one base
explode + (levels-1) per-doc lead compositions + one count aggregate
per level — no pair join anywhere.

Replication keeps the workload honest (the round-2 trick): every
token is tagged with its replica id, so token counts and the
within-replica duplicate structure are identical at every scale and
replicas share zero windows — output rows and dup counts must grow
exactly N-fold.

Results recorded in DESIGN_SCALE.md (round 11).
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


def replicate_tagged(spark, docs, n: int):
    """Replica-tagged corpus: suffix every token with ``_r<k>``."""
    from pyspark.sql import functions as F

    if n == 1:
        return docs.select("doc_id", "text")
    rep = spark.range(n).withColumnRenamed("id", "rep")
    tagged = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.concat(t, F.lit("_r"), F.col("rep").cast("string")),
        ),
        " ",
    )
    return docs.crossJoin(rep).select(
        (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
        tagged.alias("text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import load_table
    from capital.llm.dedup import substring_dup_multiscale
    from capital.operators.caching import CacheScope
    from capital.session import get_spark

    spark = get_spark("multiscale-scale")
    docs = load_table(spark, SF_DIR, "documents")
    base = None
    for n in SCALES:
        corpus = replicate_tagged(spark, docs, n).persist()
        rows = corpus.count()
        t0 = time.monotonic()
        with CacheScope() as scope:
            out = substring_dup_multiscale(corpus, scope=scope)
            agg = (
                out.groupBy("window_tokens")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n_dup_windows").alias("dup_windows"),
                    F.sum("n_dup_spans").alias("dup_spans"),
                    F.sum("dup_tokens").alias("dup_tokens"),
                )
                .orderBy("window_tokens")
                .collect()
            )
        dt = time.monotonic() - t0
        per_level = {
            int(r.window_tokens): (
                int(r.n_rows), int(r.dup_windows),
                int(r.dup_spans), int(r.dup_tokens),
            )
            for r in agg
        }
        print(f"{n}x: {rows:,} docs, {dt:.1f} s, per-level "
              f"(rows, dup_windows, dup_spans, dup_tokens): {per_level}")
        if n == 1:
            base = per_level
        else:
            for lvl, vals in per_level.items():
                b = base[lvl]
                assert vals == tuple(v * n for v in b), (n, lvl, vals, b)
            print(f"{n}x: every level exactly {n}x the 1x counts — linear")
        corpus.unpersist()


if __name__ == "__main__":
    main()
