#!/usr/bin/env python
"""Surgical span decontamination at 1x-30x the sf0.1 training corpus
(round 14: the mapInPandas-kernel rewrite's scale evidence).

decontaminate_spans is PER-DOCUMENT once the benchmark gram set is
broadcast, so plain replication (same docs under fresh ids, benchmark
held fixed) is an EXACT invariant — no replica tagging needed: every
replica's per-doc rows must equal the 1x run's rows value-for-value,
and the output must grow exactly N-fold. Runtime must grow linearly
(one narrow Arrow pass over the train side; the build side — bench
shingle distinct + collect — is constant).

Results recorded in DESIGN_SCALE.md (round 14).
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

    from capital.io import load_table
    from capital.llm.assemble import decontaminate_spans
    from capital.queries.assemble_queries import _DECON_K, _DECON_MOD
    from capital.session import get_spark

    spark = get_spark(app_name="decon-scale")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")
    bench = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    train1 = d.filter(F.col("doc_id") % _DECON_MOD != 0)

    base = None
    for n in SCALES:
        if n == 1:
            train = train1.select("doc_id", "text")
        else:
            rep = spark.range(n).withColumnRenamed("id", "rep")
            train = train1.crossJoin(rep).select(
                (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
                "text",
            )
        t0 = time.perf_counter()
        out = decontaminate_spans(train, bench, k=_DECON_K)
        rows = out.select(
            (F.col("doc_id") if n == 1 else (F.col("doc_id") / n).cast("long")
             ).alias("orig_id"),
            "n_tokens", "n_removed_tokens", "clean_md5",
        ).toArrow().to_pylist()
        dt = time.perf_counter() - t0
        sig = sorted((r["orig_id"], r["n_tokens"], r["n_removed_tokens"],
                      r["clean_md5"]) for r in rows)
        if n == 1:
            base = sig
            base_rows = len(sig)
        else:
            assert len(sig) == n * base_rows, (n, len(sig), base_rows)
            # every replica equals the 1x result value-for-value
            expected = sorted(t for t in base for _ in range(n))
            assert sig == expected, f"replica outputs diverge at {n}x"
        removed = sum(r["n_removed_tokens"] for r in rows)
        print(f"{n:3d}x: {len(rows):7d} docs, {removed:9d} removed tokens, "
              f"{dt:6.2f}s")


if __name__ == "__main__":
    main()
