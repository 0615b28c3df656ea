#!/usr/bin/env python
"""Stored BM25 index at 1x-30x the sf0.1 corpus: the design claim is
that a stored posting index decouples query cost from corpus
tokenization — the in-call scorer re-tokenizes the whole corpus per
workload, the stored probe reads postings pruned to query terms.

Method: the sf0.1 documents corpus replicated N x with shifted doc
ids and UNCHANGED text (a growing lake where matching docs grow with
the lake — postings for the query terms grow linearly on both
paths), then per scale: build+write the index once, and time (a) the
in-call ``bm25_topk`` and (b) the stored ``bm25_topk_stored``
(warm-second-run, fresh plan per pass). Scores must agree exactly at
every scale (same fold; asserted in-run).

Results recorded in DESIGN_SCALE.md (round 11).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 30)


def replicate(spark, docs, n: int):
    from pyspark.sql import functions as F

    if n == 1:
        return docs.select("doc_id", "text")
    rep = spark.range(n).withColumnRenamed("id", "rep")
    return docs.crossJoin(rep).select(
        (F.col("doc_id") * n + F.col("rep")).alias("doc_id"), "text"
    )


def main() -> None:
    from capital.io import load_table
    from capital.llm.retrieval import (
        bm25_topk,
        bm25_topk_stored,
        write_bm25_index,
    )
    from capital.session import get_spark

    spark = get_spark("bm25-index-scale")
    docs = load_table(spark, SF_DIR, "documents")
    for n in SCALES:
        corpus = replicate(spark, docs, n).persist()
        rows = corpus.count()
        idx = os.path.join(tempfile.gettempdir(), f"bm25_scale_{n}x")
        t0 = time.monotonic()
        write_bm25_index(corpus, idx)
        dt_build = time.monotonic() - t0

        def timed(fn):
            ts = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                out = fn()
                res = out.toArrow()
                ts.append(time.monotonic() - t0)
            return ts[-1], res

        dt_incall, r_incall = timed(lambda: bm25_topk(corpus))
        dt_stored, r_stored = timed(lambda: bm25_topk_stored(spark, idx))
        a = sorted(tuple(d.values()) for d in r_incall.to_pylist())
        s = sorted(tuple(d.values()) for d in r_stored.to_pylist())
        assert a == s and len(a) > 0
        print(
            f"{n}x: {rows:,} docs — build+write {dt_build:.1f} s, "
            f"in-call query {dt_incall:.2f} s, "
            f"stored probe {dt_stored:.2f} s (scores identical)"
        )
        corpus.unpersist()


if __name__ == "__main__":
    main()
