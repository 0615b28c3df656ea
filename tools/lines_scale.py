#!/usr/bin/env python
"""C4 line family at 1x-30x the sf0.1 corpus.

Two operators, two replication disciplines (each chosen so the scale
invariant is EXACT):

- ``c4_quality_filter`` is PER-DOCUMENT: plain replication (fresh
  doc_ids, text untouched) makes every replica's signals identical,
  so integer-count sums and micro-unit ratio sums grow exactly Nx.
- ``dedup_corpus_lines`` is CORPUS-WIDE: plain replication would NOT
  scale linearly (N copies of a line shared by p positions remove
  N·p−1, not N·(p−1)), so lines are REPLICA-TAGGED — each line gains
  a per-replica prefix token, making cross-replica lines distinct
  while within-replica dup structure is untouched; n_lines and
  n_removed_lines sums are then exactly Nx (asserted).

The fixture is built ONCE from the original doc_ids (the line fixture
derives its injections from doc_id arithmetic, so replicating BEFORE
the fixture would change per-replica line structure).

Results recorded in DESIGN_SCALE.md (round 15).
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


def replicate_plain(spark, lined, n: int):
    from pyspark.sql import functions as F

    if n == 1:
        return lined
    rep = spark.range(n).withColumnRenamed("id", "__r")
    return lined.crossJoin(F.broadcast(rep)).select(
        (F.col("doc_id") * n + F.col("__r")).alias("doc_id"),
        "lined_text",
    )


def replicate_line_tagged(spark, lined, n: int):
    """Each replica prefixes every LINE with a replica token: line
    identity is distinct across replicas, identical within one."""
    from pyspark.sql import functions as F

    if n == 1:
        return lined
    rep = spark.range(n).withColumnRenamed("id", "__r")
    tagged = F.array_join(
        F.transform(
            F.split(F.col("lined_text"), "\n"),
            lambda l: F.concat(
                F.lit("r"), F.col("__r").cast("string"), F.lit("x "), l
            ),
        ),
        "\n",
    )
    return lined.crossJoin(F.broadcast(rep)).select(
        (F.col("doc_id") * n + F.col("__r")).alias("doc_id"),
        tagged.alias("lined_text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import clear_engine_cache, load_table
    from capital.llm.c4 import (
        c4_quality_filter,
        dedup_corpus_lines,
        with_line_fixture,
    )
    from capital.session import get_spark

    spark = get_spark(app_name="lines-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    lined = with_line_fixture(docs).select("doc_id", "lined_text")

    base = None
    for n in SCALES:
        rep = replicate_plain(spark, lined, n)
        t0 = time.perf_counter()
        agg = c4_quality_filter(rep).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_lines").alias("nl"),
            F.sum("n_kept_lines").alias("nk"),
            F.sum(F.col("c4_keep").cast("long")).alias("keep"),
            F.sum(F.col("has_brace").cast("long")).alias("brace"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        got = tuple(int(agg[c]) for c in ("rows", "nl", "nk", "keep", "brace"))
        print(f"c4_rules {n:3d}x: {got}, {dt:6.2f}s")
        if n == 1:
            base = got
        else:
            assert got == tuple(v * n for v in base), (n, got, base)
            print(f"  every count exactly {n}x — per-doc invariant")
        clear_engine_cache(spark)

    base = None
    for n in SCALES:
        rep = replicate_line_tagged(spark, lined, n)
        t0 = time.perf_counter()
        agg = dedup_corpus_lines(rep).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_lines").alias("nl"),
            F.sum("n_removed_lines").alias("nr"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        got = tuple(int(agg[c]) for c in ("rows", "nl", "nr"))
        print(f"dedup_lines {n:3d}x: rows/lines/removed = {got}, {dt:6.2f}s")
        if n == 1:
            base = got
        else:
            assert got == tuple(v * n for v in base), (n, got, base)
            print(f"  removed-line mass exactly {n}x — tagged invariant")
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
