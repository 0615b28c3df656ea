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
    from capital.llm.text import (
        GOPHER_COVER_NS,
        GOPHER_DUP_NS,
        with_gopher_ngrams,
        with_repetition,
    )
    from capital.session import get_spark

    spark = get_spark(app_name="repetition-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    battery_cols = (
        [f"dup_{n}gram_frac" for n in GOPHER_DUP_NS]
        + [f"top_{n}gram_char_frac" for n in GOPHER_DUP_NS]
        + [f"dup_{n}gram_char_frac" for n in GOPHER_COVER_NS]
    )
    for label, fn, cols in (
        ("with_repetition", with_repetition,
         ["dup_bigram_frac", "top_token_frac"]),
        ("gopher_battery", with_gopher_ngrams, battery_cols),
    ):
        base = None
        for n in SCALES:
            rep = replicate(spark, docs, n)
            t0 = time.perf_counter()
            agg = fn(rep).agg(
                F.count(F.lit(1)).alias("rows"),
                *[
                    F.sum(F.round(F.col(c) * 1e6).cast("long")).alias(c)
                    for c in cols
                ],
            ).collect()[0]
            dt = time.perf_counter() - t0
            got = tuple(int(agg[c]) for c in ["rows"] + cols)
            print(f"{label} {n:3d}x: rows={got[0]}, {dt:6.2f}s")
            if n == 1:
                base = got
            else:
                assert got == tuple(v * n for v in base), (
                    label, n, got, base)
                print(f"  every micro-unit sum exactly {n}x — linear")
            clear_engine_cache(spark)

    # --- LONG-document stratum (round-15 verdict ask #1) -------------
    # The quadratic-argmax bug was invisible on the <=100-token corpus
    # docs; this stratum measures the battery in the regime that broke
    # it: documents of 5k-40k tokens with tens of thousands of
    # DISTINCT grams each. The hoisted-argmax kernel is O(doc_len*SUMn)
    # per doc, so wall must grow ~linearly in total token volume.
    import random

    rng = random.Random(42)
    long_rows = []
    did = 0
    for n_toks, n_docs in ((5_000, 64), (20_000, 16), (40_000, 8)):
        for _ in range(n_docs):
            did += 1
            toks = [f"w{rng.randrange(n_toks)}" for _ in range(n_toks)]
            long_rows.append((did, n_toks, " ".join(toks)))
    long_df = spark.createDataFrame(
        long_rows, "doc_id long, n_toks long, text string"
    ).repartition(32)
    for n_toks in (5_000, 20_000, 40_000):
        sub = long_df.filter(F.col("n_toks") == n_toks)
        t0 = time.perf_counter()
        cnt = with_gopher_ngrams(sub).select("dup_2gram_frac").count()
        dt = time.perf_counter() - t0
        vol = cnt * n_toks
        print(f"battery long-doc: {cnt} docs x {n_toks} toks "
              f"({vol / 1e6:.2f}M tokens) in {dt:6.2f}s "
              f"({dt / vol * 1e6:.2f} us/token)")
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
