#!/usr/bin/env python
"""Unigram-LM (Kudo) trainer at design scale — two measurements:

1. **Replication invariance** (1x-30x the sf0.1 corpus, UNTAGGED
   copies so word counts multiply exactly Nx): the trainer's
   decisions are functions of count RATIOS, so the seed inventory,
   the EM prune set, the final vocabulary (pieces AND bit-identical
   prob6 — (N·u)/(N·total) rounds to the same double) and the
   fertility report's ratio columns must be BIT-identical across
   scales, while usage/word/piece/char counts are exactly Nx.
   Tagged replication (the spans/cross-snapshot methodology) would be
   WRONG here — tags mint new words and change every count.

2. **Viterbi E-pass growth with DISTINCT-word count** (the quantity
   replication cannot move): the Arrow-vectorized segmentation pass
   over synthetic Zipf vocabularies of 50k/200k/800k distinct words
   (the bpe_scale fixture) — cost must grow ~linearly in distinct
   words, since the kernel is O(len·PIECE_MAX_LEN) per distinct word
   with closure-bounded vocab state.

Results recorded in DESIGN_SCALE.md (round 15).
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
REP_SCALES = (1, 10, 30)
VOCAB_SCALES = (50_000, 200_000, 800_000)


def replicate_plain(spark, docs, n: int):
    """n exact copies with distinct doc_ids, text/source untouched."""
    from pyspark.sql import functions as F

    if n == 1:
        return docs
    reps = spark.range(n).withColumnRenamed("id", "__r")
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * n + F.col("__r")).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )


def main() -> None:
    from pyspark.sql import functions as F

    from bpe_scale import build_vocab
    from capital.io import clear_engine_cache, load_table
    from capital.llm.unigram import (
        seed_pieces,
        unigram_fertility,
        unigram_train,
        viterbi_usage,
        word_counts,
    )
    from capital.session import get_spark

    spark = get_spark(app_name="unigram-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    base_vocab = base_seed = base_fert = None
    for n in REP_SCALES:
        rep = replicate_plain(spark, docs, n)
        t0 = time.perf_counter()
        wc = word_counts(rep)
        seed = sorted(map(tuple, seed_pieces(wc).collect()))
        vocab = sorted(map(tuple, unigram_train(word_counts(rep)).collect()))
        fert = sorted(
            map(tuple, unigram_fertility(rep, word_counts(rep)).collect())
        )
        dt = time.perf_counter() - t0
        print(f"{n:3d}x: |seed|={len(seed)} |vocab|={len(vocab)} "
              f"strata={len(fert)}, {dt:6.2f}s")
        if n == 1:
            base_seed, base_vocab, base_fert = seed, vocab, fert
        else:
            # seeds: same pieces, freq exactly Nx.
            assert [p for p, _ in seed] == [p for p, _ in base_seed]
            assert [f for _, f in seed] == [f * n for _, f in base_seed]
            # vocab: same pieces, usage exactly Nx, prob6 BIT-identical.
            assert [v[0] for v in vocab] == [v[0] for v in base_vocab]
            assert [v[1] for v in vocab] == [v[1] * n for v in base_vocab]
            assert [v[2] for v in vocab] == [v[2] for v in base_vocab]
            # fertility: counts Nx, ratio columns BIT-identical.
            for got, ref in zip(fert, base_fert):
                s, w, t, c, f_, cpt = got
                s0, w0, t0_, c0, f0, cpt0 = ref
                assert s == s0 and w == w0 * n and t == t0_ * n
                assert c == c0 * n and f_ == f0 and cpt == cpt0
            print(f"{n}x: seed/vocab/prune/prob6/fertility decisions "
                  f"bit-identical, counts exactly {n}x — invariant")
        clear_engine_cache(spark)

    # --- Viterbi E-pass growth with distinct-word count --------------
    import bpe_scale

    for nw in VOCAB_SCALES:
        bpe_scale.N_WORDS = nw
        wc = build_vocab(spark).persist()
        n_distinct = wc.count()
        vocab = {r.piece: int(r.freq) for r in seed_pieces(wc).collect()}
        t0 = time.perf_counter()
        usage = viterbi_usage(wc, vocab)
        n_pieces = usage.count()
        dt = time.perf_counter() - t0
        print(f"viterbi pass: {n_distinct:,} distinct words -> "
              f"{n_pieces:,} used pieces in {dt:6.2f}s "
              f"({dt / n_distinct * 1e6:.1f} us/word)")
        wc.unpersist()
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
