#!/usr/bin/env python
"""WordPiece trainer decision invariance at 1x-30x (round 15).

Plain replication multiplies every word count exactly Nx, so each
round's pair count is N·p and each symbol count N·c — every score
becomes (N·p)/((N·cl)·(N·cr)) = score/N: ALL scores scale by the same
1/N, so the ARGMAX (the merge table's lhs/rhs sequence) must be
IDENTICAL across scales while pair_counts are exactly Nx. Near-tie
float flips would break this — the assert doubles as a determinism
guard on the score comparison.

Also times the distributed backend's per-round cost vs the bpe_scale
synthetic vocabulary (one pair aggregate + one symbol aggregate + a
1-row collect per round — vocabulary-sized, corpus-free).
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
K_MERGES = 16


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import clear_engine_cache, load_table
    from capital.llm.bpe import word_counts
    from capital.llm.wordpiece import wordpiece_train
    from capital.session import get_spark

    spark = get_spark(app_name="wordpiece-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    wc1 = word_counts(docs)

    base = None
    for n in SCALES:
        wc = wc1 if n == 1 else wc1.select(
            "word", (F.col("cnt") * n).alias("cnt")
        )
        t0 = time.perf_counter()
        rules, _ = wordpiece_train(wc, merges=K_MERGES, mode="local")
        dt = time.perf_counter() - t0
        table = [(r["lhs"], r["rhs"], r["pair_count"]) for r in rules]
        print(f"{n:3d}x: {len(table)} merges, first={table[0][:2]}, "
              f"{dt:6.2f}s")
        if n == 1:
            base = table
        else:
            assert [(a, b) for a, b, _ in table] == [
                (a, b) for a, b, _ in base
            ], "merge sequence changed under replication"
            assert [p for _, _, p in table] == [
                p * n for _, _, p in base
            ], "pair counts not exactly Nx"
            print(f"  merge sequence identical, pair counts exactly {n}x")
        clear_engine_cache(spark)

    # distributed-backend round cost on a big synthetic vocabulary
    import bpe_scale

    bpe_scale.N_WORDS = 200_000
    vocab = bpe_scale.build_vocab(spark).persist()
    nw = vocab.count()
    t0 = time.perf_counter()
    rules, _ = wordpiece_train(vocab, merges=4, mode="distributed")
    dt = time.perf_counter() - t0
    print(f"distributed: 4 rounds over {nw:,} words in {dt:.1f}s "
          f"({dt / 4:.2f}s/round)")


if __name__ == "__main__":
    main()
