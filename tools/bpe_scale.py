#!/usr/bin/env python
"""BPE training at design scale: measured evidence that driver-local
merge training (``bpe_train(mode="local")``) reaches realistic merge
counts (K ≥ 1024) in seconds, where the distributed K-round loop pays
K × ~0.4 s of pure job-scheduling floor (round-9 verdict: 30k merges
would be days of scheduling).

Fixture: a deterministic Zipf-ish synthetic vocabulary — ``N_WORDS``
distinct words over a 26-letter alphabet with power-law counts —
built JVM-side (spark.range + hash arithmetic, no driver data), so
the measurement includes the real bounded ``toArrow`` vocabulary
collect. Word lengths 3–12, Zipf exponent ~1.1 via rank-based counts
(count = N_WORDS / rank, floored, min 1) — the long-tail shape a web
corpus rollup has.

Timed: ``bpe_train(mode="local", merges=K)`` end-to-end (collect +
train + final-state createDataFrame + a count() to materialize).
Results recorded in DESIGN_SCALE.md (round 10).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_WORDS = 200_000
K_MERGES = 4096


def build_vocab(spark):
    from pyspark.sql import functions as F

    base = spark.range(1, N_WORDS + 1).withColumnRenamed("id", "rank")
    # Deterministic pseudo-word per rank: length 3 + rank%10, letters
    # from xxhash64(rank, position) — JVM-side, no driver data.
    length = (F.col("rank") % 10 + 3).cast("int")
    letters = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.chr(
            F.pmod(F.xxhash64(F.col("rank") * 31 + i), F.lit(26)) + F.lit(97)
        ),
    )
    word = F.concat_ws("", letters)
    cnt = F.greatest(
        (F.lit(N_WORDS) / F.col("rank")).cast("long"), F.lit(1)
    )
    # Hash collisions between pseudo-words are harmless (counts sum),
    # but keep the rollup honest: group by word.
    return (
        base.select(word.alias("word"), cnt.alias("cnt"))
        .groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
    )


def main() -> None:
    from pyspark.sql import functions as F

    from capital.llm.bpe import bpe_train
    from capital.session import get_spark

    spark = get_spark("bpe-scale")
    vocab = build_vocab(spark).persist()
    n = vocab.count()
    total = vocab.groupBy().sum("cnt").collect()[0][0]
    print(f"vocabulary: {n:,} distinct words, {total:,} corpus tokens")

    t0 = time.monotonic()
    rules, state = bpe_train(vocab, merges=K_MERGES, mode="local")
    n_state = state.count()
    dt = time.monotonic() - t0
    print(
        f"local training: K={len(rules)} merges over {n_state:,} words "
        f"in {dt:.1f} s ({dt / max(len(rules), 1) * 1000:.2f} ms/merge)"
    )
    print("first merges:", [(r["lhs"], r["rhs"]) for r in rules[:5]])
    print("last merge pair_count:", rules[-1]["pair_count"] if rules else None)

    # Distributed floor for contrast: time 8 rounds, extrapolate.
    t0 = time.monotonic()
    r8, _ = bpe_train(vocab, merges=8, mode="distributed")
    dt8 = time.monotonic() - t0
    per_round = dt8 / max(len(r8), 1)
    print(
        f"distributed: 8 merges in {dt8:.1f} s ({per_round:.2f} s/round) "
        f"-> K={K_MERGES} would be ~{per_round * K_MERGES / 60:.0f} min"
    )
    assert rules[:8] == r8, "local/distributed disagree on shared prefix"
    print("prefix equivalence: OK (first 8 merges identical)")

    # Round 11: the production tokenize pass at the same realistic K —
    # group the vocabulary into pseudo-docs and run bpe_encode (id
    # table + per-word id sequences built once, corpus encoded via one
    # join + ordered flatten; no per-document merge loop at any K).
    from capital.llm.bpe import bpe_encode

    docs = (
        vocab.select(
            F.pmod(F.xxhash64("word"), F.lit(20_000)).alias("doc_id"), "word"
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("word")).alias("text"))
        .persist()
    )
    n_docs = docs.count()
    t0 = time.monotonic()
    enc = bpe_encode(docs, rules, state)
    stats = enc.agg(
        F.count(F.lit(1)), F.sum(F.size("token_ids"))
    ).collect()[0]
    dt_enc = time.monotonic() - t0
    print(
        f"encode at K={len(rules)}: {n_docs:,} docs -> "
        f"{stats[1]:,} token ids in {dt_enc:.1f} s "
        f"({stats[0]:,} docs encoded)"
    )
    assert stats[0] == n_docs


if __name__ == "__main__":
    main()
