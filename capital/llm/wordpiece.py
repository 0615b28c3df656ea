"""WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
tokenizer) — the third member of the engine's tokenizer-trainer
family next to greedy-count BPE (``llm/bpe.py``) and the unigram-LM
trainer (``llm/unigram.py``).

WordPiece is BPE with a different merge objective: instead of the
most FREQUENT adjacent pair, each round merges the pair maximizing
the likelihood gain of a unigram LM over the current symbolization —

    score(a, b) = count(ab) / (count(a) · count(b))

(count(x) = occurrences of symbol x across the symbolized vocabulary,
weighted by word count). Rare-but-strongly-associated pairs win over
merely common ones ("##ing" attaches before "th e" fuses). Ties break
(score desc, lhs asc, rhs asc); the score is one IEEE-double division
of exact integer counts, so the comparison replicates bit-exactly in
SQL (equal rationals round to the same double; the engine's
float-literal discipline).

Symbolization, the greedy non-overlapping merge (double-separator
delimited ``replace``), vocabulary thresholding and the final state
are SHARED with ``llm/bpe.py`` — WordPiece's word-internal ``##``
prefix convention is isomorphic to the engine's end-of-word marker
(both distinguish word-boundary symbols; the marker form keeps one
merge machinery for all trainers).

OOV contract (round 16, recorded for the whole trainer triad): apply
side uses the SHARED bpe machinery — ``bpe_vocab(rules, state,
unk_token=UNK)`` + ``word_token_ids(..., unk_token=UNK)`` — so
characters never seen in training encode to the reserved ``B + K``
UNK id exactly as in ``llm/bpe.py`` (pinned by llm_bpe_encode_oov);
the unigram trainer's Viterbi applies the same decision
(``llm/unigram._UNK``).

Modes (the bpe_train contract):

- ``mode="local"`` (default): collect the (word, count) vocabulary
  once (bounded by ``max_vocab``/``min_count``) and train in-memory.
  Unlike count-BPE, a merge changes EVERY score involving the merged
  pair's symbols (the denominators), so the local trainer recomputes
  pair/symbol counts per round — O(vocab·len) per merge, fine into
  the hundreds of merges the checkable queries and tests use; for
  30k-merge production runs the incremental-heap variant of the BPE
  trainer does not transfer (global score invalidation), which is a
  known property of WordPiece training, not an engine limitation.
- ``mode="distributed"``: the K-round Spark loop — per round ONE
  vocabulary-sized pair aggregate + ONE symbol aggregate + a 1-row
  winner collect (bounded metadata, the IVF-probe precedent).

Scale: identical to BPE — the corpus is touched once (word_counts);
every round runs over the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from capital.llm.bpe import (
    SEP,
    _greedy_merge,
    _pair_counts,
    _threshold_vocab,
    sym_init,
)


def _symbol_counts(state: DataFrame) -> DataFrame:
    """Occurrences of every symbol in the current symbolization,
    weighted by word count — the score's denominators."""
    syms = F.filter(
        F.split(F.col("sym"), r"\|"), lambda x: x != F.lit("")
    )
    return (
        state.select(F.col("cnt"), F.explode(syms).alias("s"))
        .groupBy("s")
        .agg(F.sum("cnt").alias("sym_count"))
    )


def wordpiece_train(
    words: DataFrame,
    merges: int = 8,
    word_col: str = "word",
    count_col: str = "cnt",
    checkpoint_dir: str | None = None,
    mode: str = "local",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> tuple[list[dict], DataFrame]:
    """Train ``merges`` WordPiece merge rules over a ``(word, count)``
    vocabulary. Returns ``(rules, final_state)`` exactly like
    :func:`capital.llm.bpe.bpe_train` — ``rules`` rows carry
    ``step/lhs/rhs/merged/pair_count/score``; ``final_state`` is the
    symbolized vocabulary (counting symbols applies the tokenizer).
    Backend equivalence is property-tested."""
    if mode == "local":
        return _wordpiece_train_local(
            words, merges, word_col, count_col, max_vocab, min_count
        )
    if mode != "distributed":
        raise ValueError(f"wordpiece_train: unknown mode {mode!r}")
    if max_vocab is not None or min_count > 1:
        words = _threshold_vocab(
            words, word_col, count_col, max_vocab, min_count
        )
    from capital.io import plan_checkpointer

    ckpt = plan_checkpointer(words.sparkSession, checkpoint_dir)
    state = ckpt(
        words.select(
            F.col(word_col).alias("word"),
            F.col(count_col).cast("long").alias("cnt"),
            sym_init(F.col(word_col)).alias("sym"),
        )
    )
    rules: list[dict] = []
    for step in range(1, int(merges) + 1):
        pc = _pair_counts(state)
        sc = _symbol_counts(state)
        top = (
            pc.join(
                sc.select(
                    F.col("s").alias("lhs"),
                    F.col("sym_count").alias("__cl"),
                ),
                "lhs",
            )
            .join(
                sc.select(
                    F.col("s").alias("rhs"),
                    F.col("sym_count").alias("__cr"),
                ),
                "rhs",
            )
            .withColumn(
                # exact integer product via DECIMAL(38,0) — a
                # long*long product overflows 2^63 at few-billion-
                # token symbol counts (ANSI throws) while the local
                # backend's Python ints don't (round-15 review);
                # decimal→double is correctly rounded, so all
                # backends and the HUGEINT-product oracle agree
                # bit-exactly.
                "score",
                F.col("pair_count").cast("double")
                / (
                    F.col("__cl").cast("decimal(19,0)")
                    * F.col("__cr").cast("decimal(19,0)")
                ).cast("double"),
            )
            .orderBy(F.desc("score"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs = top[0]["lhs"], top[0]["rhs"]
        rules.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "pair_count": int(top[0]["pair_count"]),
                "score": float(top[0]["score"]),
            }
        )
        state = ckpt(
            state.withColumn(
                "sym",
                F.replace(
                    F.col("sym"),
                    F.lit(f"{SEP}{lhs}{SEP}{SEP}{rhs}{SEP}"),
                    F.lit(f"{SEP}{lhs}{rhs}{SEP}"),
                ),
            )
        )
    return rules, state


def _wordpiece_train_local(
    words: DataFrame,
    merges: int,
    word_col: str,
    count_col: str,
    max_vocab: int | None,
    min_count: int,
) -> tuple[list[dict], DataFrame]:
    """Driver-local WordPiece over the collected vocabulary: per round
    a full pair/symbol recount (scores invalidate globally on every
    merge — see the module docstring), then the same greedy merge."""
    from capital.llm.bpe import EOW

    spark = words.sparkSession
    vocab_df = _threshold_vocab(
        words, word_col, count_col, max_vocab, min_count
    ).select(
        F.col(word_col).alias("word"), F.col(count_col).cast("long").alias("cnt")
    )
    tbl = vocab_df.toArrow()
    wlist = tbl.column("word").to_pylist()
    clist = tbl.column("cnt").to_pylist()
    state: list[tuple[list, int]] = [
        (list(w) + [EOW], int(c)) for w, c in zip(wlist, clist)
    ]
    rules: list[dict] = []
    for step in range(1, int(merges) + 1):
        pair_cnt: dict[tuple, int] = {}
        sym_cnt: dict[str, int] = {}
        for syms, c in state:
            for s in syms:
                sym_cnt[s] = sym_cnt.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + c
        if not pair_cnt:
            break
        best = min(
            pair_cnt.items(),
            key=lambda kv: (
                -(float(kv[1]) / float(sym_cnt[kv[0][0]] * sym_cnt[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        (lhs, rhs), pc = best
        score = float(pc) / float(sym_cnt[lhs] * sym_cnt[rhs])
        rules.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "pair_count": int(pc),
                "score": score,
            }
        )
        state = [
            (_greedy_merge(syms, lhs, rhs, lhs + rhs), c)
            for syms, c in state
        ]
    out = spark.createDataFrame(
        [
            (w, c, SEP * 2 + (SEP * 2).join(syms) + SEP * 2)
            for (syms, c), w in zip(state, wlist)
        ],
        "word string, cnt long, sym string",
    )
    return rules, out
