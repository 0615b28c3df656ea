"""Unigram-LM (SentencePiece-style) tokenizer training — the second
member of the tokenizer-training family next to :mod:`capital.llm.bpe`
(Kudo 2018, "Subword Regularization": vocabulary as a unigram language
model fitted by EM + pruning, vs BPE's greedy merges).

Algorithm (hard-EM over the (word, count) vocabulary state, the
bpe_train posture — corpus touched ONCE, every iteration runs over
distinct words):

1. reduce the corpus to ``(word, cnt)`` (words capped at
   :data:`WORD_CAP` chars — both engines truncate identically);
2. seed the piece inventory with every word substring of length ≤
   :data:`PIECE_MAX_LEN`, frequency = occurrence-weighted word counts;
   keep the top :data:`SEED_KEEP` by (freq desc, piece asc) plus ALL
   single characters (segmentation coverage guarantee);
3. repeat :data:`EM_ROUNDS` times (hard EM): Viterbi-segment every
   distinct word under the current piece scores, count piece usage
   weighted by word count, and re-score pieces by their usage
   (unused multi-char pieces drop out; single chars persist at 0);
4. prune to the top :data:`VOCAB_TARGET` pieces by (usage desc,
   piece asc), keeping single chars, and emit the vocabulary with
   usage counts and renormalized round6-stable probabilities.

Determinism/parity discipline (why hard EM, not Kudo's soft EM): the
engine's oracle gate hash-compares against DuckDB, and marginal
likelihoods are iterated float sums whose 1-ulp drift can flip a
segmentation argmax. The Viterbi objective here is **pure-integer
lexicographic** — minimize piece count, tie-break by maximal summed
piece frequency (exact integers), tie-break by lexicographically
smallest piece sequence — so the chosen segmentation is identical on
any engine, and every EM quantity is an exact integer until the one
final probability division (round6-stable, the kmeans micro-unit
discipline). The DP is exact for this objective: appending a piece
to a prefix preserves the (n_pieces, -sum_freq, path) ordering, so
per-position minima compose.

Scale shape: one corpus pass (map-side-combined word count); every
round is vocabulary-sized — an Arrow-vectorized ``pandas_udf`` runs
the per-word DP over DISTINCT words (the piece table rides along as
a closure dict: bounded at SEED_KEEP + alphabet rows, the kmeans
k×dim state precedent), one explode + map-side-combined usage sum,
one bounded collect per round to refresh the dict. The 100 TB corpus
is never touched after step 1.

Oracle: the DuckDB twin enumerates ALL segmentations per word with a
recursive CTE (bounded: compositions with parts ≤ 4 of ≤ 16 chars —
tetranacci(16) ≈ 2.9k paths/word worst case) and picks the same
lexicographic minimum — deliberately brute-force ground truth, the
fullrecall-oracle convention.
"""

from __future__ import annotations

import pandas as pd  # module-top: pandas_udf type hints resolve in
# the module namespace under `from __future__ import annotations`
# (CLAUDE.md — a function-local import gives UNSUPPORTED_SIGNATURE).
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Maximum piece length considered by the seeder and the DP.
PIECE_MAX_LEN = 4
#: OOV piece marker — IMPORTED from llm/bpe so every tokenizer in
#: the triad exposes ONE unknown-character contract (round 16):
#: apply-side segmentation is total; characters never seen in
#: training become this piece (frequency 0).
from capital.llm.bpe import UNK as _UNK  # noqa: E402
#: Hard-EM rounds.
EM_ROUNDS = 2
#: Final vocabulary size (multi-char pieces compete for these slots;
#: single chars are always retained on top).
VOCAB_TARGET = 32
#: Seed inventory size before EM.
SEED_KEEP = 160
#: Words are truncated to this many chars on BOTH engines (bounds the
#: oracle's exhaustive enumeration; real corpora tail off far below).
WORD_CAP = 16


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(word, cnt)``: the single corpus-wide pass.
    Whitespace tokens (the bpe.word_counts convention), capped at
    :data:`WORD_CAP` chars, empty tokens dropped."""
    from capital.llm.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .select(F.substring("__w", 1, WORD_CAP).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def seed_pieces(wc: DataFrame) -> DataFrame:
    """Substring seed inventory: ``(piece, freq)`` — top
    :data:`SEED_KEEP` by (freq desc, piece asc) ∪ all single chars.
    Occurrence-weighted: every start position of a substring counts
    ``cnt`` (a vocabulary-sized explode — ≤ WORD_CAP·PIECE_MAX_LEN
    pieces per distinct word)."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(PIECE_MAX_LEN), F.length(w) - i + 1),
                ),
                lambda l: F.substr(w, i, l),
            ),
        )
    )
    freq = (
        wc.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("piece")).limit(SEED_KEEP)
    singles = freq.filter(F.length("piece") == 1)
    return top.unionByName(singles).dropDuplicates(["piece"])


def _viterbi_path(word: str, vocab: dict[str, int]) -> list[str]:
    """The exact-integer lexicographic Viterbi: minimize
    ``(n_pieces, -sum_freq, path)``. Module-level so tests can pin it
    directly; called per distinct word from the Arrow kernel."""
    n = len(word)
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0, 0, ())
    for j in range(1, n + 1):
        cand = None
        for piece_len in range(1, min(PIECE_MAX_LEN, j) + 1):
            piece = word[j - piece_len : j]
            freq = vocab.get(piece)
            prev = best[j - piece_len]
            if prev is None:
                continue
            if freq is None:
                if piece_len != 1:
                    continue
                # OOV contract (round 16, the llm/bpe.UNK decision
                # applied to unigram): a character outside the
                # trained piece inventory segments as the UNK piece
                # with frequency 0 — apply is total over ANY corpus.
                # Unreachable for training-corpus words (their single
                # chars are always seeded), so trained segmentations
                # are unchanged.
                c = (prev[0] + 1, prev[1], prev[2] + (_UNK,))
            else:
                c = (prev[0] + 1, prev[1] - freq, prev[2] + (piece,))
            if cand is None or c < cand:
                cand = c
        best[j] = cand
    # Total by the single-char/UNK fallback above.
    assert best[n] is not None, f"unsegmentable word {word!r}"
    return list(best[n][2])


def viterbi_usage(wc: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """One hard-E step: ``(piece, usage)`` — Viterbi-segment each
    distinct word (Arrow-vectorized pandas_udf, vocab dict in the
    closure — bounded state, the kmeans precedent), weight by word
    count, map-side-combined sum."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    # Lazy UDF construction (CLAUDE.md: pandas_udf needs an active
    # session — never create at module import).
    @pandas_udf(ArrayType(StringType()))
    def _segment(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _viterbi_path(w, vocab))

    return (
        wc.select(F.explode(_segment("word")).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("usage"))
    )


def _train_vocab(
    wc: DataFrame, rounds: int
) -> tuple[dict[str, int], list[str], DataFrame]:
    """The EM loop: returns (piece → usage after the final E step,
    sorted single chars, the MATERIALIZED word-count frame). Each
    round is one distributed E step + one bounded collect (SEED_KEEP
    + alphabet rows, the kmeans state precedent). ``wc`` is
    localCheckpoint-barriered first — the seed pass and every round
    read it, and without the barrier each would re-run the
    corpus-sized explode+count lineage (the multi-referenced-
    intermediate rule)."""
    wc = wc.localCheckpoint(eager=False)
    seed_rows = seed_pieces(wc).collect()  # bounded
    vocab = {r.piece: int(r.freq) for r in seed_rows}
    singles = sorted(p for p in vocab if len(p) == 1)
    for _ in range(rounds):
        usage_rows = viterbi_usage(wc, vocab).collect()  # bounded
        # M step: scores ← usage; unused multi-char pieces drop,
        # single chars persist at 0 (coverage guarantee).
        vocab = {r.piece: int(r.usage) for r in usage_rows}
        for c in singles:
            vocab.setdefault(c, 0)
    return vocab, singles, wc


def unigram_train(
    wc: DataFrame,
    rounds: int = EM_ROUNDS,
    vocab_target: int = VOCAB_TARGET,
) -> DataFrame:
    """Train the unigram vocabulary; returns ``(piece, usage, prob6)``
    — usage from the final E step, prob6 the round6-stable
    renormalized probability over the kept set. See the module
    docstring for the algorithm and determinism contract."""
    from capital.llm.text import round6_stable

    spark = wc.sparkSession
    vocab, singles, _wc = _train_vocab(wc, rounds)
    # Prune: top vocab_target by (usage desc, piece asc) ∪ singles.
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_target]} | set(singles)
    final = [(p, u) for p, u in sorted(vocab.items()) if p in kept]
    total = sum(u for _, u in final)
    out = spark.createDataFrame(final, "piece string, usage long")
    return out.select(
        "piece",
        "usage",
        round6_stable(
            F.col("usage").cast("double") / F.lit(float(total))
        ).alias("prob6"),
    )


def unigram_doc_tokens(
    docs: DataFrame,
    wc: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = EM_ROUNDS,
) -> DataFrame:
    """Apply the trained tokenizer: per-document unigram piece count
    ``(doc_id, n_unigram_tokens)`` — the fertility comparison row next
    to llm_bpe_doc_tokens. The vocabulary (not the corpus) carries the
    per-word piece count via one more Viterbi pass over DISTINCT
    words; documents join it once (broadcast-sized here, a shuffle
    join at web scale) — the 100 TB apply pass costs one join, never
    a per-document DP."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    from capital.llm.text import tokens

    doc_words, per_word = _apply_frames(docs, wc, id_col, text_col, rounds)
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy(id_col)
        .agg(F.sum("n_sub").cast("long").alias("n_unigram_tokens"))
    )


def apply_piece_counts(words: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """Per-DISTINCT-word apply pass over a trained piece dict:
    ``(word, n_sub, n_unk)`` — total Viterbi pieces and how many are
    the UNK fallback (characters outside the trained inventory, the
    round-16 OOV contract). Arrow-vectorized; the dict rides the
    closure (bounded state, the viterbi_usage precedent)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def _counts(ws: pd.Series) -> pd.Series:
        def one(w: str) -> list[int]:
            path = _viterbi_path(w, vocab)
            return [len(path), sum(1 for p in path if p == _UNK)]

        return ws.map(one)

    return words.select("word").withColumn(
        "__c", _counts("word")
    ).select(
        "word",
        F.col("__c")[0].alias("n_sub"),
        F.col("__c")[1].alias("n_unk"),
    )


def _apply_frames(
    docs: DataFrame,
    wc: DataFrame,
    id_col: str,
    text_col: str,
    rounds: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared apply-pass frames: ``(doc_words, per_word)`` — the
    truncated/filtered (id, word) explode and the distinct-word
    piece-count table from one more Viterbi pass over the trained
    (unpruned) vocabulary."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    from capital.llm.text import tokens

    vocab, _singles, wc_b = _train_vocab(wc, rounds)

    @pandas_udf(IntegerType())
    def _n_pieces(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: len(_viterbi_path(w, vocab))
        ).astype("int32")

    per_word = wc_b.select("word", _n_pieces("word").alias("n_sub"))
    doc_words = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("__w"),
    ).select(
        F.col(id_col), F.substring("__w", 1, WORD_CAP).alias("word")
    ).filter(F.length("word") >= 1)
    return doc_words, per_word


def unigram_fertility(
    docs: DataFrame,
    wc: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    rounds: int = EM_ROUNDS,
) -> DataFrame:
    """Per-stratum unigram fertility report — the tokenizer-quality
    rollup :func:`~capital.queries.llm_queries.llm_bpe_fertility`
    runs for BPE, over the unigram-LM vocabulary (round-13 verdict
    ask #7: closes the tokenizer-family symmetry). One row per
    stratum: exact integer word/piece/char counts plus
    pieces-per-word (fertility) and chars-per-piece (compression)
    under the engine's floor-stable rounding. Same apply-pass shape
    as :func:`unigram_doc_tokens` — the vocabulary carries the
    per-word piece count; the corpus joins it once."""
    from capital.llm.text import round6_stable

    doc_words, per_word = _apply_frames(docs, wc, id_col, text_col, rounds)
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .join(docs.select(id_col, strata_col), id_col)
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_unigram_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            round6_stable(
                F.sum("n_sub").cast("double") / F.count(F.lit(1))
            ).alias("fertility"),
            round6_stable(
                F.sum(F.length("word")).cast("double")
                / F.sum("n_sub").cast("double")
            ).alias("chars_per_token"),
        )
    )
