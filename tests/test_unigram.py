"""Unigram-LM tokenizer trainer (capital/llm/unigram.py): DP
correctness, EM/pruning invariants, and the fertility comparison
against the BPE trainer (the tokenizer-family report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.unigram import (
    EM_ROUNDS,
    PIECE_MAX_LEN,
    VOCAB_TARGET,
    _viterbi_path,
    unigram_doc_tokens,
    unigram_train,
    word_counts,
)


def test_viterbi_objective_hand_computed():
    """min pieces → max summed freq → lexicographic path, exactly."""
    vocab = {"a": 5, "b": 3, "ab": 10, "ba": 100, "aba": 1, "c": 1}
    # "aba": 1 piece beats everything regardless of freq.
    assert _viterbi_path("aba", vocab) == ["aba"]
    # "abab": no 4-piece... 2-piece options: ab+ab (20), aba+b (4);
    # a+ba+b impossible at 2. Max freq wins.
    assert _viterbi_path("abab", vocab) == ["ab", "ab"]
    # freq tie → lexicographically smallest piece sequence.
    tie = {"x": 1, "y": 1, "xy": 2, "yx": 7}
    # "xyx": (xy, x) sum 3 vs (x, yx) sum 8 → max freq picks (x, yx).
    assert _viterbi_path("xyx", tie) == ["x", "yx"]
    eq = {"p": 2, "q": 2, "pq": 4, "qp": 4}
    # "pqp": (pq, p) sum 6 vs (p, qp) sum 6 → lexicographic: ("p","qp")
    # < ("pq","p") because "p" < "pq".
    assert _viterbi_path("pqp", eq) == ["p", "qp"]
    # single-char fallback covers unknown sequences.
    assert _viterbi_path("cc", vocab) == ["c", "c"]


def test_viterbi_pieces_respect_max_len():
    vocab = {c: 1 for c in "abcdef"}
    vocab["abcdef"] = 1000  # longer than PIECE_MAX_LEN: DP ignores it
    path = _viterbi_path("abcdef", vocab)
    assert all(len(p) <= PIECE_MAX_LEN for p in path)
    assert "".join(path) == "abcdef"


def test_unigram_train_invariants(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = unigram_train(word_counts(d)).collect()
    pieces = {r.piece for r in rows}
    assert len(pieces) == len(rows), "duplicate pieces"
    multi = [r for r in rows if len(r.piece) > 1]
    singles = [r for r in rows if len(r.piece) == 1]
    assert singles, "single-char coverage pieces missing"
    assert multi, "EM never promoted a multi-char piece"
    assert len(multi) <= VOCAB_TARGET
    assert all(len(r.piece) <= PIECE_MAX_LEN for r in rows)
    assert all(r.usage >= 0 for r in rows)
    # probabilities renormalize over the kept set (round6 slack).
    total = sum(r.prob6 for r in rows)
    assert abs(total - 1.0) < 1e-4
    # usage accounts for every corpus character? No — pieces cover
    # every WORD exactly once per occurrence: sum(usage) == total
    # word-piece count, bounded by corpus chars.
    n_words = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.length("w") >= 1)
        .count()
    )
    assert sum(r.usage for r in rows) >= n_words  # ≥1 piece per word


def test_unigram_fertility_vs_bpe(spark, sf_dir):
    """The tokenizer-family comparison row (r12 verdict #7): both
    trainers tokenize the same corpus; per-doc counts must be
    positive, bounded by character count, and the corpus-level
    fertility of the unigram tokenizer (min-pieces objective) must
    not exceed character-level segmentation."""
    from capital.queries.llm_queries import llm_bpe_doc_tokens

    d = load_table(spark, sf_dir, "documents")
    uni = {
        r.doc_id: r.n_unigram_tokens
        for r in unigram_doc_tokens(d, word_counts(d)).collect()
    }
    bpe = {
        r.doc_id: r.n_bpe_tokens
        for r in llm_bpe_doc_tokens(spark, sf_dir).collect()
    }
    chars = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id",
            F.length(F.regexp_replace("text", r"\s+", "")).alias("n"),
        ).collect()
    }
    assert set(uni) == set(bpe) == set(chars)
    for did in uni:
        assert 0 < uni[did] <= chars[did]
    # Corpus-level: unigram's min-pieces Viterbi should be no worse
    # than (comparable to) BPE-with-8-merges on tokens per document.
    assert sum(uni.values()) <= sum(bpe.values()) * 1.5


def test_viterbi_oov_char_segments_as_unk():
    """Round-16 OOV contract: a character outside the trained piece
    inventory segments as the UNK piece (freq 0) instead of crashing
    the kernel — apply is total over any corpus; in-vocab words are
    unchanged."""
    from capital.llm.unigram import _UNK, _viterbi_path

    vocab = {"a": 5, "b": 3, "ab": 4}
    assert _viterbi_path("ab", vocab) == ["ab"]
    assert _viterbi_path("azb", vocab) == ["a", _UNK, "b"]
    assert _viterbi_path("zz", vocab) == [_UNK, _UNK]
