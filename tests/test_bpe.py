"""BPE tokenizer training (capital/llm/bpe.py): hand-computed merges
on the canonical example, greedy overlap semantics, tie-breaks,
separator contract, early stop, checkpoint-mode equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.llm.bpe import (
    EOW,
    bpe_train,
    sym_init,
    symbol_count,
    word_counts,
)


def _vocab(spark, counts: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in counts.items()], "word string, cnt long"
    )


def test_bpe_matches_hand_computed_merges(spark):
    """Sennrich-style vocabulary; merges verified by hand:
    pair sums are weighted position counts, ties break on
    (count desc, lhs asc, rhs asc)."""
    vocab = {"low": 5, "lower": 2, "widest": 3, "newest": 6}
    rules, state = bpe_train(_vocab(spark, vocab), merges=4)
    got = [(r["lhs"], r["rhs"], r["pair_count"]) for r in rules]
    assert got == [
        ("e", "s", 9),     # ties with (s,t) and (t,</w>) — lhs asc
        ("es", "t", 9),    # ties with (t,</w>) — lhs asc
        ("est", EOW, 9),
        ("l", "o", 7),     # ties with (o,w) — lhs asc
    ]
    assert [r["merged"] for r in rules] == ["es", "est", "est</w>", "lo"]
    syms = {r.word: r.sym for r in state.collect()}
    assert syms["newest"] == "||n||e||w||est</w>||"
    assert syms["widest"] == "||w||i||d||est</w>||"
    assert syms["low"] == "||lo||w||</w>||"


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' + merge (a,a): pair_count counts every position pair
    (3), but the merge is greedy left-to-right non-overlapping —
    the state must become |aa|aa|</w>|, never |a|aa|a|…"""
    rules, state = bpe_train(_vocab(spark, {"aaaa": 1}), merges=1)
    assert rules == [
        {"step": 1, "lhs": "a", "rhs": "a", "merged": "aa", "pair_count": 3}
    ]
    assert state.collect()[0].sym == "||aa||aa||</w>||"


def test_bpe_early_stop_when_fully_fused(spark):
    """A single one-char word fuses to one symbol in one merge; the
    loop must stop early instead of erroring on an empty pair set."""
    rules, state = bpe_train(_vocab(spark, {"a": 3}), merges=10)
    assert [(r["lhs"], r["rhs"]) for r in rules] == [("a", EOW)]
    assert state.collect()[0].sym == "||a</w>||"
    assert symbol_count(F.lit("||a</w>||")) is not None  # expression builds


def test_word_counts_drops_separator_words(spark):
    docs = spark.createDataFrame(
        [(1, "good good bad|pipe <tag> good")], "doc_id long, text string"
    )
    rows = {r.word: r.cnt for r in word_counts(docs).collect()}
    assert rows == {"good": 3}


def test_bpe_symbol_count_is_tokenizer_application(spark):
    """Counting final-state symbols = applying the trained tokenizer
    to the vocabulary: after the 4 canonical merges, 'newest' is 4
    BPE tokens (n, e, w, est</w>)."""
    vocab = {"low": 5, "lower": 2, "widest": 3, "newest": 6}
    _, state = bpe_train(_vocab(spark, vocab), merges=4)
    n = {
        r.word: r.n
        for r in state.select(
            "word", symbol_count(F.col("sym")).alias("n")
        ).collect()
    }
    assert n == {"low": 3, "lower": 5, "widest": 4, "newest": 4}


def test_bpe_checkpoint_dir_mode_identical(spark, tmp_path):
    vocab = {"low": 5, "lower": 2, "widest": 3, "newest": 6}
    r1, s1 = bpe_train(_vocab(spark, vocab), merges=3, mode="distributed")
    r2, s2 = bpe_train(
        _vocab(spark, vocab),
        merges=3,
        mode="distributed",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert r1 == r2
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_bpe_local_equals_distributed_on_corpus(spark, sf_dir):
    """The round-10 contract: driver-local training (default mode) and
    the distributed K-round loop produce IDENTICAL rule tables and
    final vocabulary states on the same corpus — same exact weighted
    pair counts, same (count desc, pair lexicographic) tie-break, same
    greedy non-overlapping merge."""
    from capital.io import load_table

    wc = word_counts(load_table(spark, sf_dir, "documents"))
    r_loc, s_loc = bpe_train(wc, merges=12, mode="local")
    r_dist, s_dist = bpe_train(wc, merges=12, mode="distributed")
    assert r_loc == r_dist
    assert len(r_loc) == 12
    assert sorted(map(tuple, s_loc.collect())) == sorted(
        map(tuple, s_dist.collect())
    )


def test_bpe_vocab_thresholding_deterministic_and_shared(spark):
    """max_vocab/min_count bound the driver collect for web-scale
    vocabularies; both backends threshold identically (count desc,
    word asc — a total order), so results still agree."""
    vocab = {"low": 5, "lower": 2, "widest": 3, "newest": 6, "rare": 1}
    kw = dict(merges=3, max_vocab=4, min_count=2)
    r_loc, s_loc = bpe_train(_vocab(spark, vocab), mode="local", **kw)
    r_dist, s_dist = bpe_train(_vocab(spark, vocab), mode="distributed", **kw)
    assert r_loc == r_dist
    trained = {r.word for r in s_loc.collect()}
    assert trained == {"low", "lower", "widest", "newest"}  # 'rare' cut
    assert sorted(map(tuple, s_loc.collect())) == sorted(
        map(tuple, s_dist.collect())
    )


def test_bpe_unknown_mode_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        bpe_train(_vocab(spark, {"a": 1}), merges=1, mode="nope")


def test_sym_init_shape(spark):
    row = spark.range(1).select(sym_init(F.lit("ab")).alias("s")).collect()
    assert row[0].s == "||a||b||</w>||"


def test_apply_merges_reproduces_training_state(spark, sf_dir):
    """apply_merges over the corpus vocabulary must equal training's
    final_state syms bit-for-bit — the OOV path shares the training
    semantics (sequential in-order replace)."""
    from capital.io import load_table
    from capital.llm.bpe import apply_merges

    d = load_table(spark, sf_dir, "documents")
    wc = word_counts(d)
    rules, state = bpe_train(wc, merges=12)
    applied = apply_merges(wc, rules, batch=5)  # force batch barriers
    got = {r.word: r.sym for r in applied.collect()}
    want = {r.word: r.sym for r in state.collect()}
    assert got == want and len(want) > 0


def test_bpe_vocab_ids_dense_and_collision_min(spark):
    """Base alphabet sorted first, merges appended in step order;
    a merged token colliding with an earlier surface keeps MIN id."""
    from capital.llm.bpe import bpe_vocab

    vocab = {"aab": 4, "ab": 3}
    rules, state = bpe_train(_vocab(spark, vocab), merges=3)
    v = {r.token: r.token_id for r in bpe_vocab(rules, state).collect()}
    # alphabet: '</w>' < 'a' < 'b'
    assert v[EOW] == 0 and v["a"] == 1 and v["b"] == 2
    # every merged surface has an id >= base size or collided to min
    for i, r in enumerate(rules):
        assert r["merged"] in v
        assert v[r["merged"]] <= 3 + i


def test_bpe_encode_decode_roundtrip(spark, sf_dir):
    """decode(encode(x)) == x's clean pretokens joined by single
    spaces — the id table and per-word id sequences are lossless."""
    from capital.io import load_table
    from capital.llm.bpe import bpe_decode, bpe_encode, bpe_vocab
    from capital.llm.text import tokens

    d = load_table(spark, sf_dir, "documents")
    rules, state = bpe_train(word_counts(d), merges=8)
    enc = bpe_encode(d, rules, state)
    dec = bpe_decode(enc, bpe_vocab(rules, state))
    got = {r.doc_id: r.text for r in dec.collect()}
    want = {
        r.doc_id: r.t
        for r in d.select(
            "doc_id",
            F.array_join(
                F.filter(
                    tokens(F.col("text")),
                    lambda x: ~x.rlike("[|<>]"),
                ),
                " ",
            ).alias("t"),
        ).collect()
        if r.t  # docs with zero clean words drop out of encode
    }
    assert got == want and len(got) > 0


def test_pack_token_ids_reassembles_stream_exactly(spark):
    """Chunks must re-concatenate to the exact per-partition id
    stream: seq_len-sized chunks (short final), document pieces in
    order, and n_docs counts the docs each chunk draws from."""
    from capital.llm.assemble import pack_token_ids

    rows = [
        ("s1", 1, list(range(0, 5))),
        ("s1", 2, list(range(5, 12))),
        ("s1", 3, []),  # empty doc contributes nothing
        ("s1", 4, list(range(12, 14))),
        ("s2", 5, list(range(100, 103))),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, token_ids array<int>"
    )
    out = pack_token_ids(df, seq_len=4).collect()
    chunks = {(r.source, r.chunk_id): r for r in out}
    s1 = [
        chunks[("s1", c)].token_ids
        for c in sorted(c for s, c in chunks if s == "s1")
    ]
    assert [len(x) for x in s1] == [4, 4, 4, 2]
    flat = [i for ch in s1 for i in ch]
    assert flat == list(range(14))
    # doc 1 spans chunks 0-1, doc 2 spans 1-2, doc 4 spans 3
    assert chunks[("s1", 0)].n_docs == 1
    assert chunks[("s1", 1)].n_docs == 2
    assert chunks[("s1", 3)].n_docs == 1
    assert chunks[("s2", 0)].token_ids == [100, 101, 102]
    # doc-start offsets: doc1 starts chunk0 at 0; doc2 starts chunk1
    # at offset 1 (gpos 5); chunk2 is entirely mid-doc2 (no starts);
    # doc4 starts chunk3 at 0
    assert chunks[("s1", 0)].doc_starts == [0]
    assert chunks[("s1", 1)].doc_starts == [1]
    assert chunks[("s1", 2)].doc_starts == []
    assert chunks[("s1", 3)].doc_starts == [0]
    assert chunks[("s2", 0)].doc_starts == [0]


def test_bpe_encode_cross_corpus_shares_training_id_space(spark):
    """Round-11 advice (medium): ids are a function of the id TABLE,
    and bpe_vocab derives the base alphabet (hence every id) from
    the state it's handed. Encoding a new corpus must pass the
    TRAINING vocab — a vocab rebuilt from the new corpus's state
    (which has an extra character here) shifts ids silently."""
    from capital.llm.bpe import apply_merges, bpe_encode, bpe_vocab

    train_wc = _vocab(spark, {"low": 5, "lower": 2, "newest": 6})
    rules, train_state = bpe_train(train_wc, merges=4)
    train_vocab = bpe_vocab(rules, train_state)
    tv = {r.token: r.token_id for r in train_vocab.collect()}

    # new corpus introduces 'z' (< EOW? no: '</w>' < 'l' < ... < 'z';
    # use 'a' which sorts before 'l' and shifts every id after it)
    new_docs = spark.createDataFrame(
        [(1, "low a newest")], "doc_id int, text string"
    )
    new_state = apply_merges(word_counts(new_docs), rules)

    # correct path: training vocab passed explicitly
    enc = bpe_encode(new_docs, rules, new_state, vocab=train_vocab)
    ids = enc.collect()[0].token_ids
    # 'low' fuses exactly as in training; its ids must be the
    # training ids (word 'a' is OOV to the training charset except
    # where chars collide — 'a' itself is absent from train_vocab,
    # so its symbols drop out)
    low_ids = [tv["lo"], tv["w"], tv[EOW]]
    assert ids[: len(low_ids)] == low_ids
    assert all(i in set(tv.values()) for i in ids)

    # hazard pin: rebuilding the vocab from the NEW state assigns a
    # DIFFERENT id space (the extra base char shifts ids)
    nv = {r.token: r.token_id for r in bpe_vocab(rules, new_state).collect()}
    assert nv["a"] is not None
    shifted = [t for t in tv if t in nv and nv[t] != tv[t]]
    assert shifted, "expected id shifts when the base alphabet grows"


# --- WordPiece (round 15) -------------------------------------------------


def test_wordpiece_hand_computed_first_merge(spark):
    """score(a,b) = count(ab)/(count(a)count(b)): on 'ab ab cd' with
    counts ab:2 cd:1, pair (c,d) scores 1/(1*1)=1.0 > (a,b) 2/(2*2)=0.5
    — the rare-but-exclusive pair wins, where count-BPE picks (a,b)."""
    from capital.llm.bpe import bpe_train
    from capital.llm.wordpiece import wordpiece_train

    wc = spark.createDataFrame(
        [("ab", 2), ("cd", 1)], "word string, cnt long"
    )
    rules, _ = wordpiece_train(wc, merges=1)
    assert (rules[0]["lhs"], rules[0]["rhs"]) == ("c", "d")
    assert rules[0]["score"] == 1.0
    brules, _ = bpe_train(wc, merges=1)
    assert (brules[0]["lhs"], brules[0]["rhs"]) == ("a", "b")


def test_wordpiece_local_equals_distributed_on_corpus(spark, sf_dir):
    """Backend equivalence on real corpus words: identical rule tables
    (incl. bit-equal scores) and final states."""
    from capital.llm.bpe import word_counts
    from capital.llm.wordpiece import wordpiece_train

    from capital.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    wc = word_counts(docs)
    rl, stl = wordpiece_train(wc, merges=6, mode="local")
    rd, std = wordpiece_train(wc, merges=6, mode="distributed")
    assert [(r["lhs"], r["rhs"], r["pair_count"], r["score"]) for r in rl] \
        == [(r["lhs"], r["rhs"], r["pair_count"], r["score"]) for r in rd]
    assert sorted(map(tuple, stl.collect())) \
        == sorted(map(tuple, std.collect()))


def test_wordpiece_denominators_and_tie_break(spark):
    """'xa xa xb xc' with the </w> marker: EVERY pair scores 0.25 in
    round 1 ((x,a) 2/(4*2), (a,</w>) 2/(2*4), (x,b) 1/(4*1), ...) — the
    all-ties case pins the lex tie-break, picking ('a','</w>'). Round 2
    rescores against the merged symbol's denominators: (b,</w>) and
    (c,</w>) now score 1/(1*2)=0.5 > the 0.25 field, lex picks b."""
    from capital.llm.wordpiece import wordpiece_train

    wc = spark.createDataFrame(
        [("xa", 2), ("xb", 1), ("xc", 1)], "word string, cnt long"
    )
    rules, _ = wordpiece_train(wc, merges=2)
    assert (rules[0]["lhs"], rules[0]["rhs"]) == ("a", "</w>")
    assert rules[0]["score"] == 0.25
    assert (rules[1]["lhs"], rules[1]["rhs"]) == ("b", "</w>")
    assert rules[1]["score"] == 0.5


def test_wordpiece_unknown_mode_raises(spark):
    import pytest

    from capital.llm.wordpiece import wordpiece_train

    wc = spark.createDataFrame([("ab", 1)], "word string, cnt long")
    with pytest.raises(ValueError, match="unknown mode"):
        wordpiece_train(wc, merges=1, mode="nope")


def test_bpe_oov_unk_contract_round_trip(spark):
    """The round-16 OOV contract: encode with a stored training vocab
    maps never-seen characters to the reserved UNK id (B + K), and
    decode emits the literal marker — total encode, no silent drops."""
    from capital.llm.bpe import (
        UNK,
        apply_merges,
        bpe_decode,
        bpe_encode,
        bpe_train,
        bpe_vocab,
        word_counts,
    )

    train_docs = spark.createDataFrame(
        [(1, "low lower low"), (2, "new newer low")],
        "doc_id long, text string",
    )
    rules, tstate = bpe_train(word_counts(train_docs), merges=2)
    vocab = bpe_vocab(rules, tstate, unk_token=UNK)
    # alphabet: </w> e l n o r w  (7 chars) -> UNK id = 7 + 2
    n_base = 7
    unk_row = vocab.filter(vocab.token == UNK).collect()
    assert len(unk_row) == 1 and unk_row[0].token_id == n_base + 2

    new_docs = spark.createDataFrame(
        [(10, "low lozenge")], "doc_id long, text string"
    )
    state_all = apply_merges(word_counts(new_docs), rules)
    enc = bpe_encode(
        new_docs, rules, state_all, vocab=vocab, unk_token=UNK
    )
    row = enc.collect()[0]
    # 'z' and 'g' never occurred in training: two UNK ids
    assert row.token_ids.count(n_base + 2) == 2
    dec = bpe_decode(enc, vocab).collect()[0]
    assert dec.text == f"low lo{UNK}en{UNK}e"


def test_bpe_oov_default_drop_behavior_unchanged(spark):
    """Without unk_token the historical inner-join drop posture is
    preserved (the pinned training-corpus queries depend on it)."""
    from capital.llm.bpe import (
        apply_merges,
        bpe_encode,
        bpe_train,
        bpe_vocab,
        word_counts,
    )

    train_docs = spark.createDataFrame(
        [(1, "ab ab")], "doc_id long, text string"
    )
    rules, tstate = bpe_train(word_counts(train_docs), merges=1)
    vocab = bpe_vocab(rules, tstate)
    new_docs = spark.createDataFrame(
        [(2, "ab az")], "doc_id long, text string"
    )
    enc = bpe_encode(
        new_docs, rules, apply_merges(word_counts(new_docs), rules),
        vocab=vocab,
    ).collect()[0]
    # 'z' silently dropped; 'a' of 'az' still encodes
    ids = set(enc.token_ids)
    assert len(enc.token_ids) < 6 and ids


def test_bpe_oov_without_unk_row_raises_loudly(spark):
    """unk_token set but the supplied vocab has no unk row (e.g. a
    stored pre-round-16 artifact): encode must fail LOUDLY on the
    first OOV symbol, never silently emit zero documents (round-16
    review — the empty cross-join hazard)."""
    import pytest

    from capital.llm.bpe import (
        UNK,
        apply_merges,
        bpe_encode,
        bpe_train,
        bpe_vocab,
        word_counts,
    )

    train_docs = spark.createDataFrame(
        [(1, "ab ab")], "doc_id long, text string"
    )
    rules, tstate = bpe_train(word_counts(train_docs), merges=1)
    vocab_no_unk = bpe_vocab(rules, tstate)  # no unk row
    new_docs = spark.createDataFrame(
        [(2, "ab az")], "doc_id long, text string"
    )
    enc = bpe_encode(
        new_docs, rules, apply_merges(word_counts(new_docs), rules),
        vocab=vocab_no_unk, unk_token=UNK,
    )
    with pytest.raises(Exception, match="no '<unk>' row"):
        enc.collect()
