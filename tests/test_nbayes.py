"""Multinomial Naive Bayes: hand-computed posteriors, unseen-token
smoothing, tie-break determinism, model-state shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capital.llm.nbayes import nb_classify, nb_train


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_nb_hand_computed_separable(spark):
    """Two clearly-separated classes: resubstitution must be perfect,
    and the winning score must equal the hand-derived formula."""
    train = _docs(spark, [
        (1, "a", "apple apple banana"),
        (2, "a", "apple banana banana"),
        (3, "b", "zebra zebra yak"),
        (4, "b", "zebra yak yak"),
    ])
    model = nb_train(train)
    assert model.n_docs == 4 and model.vocab_size == 4
    out = {r.doc_id: r for r in nb_classify(train, model).collect()}
    assert [out[i].nb_pred for i in (1, 2, 3, 4)] == ["a", "a", "b", "b"]
    # hand-derive doc 1 vs class a: prior 2/4; class-a mass = 6 tokens,
    # V=4 -> denom 10; apple cnt 3, banana cnt 3.
    lp = lambda c: round(math.log((c + 1) / 10.0), 6)
    want = round(
        round(math.log(2 / 4), 6) + round(2 * lp(3) + 1 * lp(3), 6), 6
    )
    assert abs(out[1].score6 - want) < 2e-6


def test_nb_unseen_tokens_use_smoothing(spark):
    """A test doc of entirely-unseen tokens scores every class by
    prior + N·lp0 — the larger-prior class wins, nothing NULLs."""
    train = _docs(spark, [
        (1, "a", "apple banana"),
        (2, "a", "apple cherry"),
        (3, "b", "zebra yak zebra yak"),
    ])
    model = nb_train(train)
    test = _docs(spark, [(9, None, "quux corge grault")])
    r = nb_classify(test, model).collect()[0]
    # equal token masses (4 vs 4) make lp0 identical; the prior
    # (2/3 vs 1/3) decides. (With UNEQUAL masses the smaller class
    # wins unseen tokens — higher smoothed probability — which is
    # correct NB behavior, not a bug.)
    assert r.nb_pred == "a"
    assert r.score6 is not None


def test_nb_tie_breaks_lexicographically(spark):
    """Perfectly symmetric classes give equal scores on a symmetric
    doc: the argmax must pick the lexicographically smallest label on
    BOTH engines (the window (score6 desc, label asc) contract)."""
    train = _docs(spark, [
        (1, "x", "foo bar"),
        (2, "y", "foo bar"),
    ])
    model = nb_train(train)
    test = _docs(spark, [(9, None, "foo bar")])
    assert nb_classify(test, model).collect()[0].nb_pred == "x"


def test_nb_model_state_is_integer_and_bounded(spark):
    """Model frames carry exact integers only (the trainer
    discipline): no doubles in the persisted state."""
    train = _docs(spark, [(1, "a", "w1 w2"), (2, "b", "w2 w3")])
    model = nb_train(train)
    for f in model.token_counts.schema.fields:
        assert f.dataType.typeName() in ("string", "long")
    for f in model.label_stats.schema.fields:
        assert f.dataType.typeName() in ("string", "long")
    assert model.token_counts.count() == 4  # (a,w1) (a,w2) (b,w2) (b,w3)


def test_nb_save_load_roundtrip_identical(spark, tmp_path):
    """Store→load→classify must be bit-identical to in-memory
    classification (integer state is lossless through parquet)."""
    from capital.llm.nbayes import nb_load, nb_save

    train = _docs(spark, [
        (1, "a", "apple apple banana"),
        (2, "a", "apple banana banana cherry"),
        (3, "b", "zebra zebra yak"),
        (4, "b", "zebra yak yak kiwi"),
    ])
    model = nb_train(train)
    nb_save(model, str(tmp_path / "nbm"))
    loaded = nb_load(spark, str(tmp_path / "nbm"))
    assert (loaded.n_docs, loaded.vocab_size) == (
        model.n_docs, model.vocab_size
    )
    a = sorted(map(tuple, nb_classify(train, model).collect()))
    b = sorted(map(tuple, nb_classify(train, loaded).collect()))
    assert a == b
