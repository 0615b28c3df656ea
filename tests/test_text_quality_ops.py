"""Unit tests for the repetition / entropy / PII text operators on
crafted fixtures (the driver corpus contains no emails or URLs, so the
oracle-parity test alone would not prove the regex paths fire)."""

from __future__ import annotations

import math

from capital.llm.text import (
    with_char_entropy,
    with_pii_scrub,
    with_repetition,
)


def _one(spark, text, fn):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return fn(df).collect()[0]


def test_repetition_flags_boilerplate(spark):
    r = _one(spark, "buy now buy now buy now buy now", with_repetition)
    # bigrams: 7 total, 2 distinct ("buy now", "now buy").
    assert math.isclose(r.dup_bigram_frac, 1 - 2 / 7, abs_tol=1e-6)
    assert math.isclose(r.top_token_frac, 0.5, abs_tol=1e-6)


def test_repetition_clean_text_scores_zero(spark):
    r = _one(spark, "every word here is used exactly once", with_repetition)
    assert r.dup_bigram_frac == 0.0
    assert math.isclose(r.top_token_frac, 1 / 7, abs_tol=1e-6)


def test_char_entropy_extremes(spark):
    degenerate = _one(spark, "aaaaaaaa", with_char_entropy)
    assert degenerate.char_entropy == 0.0
    # 4 equally frequent characters -> exactly 2 bits.
    uniform = _one(spark, "abcdabcd", with_char_entropy)
    assert math.isclose(uniform.char_entropy, 2.0, abs_tol=1e-6)


def test_pii_scrub_redacts_and_counts(spark):
    r = _one(
        spark,
        "mail a.b@example.org or c@d.io, see https://ex.com/p?q=1 now",
        with_pii_scrub,
    )
    assert (r.n_emails, r.n_urls) == (2, 1)
    assert r.scrubbed_text == "mail <EMAIL> or <EMAIL>, see <URL> now"


def test_pii_scrub_clean_text_untouched(spark):
    r = _one(spark, "no contact info at all", with_pii_scrub)
    assert (r.n_emails, r.n_urls) == (0, 0)
    assert (r.n_phones, r.n_ips) == (0, 0)
    assert r.scrubbed_text == "no contact info at all"


def test_pii_scrub_korean_phone_formats(spark):
    r = _one(
        spark,
        "call 010-1234-5678 or +82-10-1234-5678 or the office 02-312-3456",
        with_pii_scrub,
    )
    assert r.n_phones == 3
    assert r.scrubbed_text == (
        "call <PHONE> or <PHONE> or the office <PHONE>"
    )


def test_pii_scrub_nanp_phone_and_ip(spark):
    r = _one(
        spark,
        "dial 555-123-4567 / 555 123 4567, host 192.168.0.1 up",
        with_pii_scrub,
    )
    assert (r.n_phones, r.n_ips) == (2, 1)
    assert r.scrubbed_text == "dial <PHONE> / <PHONE>, host <IP> up"


def test_pii_scrub_letter_glued_phone_masked(spark):
    # \b blocks a letter-glued start; the PHONE_GLUED_RE pass
    # recovers it with the captured prefix reinserted (round-16
    # review: privacy regression pin). Digit-glued runs stay intact.
    r = _one(
        spark,
        "cell010-1234-5678 ok, serial 123456-7890-123456 intact",
        with_pii_scrub,
    )
    assert r.n_phones == 1
    assert r.scrubbed_text == (
        "cell<PHONE> ok, serial 123456-7890-123456 intact"
    )


def test_pii_scrub_url_digits_not_rematched(spark):
    # URL masked FIRST: its path digits must not resurface as a
    # phone/IP match; bare digit runs and dates stay untouched.
    r = _one(
        spark,
        "see https://ex.com/10.1.2.3/02-312-3456 on 2024-01-15 ref 0212345678",
        with_pii_scrub,
    )
    assert (r.n_urls, r.n_phones, r.n_ips) == (1, 1, 1)
    assert r.scrubbed_text == "see <URL> on 2024-01-15 ref 0212345678"


def test_chunk_documents_semantics(spark):
    from capital.llm.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=128, overlap=16)
    rows = {(r.doc_id, r.chunk_index): r for r in out.collect()}
    # 300 tokens, step 112: starts 1,113,225 → 3 chunks of 128/128/76.
    doc1 = sorted(
        (k[1], v.n_chunk_tokens) for k, v in rows.items() if k[0] == 1
    )
    assert doc1 == [(0, 128), (1, 128), (2, 76)]
    # Coverage: last chunk reaches the final token (225+76-1 == 300).
    # Short and empty docs yield exactly one chunk each (an empty doc
    # carries the engine-wide one-empty-token convention of tokens()).
    assert [(k[1], rows[k].n_chunk_tokens) for k in rows if k[0] == 2] == [(0, 2)]
    assert [(k[1], rows[k].n_chunk_tokens) for k in rows if k[0] == 3] == [(0, 1)]


def test_chunk_documents_rejects_degenerate_overlap(spark):
    import pytest

    from capital.llm.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


# --- Kneser-Ney smoothed bigram LM ---------------------------------------


def test_kneser_ney_hand_computed(spark):
    """Exact KN arithmetic on 'a b a b a c': c2=(a,b):2,(b,a):2,(a,c):1;
    ctx a:(3,2), b:(2,1); cont a/b/c = 1 each; T=3."""
    import math

    from capital.llm.text import kneser_ney_logprob

    docs = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
    row = kneser_ney_logprob(docs).collect()[0]
    d = 0.75
    p_ba = (max(2 - d, 0) + (d * 2) * (1 / 3)) / 3   # P(b|a)
    p_ab = (max(2 - d, 0) + (d * 1) * (1 / 3)) / 2   # P(a|b)
    p_ca = (max(1 - d, 0) + (d * 2) * (1 / 3)) / 3   # P(c|a)
    terms = [
        round(math.log2(p_ba), 6),
        round(math.log2(p_ab), 6),
        round(math.log2(p_ba), 6),
        round(math.log2(p_ab), 6),
        round(math.log2(p_ca), 6),
    ]
    want = math.floor(-sum(terms) / 5 * 1e6 + 0.5) / 1e6
    assert row.n_bigrams == 5
    assert math.isclose(row.avg_neg_logprob2_kn, want, abs_tol=2e-6)


def test_kneser_ney_continuation_discrimination(spark):
    """The smoothing's point: at EQUAL bigram count, the word seen
    after more distinct contexts gets more smoothed mass (the
    'Francisco' effect — raw conditionals cannot tell them apart)."""
    from pyspark.sql import functions as F

    from capital.llm.text import kneser_ney_logprob

    # (x,a) and (x,b) both occur twice; 'a' also follows y and z.
    corpus = [
        (1, "x a x a x b x b"),
        (2, "y a z a"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    # Recover the per-bigram smoothed probability through a 1-bigram
    # probe doc? Simpler: compare doc scores of twin docs made of the
    # two bigrams exclusively.
    probe = spark.createDataFrame(
        corpus + [(10, "x a"), (11, "x b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in kneser_ney_logprob(probe).collect()}
    # Same raw conditional count, but cont(a)=3 > cont(b)=1 ⇒
    # P_KN(a|x) > P_KN(b|x) ⇒ lower neg-logprob for the 'a' probe.
    assert out[10].avg_neg_logprob2_kn < out[11].avg_neg_logprob2_kn


def test_kneser_ney_layout_invariant(spark):
    from capital.llm.text import kneser_ney_logprob

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} common w{(i * 3) % 7} common tail") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, kneser_ney_logprob(docs).collect()))
    b = sorted(map(tuple, kneser_ney_logprob(docs.repartition(7)).collect()))
    assert a == b


def test_repetition_null_and_empty_text(spark):
    """The r14 mapInPandas kernel must mirror the old left-join
    behavior: null text -> null fractions (the kernel must not die on
    None), empty text -> the [""] single-token convention (dup 0,
    top 1)."""
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in with_repetition(df).collect()}
    assert rows[1].dup_bigram_frac is None
    assert rows[1].top_token_frac is None
    assert rows[2].dup_bigram_frac == 0.0
    assert rows[2].top_token_frac == 1.0


def test_repetition_kernel_is_shuffle_free(spark):
    """Per-document signal: no Exchange may appear in the plan (any
    corpus shuffle at 100 TB would be a bug — round-13 kernel rule)."""
    df = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    plan = with_repetition(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_battery_hand_computed(spark):
    """Hand-derived Gopher §A1.1 battery values on a crafted doc:
    "a b a b a b a b a b a b" (12 tokens, 12 chars of token mass)."""
    from capital.llm.text import with_gopher_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b a b a b a b a b")], "doc_id long, text string"
    )
    r = with_gopher_ngrams(df).collect()[0]
    # 11 bigrams, 2 distinct -> dup = 1 - 2/11
    assert math.isclose(r.dup_2gram_frac, 1 - 2 / 11, abs_tol=1e-6)
    # top bigram "a b" occurs 6x, mass 6*2 = 12 of 12 chars
    assert r.top_2gram_char_frac == 1.0
    # 10 trigrams, 2 distinct
    assert math.isclose(r.dup_3gram_frac, 1 - 2 / 10, abs_tol=1e-6)
    # top trigram "a b a" 5x, mass 5*3 = 15/12 > 1 (the Gopher
    # count-times-length convention on degenerate text)
    assert math.isclose(r.top_3gram_char_frac, 1.25, abs_tol=1e-6)
    # every 5..10-gram repeats -> full coverage
    for n in range(5, 11):
        assert getattr(r, f"dup_{n}gram_char_frac") == 1.0


def test_gopher_battery_null_and_short_text(spark):
    """NULL text -> NULL fractions; short/clean docs -> zeros."""
    from capital.llm.text import with_gopher_ngrams

    df = spark.createDataFrame(
        [(1, None), (2, "hello"), (3, "all distinct words here")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in with_gopher_ngrams(df).collect()}
    assert rows[1].dup_2gram_frac is None
    assert rows[1].dup_10gram_char_frac is None
    assert rows[2].dup_2gram_frac == 0.0
    assert rows[2].top_2gram_char_frac == 0.0
    assert rows[3].dup_2gram_frac == 0.0
    assert rows[3].dup_5gram_char_frac == 0.0


def test_gopher_battery_tie_break_is_string_order(spark):
    """Tied max-count grams break on the JOINED-STRING key (the
    oracle's ORDER BY cnt DESC, gram ASC), not Python tuple order —
    they diverge when a token contains a control char below 0x20:
    tuple says ("ab","z") < ("ab\\x01","z") (prefix rule) but the
    joined strings compare '\\x01' < ' ' at position 2, so the string
    winner is "ab\\x01 z" (round-15 advice pin)."""
    from capital.llm.text import with_gopher_ngrams

    # tokens: ab z ab\x01 z ab z ab\x01 z — bigrams (ab,z), (z,ab\x01)
    # and (ab\x01,z) all tied at count 2; string-min is "ab\x01 z"
    # (mass 2·4) while tuple-min would be "ab z" (mass 2·3).
    df = spark.createDataFrame(
        [(1, "ab z ab\x01 z ab z ab\x01 z")],
        "doc_id long, text string",
    )
    r = with_gopher_ngrams(df).collect()[0]
    total = 2 * 2 + 1 * 4 + 3 * 2  # token chars: ab×2, z×4, ab\x01×2
    assert math.isclose(
        r.top_2gram_char_frac, round(8 / total, 6), abs_tol=1e-6
    )


def test_gopher_battery_long_doc_is_linear(spark):
    """The hoisted-argmax kernel must stay near-linear on a LONG
    document with many distinct grams (the regime the O(distinct²)
    in-generator max broke): 20k tokens of mostly-distinct words must
    complete in seconds, not minutes."""
    import random
    import time

    from capital.llm.text import with_gopher_ngrams

    rng = random.Random(7)
    toks = [f"w{rng.randrange(15000)}" for _ in range(20000)]
    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    t0 = time.time()
    r = with_gopher_ngrams(df).collect()[0]
    elapsed = time.time() - t0
    assert r.dup_2gram_frac is not None
    # quadratic form took minutes at this size; linear is ~a second.
    assert elapsed < 30, f"battery kernel took {elapsed:.1f}s on 20k tokens"


def test_gopher_battery_is_shuffle_free(spark):
    """Per-document battery: no Exchange in the plan."""
    from capital.llm.text import with_gopher_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    plan = (
        with_gopher_ngrams(df)._jdf.queryExecution().executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
