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
    assert r.scrubbed_text == "no contact info at all"


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
