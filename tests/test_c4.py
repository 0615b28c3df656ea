"""C4 line-granular curation: line/page rules, corpus-wide
first-occurrence line dedup, fixture injections, NULL propagation,
plan shapes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from capital.llm.c4 import (
    c4_quality_filter,
    dedup_corpus_lines,
    with_line_fixture,
)


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_c4_rules_hand_computed(spark):
    """Direct rule check on hand-written multi-line text (no fixture):
    short lines, unterminated lines and javascript lines drop; page
    gates fire on brace / lorem / too-few-kept-lines."""
    good = "\n".join(f"this is sentence number {i}." for i in range(6))
    df = spark.createDataFrame(
        [
            (1, good),                                   # clean page
            (2, good + "\ntwo words."),                  # short line dropped, page kept
            (3, good + "\nenable javascript to view."),  # js line dropped
            (4, good + "\nvar x = { y }."),              # brace -> page dropped
            (5, good + "\nlorem ipsum filler text."),    # lorem -> page dropped
            (6, "one good sentence here."),              # < 5 kept -> dropped
            (7, "no terminal punctuation here\nand here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in c4_quality_filter(df, text_col="text").collect()
    }
    assert out[1].c4_keep and out[1].n_kept_lines == 6
    assert out[1].clean_md5 == md5(good)
    assert out[2].c4_keep and out[2].n_kept_lines == 6
    assert out[3].c4_keep and out[3].n_kept_lines == 6
    assert out[4].has_brace and not out[4].c4_keep
    # the brace line also fails the line rule? it ends in '.', has >=3
    # words, no javascript -> line-KEPT; only the page gate fires.
    assert out[4].n_kept_lines == 7
    assert out[5].has_lorem and not out[5].c4_keep
    assert out[6].n_kept_lines == 1 and not out[6].c4_keep
    assert out[7].n_kept_lines == 0 and out[7].clean_md5 == md5("")


def test_c4_filter_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = (
        c4_quality_filter(df, text_col="text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_line_fixture_injections(spark):
    """Fixture arithmetic: javascript at (id+i)%7==3, '.' unless
    i%3==2, brace line iff id%11==5, lorem line iff id%13==7, NULL
    text -> NULL."""
    toks = " ".join(f"t{i}" for i in range(24))  # 3 lines of 8
    df = spark.createDataFrame(
        [(1, toks), (5, toks), (7, toks), (9, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in with_line_fixture(df).collect()}
    l1 = out[1].lined_text.splitlines()
    assert len(l1) == 3
    assert l1[0].endswith(".") and l1[1].endswith(".")
    assert l1[2].endswith("javascript")  # (1+2)%7==3 and 2%3==2: no '.'
    assert out[5].lined_text.splitlines()[-1] == "var cfg = { }"
    assert out[7].lined_text.splitlines()[-1] == "lorem ipsum dolor sit amet."
    assert out[9].lined_text is None


def test_dedup_corpus_lines_first_occurrence_wins(spark):
    """Shared lines survive only at the globally smallest (doc, idx);
    within-doc repeats keep the first; uniques always survive."""
    df = spark.createDataFrame(
        [
            (1, "alpha one.\nshared line.\nbeta two."),
            (2, "shared line.\ngamma three.\nshared line."),
            (3, "delta four.\ndelta four.\nunique five."),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_corpus_lines(df, text_col="text").collect()
    }
    assert out[1].n_removed_lines == 0
    assert out[1].clean_md5 == md5("alpha one.\nshared line.\nbeta two.")
    # doc 2 loses both copies of the shared line (doc 1 owns it).
    assert out[2].n_removed_lines == 2
    assert out[2].clean_md5 == md5("gamma three.")
    # doc 3's within-doc repeat keeps the first copy.
    assert out[3].n_removed_lines == 1
    assert out[3].clean_md5 == md5("delta four.\nunique five.")
    assert out[4].n_lines is None and out[4].clean_md5 is None


def test_dedup_corpus_lines_join_not_fanned_out(spark):
    """The join-back must hit the AGGREGATED one-row-per-line side —
    a hot boilerplate line repeated across the corpus yields exactly
    one matching build row per probe row (output rows == exploded
    line count)."""
    hot = "same hot line."
    df = spark.createDataFrame(
        [(i, f"{hot}\nuniq {i} tail.") for i in range(1, 21)],
        "doc_id long, text string",
    )
    out = dedup_corpus_lines(df, text_col="text")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 20
    assert rows[1].n_removed_lines == 0
    for i in range(2, 21):
        assert rows[i].n_removed_lines == 1
