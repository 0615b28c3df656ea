"""C4-style line-granular curation (Raffel et al. 2020, §2.2).

The C4 cleaning pass works at LINE granularity, complementing the
document-level Gopher rules (:func:`capital.llm.curation.
gopher_quality_flags`) and the token-window substring tiers:

- **Line rules**: keep a line iff it ends in a terminal punctuation
  mark, has at least ``MIN_LINE_WORDS`` words, and does not contain
  the word "javascript" (cookie/JS boilerplate) — the paper's rules.
- **Page rules**: drop the whole page when fewer than
  ``MIN_KEPT_LINES`` lines survive, when it contains a curly brace
  (code), or the phrase "lorem ipsum".
- **Corpus-level line dedup** (:func:`dedup_corpus_lines`): C4
  deduplicates repeated spans corpus-wide keeping ONE occurrence;
  here at exact-line granularity with the deterministic
  first-occurrence rule (global ``(doc_id, line_idx)`` order).

All per-line logic is linear per document (the allowed interpreted-
HOF regime — no per-row quadratic array ops); the corpus-wide dedup
is the proven count→join-back shape of ``substring_dup_spans`` at
line granularity: explode → one map-side-combined first-occurrence
aggregate → an equi-join back (each probe line matches exactly one
aggregate row, so hot boilerplate lines cannot fan out) → one per-doc
rebuild aggregate.

The driver corpus is single-line synthetic text, so the paired
queries rebuild a deterministic '\\n'-structured fixture from the
document tokens (the ``html_fixture`` convention): every rule and the
dedup see real multi-line structure, and the oracle re-derives the
fixture from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4 rule constants (Raffel et al. 2020 §2.2).
MIN_LINE_WORDS = 3
MIN_KEPT_LINES = 5
#: terminal punctuation accepted at line end (the paper's set).
TERMINAL_PUNCT_RE = '[.!?"]$'

#: fixture constants shared with the oracle generator.
FIXTURE_LINE_TOKENS = 8
FIXTURE_PUNCT_MOD = 3     # line i ends in '.' unless i % 3 == 2
FIXTURE_JS_MOD = 7        # line i gains ' javascript' when (id+i) % 7 == 3
FIXTURE_BRACE_MOD = 11    # doc gains a '{'-bearing line when id % 11 == 5
FIXTURE_LOREM_MOD = 13    # doc gains a lorem-ipsum line when id % 13 == 7


def with_line_fixture(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``lined_text``: the document's normalized tokens in
    ``FIXTURE_LINE_TOKENS``-token lines joined by ``\\n`` — most lines
    end in '.', every (id+i)%7==3 line carries a trailing
    'javascript', and per-doc arithmetic injects a curly-brace line /
    a lorem-ipsum line, so every C4 rule fires somewhere in the
    corpus. NULL text → NULL. Fixture-generation only."""
    from capital.llm.text import normalized, tokens

    k, pm, jm = FIXTURE_LINE_TOKENS, FIXTURE_PUNCT_MOD, FIXTURE_JS_MOD
    # Group the tokens into k-token lines WITHOUT the per-index
    # slice-inside-transform shape (the round-9/12 interpreted-HOF
    # trap — a k-array allocation per line; ~0.4 s of both paired
    # rows at sf0.1, round-16 verdict): one codegen'd regex pass
    # rewrites every k-th inter-token space of the joined string to
    # '\n' (tokens are \S+ by construction — `normalized` collapses
    # whitespace), and a single flat indexed transform appends the
    # per-line suffixes (scalar concat per element, no allocations).
    rx = rf"((?:\\S+ ){{{k - 1}}}\\S+) "
    base_lines = (
        f"split(regexp_replace(array_join(__lt, ' '), '{rx}', '$1\\n'),"
        f" '\\n')"
    )
    lines = (
        f"transform({base_lines},"
        f" (l, i) -> concat(l,"
        f"   CASE WHEN (__did + i) % {jm} = 3 THEN ' javascript'"
        f"     ELSE '' END,"
        f"   CASE WHEN i % {pm} != {pm - 1} THEN '.' ELSE '' END))"
    )
    extras = (
        f"concat("
        f" CASE WHEN __did % {FIXTURE_BRACE_MOD} = 5"
        f"   THEN array('var cfg = {{ }}') ELSE array() END,"
        f" CASE WHEN __did % {FIXTURE_LOREM_MOD} = 7"
        f"   THEN array('lorem ipsum dolor sit amet.')"
        f"   ELSE array() END)"
    )
    text = F.col(text_col)
    return (
        df.withColumn("__lt", tokens(normalized(text)))
        .withColumn("__did", F.col("doc_id").cast("long"))
        .withColumn(
            "lined_text",
            F.when(
                text.isNotNull(),
                F.expr(
                    f"array_join(concat({lines}, {extras}), '\\n')"
                ),
            ),
        )
        .drop("__lt", "__did")
    )


def _line_keep(line: Column) -> Column:
    """The C4 line rule as a column predicate."""
    return (
        line.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(F.trim(line), r"\s+")) >= MIN_LINE_WORDS)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_quality_filter(
    df: DataFrame,
    text_col: str = "lined_text",
    id_col: str = "doc_id",
    with_text: bool = False,
    min_kept_lines: int = MIN_KEPT_LINES,
) -> DataFrame:
    """Per-document C4 signals + the composed ``c4_keep`` gate:
    ``n_lines``, ``n_kept_lines`` (line rule above), ``has_brace``,
    ``has_lorem``, ``clean_md5`` (kept lines joined by ``\\n``), and
    ``c4_keep`` = enough kept lines AND no page-level violation.

    Narrow single-pass column expressions (one linear per-line filter
    per doc, no explode, no shuffle) — the same fuse-into-the-scan
    posture as the Gopher gate: at 100 TB this runs ahead of the
    dedup tiers so the quadratic stages never see rejected pages.
    NULL text → NULL signals and NULL keep."""
    from capital.llm.text import round6_stable  # noqa: F401 (convention)

    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(lines, _line_keep)
    has_brace = F.contains(text, F.lit("{"))
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    keep = (
        (F.size(kept) >= int(min_kept_lines)) & ~has_brace & ~has_lorem
    )
    out = (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn("has_brace", has_brace)
        .withColumn("has_lorem", has_lorem)
        .withColumn("clean_md5", F.md5(F.array_join(kept, "\n")))
        .withColumn("c4_keep", keep)
    )
    if with_text:
        # the exact string clean_md5 digests — for composing
        # pipelines that keep processing the rule-surviving lines.
        out = out.withColumn("clean_text", F.array_join(kept, "\n"))
    return out


def dedup_corpus_lines(
    df: DataFrame,
    text_col: str = "lined_text",
    id_col: str = "doc_id",
    broadcast_dups: bool = True,
) -> DataFrame:
    """CORPUS-WIDE exact line dedup, first occurrence wins (C4's
    one-copy-survives span dedup at line granularity): a line is
    removed from every position except the globally smallest
    ``(doc_id, line_idx)`` one. One row per document: ``(id, n_lines,
    n_removed_lines, clean_md5)`` — clean_md5 the digest of the
    surviving lines joined by ``\\n`` (the span-family atomic
    surrogate).

    Shape at scale (the ``substring_dup_spans`` shape at line
    granularity): posexplode lines → ONE map-side-combined
    ``count + min(struct(doc_id, idx))`` aggregate per distinct
    line, FILTERED to duplicated lines only (the sparse boilerplate
    set) → left-join back: a probe line absent from the dup relation
    is trivially its own first occurrence, so the probe side never
    shuffles when the sparse side broadcasts (``broadcast_dups``, the
    spans regime switch — pass False when a lake's dup-line set
    outgrows a broadcast and the AQE-skew-split shuffle join takes
    over; the aggregate side stays one row per line either way, so
    hot lines cannot fan out) → one per-doc rebuild aggregate. A
    unique line IS its own first occurrence and always survives."""
    from capital.io import parallelize_narrow

    # Barrier the narrow (id, lined_text) frame: the explode feeds TWO
    # consumers (the dup aggregate and the join probe), and without
    # the checkpoint any upstream fixture/tokenize expression re-runs
    # on both legs (the round-12 projection-collapse trap pinned by
    # _token_frame).
    base = parallelize_narrow(
        df.select(id_col, text_col)
    ).localCheckpoint(eager=False)
    return line_dedup_flags(
        base, id_col=id_col, text_col=text_col,
        broadcast_dups=broadcast_dups,
    )


def line_dedup_flags(
    base: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "lined_text",
    prior: DataFrame | None = None,
    broadcast_dups: bool = True,
    with_text: bool = False,
) -> DataFrame:
    """The shared first-occurrence-wins core behind
    :func:`dedup_corpus_lines` AND the streaming twin
    (``capital.streaming.incremental.incremental_lines_run`` — one
    implementation so the documented stream-vs-batch byte equality
    cannot drift; round-15 review). ``prior``: an optional
    ``(__line, __seen)`` relation of lines already owned by history —
    any line present there is removed from every position in ``base``
    (it joins as a JVM relation: corpus-derived, never broadcast)."""
    ln = base.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__idx", "__line"
        ),
    )
    dup_first = (
        ln.groupBy("__line")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("__idx").alias("i")
                )
            ).alias("__first"),
        )
        .filter(F.col("__cnt") >= 2)
        .select("__line", "__first")
    )
    kept = ln
    if prior is not None:
        kept = kept.join(prior, "__line", "left")
    keep = F.col("__first").isNull() | (
        (F.col("__first.d") == F.col(id_col))
        & (F.col("__first.i") == F.col("__idx"))
    )
    if prior is not None:
        keep = F.col("__seen").isNull() & keep
    kept = kept.join(
        F.broadcast(dup_first) if broadcast_dups else dup_first,
        "__line",
        "left",
    ).withColumn("__keep", keep)
    clean = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__keep"),
                        F.struct("__idx", "__line"),
                    )
                )
            ),
            lambda s: s["__line"],
        ),
        "\n",
    )
    aggs = [
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed_lines"),
        F.md5(clean).alias("clean_md5"),
    ]
    if with_text:
        # the exact string the md5 digests — for composing pipelines
        # (pipe_curation_v2) that keep processing the deduped text.
        aggs.append(clean.alias("clean_text"))
    per_doc = kept.groupBy(id_col).agg(*aggs)
    out_cols = [
        F.col(id_col),
        F.when(F.col("__has"), F.col("n_lines")).alias("n_lines"),
        F.when(F.col("__has"), F.col("n_removed_lines")).alias(
            "n_removed_lines"
        ),
        F.when(F.col("__has"), F.col("clean_md5")).alias("clean_md5"),
    ]
    if with_text:
        out_cols.append(
            F.when(F.col("__has"), F.col("clean_text")).alias("clean_text")
        )
    # NULL lined_text rows never explode — re-attach as NULL rows.
    return (
        base.select(
            F.col(id_col), F.col(text_col).isNotNull().alias("__has")
        )
        .join(per_doc, id_col, "left")
        .select(*out_cols)
    )
