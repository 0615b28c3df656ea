"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The engine's token counting (``text.with_bpe_token_count``) *uses* a
tokenizer; this module *trains* one — the byte-pair-encoding merge
table a production pipeline fits on its own corpus before tokenizing
100 TB with it. Reference analogue: the reference pre-aggregates its
vocabulary server-side before any per-document work
(`glue_job_scripts/industry_code_glue_job.py:38-47` is the same
"reduce corpus to a small model, then apply" posture).

Algorithm (the canonical greedy BPE):

1. reduce the corpus to ``(word, count)`` — vocabulary-sized, the
   only corpus-wide pass;
2. represent each word as a symbol sequence (characters + an
   end-of-word marker);
3. repeat K times: count adjacent symbol pairs weighted by word
   count, take the most frequent pair (count desc, then (left,
   right) lexicographic — deterministic across engines), merge every
   greedy left-to-right occurrence.

Determinism/parity discipline: pair counts are exact integer sums;
the tie-break is pure string ordering over ASCII symbols; and the
merge step is a **plain string replace** over a delimited symbol
string — ``replace`` scans left-to-right and continues *after* each
replacement on Spark (Java ``String.replace``) and DuckDB alike,
which is exactly BPE's greedy non-overlapping merge semantics.
Symbols are delimited by DOUBLE separators (``||l||o||w||</w>||``)
and the merge pattern ``|l||r|`` → ``|lr|`` consumes one separator
from each flank: with single separators, consecutive pair
occurrences share the middle ``|`` and the scan-past-match rule
silently skips every second merge site (``|x|y|x|y|`` →
``|xy|x|y|``, measured); with doubles each occurrence owns its
boundary (``||x||y||x||y||`` → ``||xy||xy||``, and the overlapping
``aaa`` case still merges greedily to ``aa``+``a``). A mid-symbol
match is impossible — the pattern's flanking ``|`` can only land on
separator characters, which never occur inside a symbol. The whole
K-step loop therefore unrolls into pure SQL (each step's winner is a
scalar subquery), the PageRank-oracle pattern.

Scale shape: the corpus is touched ONCE (the word-count rollup —
map-side combined). Every iteration runs over the *vocabulary*
(distinct words), not the corpus: one explode of adjacent pairs +
one map-side-combined sum + a 1-row TakeOrderedAndProject. The
winning pair is collected to the driver per iteration — a bounded
1-row metadata read (the IVF probed-cell precedent) that bakes the
merge into the next step's ``replace`` as a literal; vocabulary
state is localCheckpoint-ed per step like the other iterative
operators (pass ``checkpoint_dir`` for reliable storage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Symbol separator and end-of-word marker. Words containing either
#: are dropped from training on BOTH engines (defensive contract —
#: whitespace-split tokens of a text corpus; the marker uses
#: characters that cannot appear inside a clean token).
SEP = "|"
EOW = "</w>"
_BAD_WORD_RE = "[|<>]"


def word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus → ``(word, cnt)`` rollup: the single corpus-wide pass of
    BPE training (explode + map-side-combined count). Words containing
    the separator/marker characters are dropped (module contract)."""
    from capital.llm.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(~F.col("word").rlike(_BAD_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sym_init(word: Column) -> Column:
    """Initial symbol string: ``||c||h||a||r||s||</w>||`` — DOUBLE
    separators around every character plus the end-of-word marker
    (see the module docstring for why doubles)."""
    return F.concat(
        F.lit(SEP + SEP),
        F.regexp_replace(word, "(.)", f"$1{SEP}{SEP}"),
        F.lit(EOW + SEP + SEP),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count: every position
    pair (including overlapping positions — the canonical
    ``get_stats``), exact integer sums."""
    syms = F.filter(
        F.split(F.col("sym"), r"\|"), lambda x: x != F.lit("")
    )
    pairs = F.arrays_zip(
        F.slice(syms, 1, F.size(syms) - 1).alias("l"),
        F.slice(syms, 2, F.size(syms) - 1).alias("r"),
    )
    return (
        state.select(F.col("cnt"), F.explode(pairs).alias("pr"))
        .select("cnt", F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def bpe_train(
    words: DataFrame,
    merges: int = 8,
    word_col: str = "word",
    count_col: str = "cnt",
    checkpoint_dir: str | None = None,
) -> tuple[list[dict], DataFrame]:
    """Train ``merges`` BPE merge rules over a ``(word, count)``
    vocabulary.

    Returns ``(rules, final_state)``: ``rules`` is the ordered merge
    table (``step``/``lhs``/``rhs``/``merged``/``pair_count`` — the
    trained tokenizer artifact), ``final_state`` the vocabulary with
    its merged symbol string (``word``, ``cnt``, ``sym``) — counting
    its symbols IS applying the tokenizer to the vocabulary.

    Each iteration collects the 1-row winner to the driver (bounded
    metadata read; bakes the merge literal into the next ``replace``)
    and checkpoints the vocabulary state (``localCheckpoint`` by
    default; ``checkpoint_dir`` for reliable storage — executor-loss
    survival on a real cluster, the pagerank/components contract).

    Training stops early when no pair remains (every word fused to
    one symbol).
    """
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
        top = (
            _pair_counts(state)
            .orderBy(
                F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["pair_count"])
        rules.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "pair_count": c,
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


def symbol_count(sym: Column) -> Column:
    """Number of symbols in a delimited symbol string — the word's
    BPE token count (end-of-word marker included, the convention)."""
    return F.size(
        F.filter(F.split(sym, r"\|"), lambda x: x != F.lit(""))
    )
