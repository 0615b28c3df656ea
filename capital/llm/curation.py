"""Corpus curation operators: quality-bucket gating and domain caps.

The round-7 additions to the training-data tier — the two selection
shapes the assembly operators (mixture, temperature, budget) don't
cover:

- **Perplexity gating** (:func:`perplexity_gate`): CCNet's
  head/middle/tail split (Wenzek et al. 2020 §4.3) — score documents
  with the corpus-as-its-own-LM unigram signal
  (:func:`capital.llm.text.unigram_logprob`), bucket against FIXED
  thresholds, keep each bucket at its configured rate. Fixed
  thresholds (not corpus quantiles) are the production posture: the
  cutoffs are calibrated once on a reference corpus and then applied
  as constants, so the gate is a narrow map — no global ranking, no
  extra shuffle, and new data batches are gated consistently with old
  ones.
- **Per-source caps** (:func:`capped_per_source`): no domain may
  contribute more than ``cap`` documents — the anti-dominance rule
  (cap the crawl dup-heavy domains) that rate-based mixing cannot
  express (a rate bounds the *expectation*, a cap bounds the
  *count*). Selection is deterministic: the ``cap`` smallest md5
  hash-fractions per source win, so retries/engine swaps reproduce
  the sample and adding NEW documents to a source never evicts an
  already-selected one unless the newcomer hashes lower.

Scale note (:func:`capped_per_source`): the naive shape sorts every
document of every source to rank them (one window over the full
corpus). The implementation pre-filters to ``u < slack·cap/n_s``
(per-source thresholds from a tiny count aggregate) so only
~``slack·cap`` candidate rows per source reach the ranking window —
at a billion-doc hot domain with cap=10k, that is the difference
between sorting 10⁹ rows and sorting 2·10⁴. A per-source guard
(candidate count < min(cap, n_s)) falls back to threshold 1.0, so
the output is PROVABLY identical to the unfiltered ranking
(property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from capital.llm.assemble import hash_fraction

#: CCNet-style default gate: keep all "head" (fluent), half of
#: "middle", drop "tail" (gibberish / encoding noise).
DEFAULT_BUCKET_RATES = {"head": 1.0, "middle": 0.5, "tail": 0.0}


def perplexity_bucket(
    scored: DataFrame,
    head_max: float,
    tail_min: float,
    score_col: str = "avg_neg_logprob",
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """Attach the head/middle/tail bucket from fixed thresholds:
    ``score < head_max`` → head, ``score >= tail_min`` → tail,
    middle otherwise. Narrow projection; thresholds are constants
    shared with the oracle SQL."""
    return scored.withColumn(
        out_col,
        F.when(F.col(score_col) < head_max, "head")
        .when(F.col(score_col) >= tail_min, "tail")
        .otherwise("middle"),
    )


def perplexity_gate(
    df: DataFrame,
    head_max: float,
    tail_min: float,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pplgate",
) -> DataFrame:
    """CCNet-shaped quality gate: unigram-LM score → fixed-threshold
    bucket → per-bucket deterministic keep rate. Returns the KEPT
    documents with their score and bucket.

    Shuffle account: exactly :func:`~capital.llm.text.unigram_logprob`
     's exchanges (token partials + per-doc agg); the bucket and the
    md5-fraction gate fuse into the final projection."""
    from capital.llm.text import unigram_logprob

    rates = DEFAULT_BUCKET_RATES if rates is None else rates
    rate_map = F.create_map(
        *[F.lit(x) for kv in sorted(rates.items()) for x in kv]
    )
    scored = perplexity_bucket(
        unigram_logprob(df, id_col, text_col), head_max, tail_min
    )
    u = hash_fraction(F.col(id_col), seed)
    rate = F.coalesce(rate_map[F.col("ppl_bucket")], F.lit(0.0))
    return scored.filter(u < rate).select(
        id_col, "n_tokens", "avg_neg_logprob", "ppl_bucket"
    )


def capped_per_source(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "cap",
    prefilter_slack: float = 2.0,
) -> DataFrame:
    """Keep at most ``cap`` documents per source — the ``cap``
    smallest ``hash_fraction(id)`` win, ties broken by id.

    Output: ``(source, id, cap_rank)`` with ``cap_rank`` in
    ``[1, cap]`` — identical to ranking ALL rows per source, but only
    ~``prefilter_slack · cap`` candidates per source reach the sort
    (see module docstring for the guard that makes this exact)."""
    if cap < 1:
        raise ValueError("capped_per_source: cap must be >= 1")
    u = hash_fraction(F.col(id_col), seed)
    rows = df.select(source_col, id_col).withColumn("__u", u)

    # Tiny per-source aggregate: total rows and candidate rows under
    # the slack threshold, in one pass (the threshold formula only
    # needs n_s, computed alongside).
    counts = rows.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    thr = F.least(
        F.lit(1.0), F.lit(float(prefilter_slack) * cap) / F.col("__n")
    )
    stats = (
        rows.join(F.broadcast(counts), source_col)
        .groupBy(source_col)
        .agg(
            F.first("__n").alias("__n"),
            F.sum(
                F.when(F.col("__u") < thr, 1).otherwise(0)
            ).alias("__n_cand"),
        )
    )
    # Guard: a source whose candidate set cannot cover min(cap, n)
    # ranks ALL its rows (threshold 1.0) — the pre-filter is then
    # provably lossless for every source.
    final_thr = F.when(
        F.col("__n_cand") >= F.least(F.lit(cap), F.col("__n")), thr
    ).otherwise(F.lit(1.0))
    cand = rows.join(
        F.broadcast(stats.select(source_col, final_thr.alias("__t"))),
        source_col,
    ).filter(F.col("__u") < F.col("__t"))

    w = Window.partitionBy(source_col).orderBy(
        F.asc("__u"), F.asc(id_col)
    )
    return (
        cand.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= cap)
        .select(source_col, id_col, "cap_rank")
    )


#: Gopher document-quality rules (Rae et al. 2021, Appendix A1.1),
#: scoped to document granularity (the synthetic corpus has no line
#: structure, so the two line-level rules — bullet starts, ellipsis
#: ends — are out of scope here). Constants are shared verbatim with
#: the oracle SQL.
GOPHER_RULES = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,   # '#' or '...' per word
    "min_alpha_word_ratio": 0.8,
    "min_required_stopwords": 2,
}

#: The paper's required-stopword set.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    rules: dict | None = None,
) -> DataFrame:
    """Per-document Gopher rule signals + the composed ``keep`` gate.

    All five signals are narrow single-pass column expressions over
    the raw text — no explode, no shuffle; the only higher-order op
    is a linear per-token filter (interpreted but O(tokens), the
    allowed regime). ``sum(len(token))`` uses the closed form
    ``len(text minus whitespace)``, which equals the token-length sum
    exactly under the engine's whitespace split (and keeps the
    empty-text ``[""]`` convention consistent on both engines).

    At 100 TB this is the cheapest gate in the funnel: fuse it into
    the scan ahead of the dedup/LSH tiers so the quadratic stages
    never see documents the rules reject.
    """
    from capital.llm.text import round6_stable, tokens

    r = dict(GOPHER_RULES)
    if rules:
        r.update(rules)
    text = F.col(text_col)
    toks = tokens(text)
    n_words = F.size(toks)
    char_sum = F.length(F.regexp_replace(text, r"\s+", ""))
    mean_wl = char_sum / F.greatest(n_words, F.lit(1))
    n_symbols = F.size(
        F.split(text, r"#", -1)
    ) - 1 + F.size(F.split(text, r"\.\.\.", -1)) - 1
    symbol_ratio = n_symbols / F.greatest(n_words, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    alpha_ratio = n_alpha / F.greatest(n_words, F.lit(1))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    keep = (
        (n_words >= r["min_words"])
        & (n_words <= r["max_words"])
        & (mean_wl >= r["min_mean_word_len"])
        & (mean_wl <= r["max_mean_word_len"])
        & (symbol_ratio <= r["max_symbol_ratio"])
        & (alpha_ratio >= r["min_alpha_word_ratio"])
        & (n_stop >= r["min_required_stopwords"])
    )
    # round6_stable, not round(): the ratios are exact-integer
    # divisions, bit-identical across engines, so a half-way decimal
    # boundary would expose the engines' round() disagreement.
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", round6_stable(mean_wl))
        .withColumn("symbol_ratio", round6_stable(symbol_ratio))
        .withColumn("alpha_word_ratio", round6_stable(alpha_ratio))
        .withColumn("n_required_stopwords", n_stop)
        .withColumn("gopher_keep", keep)
    )
