"""Text-analysis operators for training-data pipelines.

All operators are pure Catalyst expressions (split / filter / transform /
regexp — JVM-side, codegen'd); none drop to Python. At 100 TB each is a
narrow per-row map over the scan: no shuffle, scales with input splits.

Design: every operator is a function ``DataFrame -> DataFrame`` adding
typed columns, so they compose into one fused projection pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny per-language marker vocabularies for the n-gram/stopword
#: language-ID heuristic. Deliberately small and deterministic so the
#: heuristic is replicable in plain SQL (the DuckDB oracle).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("的", "是", "了", "在", "和"),
}

#: Characters counted as punctuation by the quality score.
_PUNCT_RE = r"[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish baseline tokenizer)."""
    return F.split(F.trim(text), r"\s+")


def py_tokens(text: str) -> list[str]:
    """Driver-side twin of ``tokens(normalized(col))`` for tiny
    workload lists (e.g. the BM25 query set): lowercase, collapse
    whitespace, trim, split. Java's ``\\s`` is ASCII-only, so the
    Python twin pins ``re.ASCII`` — parity with the Spark pair is
    asserted over the whole corpus in
    tests/test_retrieval_dsir.py::test_py_tokens_matches_spark_tokenizer.
    The trim is likewise pinned to the ASCII whitespace class: bare
    ``str.strip()`` removes Unicode whitespace (U+00A0, U+2028, …)
    that Java's ``trim`` (<= U+0020) and ASCII ``\\s`` keep, so a
    non-ASCII query term would silently diverge from the corpus side.
    Note the engine-wide convention: empty text tokenizes to ``[""]``
    (one empty token), same as Spark split / DuckDB
    string_split_regex."""
    import re

    collapsed = re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip(
        " \t\n\r\x0b\x0c"
    )
    return re.split(r"\s+", collapsed, flags=re.ASCII)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(F.col(text_col))))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality scoring.

    score ∈ [0,1]: rewards reasonable length, low punctuation density,
    and a natural stopword ratio — the classic cheap pre-filter before
    model-based quality scoring.
    """
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop / F.greatest(n_tok, F.lit(1))
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.3) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits.

    Ties break by fixed language order (en, de, fr, es, zh); zero hits
    → 'unknown'. Deterministic and SQL-replicable by construction.
    """
    toks = tokens(F.lower(F.col(text_col)))

    def _hits(markers: tuple[str, ...]) -> Column:
        # NB: the lambda must be single-parameter — PySpark reads lambda
        # arity, and a second (default) parameter turns it into an
        # (element, index) lambda.
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    hit_cols = {lang: _hits(m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("unknown")
    # Build the CASE ladder in reverse so earlier languages win ties.
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(
            (hit_cols[lang] > 0) & (hit_cols[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("pred_lang", pred)


#: PII patterns, kept to syntax valid in both Java regex (Spark) and
#: RE2 (DuckDB) — no lookarounds (RE2 lacks them), no backreferences,
#: ASCII \b/\d only — so the oracle replicates the scrub exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
#: separator-delimited phone numbers: optional +country prefix, a
#: 2–4 digit area/carrier group, 3–4 digit middle, 4 digit tail —
#: covers Korean mobile/landline (010-1234-5678, +82-10-1234-5678,
#: 02-312-3456) and NANP-style 555-123-4567 / 555 123 4567. The \b
#: guards stop matches starting/ending inside longer digit runs
#: (serial numbers stay intact — round-16 review); \b also blocks a
#: LETTER-glued start ('cell010-…'), which PHONE_GLUED_RE recovers
#: with a captured-prefix replacement (RE2 has no lookbehind — the
#: $1 reinsertion is the portable form; the two patterns are
#: disjoint by construction: boundary-start vs word-char-start).
#: Bare unseparated digit runs and parenthesized area codes stay out
#: of scope, and phone-shaped numeric prose (space-separated year
#: ranges) is accepted over-masking — the C4-grade scrub errs toward
#: privacy.
PHONE_RE = r"(?:\+\d{1,3}[- .])?\b\d{2,4}[- .]\d{3,4}[- .]\d{4}\b"
PHONE_GLUED_RE = (
    r"([A-Za-z_])((?:\+\d{1,3}[- .])?\d{2,4}[- .]\d{3,4}[- .]\d{4})\b"
)
#: dotted-quad IPv4 (no octet range check — the C4-grade scrub masks
#: version-string lookalikes too, deterministically on both engines).
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: scrub chain (name, pattern, replacement), applied sequentially;
#: URL before PHONE/IP so digits inside already-masked URLs are never
#: re-matched; replacements may carry $-group references (Java and
#: RE2 agree on $1 semantics). Count columns aggregate per NAME
#: (n_phones = boundary + letter-glued matches). Shared with the
#: SQL-twin generator in capital/queries/llm_queries.py so every
#: composing oracle (text_pii_scrub, pipe_*) stays in lockstep.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("urls", URL_RE, "<URL>"),
    ("phones", PHONE_RE, "<PHONE>"),
    ("phones", PHONE_GLUED_RE, "$1<PHONE>"),
    ("ips", IP_RE, "<IP>"),
)


def zip_grams(toks: Column, k: int) -> Column:
    """Rolling k-token grams (space-joined, order-preserving, NON-
    distinct) built as k shifted ``slice`` copies zipped positionally
    — the round-9/12 fast shape; the per-index
    ``transform(sequence(1, n−k+1), i -> slice(toks, i, k))`` walk
    runs the interpreted per-element slice path (measured 1.33 s vs
    0.71 s on the sf0.1 5-gram build). Docs shorter than k degrade to
    one truncated gram (missing zip slots are null; ``concat_ws``
    skips nulls — identical to the old ``slice(toks, 1, k)``
    truncation)."""
    n = F.size(toks)
    width = F.greatest(n - F.lit(k - 1), F.lit(1))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(k)]
    )
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(k)])
    )


def with_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al., "Scaling Language
    Models: ... Gopher", 2021, §A1.1 repetition filters):

    - ``dup_bigram_frac``: fraction of word bigrams that are repeats —
      high for boilerplate/spam pages;
    - ``top_token_frac``: frequency share of the most common token —
      high for keyword-stuffed or degenerate text.

    Shape at scale (round 14): both signals are PER-DOCUMENT — no row
    influences another document — so the right plan is one shuffle-free
    Arrow ``mapInPandas`` kernel doing the O(doc_len) dict walk per doc
    (the :func:`capital.llm.dedup.self_repetition_trim` treatment; no
    corpus-derived broadcast set is involved, so the round-14
    kernel-inversion hazard does not apply). The previous form
    expressed the same per-doc logic through four corpus-sized
    exchanges (two explode → groupBy(id, gram) → groupBy(id) pipelines)
    plus two joins back on the id — measured 1.33 s vs 0.47 s at sf0.1,
    and at 100 TB those exchanges are pure waste. The kernel is also a
    materialization barrier, so downstream *filters* on the fractions
    (the cleaning-pipeline gates) cannot push into and re-evaluate the
    signal — the property the old aggregate-join shape existed to
    provide. Tokenization uses :func:`py_tokens`, the asserted twin of
    ``tokens(normalized(.))``; a null text yields null fractions
    (exactly the old left-join behavior). Rounding is the
    :func:`round6_stable` four-IEEE-op form on both engines (the
    pre-round value is a ratio of exact integers — bit-identical in
    Python, the JVM, and DuckDB).
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("dup_bigram_frac", DoubleType()),
            StructField("top_token_frac", DoubleType()),
        ]
    )

    def _rep(batches):
        import math

        import pandas as pd

        for pdf in batches:
            dup, top = [], []
            for text in pdf[text_col]:
                if text is None:
                    dup.append(None)
                    top.append(None)
                    continue
                toks = py_tokens(text)
                n = len(toks)
                if n >= 2:
                    distinct = len(
                        {(toks[i], toks[i + 1]) for i in range(n - 1)}
                    )
                    d_raw = 1.0 - distinct / float(n - 1)
                else:
                    # One (possibly empty) token degrades to a single
                    # truncated gram — dup fraction 0, same as the old
                    # zip-of-slices shape.
                    d_raw = 0.0
                cnt: dict[str, int] = {}
                for t in toks:
                    cnt[t] = cnt.get(t, 0) + 1
                t_raw = max(cnt.values()) / float(n)
                dup.append(math.floor(d_raw * 1000000.0 + 0.5) / 1000000.0)
                top.append(math.floor(t_raw * 1000000.0 + 0.5) / 1000000.0)
            out = pdf.copy()
            out["dup_bigram_frac"] = pd.Series(dup, dtype="float64")
            out["top_token_frac"] = pd.Series(top, dtype="float64")
            yield out

    return df.mapInPandas(_rep, schema=out_schema)


#: The Gopher §A1.1 n-gram battery: duplicate-FRACTION n-grams …
GOPHER_DUP_NS = (2, 3, 4)
#: … and duplicated-n-gram character-COVERAGE n-grams.
GOPHER_COVER_NS = (5, 6, 7, 8, 9, 10)


def with_gopher_ngrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The FULL Gopher §A1.1 repetition battery (Rae et al. 2021,
    Table A1) beyond :func:`with_repetition`'s two signals — one
    column per filter row of the paper's table:

    - ``dup_{n}gram_frac`` (n = 2, 3, 4): fraction of the document's
      word n-grams that are repeats (occurrences beyond the first);
    - ``top_{n}gram_char_frac`` (n = 2, 3, 4): character share of the
      single most frequent n-gram, counting every occurrence (ties
      break to the lexicographically smallest gram — deterministic
      and SQL-replicable);
    - ``dup_{n}gram_char_frac`` (n = 5…10): character share of the
      UNION of token positions covered by any n-gram occurring more
      than once (all occurrences mark coverage; overlaps count once —
      the union semantics of the span family).

    Character mass is token characters (whitespace carries no mass):
    a position contributes ``len(token)``, a gram ``len(' '.join) −
    (n−1)``; the denominator is the document's total token characters
    (docs whose tokens are all empty — the ``[""]`` convention —
    score 0 everywhere, as do docs shorter than n). NULL text yields
    NULL fractions (the oracle's NULL token array).

    Shape at scale: PER-DOCUMENT — one shuffle-free Arrow
    ``mapInPandas`` kernel, one O(doc_len · Σn) dict walk per doc, no
    corpus-derived state (the round-14 kernel regime). All fractions
    are :func:`round6_stable` ratios of exact integers, bit-identical
    on both engines.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    cols = (
        [f"dup_{n}gram_frac" for n in GOPHER_DUP_NS]
        + [f"top_{n}gram_char_frac" for n in GOPHER_DUP_NS]
        + [f"dup_{n}gram_char_frac" for n in GOPHER_COVER_NS]
    )
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(c, DoubleType()) for c in cols]
    )

    def _r6(x: float) -> float:
        import math

        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    def _battery(batches):
        import pandas as pd

        for pdf in batches:
            vals: dict[str, list] = {c: [] for c in cols}
            for text in pdf[text_col]:
                if text is None:
                    for c in cols:
                        vals[c].append(None)
                    continue
                toks = py_tokens(text)
                lens = [len(t) for t in toks]
                total_chars = sum(lens)
                for n in GOPHER_DUP_NS:
                    m = len(toks) - n + 1
                    if m <= 0:
                        vals[f"dup_{n}gram_frac"].append(0.0)
                        vals[f"top_{n}gram_char_frac"].append(0.0)
                        continue
                    cnt: dict[str, int] = {}
                    for i in range(m):
                        g = " ".join(toks[i : i + n])
                        cnt[g] = cnt.get(g, 0) + 1
                    vals[f"dup_{n}gram_frac"].append(
                        _r6(1.0 - len(cnt) / float(m))
                    )
                    # argmax by count, ties to the lex-smallest gram —
                    # the STRING key, matching the oracle's
                    # `ORDER BY cnt DESC, gram ASC` (tuple order can
                    # diverge on sub-space control chars). mx hoisted:
                    # the in-generator form was O(distinct²) per doc.
                    mx = max(cnt.values())
                    top_s = min(
                        g for g, c in cnt.items() if c == mx
                    )
                    mass = mx * (len(top_s) - (n - 1))
                    vals[f"top_{n}gram_char_frac"].append(
                        _r6(mass / float(total_chars))
                        if total_chars else 0.0
                    )
                for n in GOPHER_COVER_NS:
                    m = len(toks) - n + 1
                    if m <= 0 or total_chars == 0:
                        vals[f"dup_{n}gram_char_frac"].append(0.0)
                        continue
                    pos_by_gram: dict[tuple, list] = {}
                    for i in range(m):
                        g = tuple(toks[i : i + n])
                        ps = pos_by_gram.get(g)
                        if ps is None:
                            pos_by_gram[g] = [i]
                        else:
                            ps.append(i)
                    covered: set[int] = set()
                    for ps in pos_by_gram.values():
                        if len(ps) >= 2:
                            for i in ps:
                                covered.update(range(i, i + n))
                    mass = sum(lens[p] for p in covered)
                    vals[f"dup_{n}gram_char_frac"].append(
                        _r6(mass / float(total_chars))
                    )
            out = pdf.copy()
            for c in cols:
                out[c] = pd.Series(vals[c], dtype="float64")
            yield out

    return df.mapInPandas(_battery, schema=out_schema)


def with_char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (bits/char) of the character distribution — low
    entropy flags degenerate/repetitive text, very high flags noise.

    Shape: explode characters → count per (id, char) → fold the
    entropy terms per id. The per-row formulation (filter per distinct
    char) is O(distinct×len) inside a single task — measured 85×
    slower at sf0.1 — while the exploded form is two map-side-combined
    shuffles that scale with input splits.

    Accumulation discipline: terms fold in sorted-char order on both
    engines (``sort_array`` of (char, term) structs here, sorted
    ``list_transform`` in the oracle), so the float result is
    bit-replicable.
    """
    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    text = F.col(text_col)
    # greatest(n,1) guards the empty doc: ANSI mode makes /0 an error,
    # and ['']/1 yields entropy 0 identically on both engines.
    ng = F.greatest(F.length(text), F.lit(1))
    chars = F.transform(
        F.sequence(F.lit(1), ng), lambda i: F.substring(text, i, 1)
    )
    counts = (
        df.select(
            F.col(id_col), ng.alias("__ng"), F.explode(chars).alias("__c")
        )
        .groupBy(id_col, "__c")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.first("__ng").alias("__ngf"))
    )
    term = (F.col("__cnt") / F.col("__ngf")) * F.log2(
        F.col("__cnt") / F.col("__ngf")
    )
    per_doc = (
        counts.select(
            F.col(id_col),
            F.struct(F.col("__c"), term.alias("__t")).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__s")).alias("__terms"))
    )
    entropy = -F.aggregate(
        F.transform("__terms", lambda s: s["__t"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # abs() canonicalizes IEEE -0.0 (single-repeated-char docs) so the
    # row sort order cannot diverge from the oracle's.
    ent = per_doc.select(
        F.col(id_col), F.abs(F.round(entropy, 6)).alias("char_entropy")
    )
    return df.join(ent, id_col, "left")


#: GPT-2-style pretokenizer pattern, reduced to syntax shared by Java
#: regex and RE2 (no lookahead): letter runs, digit runs, and
#: punctuation/symbol runs, each with an optional leading space.
#: Unicode classes keep CJK/Hangul text tokenizing sensibly.
BPE_SPLIT_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token budget: counts pretokenizer segments (the pieces a
    byte-pair encoder would merge within) — a far better cost proxy for
    LLM training than whitespace words, especially for unsegmented
    scripts. Adds ``chars_per_token`` as the compression-ratio signal.
    Narrow regexp projection; no shuffle.
    """
    text = F.col(text_col)
    toks = F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)
    n = F.size(toks)
    return df.withColumn("n_bpe_tokens", n).withColumn(
        "chars_per_token",
        F.round(F.length(text) / F.greatest(n, F.lit(1)), 6),
    )


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect-and-redact PII-ish spans (emails, URLs, phone numbers,
    IPv4 addresses — the C4/FineWeb-grade set): per-doc match counts
    plus the redacted text. Counts are over the RAW text; redaction
    applies the :data:`PII_PATTERNS` chain in order (URL before
    PHONE/IP so URL-embedded digits are never re-matched). Narrow
    regexp projection — the standard pre-training scrub pass, zero
    shuffle at any scale.
    """
    text = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat, _repl in PII_PATTERNS:
        c = F.regexp_count(text, F.lit(pat))
        counts[name] = counts[name] + c if name in counts else c
    out = df
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c)
    redacted = text
    for _name, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    return out.withColumn("scrubbed_text", redacted)


def normalized(text: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapsed
    whitespace, trimmed."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    - ``fingerprint``: md5 of the normalized full text (exact-dup key);
    - ``min_shingle_hash``: minimum md5 over 5-token rolling shingles —
      a winnowing-style content fingerprint robust to prefix/suffix
      edits. Hex-string min == numeric min (fixed-width lowercase hex),
      which keeps it replicable in any SQL engine.
    """
    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    toks = tokens(normalized(F.col(text_col)))
    shingles = zip_grams(toks, 5)
    return df.withColumn(
        "fingerprint", F.md5(normalized(F.col(text_col)))
    ).withColumn(
        "min_shingle_hash",
        F.array_min(F.transform(shingles, lambda s: F.md5(s))),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    context-length preparation step between cleaning and packing
    (long documents must become model-sized pieces; the overlap keeps
    boundary sentences learnable from both sides).

    Window starts step by ``chunk_tokens - overlap`` while material
    remains (a final short chunk keeps the tail; a short/empty doc
    yields exactly one chunk). Emits ``(id, chunk_index,
    n_chunk_tokens, chunk_md5)`` — the digest, not the text, so
    downstream exact-dedup of chunks needs no second tokenization.

    Scale: narrow explode, ~n_tokens/step rows per doc, zero shuffle;
    the expansion happens in the scan's projection.
    """
    step = int(chunk_tokens) - int(overlap)
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(int(overlap)), F.lit(1)), F.lit(step)
    )
    exploded = df.select(
        F.col(id_col), toks.alias("__toks"), F.explode(starts).alias("__s")
    )
    chunk = F.slice(F.col("__toks"), F.col("__s"), int(chunk_tokens))
    return exploded.select(
        F.col(id_col),
        F.expr(f"(__s - 1) div {step}").cast("int").alias("chunk_index"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary statistics for tokenizer training: per-token
    global occurrence count, frequency rank, and cumulative coverage
    share (what fraction of all token occurrences the top-r tokens
    explain — the number a vocab-size decision is made from).

    Shape: explode tokens → one map-side-combined count per token →
    a single ordered window over the *vocabulary* (not the corpus) for
    rank + running share. The window is deliberately unpartitioned:
    vocabulary cardinality is corpus-sublinear (Heaps' law) and the
    frame shrank by orders of magnitude at the aggregate; at true
    100 TB scale cap it (count >= min_count) before ranking. Ties
    break by token so rank and cum share are deterministic.
    """
    tok = df.select(
        F.explode(tokens(normalized(F.col(text_col)))).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    run = Window.orderBy(F.desc("n_occurrences"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_share",
            F.round(
                F.sum("n_occurrences").over(run)
                / F.sum("n_occurrences").over(tot),
                6,
            ),
        )
        .filter(F.col("rank") <= int(top_k))
    )


def doc_frequency_boilerplate(
    df: DataFrame,
    min_doc_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-token discovery by document frequency: tokens
    present in at least ``min_doc_frac`` of all documents (the site
    chrome / license header / navigation words a cleaning pass strips
    or downweights). Per-doc *distinct* tokens explode once; the doc
    count is a scalar agg cross-joined (1 row — broadcast, no corpus
    re-scan)."""
    distinct_tok = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(tokens(normalized(F.col(text_col))))
        ).alias("token"),
    )
    dfreq = distinct_tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs_with")
    )
    total = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        dfreq.crossJoin(F.broadcast(total))
        .withColumn(
            "doc_frac",
            F.round(F.col("n_docs_with") / F.col("__n_docs"), 6),
        )
        .filter(F.col("doc_frac") >= float(min_doc_frac))
        .select("token", "n_docs_with", "doc_frac")
    )


def round6_stable(col: Column) -> Column:
    """Cross-engine-stable round-to-6 for NON-NEGATIVE doubles whose
    pre-round value is bit-identical on both engines:
    ``floor(x·10⁶ + 0.5) / 10⁶`` — four elementary IEEE ops any engine
    executes identically. Engine ``round()`` implementations are NOT
    interchangeable at half-way boundaries (Java BigDecimal rounds the
    exact decimal expansion of the double; C-style rounds the scaled
    product): at sf0.1 one document's avg logprob landed on such a
    boundary and Spark/DuckDB round() disagreed by exactly 1e-6
    (round-7 audit). Use this wherever the rounded value is derived
    from exact (decimal/integer) inputs; plain round() is fine when
    values are far from boundaries in expectation."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram language-model score: average negative
    log2-probability of the document's tokens under the corpus's own
    unigram distribution — the CCNet-style LM-perplexity quality
    signal (Wenzek et al. 2020), with the corpus itself as the LM.
    High scores = improbable token streams (gibberish, encoding
    noise); low = fluent-for-this-corpus text.

    Shape: token explode → map-side-combined vocab counts → scalar
    total broadcast → per-token logp re-joined to the token stream →
    one groupBy(doc). Per-token log-probs are rounded to 6 decimals
    and accumulated as DECIMAL(28,6) so the per-doc sum is
    order-independent and engine-exact (the repo's float-parity
    discipline: never SUM raw doubles). At 100 TB the vocab join is
    the only non-broadcast exchange; persist the exploded tokens to
    trade the second corpus scan for storage.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(normalized(F.col(text_col)))).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__total"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(F.log2(F.col("__n") / F.col("__total")), 6)
        .cast("decimal(28,6)")
        .alias("__logp"),
    )
    return (
        tok.join(probs, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round6_stable(
                -F.sum("__logp").cast("double") / F.count(F.lit(1))
            ).alias("avg_neg_logprob"),
        )
    )


def tfidf_doc_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TF-IDF scalar stats over EXACT tokens: distinct-term
    count and the L2 norm of the tf·idf weight vector, with Spark ml's
    smoothed IDF formula ``ln((N + 1) / (df + 1))``.

    This is the engine-portable twin of the ``pyspark.ml``
    HashingTF→IDF pipeline (:func:`capital.llm.ml_variants.
    tfidf_features`): identical math minus the feature-hashing step, so
    every number is replicable in any SQL engine (no murmur3 bucketing,
    no collision noise) and the query carries a hash oracle. Shape:
    token explode → (doc, term) tf counts with partial aggregation →
    term-keyed df counts → broadcast scalar doc total → doc-keyed
    final aggregate. Three key-partitioned shuffles, no windows over
    the corpus; the weight sum is decimal-cast for order-independent
    float parity (see ``capital.queries.registry.decimal_sum``).
    """
    from capital.io import parallelize_narrow

    toks = parallelize_narrow(df).select(
        F.col(id_col),
        F.explode(tokens(normalized(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    total = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    weighted = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__wgt",
            F.col("__tf")
            * F.log((F.col("__n_docs") + F.lit(1.0)) / (F.col("__df") + F.lit(1.0))),
        )
    )
    return weighted.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.sqrt(
                F.sum(
                    (F.col("__wgt") * F.col("__wgt")).cast("decimal(28,6)")
                ).cast("double")
            ),
            6,
        ).alias("l2_norm"),
    )


def _bigram_rows(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exploded ``(id, prev, cur)`` bigram rows, built by zipping the
    token array with its own tail — TWO ``slice`` copies + one
    ``arrays_zip`` pass, all linear (round 12: the previous per-index
    ``transform(sequence(1, n-1), i -> element_at(...))`` walk ran in
    the interpreted HOF path and cost 12.6 s vs 1.1 s for this shape
    on the sf0.1 bigram count — the same trap as the round-9 shingle
    finding). Docs with fewer than two tokens are filtered out before
    the slice (``slice`` with length 0 would be fine, but the filter
    also keeps ``sequence``-free semantics explicit)."""
    toks = tokens(normalized(F.col(text_col)))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("prev"),
        F.slice(toks, 2, n - 1).alias("cur"),
    )
    return (
        df.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("bg"))
        .select(F.col(id_col), F.col("bg.prev"), F.col("bg.cur"))
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model score: average negative
    log2 of P(token | previous token) under the corpus's own bigram
    distribution — the conditional upgrade of :func:`unigram_logprob`
    (CCNet-style LM quality signal, Wenzek et al. 2020). Word salad
    scores high even when its unigrams are individually common, which
    is exactly what the unigram signal cannot see.

    Shape: bigrams materialize **array-side** (zip of the token array
    with its own tail — narrow, no posexplode self-join), then one
    (prev, cur) count aggregate; context totals reuse that aggregate's
    partitioning (groupBy on a key subset — no extra exchange); the
    conditional-prob join is co-partitioned on ``prev``. Per-bigram
    log-probs round to 6 decimals and accumulate as DECIMAL(28,6) —
    the repo's order-independent float-parity discipline. Docs with
    fewer than two tokens have no bigrams and drop out (inner join),
    mirroring the oracle.
    """
    big = _bigram_rows(df, id_col, text_col)
    c2 = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("__n2"))
    c1 = c2.groupBy("prev").agg(F.sum("__n2").alias("__n1"))
    probs = c2.join(c1, "prev").select(
        "prev",
        "cur",
        F.round(F.log2(F.col("__n2") / F.col("__n1")), 6)
        .cast("decimal(28,6)")
        .alias("__logp"),
    )
    return (
        big.join(probs, ["prev", "cur"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round6_stable(
                -F.sum("__logp").cast("double") / F.count(F.lit(1))
            ).alias("avg_neg_logprob2"),
        )
    )


def kneser_ney_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document interpolated Kneser–Ney bigram score: average
    negative log2 of

    ``P_KN(cur|prev) = (max(c(prev,cur) − D, 0)
                        + D · N1+(prev,·) · (N1+(·,cur) / T)) / c(prev)``

    — the absolute-discount/continuation smoothing (Kneser & Ney 1995;
    Chen & Goodman 1999) behind KenLM-style quality filtering (CCNet,
    Wenzek et al. 2020). Against the raw conditional
    (:func:`bigram_logprob`) it (a) never assigns zero mass to an
    unseen-but-plausible continuation and (b) scores a word by how
    many CONTEXTS it follows (``N1+(·,cur)/T``), not how often it
    occurs — the canonical "San Francisco" failure: raw counts make
    bare "Francisco" likely anywhere, continuation counts do not.

    Every model quantity is an exact integer aggregate over the SAME
    (prev, cur) count frame (context totals, context fan-out
    ``N1+(prev,·)``, continuation counts ``N1+(·,cur)``, type total
    ``T`` — groupBys on key subsets, partitioning reused); the
    probability is one fixed-shape float expression of those integers
    (parenthesization shared with the SQL twin), per-bigram log2
    rounds to 6 and accumulates as DECIMAL — the engine float-parity
    discipline. Docs with fewer than two tokens drop (no bigrams).
    """
    big = _bigram_rows(df, id_col, text_col)
    d = float(discount)
    c2 = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("__n2"))
    ctx = c2.groupBy("prev").agg(
        F.sum("__n2").alias("__n1"),
        F.count(F.lit(1)).alias("__fanout"),
    )
    cont = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("__ncont"))
    types = c2.agg(F.count(F.lit(1)).alias("__t"))
    p = (
        F.greatest(F.col("__n2") - F.lit(d), F.lit(0.0))
        + (F.lit(d) * F.col("__fanout"))
        * (F.col("__ncont") / F.col("__t"))
    ) / F.col("__n1")
    probs = (
        c2.join(ctx, "prev")
        .join(cont, "cur")
        .crossJoin(F.broadcast(types))
        .select(
            "prev",
            "cur",
            F.round(F.log2(p), 6).cast("decimal(28,6)").alias("__logp"),
        )
    )
    return (
        big.join(probs, ["prev", "cur"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round6_stable(
                -F.sum("__logp").cast("double") / F.count(F.lit(1))
            ).alias("avg_neg_logprob2_kn"),
        )
    )
