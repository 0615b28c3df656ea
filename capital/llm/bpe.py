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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Symbol separator and end-of-word marker. Words containing either
#: are dropped from training on BOTH engines (defensive contract —
#: whitespace-split tokens of a text corpus; the marker uses
#: characters that cannot appear inside a clean token).
SEP = "|"
EOW = "</w>"
_BAD_WORD_RE = "[|<>]"
#: Unknown-symbol token (the OOV contract, round 16): characters never
#: seen in the TRAINING alphabet encode to the UNK id — one reserved
#: id immediately after the merge-id block (``B + K``), so the trained
#: id space is stable and total. The surface form uses characters a
#: clean token can never contain (the _BAD_WORD_RE exclusion), so it
#: cannot collide with a real symbol; decode emits it literally.
UNK = "<unk>"


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
    mode: str = "local",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> tuple[list[dict], DataFrame]:
    """Train ``merges`` BPE merge rules over a ``(word, count)``
    vocabulary.

    Returns ``(rules, final_state)``: ``rules`` is the ordered merge
    table (``step``/``lhs``/``rhs``/``merged``/``pair_count`` — the
    trained tokenizer artifact), ``final_state`` the vocabulary with
    its merged symbol string (``word``, ``cnt``, ``sym``) — counting
    its symbols IS applying the tokenizer to the vocabulary.

    Two training backends behind one API (equivalence property-tested
    — identical rule tables and final states on the same vocabulary):

    - ``mode="local"`` (default): the corpus-wide ``word_counts``
      rollup already reduced the problem to a vocabulary that fits on
      the driver — collect it ONCE and train merges in-memory with
      incrementally-maintained pair counts (heap + lazy deletion, the
      standard tokenizer-trainer algorithm). Real tokenizers run
      30k–50k merges; the distributed loop's ~0.4 s/round scheduling
      floor makes that days of pure overhead, while local training
      does K=4096 over a 200k-word vocabulary in seconds
      (DESIGN_SCALE.md). This is the reference's own posture —
      "reduce to a small model, then apply"
      (glue_job_scripts/industry_code_glue_job.py:38-47). Web-scale
      vocabularies bound the collect with ``max_vocab`` (top-N by
      count, deterministic tie-break) and/or ``min_count`` — exactly
      what production trainers do (hapax legomena cannot win a merge
      against any threshold anyway).
    - ``mode="distributed"``: the K-round Spark loop, for
      vocabularies too large to collect even after thresholding. Each
      iteration collects the 1-row winner (bounded metadata read;
      bakes the merge literal into the next ``replace``) and
      checkpoints the vocabulary state (``localCheckpoint`` by
      default; ``checkpoint_dir`` for reliable storage).

    Training stops early when no pair remains (every word fused to
    one symbol).
    """
    if mode == "local":
        return _bpe_train_local(
            words, merges, word_col, count_col, max_vocab, min_count
        )
    if mode != "distributed":
        raise ValueError(f"bpe_train: unknown mode {mode!r}")
    if max_vocab is not None or min_count > 1:
        words = _threshold_vocab(words, word_col, count_col, max_vocab, min_count)
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


def _threshold_vocab(
    words: DataFrame,
    word_col: str,
    count_col: str,
    max_vocab: int | None,
    min_count: int,
) -> DataFrame:
    """Deterministic vocabulary thresholding shared by both backends:
    drop words below ``min_count``, then keep the top ``max_vocab`` by
    (count desc, word asc) — a total order, so the kept set is unique."""
    out = words
    if min_count > 1:
        out = out.filter(F.col(count_col) >= int(min_count))
    if max_vocab is not None:
        out = out.orderBy(
            F.desc(count_col), F.asc(word_col)
        ).limit(int(max_vocab))
    return out


def _greedy_merge(syms: list, lhs: str, rhs: str, merged: str) -> list:
    """Greedy left-to-right non-overlapping merge — the list twin of
    the delimited-string ``replace`` (scan continues AFTER each
    replacement, so ``aaa`` merges to ``aa``+``a``)."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_train_local(
    words: DataFrame,
    merges: int,
    word_col: str,
    count_col: str,
    max_vocab: int | None,
    min_count: int,
) -> tuple[list[dict], DataFrame]:
    """Driver-local merge training over the vocabulary rollup (see
    :func:`bpe_train`). One bounded collect (``toArrow`` — the
    vocabulary, not the corpus), then K merges with incrementally
    maintained pair counts:

    - global ``pair_counts`` plus an inverted index pair → holder
      word ids, so each merge touches only the words that contain
      the winning pair;
    - per touched word, the pair-count delta is (new adjacent-pair
      multiset − old), exact by construction — overlap counting
      (canonical ``get_stats``) falls out of counting positions;
    - winner selection via a min-heap on ``(-count, lhs, rhs)`` with
      lazy deletion (every count change pushes a fresh entry; stale
      entries are discarded on pop) — the same (count desc, pair
      lexicographic) tie-break as the distributed path. ASCII/BMP
      symbols order identically in Python (code points) and Spark
      (UTF-16 units); only astral-plane characters could diverge.

    Complexity: O(Σ|word| + K·(touched words)·|word|) — seconds for
    K in the thousands on a few-hundred-k-word vocabulary, vs the
    distributed loop's K × ~0.4 s job-scheduling floor.
    """
    import heapq
    from collections import Counter, defaultdict

    spark = words.sparkSession
    vocab_df = _threshold_vocab(words, word_col, count_col, max_vocab, min_count)
    tbl = vocab_df.select(
        F.col(word_col).alias("word"), F.col(count_col).cast("long").alias("cnt")
    ).toArrow()
    wlist = tbl.column("word").to_pylist()
    clist = tbl.column("cnt").to_pylist()
    vocab: list[list] = [[*w, EOW] for w in wlist]

    pair_counts: Counter = Counter()
    holders: dict = defaultdict(set)
    for i, syms in enumerate(vocab):
        c = clist[i]
        for p, k in Counter(zip(syms, syms[1:])).items():
            pair_counts[p] += k * c
            holders[p].add(i)
    heap = [(-n, l, r) for (l, r), n in pair_counts.items()]
    heapq.heapify(heap)

    rules: list[dict] = []
    for step in range(1, int(merges) + 1):
        best = None
        while heap:
            negn, l, r = heap[0]
            if pair_counts.get((l, r), 0) == -negn:
                best = (l, r)
                break
            heapq.heappop(heap)  # stale (count changed or zeroed)
        if best is None:
            break
        lhs, rhs = best
        merged = lhs + rhs
        rules.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": merged,
                "pair_count": int(pair_counts[best]),
            }
        )
        for i in list(holders[best]):
            syms = vocab[i]
            c = clist[i]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _greedy_merge(syms, lhs, rhs, merged)
            new = Counter(zip(new_syms, new_syms[1:]))
            vocab[i] = new_syms
            for p in old.keys() | new.keys():
                delta = (new.get(p, 0) - old.get(p, 0)) * c
                if delta:
                    nc = pair_counts[p] + delta
                    if nc > 0:
                        pair_counts[p] = nc
                        heapq.heappush(heap, (-nc, p[0], p[1]))
                    else:
                        del pair_counts[p]
                if new.get(p, 0) > 0:
                    holders[p].add(i)
                else:
                    holders[p].discard(i)

    sep2 = SEP + SEP
    state = spark.createDataFrame(
        [
            (wlist[i], clist[i], sep2 + sep2.join(vocab[i]) + sep2)
            for i in range(len(wlist))
        ],
        "word string, cnt long, sym string",
    )
    return rules, state


def symbol_count(sym: Column) -> Column:
    """Number of symbols in a delimited symbol string — the word's
    BPE token count (end-of-word marker included, the convention)."""
    return F.size(
        F.filter(F.split(sym, r"\|"), lambda x: x != F.lit(""))
    )


def _syms(sym: Column) -> Column:
    """Delimited symbol string → symbol array (drops the empty
    fragments the double separators produce)."""
    return F.filter(F.split(sym, r"\|"), lambda x: x != F.lit(""))


def apply_merges(
    words: DataFrame,
    rules: list[dict],
    word_col: str = "word",
    checkpoint_dir: str | None = None,
    batch: int = 48,
) -> DataFrame:
    """Apply a trained merge table to NEW words: sequential in-order
    replace over the delimited symbol string — the exact semantics of
    training's merge step, so ``apply_merges(word_counts(corpus),
    rules)`` reproduces training's ``final_state`` syms bit-for-bit
    on the training corpus (property-tested) and extends the
    tokenizer to out-of-vocabulary words of a new corpus.

    Replaces are chained ``batch`` rules at a time with a
    localCheckpoint barrier between batches: one projection holding
    thousands of nested ``replace`` calls exceeds janino's 64 KB
    generated-method limit and silently falls back to interpreted
    evaluation (the round-6 PQ finding) — 48 stays comfortably
    codegen'd. Cost is K/batch narrow passes over the *distinct
    words* (vocabulary-sized), never the corpus.
    """
    from capital.io import plan_checkpointer

    ckpt = plan_checkpointer(words.sparkSession, checkpoint_dir)
    out = words.withColumn("sym", sym_init(F.col(word_col)))
    for i in range(0, len(rules), batch):
        col = F.col("sym")
        for r in rules[i : i + batch]:
            col = F.replace(
                col,
                F.lit(f"{SEP}{r['lhs']}{SEP}{SEP}{r['rhs']}{SEP}"),
                F.lit(f"{SEP}{r['merged']}{SEP}"),
            )
        out = out.withColumn("sym", col)
        if i + batch < len(rules):
            out = ckpt(out)
    return out


def bpe_vocab(
    rules: list[dict], state: DataFrame, unk_token: str | None = None
) -> DataFrame:
    """The trained tokenizer's id table: ``(token, token_id)``.

    Ids are assigned the standard way — the base alphabet (every
    character occurring in the training vocabulary, plus the
    end-of-word marker) sorted lexicographically gets ids ``0..B-1``,
    then each merge rule's ``merged`` symbol gets ``B + step - 1``.
    Two different merges can produce the same surface string
    (``a+bc`` and ``ab+c`` both yield ``abc``); the table keeps the
    MIN id per token so symbol → id is a function (both the encode
    join and the oracle apply the same rule).

    The global row_number window runs on ONE task — fine: the
    alphabet is charset-bounded (hundreds of rows), the same bounded-
    metadata posture as the per-step winner collect.

    ``unk_token``: reserve one extra id ``B + K`` (base alphabet +
    number of merge rules — invariant to surface-collision dedup) for
    the given unknown-symbol surface form, appended AFTER the min-id
    dedup so it can never absorb a real symbol's id. Pass
    :data:`UNK` to get the module's documented OOV contract.
    """
    spark = state.sparkSession
    chars = (
        state.select(F.explode(F.split(F.col("word"), "")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    alpha = chars.unionByName(
        spark.createDataFrame([(EOW,)], "token string")
    ).distinct()
    base = alpha.withColumn(
        "token_id",
        (F.row_number().over(Window.orderBy("token")) - 1).cast("int"),
    )
    n_base = base.agg(F.count(F.lit(1)).alias("__b"))
    merged = spark.createDataFrame(
        [(r["step"], r["merged"]) for r in rules], "step int, token string"
    )
    merged_ids = merged.crossJoin(n_base).select(
        "token",
        (F.col("__b") + F.col("step") - 1).cast("int").alias("token_id"),
    )
    out = (
        base.unionByName(merged_ids)
        .groupBy("token")
        .agg(F.min("token_id").alias("token_id"))
    )
    if unk_token is not None:
        unk_row = n_base.select(
            F.lit(unk_token).alias("token"),
            (F.col("__b") + F.lit(len(rules))).cast("int").alias(
                "token_id"
            ),
        )
        out = out.unionByName(unk_row)
    return out


def word_token_ids(
    state: DataFrame, vocab: DataFrame, unk_token: str | None = None
) -> DataFrame:
    """Vocabulary → per-word token-id sequence ``(word, wids
    array<int>)``: split each word's merged symbol string, join
    symbols against the id table, reassemble in symbol order. Total
    by construction when ``state`` is the TRAINING state — every
    final symbol is either a training-alphabet character or a merge
    rule's output, both in ``vocab``.

    ``unk_token``: the OOV contract for a NEW corpus — symbols absent
    from the id table (characters never seen in training) map to the
    unk row's id instead of silently dropping (left join + a 1-row
    broadcast scalar; the vocab passed in must carry the unk row —
    ``bpe_vocab(..., unk_token=UNK)``).

    This is the "reduce to a small model, then apply" pass: the
    per-word merge walk happens once per DISTINCT word; encoding
    100 TB of documents is then one join against this table.
    """
    wsym = state.select(
        F.col("word"),
        F.posexplode(_syms(F.col("sym"))).alias("spos", "token"),
    )
    if unk_token is not None:
        # agg, not filter: an aggregate over an empty relation still
        # yields ONE (null) row, so a vocab missing its unk row can't
        # silently empty the whole encode through the cross join —
        # the raise_error below makes it loud instead (round-16
        # review; a pre-round-16 stored vocab has no unk row).
        unk = vocab.filter(F.col("token") == unk_token).agg(
            F.min("token_id").alias("__unk_id")
        )
        joined = (
            wsym.join(vocab, "token", "left")
            .crossJoin(F.broadcast(unk))
            .withColumn(
                "token_id",
                F.coalesce(
                    "token_id",
                    "__unk_id",
                    F.raise_error(
                        F.lit(
                            "word_token_ids: out-of-vocabulary symbol "
                            f"but the vocab has no '{unk_token}' row — "
                            "build it with bpe_vocab(..., unk_token=...)"
                        )
                    ).cast("int"),
                ),
            )
        )
    else:
        joined = wsym.join(vocab, "token")
    return (
        joined
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("spos", "token_id"))),
                lambda s: s["token_id"],
            ).alias("wids")
        )
    )


def bpe_encode(
    docs: DataFrame,
    rules: list[dict],
    state: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    unk_token: str | None = None,
) -> DataFrame:
    """Tokenize documents to BPE token-ID sequences: ``(id_col,
    token_ids array<int>)`` — the training-ready form the packing
    stage consumes (completes tokenize → pack; round-10 verdict #1).

    ``state`` must cover the corpus vocabulary: pass training's
    ``final_state`` when encoding the training corpus, or
    ``apply_merges(word_counts(new_corpus), rules)`` for a new one.
    Words containing separator/marker characters are dropped (the
    module's training contract, applied symmetrically); words absent
    from ``state`` are dropped by the inner join — cover the
    vocabulary rather than relying on that.

    **Id-space contract (round-11 advice):** token ids are a function
    of the id TABLE, and :func:`bpe_vocab` derives the base alphabet
    (hence every id, merge ids included — they're offset by the
    alphabet size) from the ``state`` it is handed. Encoding a new
    corpus with a vocab rebuilt from the NEW corpus's state would
    silently assign a different id space (a new character shifts all
    ids), breaking the trained-model embedding mapping the ids exist
    for. So: build the table ONCE from the training state —
    ``bpe_vocab(rules, training_state)`` — store it like any other
    model artifact, and pass it here via ``vocab`` for every corpus.
    When ``vocab`` is None the table is derived from ``state``, which
    is only correct when ``state`` IS the training state.

    **OOV contract (round 16):** with ``unk_token=None`` characters
    unknown to the training vocab DROP out of the encoded sequence
    (the historical inner-join behavior, kept for the pinned
    training-corpus queries). Pass ``unk_token=UNK`` — and a stored
    ``bpe_vocab(rules, training_state, unk_token=UNK)`` — to get the
    production posture: unknown symbols encode to the reserved
    ``B + K`` id and decode to the literal marker, so encode is total
    over any corpus (pinned by llm_bpe_encode_oov + round-trip
    tests).

    Shape: corpus → posexplode words (the token-count pass the
    engine already does) → join the vocabulary-sized ``(word, wids)``
    table → per-doc ordered flatten. One shuffle for the join, one
    for the group-by; the per-row array_sort/flatten is linear in
    the document's token count (no quadratic HOF).
    """
    from capital.llm.text import tokens

    if vocab is None:
        vocab = bpe_vocab(rules, state, unk_token=unk_token)
    wids = word_token_ids(state, vocab, unk_token=unk_token)
    tk = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("wpos", "word"),
    ).filter(~F.col("word").rlike(_BAD_WORD_RE))
    return (
        tk.join(wids, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "wids"))),
                    lambda s: s["wids"],
                )
            ).alias("token_ids")
        )
    )


def bpe_decode(
    encoded: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Token-id sequences back to whitespace-normalized text (the
    round-trip check: ``decode(encode(x))`` equals x's clean
    pretokens joined by single spaces). Inverse join of
    :func:`bpe_encode`; end-of-word markers become spaces."""
    ex = encoded.select(
        F.col(id_col), F.posexplode(F.col(ids_col)).alias("tpos", "token_id")
    ).join(vocab, "token_id")
    joined = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("tpos", "token"))),
            lambda s: s["token"],
        ),
    )
    return ex.groupBy(id_col).agg(
        F.trim(F.replace(joined, F.lit(EOW), F.lit(" "))).alias("text")
    )
