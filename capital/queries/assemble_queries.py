"""Corpus-assembly queries (mixing / splitting / packing /
decontamination / sharding) over the ``documents`` table.

Oracle strategy: every operator's randomness is the md5 hash-fraction
(``capital.llm.assemble.hash_fraction``), replicated in DuckDB as
``('0x' || substr(md5(k),1,8))::UBIGINT / 2^32`` — bit-identical
doubles — and every oracle is *generated from the same constants*
(mixture table, split fractions, budgets) as the Spark code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.assemble import (
    contamination,
    mixture_sample,
    pack_chunk_stats,
    split_assign,
    with_shard,
)
from capital.queries.registry import query

# --- shared SQL fragments ------------------------------------------------


def _u_sql(seed: str, key: str = "doc_id") -> str:
    """DuckDB twin of assemble.hash_fraction."""
    return (
        f"('0x' || substr(md5('{seed}:' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::UBIGINT / 4294967296.0"
    )


def _bucket_sql(seed: str, n: int, key: str = "doc_id") -> str:
    """DuckDB twin of assemble.hash_bucket."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::UBIGINT % {n} AS BIGINT)"
    )


#: Per-source mixture rates (the corpus-mixing table). Generated, not
#: hand-written, so engine and oracle share one source of truth.
MIX_RATES: dict[str, float] = {
    f"src{i}": round(0.05 + 0.045 * i, 3) for i in range(20)
}
_MIX_SEED = "mix1"

_VAL_FRAC, _TEST_FRAC = 0.1, 0.1
_SPLIT_SEED = "split1"

_PACK_BUDGET = 4000  # chars per packed chunk

_DECON_K = 5  # shingle width
_DECON_MOD = 97  # doc_id % MOD == 0 → benchmark ("eval") doc

_N_SHARDS = 8
_SHARD_SEED = "shard1"


def _mix_case() -> str:
    whens = "\n             ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
    )
    return f"CASE source\n             {whens}\n             ELSE 0.0 END"


@query(
    "asm_mixture_sample",
    oracle=f"""
    SELECT doc_id, source, round({_u_sql(_MIX_SEED)}, 6) AS sample_u
    FROM documents
    WHERE {_u_sql(_MIX_SEED)} < {_mix_case()}
    """,
)
def asm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted corpus mixing via deterministic hash
    sampling — reproducible across runs and cluster sizes, unlike
    ``rand()``-based sampleBy."""
    d = load_table(spark, sf_dir, "documents")
    return mixture_sample(d, MIX_RATES, seed=_MIX_SEED).select(
        "doc_id", "source", "sample_u"
    )


@query(
    "asm_split_assign",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_u_sql(_SPLIT_SEED)} < {_TEST_FRAC} THEN 'test'
                WHEN {_u_sql(_SPLIT_SEED)} < {_TEST_FRAC + _VAL_FRAC}
                  THEN 'val'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def asm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold train/val/test split: a doc's split is a pure
    function of its id, so eval membership survives corpus growth."""
    d = load_table(spark, sf_dir, "documents")
    return split_assign(
        d, val_frac=_VAL_FRAC, test_frac=_TEST_FRAC, seed=_SPLIT_SEED
    ).select("doc_id", "split")


@query(
    "asm_pack_chunks",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prior
      FROM documents)
    SELECT source, CAST(prior // {_PACK_BUDGET} AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           -- DuckDB SUM(int) is HUGEINT, which pandas renders float64
           -- and the driver's value hash sees as 368.0 vs Spark's 368.
           CAST(SUM(n_chars) AS BIGINT) AS chunk_cost
    FROM c
    GROUP BY source, chunk_id
    """,
)
def asm_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by stream chunking: per-source deterministic
    concatenation order, cut at a fixed cost budget; reports docs and
    filled cost per chunk. Windows are per-source — parallel, no
    global sort."""
    d = load_table(spark, sf_dir, "documents")
    return pack_chunk_stats(d, budget=_PACK_BUDGET)


#: Exact contamination SQL — shared by the exact query and its
#: bloom-prefiltered twin: the bloom has no false negatives and the
#: exact join drops its false positives, so BOTH plans must hash to
#: this same result.
_CONTAM_ORACLE = f"""
    WITH norm AS (
      SELECT doc_id,
             string_split_regex(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               '\\s+') AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+{_DECON_K - 1}], ' ')
                            FOR i IN range(1,
                              greatest(len(t) - {_DECON_K - 1}, 1) + 1)])
               AS s
      FROM norm),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh
      WHERE doc_id % {_DECON_MOD} = 0),
    train AS (
      SELECT doc_id, unnest(s) AS g FROM sh
      WHERE doc_id % {_DECON_MOD} <> 0)
    SELECT doc_id, COUNT(DISTINCT train.g) AS n_shared
    FROM train JOIN bench USING (g)
    GROUP BY doc_id
    """


@query(
    "asm_contamination",
    oracle=_CONTAM_ORACLE,
)
def asm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: training docs sharing a
    5-token shingle with the (broadcast) benchmark set, with shared
    counts — the pre-training n-gram overlap scan."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    return contamination(train, bench, k=_DECON_K)


@query(
    "asm_contamination_bloom",
    oracle=_CONTAM_ORACLE,
)
def asm_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a Bloom-filter prefilter in front of the
    exact join (capital/llm/bloom.py): the scale path when the
    benchmark shingle set is too big to broadcast raw — the probe side
    meets only a fixed-size word table (k map-side broadcast joins),
    and the bloom's false positives die in the exact join, so the
    output hash-matches the exact oracle bit-for-bit."""
    from capital.io import parallelize_narrow
    from capital.llm.assemble import shingle_set
    from capital.llm.bloom import bloom_prefilter

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    t_sh = parallelize_narrow(train).select(
        F.col("doc_id"), F.explode(shingle_set(F.col("text"), _DECON_K)).alias("g")
    )
    b_sh = bench.select(
        F.explode(shingle_set(F.col("text"), _DECON_K)).alias("g")
    ).distinct()
    candidates = bloom_prefilter(t_sh, b_sh, "g", "g")
    return (
        candidates.join(F.broadcast(b_sh), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )


@query(
    "asm_contamination_by_bench",
    oracle=f"""
    WITH norm AS MATERIALIZED (
      SELECT doc_id,
             string_split_regex(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               '\\s+') AS t
      FROM documents),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+{_DECON_K - 1}], ' ')
                            FOR i IN range(1,
                              greatest(len(t) - {_DECON_K - 1}, 1) + 1)])
               AS s
      FROM norm),
    bench AS (
      SELECT doc_id, unnest(s) AS g FROM sh
      WHERE doc_id % {_DECON_MOD} = 0),
    train AS (
      SELECT doc_id AS tid, unnest(s) AS g FROM sh
      WHERE doc_id % {_DECON_MOD} <> 0)
    SELECT bench.doc_id,
           COUNT(DISTINCT train.tid) AS n_leaking_docs,
           COUNT(DISTINCT bench.g) AS n_shared_grams
    FROM train JOIN bench USING (g)
    GROUP BY bench.doc_id
    """,
)
def asm_contamination_by_bench(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benchmark-side contamination attribution (llm/assemble.
    contamination_by_benchmark): per EVAL document, how many training
    docs share a 5-gram with it and how many of its grams leak — the
    eval-integrity report that says which test items to quarantine,
    the reverse direction of asm_contamination's train-side scrub
    list. Same broadcast economics: the 100 TB side never shuffles
    unmatched rows."""
    from capital.llm.assemble import contamination_by_benchmark

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    return contamination_by_benchmark(train, bench, k=_DECON_K)


_SEMDECON_MOD = 17     # vec_id % MOD == 0 → benchmark ("eval") vector
_SEMDECON_TAU = 0.35   # the corpus's embedding-threshold convention
_SEMDECON_DIM = 64


@query(
    "asm_semantic_decontamination",
    oracle=f"""
    WITH q AS (SELECT vec_id AS bid, embedding AS qv
               FROM embeddings WHERE vec_id % {_SEMDECON_MOD} = 0),
    c AS (SELECT vec_id, embedding AS cv
          FROM embeddings WHERE vec_id % {_SEMDECON_MOD} <> 0),
    s AS (
      SELECT vec_id, bid,
             list_sum([CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                       FOR i IN range(1, {_SEMDECON_DIM} + 1)])
             / (sqrt(list_sum([CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                               FOR i IN range(1, {_SEMDECON_DIM} + 1)]))
                * sqrt(list_sum([CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)
                                 FOR i IN range(1, {_SEMDECON_DIM} + 1)])))
               AS sim
      FROM q, c WHERE vec_id <> bid),
    hits AS (
      SELECT vec_id, COUNT(*) AS n_bench_hits,
             floor(MAX(sim) * 1e6 + 0.5e0) / 1e6 AS max_sim,
             MIN(bid) AS first_bench_id
      FROM s WHERE sim >= {_SEMDECON_TAU!r}e0 GROUP BY vec_id)
    SELECT c.vec_id, hits.vec_id IS NOT NULL AS is_contaminated,
           COALESCE(n_bench_hits, 0) AS n_bench_hits,
           max_sim, first_bench_id
    FROM c LEFT JOIN hits USING (vec_id)
    """,
)
def asm_semantic_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEMANTIC decontamination (llm/assemble.semantic_contamination):
    training vectors whose embedding cosine against any benchmark
    vector (vec_id % 17 == 0, the derived eval suite) reaches the
    corpus's 0.35 convention — the paraphrase-robust complement to
    the n-gram asm_contamination pair. Benchmark side broadcast with
    precomputed norms; the training side is one narrow broadcast-
    nested-loop pass, filtered at the source — the 100 TB corpus
    never shuffles (only the filtered hit rows aggregate)."""
    from capital.llm.assemble import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % _SEMDECON_MOD == 0)
    train = emb.filter(F.col("vec_id") % _SEMDECON_MOD != 0)
    return semantic_contamination(train, bench, threshold=_SEMDECON_TAU)


@query(
    "asm_shard_sizes",
    oracle=f"""
    SELECT {_bucket_sql(_SHARD_SEED, _N_SHARDS)} AS shard_id,
           COUNT(*) AS n_docs,
           MIN(md5('{_SHARD_SEED}:' || CAST(doc_id AS VARCHAR)))
             AS first_shuffle_key
    FROM documents
    GROUP BY shard_id
    """,
)
def asm_shard_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + global shuffle order: shard
    populations and each shard's first shuffle key (the order a data
    loader would stream). One hash exchange; local sorts only."""
    d = load_table(spark, sf_dir, "documents")
    return (
        with_shard(d, _N_SHARDS, seed=_SHARD_SEED)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("shuffle_key").alias("first_shuffle_key"),
        )
    )


_DECON_SPAN_ORACLE = rf"""
    WITH norm AS MATERIALIZED (
      SELECT doc_id,
             string_split_regex(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
               '\s+') AS t
      FROM documents),
    bench AS MATERIALIZED (
      SELECT DISTINCT unnest(s) AS g FROM (
        SELECT list_distinct(
                 [array_to_string(t[i:i+{_DECON_K - 1}], ' ')
                  FOR i IN range(1,
                    greatest(len(t) - {_DECON_K - 1}, 1) + 1)]) AS s
        FROM norm WHERE doc_id % {_DECON_MOD} = 0)),
    train AS MATERIALIZED (
      SELECT doc_id, t FROM norm WHERE doc_id % {_DECON_MOD} <> 0),
    tg AS (
      SELECT doc_id, i AS gpos,
             array_to_string(t[i:i+{_DECON_K - 1}], ' ') AS g
      FROM train, unnest(range(1, len(t) - {_DECON_K} + 2)) AS u(i)
      WHERE len(t) >= {_DECON_K}),
    marked AS MATERIALIZED (
      SELECT DISTINCT doc_id, p AS pos
      FROM (SELECT tg.doc_id AS doc_id, tg.gpos AS gpos
            FROM tg JOIN bench USING (g)),
           unnest(range(gpos, gpos + {_DECON_K})) AS v(p)),
    tp AS MATERIALIZED (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM train, unnest(range(1, len(t) + 1)) AS u(i)),
    kept AS (
      SELECT doc_id, pos, tok FROM tp
      ANTI JOIN marked USING (doc_id, pos)),
    clean AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS nk,
             md5(array_to_string(list(tok ORDER BY pos), ' '))
               AS cmd5
      FROM kept GROUP BY doc_id)
    SELECT t2.doc_id AS doc_id,
           CAST(len(t2.t) AS BIGINT) AS n_tokens,
           CAST(len(t2.t) - COALESCE(clean.nk, 0) AS BIGINT)
             AS n_removed_tokens,
           COALESCE(clean.cmd5, md5('')) AS clean_md5
    FROM train t2 LEFT JOIN clean USING (doc_id)
    """


@query("asm_decontaminate_spans", oracle=_DECON_SPAN_ORACLE)
def asm_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURGICAL benchmark decontamination (llm/assemble.
    decontaminate_spans): remove only the token spans covered by a
    benchmark k-gram instead of dropping whole documents — the
    FLAN/Llama span-removal posture next to asm_contamination's
    doc-level flags. Benchmark grams broadcast (eval-suite-sized);
    matched gram starts explode to covered positions (contamination
    volume, not corpus volume); per-doc rebuild digest is the
    span_dedup_stats atomic-surrogate convention."""
    from capital.llm.assemble import decontaminate_spans

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    return decontaminate_spans(train, bench, k=_DECON_K)


_EPOCH_SEED, _EPOCH_SHARDS = "eporder", 4


def _epoch_sql(epoch: int) -> str:
    ekey = f"{_EPOCH_SEED}:{epoch}"
    return f"""
      SELECT doc_id, CAST({epoch} AS BIGINT) AS epoch,
             {_bucket_sql(f"{ekey}:shard", _EPOCH_SHARDS)} AS shard,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY {_bucket_sql(f"{ekey}:shard", _EPOCH_SHARDS)}
               ORDER BY md5('{ekey}:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS position
      FROM documents"""


@query(
    "asm_epoch_shuffle",
    oracle=f"""
    {_epoch_sql(0)}
    UNION ALL
    {_epoch_sql(1)}
    """,
)
def asm_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic training order (llm/assemble.
    epoch_shuffle): every epoch reads the corpus in a different
    md5-derived pseudorandom order, every rerun of the same epoch in
    the SAME order — restart-reproducible mid-epoch resume, the
    reproducibility contract a training run needs. Emits (doc, epoch,
    shard, dense in-shard position) for epochs 0 and 1; per-shard
    window sorts run in parallel, no global sort."""
    from capital.llm.assemble import epoch_shuffle

    d = load_table(spark, sf_dir, "documents")
    parts = [
        epoch_shuffle(
            d, ep, n_shards=_EPOCH_SHARDS, seed=_EPOCH_SEED
        ).select(
            "doc_id",
            F.col("epoch").cast("long").alias("epoch"),
            F.col("shard").cast("long").alias("shard"),
            "position",
        )
        for ep in (0, 1)
    ]
    return parts[0].unionByName(parts[1])


_TMIX_ALPHA, _TMIX_TARGET, _TMIX_SEED = 0.5, 600, "tmix1"


@query(
    "asm_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    q AS (
      SELECT source, n_docs,
             pow(n_docs / (SELECT SUM(n_docs) FROM counts),
                 {_TMIX_ALPHA}) AS q_raw
      FROM counts),
    rates AS (
      SELECT source, n_docs,
             round({float(_TMIX_TARGET)} * (q_raw / (SELECT SUM(q_raw)
                                                     FROM q))
                   / n_docs, 6) AS rate
      FROM q),
    c AS (
      SELECT d.doc_id, d.source, r.rate,
             CAST(FLOOR(r.rate)
                  + CASE WHEN {_u_sql(_TMIX_SEED)} < r.rate - FLOOR(r.rate)
                         THEN 1 ELSE 0 END AS INTEGER) AS n_copies
      FROM documents d JOIN rates r ON d.source = r.source)
    SELECT doc_id, source, rate, n_copies,
           CAST(unnest(range(1, n_copies + 1)) AS INTEGER) AS copy_idx
    FROM c WHERE n_copies > 0
    """,
)
def asm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (q_s ∝ share^alpha, the
    mT5/XLM-R multilingual sampling rule) with deterministic
    floor+Bernoulli fractional upsampling: low-resource sources repeat
    (copy_idx), high-resource sources subsample, expected totals hit
    target_docs exactly. Rates are per-source broadcast rows; the
    corpus side never shuffles."""
    from capital.llm.assemble import temperature_mixture

    d = load_table(spark, sf_dir, "documents")
    return temperature_mixture(
        d, alpha=_TMIX_ALPHA, target_docs=_TMIX_TARGET, seed=_TMIX_SEED
    )


_SEL_BUDGET = 1000  # tokens per source


def _quality_budget_oracle() -> str:
    """Generated from the same constants as the Spark path: the
    stopword list is text.LANG_MARKERS['en'] and the score formula is
    the text_quality_score twin — one source of truth."""
    from capital.llm.text import LANG_MARKERS

    stops = "(" + ", ".join(f"'{w}'" for w in LANG_MARKERS["en"]) + ")"
    return f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok,
             length(text) AS n_chars,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
               AS punct,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x IN {stops})) AS stop,
             source
      FROM documents),
    q AS (
      SELECT doc_id, source,
             CAST(n_tok AS INTEGER) AS n_tokens,
             round(0.4 * least(n_tok / 100.0, 1.0)
                   + 0.3 * (1 - least((punct / greatest(n_chars, 1))
                                      * 10, 1.0))
                   + 0.3 * least((stop / greatest(n_tok, 1)) * 5, 1.0),
                   6) AS quality_score
      FROM t),
    c AS (
      SELECT source, doc_id, n_tokens, quality_score,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS budget_used
      FROM q)
    SELECT source, doc_id, n_tokens, quality_score, budget_used
    FROM c WHERE budget_used < {_SEL_BUDGET}
    """


@query("asm_quality_budget", oracle=_quality_budget_oracle())
def asm_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked selection under a per-source token budget — the
    curation step between scoring and packing: best documents first
    until each source's budget is spent (greedy prefix, exclusive
    running cost; see assemble.select_within_budget)."""
    from capital.llm.assemble import select_within_budget
    from capital.llm.text import with_quality_score

    d = load_table(spark, sf_dir, "documents")
    return select_within_budget(
        with_quality_score(d), budget=_SEL_BUDGET
    ).select("source", "doc_id", "n_tokens", "quality_score", "budget_used")


# --- UniMax water-filling token-budget allocation ------------------------

#: Budget as a fraction of total capacity (scale-adaptive: exercises
#: both the saturated and level branches at every sf, since the
#: synthetic sources' token totals spread ~±15% around the mean) and
#: the per-source epoch cap — shared verbatim with the oracle SQL.
_UNIMAX_FRACTION = 0.9
_UNIMAX_EPOCHS = 4.0


def _unimax_oracle() -> str:
    e = f"{_UNIMAX_EPOCHS!r}e0"
    f_ = f"{_UNIMAX_FRACTION!r}e0"
    return rf"""
    WITH per_src AS (
      SELECT source,
             SUM(len(string_split_regex(trim(text), '\s+'))) AS n_tokens
      FROM documents GROUP BY source),
    st AS (
      SELECT source, n_tokens,
             {e} * n_tokens AS capacity,
             row_number() OVER w AS rn,
             COALESCE(SUM(n_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prefix_t,
             COUNT(*) OVER () AS n_src,
             SUM(n_tokens) OVER () AS total_t
      FROM per_src
      WINDOW w AS (ORDER BY {e} * n_tokens ASC, source ASC)),
    cand_t AS (
      SELECT *,
             ({f_} * ({e} * total_t) - {e} * prefix_t)
               / CAST(n_src - rn + 1 AS DOUBLE) AS cand
      FROM st),
    pv AS (
      SELECT *, MIN(CASE WHEN cand <= capacity THEN rn END) OVER ()
                  AS pivot_rn
      FROM cand_t),
    lv AS (
      SELECT *,
             CASE WHEN pivot_rn IS NULL OR rn < pivot_rn
                  THEN capacity
                  ELSE MAX(CASE WHEN rn = pivot_rn THEN cand END)
                       OVER () END AS alloc
      FROM pv)
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           floor(capacity * 1e6 + 0.5e0) / 1e6 AS capacity,
           floor(alloc * 1e6 + 0.5e0) / 1e6 AS alloc_tokens,
           floor(alloc / n_tokens * 1e6 + 0.5e0) / 1e6 AS epochs_alloc,
           alloc >= capacity AS saturated
    FROM lv
    """


@query("asm_unimax_budget", oracle=_unimax_oracle())
def asm_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax water-filling budget allocation (Chung et al. 2023):
    spread 90% of the corpus's 4-epoch token capacity as uniformly as
    possible across sources, saturating small sources at the epoch
    cap and cutting the rest at the common water level
    (assemble.unimax_allocation — closed-form over the S-row
    per-source rollup, exact-integer window sums)."""
    from capital.llm.assemble import unimax_allocation
    from capital.llm.text import tokens

    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens")
    )
    out = unimax_allocation(
        per_src,
        budget_fraction=_UNIMAX_FRACTION,
        epoch_cap=_UNIMAX_EPOCHS,
    )
    return out.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "capacity",
        "alloc_tokens",
        "epochs_alloc",
        "saturated",
    )
