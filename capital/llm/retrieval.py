"""Lexical retrieval over the document corpus: Okapi BM25 top-k.

The classic sparse-retrieval scorer (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond") — the
standard first-stage retriever next to the engine's dense ANN family
(:mod:`capital.llm.similarity`, :mod:`capital.llm.ivf`). Reference
parity note: the reference repo has no retrieval tier; this extends
the engine's LLM-pipeline surface (training-data curation needs
lexical retrieval for decontamination audits and hard-negative
mining).

Shape (all Catalyst, no Python in the hot path):

1. token explode → per-(doc, term) ``tf`` counts (map-side-combined
   partial aggregation — the only corpus-sized shuffle);
2. the query term set (tiny) is **broadcast** against ``tf``, so the
   corpus-sized relation is pruned to query-term rows map-side before
   any further exchange;
3. document frequencies ``df`` aggregate over the *pruned* relation
   (only query terms — correct because df counts docs per term, and
   pruning drops whole terms, never docs within a kept term);
4. doc length is a NARROW per-doc property (token count) carried
   through the tf groupBy as a functionally-dependent key — no dl
   aggregation, no doc_id join-back; ``N``/``avgdl`` are a broadcast
   scalar straight off the corpus scan;
5. per-term partial scores sum per (query, doc) as DECIMAL(28,6)
   (order-independent float parity — the repo's never-SUM-raw-doubles
   discipline), then a per-query top-k window.

At 100 TB: the per-query candidate set after the broadcast prune is
docs-containing-a-query-term, and the final window partitions on
``query_id`` (low cardinality). For huge candidate sets, pre-reduce
with a per-partition top-k before the window (the
``TakeOrderedAndProject`` pattern) — at that point the bounded-error
WAND/impact-ordered pruning of real search engines applies; this
operator is the exact scorer those systems approximate.

Float parity: ``idf`` and the tf-saturation term are evaluated with
the IDENTICAL expression tree on both engines (natural ``ln``, same
literal placement, left-associative arithmetic), so the pre-decimal
per-term double is bit-identical; DuckDB literals are emitted in
scientific notation from the same Python constants
(CLAUDE.md: bare decimal literals type as DECIMAL in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: BM25 hyperparameters (the canonical defaults).
K1 = 1.2
B = 0.75

#: The benchmark query workload: fixed literal queries over the
#: synthetic corpus vocabulary. A constant so the DuckDB oracle is
#: generated from the same source of truth.
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "spark window agg"),
    (2, "hash join table"),
    (3, "batch merge order"),
    (4, "slow scan filter"),
    (5, "customer query value"),
    (6, "big small fast row"),
    (7, "column data line part"),
    (8, "key row scan merge"),
]


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    *,
    k1: float = K1,
    b: float = B,
    topk: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-``topk`` documents per query under Okapi BM25.

    ``score(q,d) = Σ_{t∈q} ln(1 + (N - df + 0.5)/(df + 0.5))
    · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``

    Query term multiplicity weights a term's contribution (qtf
    weighting): queries are tokenized with the corpus tokenizer and
    duplicates are kept.

    Returns ``(query_id, doc_id, bm25, rank)`` with a deterministic
    tie-break (score desc, doc_id asc).
    """
    # Local imports: capital.queries.__init__ imports the module that
    # imports this one (registry import at module scope would cycle).
    from capital.io import parallelize_narrow
    from capital.llm.text import normalized, tokens

    if queries is None:
        queries = BM25_QUERIES
    spark = docs.sparkSession

    # dl is a NARROW per-doc property (total token count == the sum
    # of its tf values), so it rides the explode and the tf groupBy
    # as a functionally-dependent grouping key — no dl re-aggregation
    # of tf and no doc_id join-back (round 11: the hybrid query's ~8
    # sequential lexical stages each paid the local stage floor; this
    # removes the dl shuffle AND the dl join exchange). Corpus
    # scalars likewise come straight off the corpus scan, not the tf
    # lineage.
    narrow = parallelize_narrow(docs)
    toks = narrow.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(normalized(F.col(text_col)))).alias("dl"),
        F.explode(tokens(normalized(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "dl", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scalars = narrow.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(tokens(normalized(F.col(text_col))))).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )

    qdf = spark.createDataFrame(queries, ["query_id", "qtext"])
    # Query-term WEIGHTS, not a multiset: duplicate query terms become
    # an exact integer qtf multiplying the score term. Equivalent
    # semantics, but document-length query-by-example workloads were
    # multiplying the scored relation ~14x through the join (1.66M vs
    # ~0.3M rows into the decimal aggregate at sf0.1 — measured
    # 3.3 -> 1.3 s on the hybrid query's lexical side).
    qterms = (
        qdf.select(
            "query_id",
            F.explode(tokens(normalized(F.col("qtext")))).alias("token"),
        )
        .groupBy("query_id", "token")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    qtok = qterms.select("token").distinct()

    tfq = tf.join(F.broadcast(qtok), "token")
    dfreq = tfq.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    return _score_topk(tfq, qterms, dfreq, scalars, k1, b, topk, exclude_self)


def _score_topk(
    tfq: DataFrame,
    qterms: DataFrame,
    dfreq: DataFrame,
    scalars: DataFrame,
    k1: float,
    b: float,
    topk: int,
    exclude_self: bool,
) -> DataFrame:
    """The BM25 scoring tail shared by the in-call and stored-index
    paths: ``tfq`` is the query-term-pruned (doc_id, dl, token, tf)
    relation, ``dfreq`` (token, dfc), ``scalars`` one (n_docs, avgdl)
    row. Expression tree is byte-stable (oracle float parity)."""
    from capital.queries.registry import decimal_sum

    scored = (
        tfq.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfc") + F.lit(0.5))
        / (F.col("dfc") + F.lit(0.5))
    )
    tf_sat = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = scored.select(
        "query_id",
        "doc_id",
        (F.col("qtf") * (idf * tf_sat)).alias("__s"),
    )
    totals = per_term.groupBy("query_id", "doc_id").agg(
        decimal_sum(F.col("__s"), "bm25")
    )
    if exclude_self:
        # Query-by-example workloads (query = a corpus document): the
        # trivial self-match would occupy rank 1 of every list.
        totals = totals.filter(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "bm25", "rank")
    )


#: RRF rank constant (Cormack et al. 2009's k=60 convention).
RRF_K = 60
#: Contribution quantization: each 1/(k+rank) becomes the exact
#: integer floor(1e12/(k+rank)), so per-(query, doc) fusion sums are
#: order-free integer adds — cross-engine/retry bit-stable (float
#: sums of 3+ ranker contributions would depend on aggregation
#: order). 1e-12 resolution is far below any rank-relevant gap.
RRF_SCALE = 1_000_000_000_000


def rrf_fuse(
    ranked_lists: list[DataFrame],
    topk: int = 10,
    k_rrf: int = RRF_K,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion over N ranked lists (Cormack et al.
    2009): ``rrf(q, d) = Σ_lists 1/(k + rank_list(q, d))``, summed
    over the lists that ranked the document at all. Ranker-agnostic —
    fuse lexical BM25 with dense ANN, or any mix.

    Each input needs ``(query_col, doc_col, rank_col)``; extra
    columns are dropped. Contributions are quantized to exact
    ``RRF_SCALE`` integers before the sum (see :data:`RRF_SCALE`), so
    the fused score is deterministic regardless of Spark's partial-
    aggregation order; final ties break on the document id.

    Scale: inputs are already top-k-per-query sized (never
    corpus-sized), so the union + one (query, doc) aggregate + one
    per-query window are all small; the heavy lifting stays in the
    upstream rankers.
    """
    contrib = F.floor(F.lit(float(RRF_SCALE)) / (F.lit(k_rrf) + F.col(rank_col)))
    tagged = None
    for df in ranked_lists:
        part = df.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            contrib.alias("__c"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy("query_id", "doc_id").agg(
        F.sum("__c").alias("__c_total"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__c_total").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("__c_total").cast("double") / F.lit(float(RRF_SCALE))).alias(
                "rrf_score"
            ),
            "n_lists",
        )
    )


#: Posting-list hash partitioning: tf/ is Hive-partitioned by
#: pbucket = xxhash64(token) mod this, so stored-index probes prune
#: to the workload's buckets at plan time (static partition pruning,
#: the stored-IVF posture). 64 keeps directories manageable while a
#: single-digit-token workload prunes ~9/10 of the postings even at
#: this width; widen for a real lake.
N_POSTING_BUCKETS = 64


def _query_terms(spark, queries: list[tuple[int, str]]) -> DataFrame:
    """Query workload → weighted (query_id, token, qtf) terms — the
    qtf-weighting discipline shared by the in-call and stored paths."""
    from capital.llm.text import normalized, tokens

    qdf = spark.createDataFrame(queries, ["query_id", "qtext"])
    return (
        qdf.select(
            "query_id",
            F.explode(tokens(normalized(F.col("qtext")))).alias("token"),
        )
        .groupBy("query_id", "token")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )


def bm25_index_write_batch(
    docs: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write one batch's BM25 index partials under ``index_dir`` —
    three additive tables, each ``batch_id=``-partitioned with
    dynamic overwrite (the engine's replay-convergence discipline):

    - ``tf/``: (doc_id, dl, token, tf) posting rows — batches hold
      DISJOINT documents, so the fold is a plain union;
    - ``df/``: per-batch (token, dfc) document frequencies — additive
      across batches exactly because documents are disjoint;
    - ``stats/``: one (n_docs, dl_sum) row — integer partials, so the
      read-time avgdl division is bit-identical to the in-call one.

    Postings are additionally hash-partitioned by ``pbucket =
    xxhash64(token) mod N_POSTING_BUCKETS`` — the stored-IVF static-
    pruning posture: a query workload touches a handful of tokens, so
    the probe collects their (tiny) pbucket set and the postings scan
    prunes to those Hive partitions at PLAN time (``PartitionFilters``,
    plan-tested). Pruning is an optimization only — the broadcast
    token join still enforces membership.
    """
    from capital.io import parallelize_narrow
    from capital.llm.text import normalized, tokens

    narrow = parallelize_narrow(docs)
    toks = narrow.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(normalized(F.col(text_col)))).alias("dl"),
        F.explode(tokens(normalized(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "dl", "token").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)  # consumed twice (tf write + df)
    tf.withColumn("batch_id", F.lit(batch_id)).withColumn(
        "pbucket", F.pmod(F.xxhash64("token"), F.lit(N_POSTING_BUCKETS))
    ).write.mode("overwrite").partitionBy("batch_id", "pbucket").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(f"{index_dir}/tf")
    df_part = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    df_part.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).partitionBy("batch_id").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(f"{index_dir}/df")
    stats = narrow.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(normalized(F.col(text_col)))))
        .cast("long")
        .alias("dl_sum"),
    )
    stats.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).partitionBy("batch_id").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(f"{index_dir}/stats")


def write_bm25_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Build a stored BM25 index over a corpus in one pass — the
    lexical member of the engine's stored-index family (LSH band
    table, IVF/PQ lakes): postings, document frequencies and corpus
    stats persisted so queries never re-scan or re-tokenize the
    corpus. One full-corpus "batch 0" of
    :func:`bm25_index_write_batch`; grow it incrementally with
    :func:`incremental_bm25_index_run`.

    This is a FULL REBUILD, so the target dir is deleted first
    (round-11 advice): the batch writer's dynamic partition
    overwrite is right for the incremental append path, but a
    rebuild over a changed corpus must also drop ``pbucket``
    partitions the new corpus doesn't hit — dynamic mode would leave
    stale postings that score phantom docs with no loud failure (df/
    and stats/ rewrite fully, so nothing errors). Local-fs delete,
    the compact_partition posture: an object-store deployment swaps
    the primitive, the protocol (drop-then-build, or build to a
    run-keyed path) is unchanged."""
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    bm25_index_write_batch(docs, 0, index_dir, id_col, text_col)


def bm25_topk_stored(
    spark,
    index_dir: str,
    queries: list[tuple[int, str]] | None = None,
    *,
    k1: float = K1,
    b: float = B,
    topk: int = 10,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-``topk`` BM25 against a STORED index — byte-identical
    scores to :func:`bm25_topk` over the same corpus (shared scoring
    tail, integer-partial stats fold, tested + oracle-pinned), with
    the corpus never touched: postings prune to query terms at the
    scan, df comes from the additive stored table instead of a
    recount, and the stats fold's single int→double division matches
    the in-call expression bit-for-bit."""
    if queries is None:
        queries = BM25_QUERIES
    qterms = _query_terms(spark, queries)
    qtok = qterms.select("token").distinct()
    # The workload's pbucket set: a deliberate tiny collect (bounded
    # by the query token count — the IVF probed-cells precedent) that
    # buys PLAN-time PartitionFilters on the postings scan; the
    # broadcast token join below still enforces exact membership.
    pbuckets = [
        r[0]
        for r in qtok.select(
            F.pmod(F.xxhash64("token"), F.lit(N_POSTING_BUCKETS)).alias("pb")
        )
        .distinct()
        .collect()
    ]
    tf = (
        spark.read.parquet(f"{index_dir}/tf")
        .filter(F.col("pbucket").isin(pbuckets))
        .drop("batch_id", "pbucket")
    )
    tfq = tf.join(F.broadcast(qtok), "token")
    dfreq = (
        spark.read.parquet(f"{index_dir}/df")
        .join(F.broadcast(qtok), "token")
        .groupBy("token")
        .agg(F.sum("dfc").alias("dfc"))
    )
    scalars = (
        spark.read.parquet(f"{index_dir}/stats")
        .agg(
            F.sum("n_docs").alias("__n"),
            F.sum("dl_sum").alias("__dl"),
        )
        .select(
            F.col("__n").alias("n_docs"),
            (F.col("__dl").cast("double") / F.col("__n")).alias("avgdl"),
        )
    )
    return _score_topk(tfq, qterms, dfreq, scalars, k1, b, topk, exclude_self)


def incremental_bm25_index_run(
    spark,
    source_dir: str,
    schema,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
):
    """Grow a stored BM25 index incrementally — index one day's crawl
    without re-tokenizing the lake (the incremental-LSH/IVF posture
    applied to lexical retrieval). Each micro-batch lands its
    posting/df/stats PARTIALS as ``batch_id=`` partitions
    (:func:`bm25_index_write_batch`); :func:`bm25_topk_stored` folds
    them at read time (union / additive sum / integer-ratio), so a
    query over the grown index equals :func:`bm25_topk` over the
    union corpus exactly (tested), and a replayed batch rewrites its
    own partitions to the same bytes. Batches must hold disjoint
    documents (the file-stream contract — each file is ingested
    once)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_write_batch(batch_df, batch_id, index_dir, id_col, text_col)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.format(fmt)
        .load(source_dir)
        .writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
