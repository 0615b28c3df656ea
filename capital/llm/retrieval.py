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
    dfc_via_window: bool = False,
) -> DataFrame:
    """Top-``topk`` documents per query under Okapi BM25.

    ``score(q,d) = Σ_{t∈q} ln(1 + (N - df + 0.5)/(df + 0.5))
    · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``

    Query term multiplicity weights a term's contribution (qtf
    weighting): queries are tokenized driver-side with
    :func:`capital.llm.text.py_tokens` — the asserted twin of the
    corpus tokenizer — and duplicates are kept. The query workload is
    driver data by contract (a Python list), so tokenizing it in
    Python removes two plan-time jobs the round-12 bench attributed
    to the local stage-floor stack: the qtok broadcast materialization
    (now a literal ``isin`` prune pushed into the corpus scan) and the
    Spark-side qterms aggregation (now a LocalRelation built from the
    same Python counts, broadcast without running a job).

    ``dfc_via_window=True`` computes document frequencies as a count
    window over the token-partitioned pruned relation instead of a
    groupBy + broadcast-join: one less materialization job (measured
    1.55 → 1.33 s at sf0.1), but the exchange partitions by the
    distinct query terms — fine for interactive workloads over
    bounded corpora, WRONG at lake scale where docs-per-term is huge
    and ≤|terms| tasks would cap parallelism. Default False = the
    scale shape (the df aggregate is map-side-combined and its
    broadcast is |terms| rows).

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

    # One tokenization pass, materialized (round 13): dl + explode +
    # corpus scalars all read the tokenized array, and Catalyst's
    # projection collapse would otherwise inline the regex tokenizer
    # into each use (the round-12 _token_frame trap — no CSE in the
    # generator path). The checkpoint is a narrow executor-local
    # materialization of (id, tokens); lazy, so plan construction
    # stays job-free and memoization semantics hold.
    narrow = parallelize_narrow(docs)
    barrier = narrow.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalized(F.col(text_col))).alias("__toks"),
    ).localCheckpoint(eager=False)

    # dl is a NARROW per-doc property (total token count == the sum
    # of its tf values), so it rides the explode and the tf groupBy
    # as a functionally-dependent grouping key — no dl re-aggregation
    # of tf and no doc_id join-back (round 11). Corpus scalars come
    # off the same checkpointed token frame, not the tf lineage.
    toks = barrier.select(
        "doc_id",
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("token"),
    )

    # Query-term WEIGHTS, not a multiset: duplicate query terms become
    # an exact integer qtf multiplying the score term. Equivalent
    # semantics, but document-length query-by-example workloads were
    # multiplying the scored relation ~14x through the join (1.66M vs
    # ~0.3M rows into the decimal aggregate at sf0.1 — measured
    # 3.3 -> 1.3 s on the hybrid query's lexical side).
    qterms, all_terms = _query_terms(spark, queries)

    # Literal prune BEFORE the only corpus-sized shuffle: the isin
    # filter reaches the scan, so only query-term tokens enter the tf
    # aggregate at all (df counts docs per term; pruning drops whole
    # terms, never docs within a kept term — still exact).
    tfq = toks.filter(F.col("token").isin(all_terms)).groupBy(
        "doc_id", "dl", "token"
    ).agg(F.count(F.lit(1)).alias("tf"))
    scalars = barrier.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size("__toks")).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )

    if dfc_via_window:
        scored = tfq.withColumn(
            "dfc", F.count(F.lit(1)).over(Window.partitionBy("token"))
        )
    else:
        dfreq = tfq.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
        scored = tfq.join(F.broadcast(dfreq), "token")
    scored = scored.join(F.broadcast(qterms), "token").crossJoin(
        F.broadcast(scalars)
    )
    return _finish_scoring(scored, k1, b, topk, exclude_self)


def _finish_scoring(
    scored: DataFrame,
    k1: float,
    b: float,
    topk: int,
    exclude_self: bool,
) -> DataFrame:
    """Score + top-k over the fully-joined relation (query_id, doc_id,
    tf, dl, dfc, qtf, n_docs, avgdl). The expression tree is
    byte-stable across every caller (oracle float parity)."""
    from capital.queries.registry import decimal_sum

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


def _query_terms(
    spark, queries: list[tuple[int, str]]
) -> tuple[DataFrame, list[str]]:
    """Query workload → (weighted (query_id, token, qtf) LocalRelation,
    sorted distinct terms) — the qtf-weighting discipline shared by the
    in-call and stored paths. Tokenized DRIVER-side with
    :func:`capital.llm.text.py_tokens` (the asserted twin of the corpus
    tokenizer): the workload is a Python list by contract, so this
    builds a LocalRelation that broadcasts without running a job, and
    the distinct-term list feeds a literal ``isin`` prune pushed into
    the corpus/postings scan."""
    from capital.llm.text import py_tokens

    qterm_rows: list[tuple[int, str, int]] = []
    all_terms: set[str] = set()
    for qid, qtext in queries:
        counts: dict[str, int] = {}
        for t in py_tokens(qtext):
            counts[t] = counts.get(t, 0) + 1
        all_terms.update(counts)
        qterm_rows.extend((qid, t, qtf) for t, qtf in sorted(counts.items()))
    # Explicit schema: matches what inference produces on non-empty
    # rows AND keeps the empty-workload edge from failing inference.
    qterms = spark.createDataFrame(
        qterm_rows, "query_id long, token string, qtf long"
    )
    return qterms, sorted(all_terms)


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
    ).localCheckpoint(eager=False)  # consumed twice (tf write + df);
    # lazy — the tf write materializes it (round 16, one job fewer)
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
    run-keyed path) is unchanged.

    Deletion is REFUSED unless the target is absent, empty, or looks
    like a BM25 index (has a ``tf``/``df``/``stats`` subdir or a
    ``_BUILT*`` marker) — a mistyped path must not silently destroy
    an unrelated directory (round-12 advice)."""
    import os
    import shutil

    if os.path.exists(index_dir):
        entries = os.listdir(index_dir)
        looks_like_index = not entries or any(
            e in ("tf", "df", "stats") or e.startswith("_BUILT")
            for e in entries
        )
        if not looks_like_index:
            raise ValueError(
                f"refusing to delete {index_dir!r}: existing non-empty "
                "directory without a BM25 index layout (tf/df/stats)"
            )
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
    dfc_via_window: bool = False,
) -> DataFrame:
    """Top-``topk`` BM25 against a STORED index — byte-identical
    scores to :func:`bm25_topk` over the same corpus (shared scoring
    tail, integer-partial stats fold, tested + oracle-pinned), with
    the corpus never touched: postings prune to query terms at the
    scan (pbucket PartitionFilters + literal token isin), and the
    corpus scalars fold DRIVER-side from the stats partials (one
    (n_docs, dl_sum) row per batch by construction — the IVF
    probed-cells precedent: a bounded metadata read that replaces a
    Spark job + broadcast exchange; Python's int/int true division is
    the same IEEE op as the in-call long→double division while the
    sums stay below 2^53 — ~10^15 tokens, far past 100 TB).

    ``dfc_via_window=True`` recounts document frequencies from the
    pruned postings themselves via a token-partition window — exact
    because batches hold DISJOINT documents (one posting row per
    (doc, token) globally), and it skips the df-table read + its
    broadcast-materialization job. Same scale caveat as
    :func:`bm25_topk`: ≤|terms| tasks carry the window, so keep the
    default (stored additive df + broadcast) when docs-per-term is
    lake-sized."""
    if queries is None:
        queries = BM25_QUERIES
    qterms, all_terms = _query_terms(spark, queries)
    qtok = spark.createDataFrame([(t,) for t in all_terms], ["token"])
    # The workload's pbucket set: a deliberate tiny collect (bounded
    # by the query token count — the IVF probed-cells precedent) that
    # buys PLAN-time PartitionFilters on the postings scan; the
    # literal token isin below still enforces exact membership.
    pbuckets = [
        r[0]
        for r in qtok.select(
            F.pmod(F.xxhash64("token"), F.lit(N_POSTING_BUCKETS)).alias("pb")
        )
        .distinct()
        .collect()
    ]
    tfq = (
        spark.read.parquet(f"{index_dir}/tf")
        .filter(F.col("pbucket").isin(pbuckets))
        .filter(F.col("token").isin(all_terms))
        .drop("batch_id", "pbucket")
    )
    if dfc_via_window:
        base = tfq.withColumn(
            "dfc",
            F.count(F.lit(1)).over(Window.partitionBy("token")).cast("long"),
        )
    else:
        dfreq = (
            spark.read.parquet(f"{index_dir}/df")
            .filter(F.col("token").isin(all_terms))
            .groupBy("token")
            .agg(F.sum("dfc").alias("dfc"))
        )
        base = tfq.join(F.broadcast(dfreq), "token")
    # Driver-side stats fold: one integer row per batch, read with
    # pyarrow (no Spark job); attached as literals (no crossJoin
    # broadcast exchange).
    import pyarrow.parquet as pq

    st = pq.read_table(f"{index_dir}/stats", columns=["n_docs", "dl_sum"])
    n_docs = sum(st.column("n_docs").to_pylist())
    dl_sum = sum(st.column("dl_sum").to_pylist())
    if n_docs == 0:
        raise ValueError(
            f"BM25 index at {index_dir!r} is empty (n_docs=0); "
            "score_queries_stored needs at least one indexed document"
        )
    scored = (
        base.join(F.broadcast(qterms), "token")
        .withColumn("n_docs", F.lit(n_docs).cast("long"))
        .withColumn("avgdl", F.lit(dl_sum / n_docs))
    )
    return _finish_scoring(scored, k1, b, topk, exclude_self)


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
