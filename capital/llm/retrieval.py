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
    from capital.queries.registry import decimal_sum

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
