"""Retrieval + data-selection queries: BM25 lexical top-k and DSIR
importance resampling over the ``documents`` table.

Oracle strategy: both operators are deterministic by construction
(md5 hashing, fixed literal query workload), so each carries a full
hash oracle. All float literals in the SQL twins are emitted in
scientific notation from the SAME Python constants as the Spark code
(CLAUDE.md: bare decimal-point literals type as DECIMAL in DuckDB and
run decimal-scale arithmetic, silently 1-ulp off the double op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.dsir import GUMBEL_SEED, N_BUCKETS, SEED, dsir_resample
from capital.llm.retrieval import B, BM25_QUERIES, K1, bm25_topk
from capital.queries.llm_queries import _NTOKS
from capital.queries.registry import query


def _d(x: float) -> str:
    """A Python double as a DuckDB DOUBLE literal (scientific
    notation; repr already carries an exponent for tiny values)."""
    s = repr(float(x))
    return s if "e" in s or "E" in s else s + "e0"


_RET_TOPK = 10

_QVALUES = ", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)
_QTOKS = (
    r"string_split_regex(trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')),"
    r" '\s+')"
)


#: Shared by the in-call query and its stored-index twin: the score
#: is defined by the corpus + workload, not by where postings live.
_BM25_ORACLE = f"""
    WITH q(query_id, qtext) AS (VALUES {_QVALUES}),
    qterms AS (
      SELECT query_id, token, COUNT(*) AS qtf FROM (
        SELECT CAST(query_id AS BIGINT) AS query_id,
               unnest({_QTOKS}) AS token
        FROM q)
      GROUP BY query_id, token),
    qtok AS (SELECT DISTINCT token FROM qterms),
    tok AS (SELECT doc_id, unnest({_NTOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    sc AS (SELECT COUNT(*) AS n_docs,
                  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
           FROM dl),
    tfq AS (SELECT tf.* FROM tf JOIN qtok USING (token)),
    dfq AS (SELECT token, COUNT(*) AS dfc FROM tfq GROUP BY token),
    per AS (
      SELECT qt.query_id, tfq.doc_id,
             qt.qtf * ((ln({_d(1.0)} + (sc.n_docs - dfq.dfc + {_d(0.5)})
                             / (dfq.dfc + {_d(0.5)})))
             * (tfq.tf * {_d(K1 + 1.0)}
                / (tfq.tf + {_d(K1)}
                   * ({_d(1.0)} - {_d(B)}
                      + {_d(B)} * dl.dl / sc.avgdl)))) AS s
      FROM tfq
      JOIN dfq USING (token)
      JOIN qterms qt USING (token)
      JOIN dl ON dl.doc_id = tfq.doc_id
      CROSS JOIN sc),
    tot AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE) AS bm25
      FROM per GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id, bm25,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS rn
      FROM tot)
    SELECT query_id, doc_id, bm25, CAST(rn AS INTEGER) AS rank
    FROM ranked WHERE rn <= {_RET_TOPK}
    """


@query("ret_bm25_topk", oracle=_BM25_ORACLE)
def ret_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query over the fixed literal query
    workload — the lexical first-stage retriever next to the dense
    ANN family. See capital/llm/retrieval.py for the plan shape
    (literal query-term prune pushed into the corpus scan; single
    tokenization pass behind a checkpoint barrier).
    dfc_via_window: the benchmark corpus is bounded (≤5k docs), so
    the df count rides a token-partition window instead of paying a
    broadcast-materialization job — at lake scale the default
    groupBy+broadcast path is the right shape (see the operator
    docstring for the measured trade)."""
    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, topk=_RET_TOPK, dfc_via_window=True)


@query("ret_bm25_stored", memoize=False, oracle=_BM25_ORACLE)
def ret_bm25_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 against a STORED index (llm/retrieval.write_bm25_index /
    bm25_topk_stored) — the lexical member of the stored-index family
    (LSH band table, IVF/PQ lakes): postings, document frequencies
    and integer corpus-stat partials persisted once, queries served
    without re-tokenizing the corpus. The whole build→write→fold→
    score path must hash-match the SAME oracle as the in-call
    ret_bm25_topk (shared scoring tail; the stats fold's single
    int→double division is the in-call expression bit-for-bit).
    memoize=False: writes the index eagerly per call."""
    import os
    import tempfile

    from capital.llm.retrieval import bm25_topk_stored, write_bm25_index

    d = load_table(spark, sf_dir, "documents")
    # Fixed per-sf path + dynamic overwrite (the sim_ivf_stored
    # convention): repeated runs reuse one directory. The layout
    # version rides the path — a partitioning change (round 11 added
    # pbucket) must never dynamic-overwrite into a stale differently-
    # partitioned dir from an earlier round (observed: mixed layouts
    # make the read fail).
    path = os.path.join(
        tempfile.gettempdir(),
        f"capital_bm25_index_v2_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    write_bm25_index(d, path)
    # dfc recount from the pruned postings (window) + driver-side
    # stats fold: bounded benchmark corpus (see ret_bm25_topk note).
    return bm25_topk_stored(
        spark, path, topk=_RET_TOPK, dfc_via_window=True
    )


def ensure_bm25_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once fixture for the probe-only stored-BM25 query: a
    per-sf index dir (SEPARATE from ret_bm25_stored's rebuild path,
    which deletes its dir every call) guarded by a content marker, so
    a changed corpus triggers a rebuild instead of probing stale
    postings (the round-11 ret_bm25_stored hazard). Round-13
    hardening (r12 advice): the index path embeds a hash of the FULL
    sf_dir path (two dirs sharing a basename no longer collide), and
    the marker digest is content-sensitive — row count + total text
    bytes + max doc_id (one metadata-cheap aggregate over the
    parquet), not count alone, so a same-size regenerated corpus
    rebuilds too. Single-writer assumed (the driver is one process;
    the lake posture is a versioned-index maintenance job)."""
    import hashlib
    import os
    import tempfile

    from capital.llm.retrieval import write_bm25_index

    d = load_table(spark, sf_dir, "documents")
    digest_row = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("text")).alias("nbytes"),
        F.max("doc_id").alias("maxid"),
    ).collect()[0]
    digest = f"n{digest_row.n}_b{digest_row.nbytes}_m{digest_row.maxid}"
    sf_tag = hashlib.md5(
        os.path.abspath(sf_dir).encode("utf-8")
    ).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(),
        f"capital_bm25_probe_index_v2_"
        f"{os.path.basename(sf_dir.rstrip('/'))}_{sf_tag}",
    )
    marker = os.path.join(path, f"_BUILT_{digest}")
    if not os.path.exists(marker):
        write_bm25_index(d, path)  # deletes any stale layout first
        with open(marker, "w"):
            pass
    return path


@query("ret_bm25_probe_only", memoize=False, oracle=_BM25_ORACLE)
def ret_bm25_probe_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from a PREBUILT stored index (round-11 verdict
    #2): :func:`ensure_bm25_index` builds the versioned index at most
    once per corpus content, and the query itself is pure probe —
    postings partition-pruned to the workload's pbuckets, df/stats
    folded from the stored partials, corpus never touched. Same
    oracle as ret_bm25_topk (the score is defined by corpus +
    workload, not by where postings live); this row is the index
    family's steady-state cost, next to ret_bm25_stored's
    build+write+probe cost. memoize=False: the fixture check and the
    pbucket collect are eager."""
    from capital.llm.retrieval import bm25_topk_stored

    path = ensure_bm25_index(spark, sf_dir)
    # dfc recount from the pruned postings (window) + driver-side
    # stats fold: bounded benchmark corpus (see ret_bm25_topk note).
    return bm25_topk_stored(
        spark, path, topk=_RET_TOPK, dfc_via_window=True
    )


_DSIR_QUOTA = 100
_HS = 4294967296.0


def _bucket_sql(seed: str, n: int) -> str:
    """DuckDB twin of dsir._bucket (md5 on the raw token text)."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || token), 1, 8))"
        f"::UBIGINT % {n} AS BIGINT)"
    )


def _gumbel_sql(seed: str, key: str = "doc_id") -> str:
    """DuckDB twin of dsir._gumbel: −ln(−ln((h32 + 0.5)/2³²))."""
    u = (
        f"(('0x' || substr(md5('{seed}:' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::UBIGINT + {_d(0.5)}) / {_d(_HS)}"
    )
    return f"-ln(-ln({u}))"


def _round6(expr: str) -> str:
    """SQL twin of capital.llm.text.round6_stable."""
    return f"floor(({expr}) * {_d(1000000.0)} + {_d(0.5)}) / {_d(1000000.0)}"


_RATIO = (
    f"ln((ct + {_d(1.0)}) / (tt + {_d(float(N_BUCKETS))}))"
    f" - ln((cr + {_d(1.0)}) / (tr + {_d(float(N_BUCKETS))}))"
)


@query(
    "cur_dsir_resample",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, (lang = 'en') AS is_t, unnest({_NTOKS}) AS token
      FROM documents),
    bk AS (
      SELECT doc_id, is_t, {_bucket_sql(SEED, N_BUCKETS)} AS bucket
      FROM base),
    dc AS (SELECT doc_id, bucket, COUNT(*) AS c
           FROM bk GROUP BY doc_id, bucket),
    pb AS (SELECT bucket,
                  SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                  COUNT(*) AS cr
           FROM bk GROUP BY bucket),
    grid AS (SELECT unnest(range(0, {N_BUCKETS})) AS bucket),
    dense AS (
      SELECT grid.bucket, COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
      FROM grid LEFT JOIN pb USING (bucket)),
    tots AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM dense),
    ratios AS (
      SELECT bucket,
             CAST({_round6(_RATIO)} AS DECIMAL(28,6)) AS ratio
      FROM dense CROSS JOIN tots),
    w AS (
      SELECT doc_id,
             CAST(SUM(CAST(dc.c * ratios.ratio AS DECIMAL(28,6)))
                  AS DOUBLE) AS log_w
      FROM dc JOIN ratios USING (bucket) GROUP BY doc_id),
    keyed AS (
      SELECT doc_id, log_w,
             {_round6(f"log_w + {_gumbel_sql(GUMBEL_SEED)}")} AS sel_key
      FROM w)
    SELECT doc_id, log_w, sel_key
    FROM keyed
    ORDER BY sel_key DESC, doc_id
    LIMIT {_DSIR_QUOTA}
    """,
)
def cur_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): Gumbel-top-k
    selection of the pool documents whose hashed-unigram profile most
    resembles the ``lang='en'`` target subset. See
    capital/llm/dsir.py for the fit/weigh/resample plan shape."""
    d = load_table(spark, sf_dir, "documents")
    return dsir_resample(d, F.col("lang") == "en", _DSIR_QUOTA)


# --- hybrid retrieval: BM25 + dense cosine fused by RRF (round 10) --------

_HYB_N = 8        # query-by-example workload: documents 0..7
_HYB_CAND = 20    # per-ranker candidate depth
_HYB_TOPK = 10


def _hybrid_oracle() -> str:
    from capital.llm.retrieval import RRF_K, RRF_SCALE
    from capital.queries.llm_queries import _COS

    cos = _COS.replace("qv", "q.e").replace("cv", "c.e")
    return rf"""
    WITH q AS (SELECT doc_id AS query_id, text AS qtext
               FROM documents WHERE doc_id < {_HYB_N}),
    qterms AS (
      SELECT query_id, token, COUNT(*) AS qtf FROM (
        SELECT query_id, unnest({_QTOKS}) AS token FROM q)
      GROUP BY query_id, token),
    qtok AS (SELECT DISTINCT token FROM qterms),
    tok AS (SELECT doc_id, unnest({_NTOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    sc AS (SELECT COUNT(*) AS n_docs,
                  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
           FROM dl),
    tfq AS (SELECT tf.* FROM tf JOIN qtok USING (token)),
    dfq AS (SELECT token, COUNT(*) AS dfc FROM tfq GROUP BY token),
    per AS (
      SELECT qt.query_id, tfq.doc_id,
             qt.qtf * ((ln({_d(1.0)} + (sc.n_docs - dfq.dfc + {_d(0.5)})
                             / (dfq.dfc + {_d(0.5)})))
             * (tfq.tf * {_d(K1 + 1.0)}
                / (tfq.tf + {_d(K1)}
                   * ({_d(1.0)} - {_d(B)}
                      + {_d(B)} * dl.dl / sc.avgdl)))) AS s
      FROM tfq
      JOIN dfq USING (token)
      JOIN qterms qt USING (token)
      JOIN dl ON dl.doc_id = tfq.doc_id
      CROSS JOIN sc),
    lex AS (
      SELECT query_id, doc_id, rn AS rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id) AS rn
        FROM (SELECT query_id, doc_id,
                     CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE) AS bm25
              FROM per WHERE doc_id <> query_id
              GROUP BY query_id, doc_id))
      WHERE rn <= {_HYB_CAND}),
    dense AS (
      SELECT query_id, doc_id, rn AS rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, doc_id) AS rn
        FROM (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                     {cos} AS sim
              FROM (SELECT vec_id, embedding AS e FROM embeddings
                    WHERE vec_id < {_HYB_N}) q,
                   (SELECT vec_id, embedding AS e FROM embeddings) c
              WHERE q.vec_id <> c.vec_id))
      WHERE rn <= {_HYB_CAND}),
    fused AS (
      SELECT query_id, doc_id,
             SUM(CAST(floor({_d(float(RRF_SCALE))} / ({RRF_K} + rank))
                      AS BIGINT)) AS c_total,
             COUNT(*) AS n_lists
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense)
      GROUP BY query_id, doc_id)
    SELECT query_id, CAST(rn AS INTEGER) AS rank, doc_id,
           CAST(c_total AS DOUBLE) / {_d(float(RRF_SCALE))} AS rrf_score,
           CAST(n_lists AS INTEGER) AS n_lists
    FROM (SELECT query_id, doc_id, c_total, n_lists,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY c_total DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= {_HYB_TOPK}
    """


@query("ret_hybrid_rrf", memoize=False, oracle=_hybrid_oracle())
def ret_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid first-stage retrieval (the RAG-pipeline shape): the
    lexical BM25 ranker and the dense brute-cosine ranker each
    produce per-query top-20 candidates for a query-by-example
    workload (query = documents 0..7, self-matches excluded on both
    sides), fused by reciprocal rank fusion
    (llm/retrieval.rrf_fuse — integer-quantized contributions so the
    fused score is aggregation-order-free). Composes two
    independently-oracled rankers; the oracle checks the whole
    composition. memoize=False: the bounded 8-row query-text collect
    is eager."""
    from capital.llm.retrieval import rrf_fuse
    from capital.llm.similarity import cosine_topk

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qdocs = (
        d.filter(F.col("doc_id") < _HYB_N)
        .select("doc_id", "text")
        .collect()
    )  # bounded: N query texts (the IVF-probe precedent)
    lex = bm25_topk(
        d,
        queries=[(int(r.doc_id), r.text) for r in qdocs],
        topk=_HYB_CAND,
        exclude_self=True,
        dfc_via_window=True,  # bounded benchmark corpus (see ret_bm25_topk)
    ).select("query_id", "doc_id", "rank")
    dense = cosine_topk(
        emb, emb.filter(F.col("vec_id") < _HYB_N), k=_HYB_CAND
    ).select(
        F.col("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    fused = rrf_fuse([lex, dense], topk=_HYB_TOPK)
    return fused.select(
        "query_id",
        "rank",
        "doc_id",
        "rrf_score",
        F.col("n_lists").cast("int").alias("n_lists"),
    )
