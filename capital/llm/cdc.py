"""Content-defined chunking (CDC) for shift-robust sub-document dedup.

Fixed-stride span dedup (``llm/dedup.span_dedup_stats``) breaks when
boilerplate is *shifted* by one inserted token — every downstream
span changes. CDC cuts chunk boundaries from the CONTENT instead
(the rsync/LBFS trick, Muthitacharoen et al. 2001, used at corpus
scale by dedup pipelines over crawl snapshots): a token STARTS a new
chunk when ``md5(token) mod avg_size == 0``, so a boundary decision
depends only on the token itself — insert a token anywhere and every
chunk not containing the edit keeps its exact bytes and digest.
Expected chunk length is ``avg_size`` tokens (geometric).

Shape (all corpus-scale steps are the engine's standard explode +
map-side-combine patterns):

- posexplode tokens → boundary flag (narrow map);
- running sum of boundaries per doc = chunk id (ONE window shuffle on
  doc id, sorted by position);
- chunk digest = md5 of the order-preserved token join (groupBy
  (doc, chunk) — clusters within the window's hash partitioning);
- corpus-wide digest counts (ONE shuffle on 16-byte digests,
  map-side combined; hot boilerplate digests collapse to one row per
  partition before the exchange).

Determinism: boundaries, digests, and counts are all md5 — no RNG,
bit-identical on the DuckDB oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from capital.llm.assemble import hash_bucket
from capital.llm.text import normalized, tokens


def cdc_chunks(
    df: DataFrame,
    avg_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "cdc",
) -> DataFrame:
    """Per-document content-defined chunks:
    ``(id, chunk_idx, digest, n_tokens)``. ``chunk_idx`` is 1-based in
    document order; ``digest`` is md5 of the space-joined tokens."""
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(normalized(F.col(text_col)))).alias(
            "__pos", "__token"
        ),
    )
    boundary = F.when(
        (F.col("__pos") == 0)
        | (hash_bucket(F.col("__token"), seed, avg_size) == 0),
        1,
    ).otherwise(0)
    w = Window.partitionBy(id_col).orderBy("__pos")
    chunked = tok.withColumn(
        "chunk_idx", F.sum(boundary).over(w)
    )
    # Order-preserving chunk text: collect (pos, token), sort by pos,
    # join — groupBy order is not otherwise guaranteed.
    return chunked.groupBy(id_col, "chunk_idx").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__token"))
                    ),
                    lambda s: s["__token"],
                ),
                " ",
            )
        ).alias("digest"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def cdc_dup_stats(
    df: DataFrame,
    avg_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "cdc",
    scope=None,
    broadcast_dups: bool = True,
) -> DataFrame:
    """Per-document CDC duplication profile:
    ``(id, n_chunks, n_dup_chunks, dup_tokens)`` where a chunk is
    "dup" when its digest occurs in MORE THAN ONE document (its own
    repeats don't count — within-doc repetition is the repetition
    operator's job). The shift-robust near-boilerplate signal.

    Plan note (measured, round 7): the chunk frame feeds BOTH the
    digest-count aggregate and the join-back with no exchange reuse,
    so the explode + window + ordered-collect pipeline runs twice —
    and that is the FASTER shape. Persisting chunks measured 1.9–2.3 s
    vs 1.6–1.7 s unpersisted at sf0.1 (interleaved min-of-2): the
    materialization barrier + memory store cost more than the
    recompute saves, the same lesson as the skew-probe count caching
    (don't displace the agg pipeline with an InMemoryRelation). Pass a
    ``CacheScope`` as ``scope`` to persist anyway when the input is
    expensive to recompute (e.g. a filtered/decoded upstream)."""
    chunks = cdc_chunks(df, avg_size, id_col, text_col, seed)
    if scope is not None:
        chunks = scope.persist(chunks)
    # Round 14: the dup-digest set (shared by >1 doc) is sparse by
    # nature, so BROADCAST it and probe with a left join — the
    # substring_dup_spans regime. The former shuffle join on digest
    # attached counts to EVERY chunk row and colocated a hot
    # boilerplate digest's rows into one join task; this shape keeps
    # the probe map-side, so the whole probe job rides the window's
    # id-partitioning (groupBy (id, chunk) and groupBy id both reuse
    # it — one exchange total on the probe). The dup-digest set is
    # CORPUS-DERIVED, so the hint is a regime switch, not a law: pass
    # ``broadcast_dups=False`` when a lake's dup-digest set outgrows
    # a broadcast and the plain shuffle join (AQE-skew-split) takes
    # over. Output-identical either way (A/B'd at sf0.1).
    dup_set = (
        chunks.groupBy("digest")
        .agg(F.count_distinct(F.col(id_col)).alias("__docs"))
        .filter(F.col("__docs") > 1)
        .select("digest", F.lit(1).alias("__dup"))
    )
    probed = chunks.join(
        F.broadcast(dup_set) if broadcast_dups else dup_set,
        "digest",
        "left",
    )
    dup = F.when(F.col("__dup").isNotNull(), 1).otherwise(0)
    return probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(dup).alias("n_dup_chunks"),
        F.sum(
            F.when(dup == 1, F.col("n_tokens")).otherwise(0)
        ).alias("dup_tokens"),
    )


def cdc_index_rows(
    df: DataFrame,
    avg_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "cdc",
) -> DataFrame:
    """Storable CDC index rows ``(digest, id)`` — append one batch's
    rows per ingestion run (the growing-lake pattern of the LSH band
    index, ``dedup.band_keys``): the stored index is digests only
    (16-byte keys + ids), never the text, so history is never
    re-chunked."""
    return cdc_chunks(df, avg_size, id_col, text_col, seed).select(
        "digest", id_col
    )


def cdc_incremental_flags(
    batch: DataFrame,
    index: DataFrame,
    avg_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "cdc",
) -> DataFrame:
    """Probe ONE batch against a stored CDC digest index: per batch
    document, how many of its chunks (and tokens) already exist in
    history — the shift-robust boilerplate/near-dup signal for
    incremental ingestion.

    Scale shape: the batch is chunked (batch-sized window), its
    digests join the index on the uniform 16-byte digest key
    (bucket the stored index by digest and the probe co-locates;
    a Bloom prefilter of index digests drops the join entirely for
    mostly-novel batches — ``llm/bloom.py`` composes directly).
    History text is never re-read."""
    chunks = cdc_chunks(batch, avg_size, id_col, text_col, seed)
    known = index.select("digest").distinct()
    hit = F.when(F.col("__known").isNotNull(), 1).otherwise(0)
    return (
        chunks.join(
            known.withColumn("__known", F.lit(1)), "digest", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(hit).alias("n_known_chunks"),
            F.sum(
                F.when(hit == 1, F.col("n_tokens")).otherwise(0)
            ).alias("known_tokens"),
        )
    )
