"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick pretraining documents whose hashed-n-gram profile
looks like a target domain, by importance-resampling the raw pool
under bag-of-hashed-unigram language models.

The engine twin of the paper's pipeline, Spark-first:

1. **Featurize**: tokens hash into ``n_buckets`` buckets (the paper's
   hashed n-gram features) via the repo's cross-engine md5 bucket
   (:func:`capital.llm.assemble.hash_bucket` construction — NOT
   xxhash64, so the DuckDB oracle replicates it bit-for-bit). One
   corpus-sized explode → (doc, bucket) count aggregate, map-side
   combined.
2. **Fit**: add-1-smoothed bucket distributions for the target subset
   and the raw pool — two tiny ``n_buckets``-row aggregates.
3. **Weigh**: per-bucket log-ratio ``ln λ_target[b] − ln λ_raw[b]``
   rounds to 6 decimals and casts DECIMAL(28,6); a document's log
   importance weight is the **exact** decimal dot product
   ``Σ_b count_{d,b} · ratio[b]`` (integer × decimal — associative,
   order-independent: the repo's float-parity discipline). The
   ratio table is ``n_buckets`` rows → broadcast join.
4. **Resample**: the paper samples without replacement with
   probability ∝ exp(log w). The Gumbel-top-k trick makes that a
   deterministic ORDER BY: key = log w + Gumbel(0,1), where the
   Gumbel is derived from the md5 hash-fraction
   (``g = −ln(−ln(u))``, ``u = (h32 + 0.5)/2³²`` — strictly inside
   (0,1) so both logs are finite). Top-``quota`` by key is Spark's
   ``TakeOrderedAndProject`` — distributed partial top-k, no global
   sort, no single-task window.

At 100 TB: one corpus shuffle (the (doc,bucket) aggregate), one
broadcast, one distributed top-k. The fitted ratio table is the
"trained" artifact — persist it and step 3–4 become a single
broadcast-join pass over any new pool (the stored-index pattern of
``llm/cdc.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature-space size. The paper uses 10k for full-scale corpora; 256
#: keeps the toy corpus's buckets dense enough that both LMs see every
#: bucket (smoothing still covers empties).
N_BUCKETS = 256
SEED = "dsir1"
GUMBEL_SEED = "dsirg1"

_HASH_SPACE = 4294967296.0


def _bucket(token: Column, seed: str, n: int) -> Column:
    """md5 bucket of a token — assemble.hash_bucket's construction,
    keyed on the token text."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), token))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n).alias(
        "bucket"
    )


def _gumbel(key: Column, seed: str) -> Column:
    """Deterministic standard-Gumbel noise from md5(seed:key):
    ``−ln(−ln((h32 + 0.5)/2³²))``. The +0.5 keeps u strictly in
    (0,1) — u=0 would make the inner log −inf."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") + F.lit(0.5)) / F.lit(
        _HASH_SPACE
    )
    return -F.log(-F.log(u))


def dsir_log_ratios(
    docs: DataFrame,
    target_pred: Column,
    *,
    n_buckets: int = N_BUCKETS,
    seed: str = SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Fit the DSIR importance model.

    Returns ``(doc_buckets, ratios)``: the per-(doc, bucket) counts of
    the pool, and the ``n_buckets``-row table of per-bucket log
    probability ratios (DECIMAL(28,6) ``ratio`` column) between the
    target subset (rows matching ``target_pred``) and the raw pool.
    """
    from capital.io import parallelize_narrow
    from capital.llm.text import normalized, tokens

    tok = parallelize_narrow(docs).select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("__is_target"),
        F.explode(tokens(normalized(F.col(text_col)))).alias("token"),
    )
    bucketed = tok.select(
        "doc_id",
        "__is_target",
        _bucket(F.col("token"), seed, n_buckets),
    )
    # ONE corpus pass (round 14): the former shape aggregated
    # `bucketed` twice (per-(doc,bucket) counts AND per-bucket totals),
    # so the tokenize+explode ran in BOTH the ratio-broadcast build job
    # and the weights probe. Grouping by (doc, __is_target, bucket)
    # first lets the per-bucket totals derive from the already-reduced
    # frame (__is_target is constant per doc, so the groups are
    # unchanged), and the probe job reuses the aggregate's shuffle
    # files — the corpus is tokenized once. Toy-scale wash (within
    # host noise at sf0.1); at lake scale tokenization is the cost.
    dbt = bucketed.groupBy("doc_id", "__is_target", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    doc_buckets = dbt.select("doc_id", "bucket", "c")
    # Per-bucket totals for both LMs in ONE aggregate (conditional
    # partials), densified over the full bucket range so smoothing
    # covers buckets one side never saw.
    per_bucket = dbt.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_target"), F.col("c")).otherwise(0)).alias(
            "ct"
        ),
        F.sum("c").alias("cr"),
    )
    grid = docs.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    dense = (
        grid.join(per_bucket, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    tots = dense.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    # round6_stable (not engine round()): the pre-round double is
    # bit-identical on both engines by construction, which is exactly
    # the half-way-boundary regime where engine round()s disagree
    # (round-7 audit; CLAUDE.md).
    from capital.llm.text import round6_stable

    ratios = dense.crossJoin(F.broadcast(tots)).select(
        "bucket",
        round6_stable(
            F.log(
                (F.col("ct") + F.lit(1.0))
                / (F.col("tt") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("cr") + F.lit(1.0))
                / (F.col("tr") + F.lit(float(n_buckets)))
            )
        )
        .cast("decimal(28,6)")
        .alias("ratio"),
    )
    return doc_buckets, ratios


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    *,
    n_buckets: int = N_BUCKETS,
    seed: str = SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document log importance weight ``(doc_id, log_w)`` — the
    exact decimal dot product of hashed-unigram counts with the fitted
    log-ratio table (broadcast join, no corpus re-shuffle)."""
    # Local import: capital.queries.__init__ imports the module that
    # imports this one (registry import at module scope would cycle).
    from capital.queries.registry import decimal_sum

    doc_buckets, ratios = dsir_log_ratios(
        docs,
        target_pred,
        n_buckets=n_buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
    )
    return (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(decimal_sum(F.col("c") * F.col("ratio"), "log_w"))
    )


def dsir_resample(
    docs: DataFrame,
    target_pred: Column,
    quota: int,
    *,
    n_buckets: int = N_BUCKETS,
    seed: str = SEED,
    gumbel_seed: str = GUMBEL_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select ``quota`` documents by Gumbel-top-k importance
    resampling (without replacement, ∝ exp(log_w)) — deterministic,
    so the selection is oracle-checkable. Returns
    ``(doc_id, log_w, sel_key)`` ordered by the selection key."""
    weights = dsir_weights(
        docs,
        target_pred,
        n_buckets=n_buckets,
        seed=seed,
        id_col=id_col,
        text_col=text_col,
    )
    from capital.llm.text import round6_stable

    keyed = weights.select(
        "doc_id",
        "log_w",
        round6_stable(
            F.col("log_w") + _gumbel(F.col("doc_id"), gumbel_seed)
        ).alias("sel_key"),
    )
    return keyed.orderBy(
        F.col("sel_key").desc(), F.col("doc_id").asc()
    ).limit(quota)
