"""Skew-mitigation operators for hot keys at cluster scale.

AQE's skew-join splitting (on by default, capital.session) handles
most skew at runtime. These operators cover the cases AQE cannot:
skewed **aggregations** (one reducer owns the hot key) and skewed
joins where the build side must be replicated.

Salting trades one extra (cheap, well-distributed) partial shuffle for
eliminating the straggler task — the classic two-phase aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: Decomposable aggregates: phase-1 builder and phase-2 combiner.
#: (count partials merge with SUM; avg must be decomposed by the
#: caller into a sum and a count.)
_SALTED_FNS: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c if c is not None else F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _row_salt(
    df: DataFrame, buckets: int, layout_salt: bool = False
) -> Column:
    """Deterministic per-row salt in ``[0, buckets)``: ``xxhash64``
    over every hashable column (NOT just the hot key — that would map
    the whole hot key to one bucket and undo the salting). ``pmod``
    keeps the sign non-negative. Retry-deterministic, unlike
    ``rand(seed)`` whose output depends on the partition layout at
    evaluation time.

    Map-typed columns are excluded (``xxhash64`` rejects maps — their
    entry order is undefined, so they cannot hash stably anyway).

    Limitation (documented, by design): the salt is a pure function of
    the row, so FULLY IDENTICAL rows share a bucket. A key-only
    projection of a hot key (count(*) by hot key) therefore degenerates
    to one bucket — pass ``layout_salt=True`` there to mix in
    ``spark_partition_id()``: the hot key then spreads across as many
    buckets as input partitions (map-side combine already collapses
    within-partition duplicates). The trade is layout *independence* —
    the salt value changes if the upstream partitioning changes — while
    retry-determinism is kept (a retried task recomputes the same
    partition id over the same rows)."""
    hashable = [
        F.col(f.name)
        for f in df.schema.fields
        if not f.dataType.typeName().startswith("map")
    ]
    if layout_salt:
        hashable.append(F.spark_partition_id())
    if not hashable:
        raise ValueError(
            "salted_agg: no hashable columns to salt on "
            "(all-map-column frame; pass layout_salt=True)"
        )
    return F.pmod(F.xxhash64(*hashable), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | None]],
    salt_buckets: int = 16,
    layout_salt: bool = False,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    Phase 1 groups on (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials on
    the true keys with the combiner that matches each aggregate
    (sum/count→SUM of partials, min→MIN, max→MAX).

    ``aggs`` maps output name → ("sum"|"count"|"min"|"max", column);
    the column may be None for count(*).

    The salt is ``xxhash64`` over the whole row, not ``rand()``:
    deterministic under task retry/recompute (a retried partition
    re-derives the same buckets, so speculative execution and stage
    re-runs cannot double-count), and still spreads a hot *key* whose
    non-key columns vary. Fully identical rows share a bucket — for a
    key-only projection (count(*) by hot key) that defeats the
    salting: pass ``layout_salt=True`` there (see :func:`_row_salt`
    for the exact trade).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _SALTED_FNS:
            raise ValueError(
                f"salted_agg: {name!r} uses {fn!r}; supported: "
                f"{sorted(_SALTED_FNS)} (decompose avg into sum+count)"
            )
    salted = df.withColumn(
        "__salt", _row_salt(df, salt_buckets, layout_salt)
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _SALTED_FNS[fn][0](col).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _SALTED_FNS[fn][1](f"__p_{name}").alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )


def block_counts(keyed: DataFrame, block_cols: list[str]) -> DataFrame:
    """Per-block row counts — the frame both the skew probe and the
    chunk annotation consume."""
    return keyed.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__n"))


def chunked_blocks(
    keyed: DataFrame,
    block_cols: list[str],
    id_col: str,
    chunk_target: int = 1024,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Attach deterministic chunk metadata to a blocked frame: per-block
    row count ``__n``, chunk count ``__s = ceil(n / chunk_target)``, and
    this row's chunk ``__c = xxhash64(id) mod __s``.

    Blocks of one row are dropped (they cannot pair). The count is an
    aggregate + equi-join rather than a window so a hot block never has
    to materialize in a single task; AQE broadcasts the per-block counts
    when they are small. Pass a precomputed (ideally persisted)
    ``counts`` frame to skip re-aggregating — the skew probe does.
    """
    if counts is None:
        counts = block_counts(keyed, block_cols)
    return (
        keyed.join(counts.filter(F.col("__n") > 1), block_cols)
        .withColumn(
            "__s",
            F.ceil(F.col("__n") / F.lit(chunk_target)).cast("int"),
        )
        .withColumn(
            "__c",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("__s")).cast("int"),
        )
    )


def _plain_pair_join(
    keyed: DataFrame,
    block_cols: list[str],
    id_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Naive within-block pair enumeration (``id_a < id_b``) — the
    fast path when no block can exceed the chunk target."""
    left = keyed.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    right = keyed.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    return left.join(right, block_cols).filter(F.col("id_a") < F.col("id_b"))


def plain_by_hint(total_rows: int, chunk_target: int = 1024) -> bool:
    """True when a known global row count makes the plain pair join
    safe with no probe: even one all-rows block stays within
    ``8·chunk_target²`` pairs. Callers use this to decide whether the
    keyed frame needs persisting at all (no probe → single consumer)."""
    return total_rows ** 2 <= 8 * chunk_target ** 2


def max_block_rows(keyed: DataFrame, block_cols: list[str]) -> int:
    """Largest block's row count (0 for an empty frame) — one
    count-aggregate job over ``keyed``."""
    row = block_counts(keyed, block_cols).agg(F.max("__n")).first()
    return int(row[0]) if row and row[0] is not None else 0


def chunked_pair_join(
    keyed: DataFrame,
    block_cols: list[str],
    id_col: str,
    payload_cols: list[str] | None = None,
    chunk_target: int = 1024,
    probe: bool = True,
    total_rows_hint: int | None = None,
    max_block_hint: int | None = None,
) -> DataFrame:
    """All within-block unordered pairs (``id_a < id_b``) with a hard
    per-task bound under block skew.

    A plain self-join on the block key sends a hot block's entire
    ~m²/2 pair space to one task (boilerplate-heavy web corpora make
    million-doc LSH/SimHash buckets routinely). Here each block is cut
    into ``s = ceil(m / chunk_target)`` hash-chunks and the pair space
    is enumerated per *chunk pair*: a row joins under bucket key
    ``(block, c_left, c_right)`` where each side explodes over the s
    partner chunks. Every unordered pair (x, y), x < y, materializes in
    exactly one bucket — ``(chunk(x), chunk(y))`` — so the output is
    identical to the naive self-join, but no task ever compares more
    than ~``chunk_target²`` candidates. Replication is s small rows per
    input row (total O(m²/chunk_target) — pair count over chunk size),
    and unskewed blocks (s=1) degenerate to the plain single-bucket
    join.

    AQE's skew-join split bounds per-task *input*; it cannot bound the
    quadratic *output* of a self-join bucket — this operator does.
    ``payload_cols`` are carried to both sides as ``<col>_a`` /
    ``<col>_b``.

    **Skew probe (``probe=True``).** Chunking costs a counts
    aggregate + join-back + an s-way explode of both sides — fixed
    overhead that dominated small unskewed workloads (the
    embedding-cosine query ran 9.7× its anchor paying three stages to
    chunk blocks of ≤200 rows). With ``probe`` on, one cheap
    count-aggregate job checks the largest block first; when no block
    exceeds ``chunk_target`` the plain single-bucket self-join is
    emitted instead — identical output, and the per-task pair bound
    holds trivially because every block fits one chunk. The probe is
    an *eager* job at call time: persist ``keyed`` first if its
    lineage is expensive (all engine callers do). ``probe=False``
    restores the always-chunked lazy plan — use it when the workload
    is EXPECTED skewed (SimHash prefix/segment blocking on boilerplate
    corpora): there the probe's answer is already known and its pass
    over the signature lineage is pure cost, and feeding the probe's
    *cached* counts into the chunked join measured 2× WORSE than
    recomputing them in-plan (the cached relation displaces the
    partial-agg + exchange-reuse shape; sf0.1 fullrecall 12.7 s vs
    6.6 s) — so the skewed path always rebuilds counts inside the
    plan and the probe result is deliberately thrown away.

    The probe is a point-in-time decision over ONE snapshot of
    ``keyed``: the returned (lazy) plan assumes the data the probe
    counted. Execute it within the same job/call; do not hold the
    plan across source mutations (a re-read of grown data under a
    plain-join decision would silently void the per-task pair bound).
    All engine callers build-and-run per query, satisfying this.

    **total_rows_hint** — when the caller already knows the frame's
    row count n (e.g. it sized partitions with
    ``io.right_size_narrow``), and n is small enough that even the
    fully-degenerate case (every row in ONE block) stays within a
    small constant of the design bound (``n²/2 ≤ 8·chunk_target²``,
    i.e. n ≤ ~2.9k at the default target), the plain join is emitted
    with NO probe job at all: the global count already bounds any
    block's pair space, so the eager count-aggregate would re-answer
    a question the caller answered. This removes one of the two
    eager jobs on micro inputs (embedding-cosine at sf0.1: 2 jobs →
    1). A wrong (stale, too-small) hint risks an oversized task, not
    wrong results — same contract as the probe snapshot above.

    **max_block_hint** (round 17) — the per-BLOCK analogue: when the
    caller knows an upper bound on any single block's row count m
    (e.g. the blocks partition a frame whose total row count the
    caller already paid for, and each id contributes at most one row
    per block — LSH band buckets over a counted sample), the plain
    join is emitted with no probe iff ``m²/2 ≤ 4·chunk_target²``.
    That is exactly the worst case ``total_rows_hint`` guards against
    (all n rows in ONE block), so the same ``plain_by_hint`` bound
    applies; a total-rows bound is just the degenerate block bound.
    Same contract: a wrong hint risks an oversized task, never wrong
    results.
    """
    payload_cols = payload_cols or []
    if (
        probe
        and total_rows_hint is not None
        and plain_by_hint(total_rows_hint, chunk_target)
    ):
        return _plain_pair_join(keyed, block_cols, id_col, payload_cols)
    if (
        probe
        and max_block_hint is not None
        and plain_by_hint(max_block_hint, chunk_target)
    ):
        return _plain_pair_join(keyed, block_cols, id_col, payload_cols)
    if probe and max_block_rows(keyed, block_cols) <= chunk_target:
        return _plain_pair_join(keyed, block_cols, id_col, payload_cols)
    # keyed is NOT persisted here: materializing the chunk-annotated
    # frame was measured net-negative at sf0.1 (cache write cost > the
    # two cheap recomputes of a projection over the caller's
    # already-persisted input); callers persist their expensive
    # upstream (signatures, banded index, hashed vectors) instead.
    chunked = chunked_blocks(keyed, block_cols, id_col, chunk_target)
    partner = F.explode(
        F.sequence(F.lit(0), F.col("__s") - F.lit(1))
    ).alias("__partner")
    left = chunked.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        F.col("__c").alias("__ca"),
        partner,
    ).withColumnRenamed("__partner", "__cb")
    right = chunked.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        F.col("__c").alias("__cb"),
        partner,
    ).withColumnRenamed("__partner", "__ca")
    return (
        left.join(right, [*block_cols, "__ca", "__cb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("__ca", "__cb")
    )


def salted_broadcast_left_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof fact↔dim join: salt the fact side, replicate the dim
    side once per salt bucket, join on (key, salt).

    Use when the dim is too large to broadcast outright but a hot fact
    key would overload one sort-merge partition. Replication factor is
    ``salt_buckets`` on the *small* side only. Salt is whole-row
    ``xxhash64`` (see :func:`_row_salt`) — retry-deterministic, and a
    left join must not have its match side change under recompute.
    """
    salted_facts = facts.withColumn("__salt", _row_salt(facts, salt_buckets))
    replicated_dim = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_facts.join(replicated_dim, [on, "__salt"], "left").drop(
        "__salt"
    )
