"""Deduplication operators for training-data pipelines.

Tiers, cheapest first:

1. **Exact** (:func:`exact_dedup_groups`) — md5-keyed hash groupBy.
   One shuffle on a 16-byte key; the canonical 100 TB first pass.
2. **Span-level exact** (:func:`span_dedup_stats`) — repeated
   fixed-token windows dropped corpus-wide; the bounded-window form of
   exact-substring dedup (Lee et al., ACL 2022).
3. **MinHash + LSH** (:func:`minhash_signatures`,
   :func:`lsh_candidate_pairs`) — shingle → k minhashes → b bands;
   candidate pairs only where a band bucket collides. Shuffle cost is
   O(docs × b) tiny band keys, never O(docs²). (Broder, "On the
   resemblance and containment of documents", 1997; banding per
   Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets* ch. 3.)
4. **SimHash** (:func:`simhash_bits`) — near-dup bit signature;
   Hamming-adjacent buckets, single-prefix (:func:`simhash_neardup_
   pairs`) or full-recall pigeonhole (:func:`simhash_fullrecall_
   pairs`). (Charikar, STOC 2002; Manku/Jain/Sarma, WWW 2007.)
5. **n-gram Jaccard** (:func:`jaccard_pairs`) — exact verification on a
   bounded candidate set (from LSH buckets or an explicit sample);
   the only quadratic step, applied after blocking.

Edit-distance entity dedup (prefix-blocked and FastSS full-recall)
lives in :mod:`capital.operators.dedup`; embedding-cosine near-dup in
:mod:`capital.llm.similarity`; cluster resolution in
:mod:`capital.llm.clusters`.

Hash discipline: all hashes are md5 hex strings or bits derived from
them — deterministic, engine-portable (the DuckDB oracles replicate
them bit-for-bit), and collision-safe at any corpus size. A production
Spark-only path could swap in ``xxhash64`` for ~3× hash throughput; the
structure is identical.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from capital.llm.text import normalized, tokens

if TYPE_CHECKING:  # import cycle guard: caching has no deps on llm
    from capital.operators.caching import CacheScope


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate groups keyed by md5(normalized text).

    Returns one row per distinct content: representative id (min),
    duplicate count. ``anti-join back on id`` yields the deduped corpus.
    """
    keyed = df.select(
        F.col(id_col), F.md5(normalized(F.col(text_col))).alias("content_key")
    )
    return keyed.groupBy("content_key").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of the normalized text.

    Built from k LINEAR slices zipped positionally (round 9): the
    previous per-index form — ``transform(sequence(1, n−k+1),
    i -> concat_ws(slice(toks, i, k)))`` — allocated a k-element
    sub-array per shingle inside Catalyst's interpreted higher-order
    path, O(n·k) with per-element array construction; zipping k
    shifted slices does the same join with k O(n) copies and one
    cheap per-element concat — measured 1.9× warm on the sf0.1
    corpus, output byte-identical (docs shorter than k tokens
    degrade to one short shingle either way: the missing zip slots
    are null and ``concat_ws`` skips nulls, matching the old
    ``slice(toks, 1, k)`` truncation)."""
    toks = tokens(normalized(text))
    n = F.size(toks)
    width = F.greatest(n - F.lit(k - 1), F.lit(1))
    z = F.arrays_zip(
        *[
            F.slice(toks, i + 1, width).alias(f"t{i}")
            for i in range(k)
        ]
    )
    return F.array_distinct(
        F.transform(
            z,
            lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(k)]),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: array of ``num_hashes`` minima.

    Component i = min over shingles of md5(i || '|' || shingle) — the
    "k independent permutations" realized as salted hashes. Lexicographic
    min over fixed-width hex == numeric min over the 128-bit values.

    Shape: explode shingles, compute the ``num_hashes`` salted md5s as
    flat codegen'd columns, take per-doc ``min`` of each with partial
    (map-side) aggregation, reassemble the array. The earlier
    transform+array_min expression form evaluated every md5 in
    Catalyst's *interpreted* higher-order path — measured 9.1 s vs
    2.4 s for this shape at sf0.1 (the same 'per-row array ops'
    failure mode as char entropy). The explode never crosses the wire:
    partial agg combines shingle rows locally, so the shuffle is
    docs × num_hashes minima regardless of document length.

    ``explode_outer`` keeps null-text docs as a row of null components,
    matching the old ``array_min(null)`` behavior.
    """
    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("__sh")
    )
    return minhash_signatures_from_shingles(
        sh, id_col=id_col, shingle_col="__sh", num_hashes=num_hashes
    )


def minhash_signatures_from_shingles(
    sh: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "__sh",
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures from an already-shingled frame
    (``id, array<string>``) — the shared-lineage entry point: a caller
    that also needs the shingle sets (exact-Jaccard verification)
    shingles the corpus ONCE, persists, and feeds both consumers,
    instead of paying a second full tokenize+shingle scan (one whole
    corpus pass saved at 100 TB; see :func:`verified_neardup_pairs`).
    """
    exploded = sh.select(
        F.col(id_col), F.explode_outer(F.col(shingle_col)).alias("_shingle")
    )
    mins = [
        F.min(
            F.md5(F.concat(F.lit(f"{i}|"), F.col("_shingle")))
        ).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    agged = exploded.groupBy(id_col).agg(*mins)
    sig = F.array(*[F.col(f"_h{i}") for i in range(num_hashes)])
    return agged.select(F.col(id_col), sig.alias("signature"))


def _lsh_banding(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    scope: CacheScope | None,
    max_block_hint: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared banding core: returns ``(persisted signatures,
    deduplicated candidate id pairs)`` — see :func:`lsh_candidate_ids`
    / :func:`lsh_candidate_pairs` for the public contracts."""
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join

    # Materialize signatures once: the banding explode and any join
    # branches would otherwise re-evaluate the full hash pipeline per
    # reference. (At warehouse scale: write signatures to a table and
    # band from there.)
    signatures = scoped_persist(signatures, scope)
    # The band-bucket self-join and the pair dedup shuffle IDS ONLY:
    # a 32×32-hex signature (~1 KB/row) riding the docs×bands explode
    # and two exchanges is pure shuffle fat. Persist the banded index
    # too: chunked_pair_join reads it three times (skew probe/counts +
    # both join sides), and each read would otherwise re-run the
    # banding md5 explode. docs × bands small rows.
    banded = scoped_persist(
        band_keys(
            signatures, id_col=id_col, bands=bands, rows_per_band=rows_per_band
        ),
        scope,
    )
    id_pairs = (
        chunked_pair_join(
            banded, ["band_key"], id_col, max_block_hint=max_block_hint
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return signatures, id_pairs


def lsh_candidate_ids(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
    scope: CacheScope | None = None,
    max_block_hint: int | None = None,
) -> DataFrame:
    """Deduplicated LSH candidate id pairs WITHOUT the estimated-
    Jaccard signature re-attach (round 17): consumers that verify
    candidates with exact Jaccard (``verified_neardup_pairs``) or only
    count them (``lsh_recall_probe``) discard ``est_jaccard``, but
    Catalyst cannot prune the two id→signature JOINS that compute it —
    only the projection — so the full form cost two needless joins of
    the candidate set against the signature frame in every verify
    plan. Same candidate set as :func:`lsh_candidate_pairs`, minus
    the estimate column.
    """
    return _lsh_banding(
        signatures, id_col, bands, rows_per_band, scope, max_block_hint
    )[1]


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
    scope: CacheScope | None = None,
    max_block_hint: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    Explodes to (band, band_key) — ``docs × bands`` small rows — and
    self-joins per bucket via :func:`capital.operators.skew.
    chunked_pair_join`: a hot bucket (boilerplate docs all sharing one
    band key) is cut into hash-chunks so no task owns more than
    ~``chunk_target²`` candidate comparisons — AQE's skew split bounds
    join *input* but not a self-join bucket's quadratic *output*.
    Estimated Jaccard = fraction of equal signature components.

    Persists two intermediates the returned plan references; pass a
    :class:`capital.operators.caching.CacheScope` to release them
    deterministically after consuming the result.

    ``max_block_hint``: a driver-known upper bound on the number of
    signatures (each doc contributes exactly one row per band, so a
    band bucket can never exceed the signature count) — forwarded to
    the chunked join so a caller that already counted its input skips
    the eager skew-probe job (round 17; the embedding-cosine
    ``total_rows_hint`` precedent).

    Signatures re-attach from the persisted frame after the ids-only
    dedup (the same trick verified_neardup_pairs uses for shingles);
    callers that do not need ``est_jaccard`` should use
    :func:`lsh_candidate_ids` and skip the two re-attach joins.
    """
    n = bands * rows_per_band
    signatures, id_pairs = _lsh_banding(
        signatures, id_col, bands, rows_per_band, scope, max_block_hint
    )
    pairs = id_pairs.join(
        signatures.select(
            F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a")
        ),
        "id_a",
    ).join(
        signatures.select(
            F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b")
        ),
        "id_b",
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(n)
    )
    return pairs.select(
        "id_a", "id_b", F.round(est, 6).alias("est_jaccard")
    )


def simhash_bits(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash near-dup signature as a ``bits``-char bit string.

    bit_j(doc) = 1 iff sum over distinct tokens of ±1 (sign = bit j of
    the token's md5) is positive. Bit j is read straight from md5 hex
    digit ``j // 4`` — no big-int conversion, so the computation is
    replicable in any SQL engine.

    Shape: explode distinct tokens → one groupBy(doc) with ``bits``
    conditional sums. One shuffle on doc id; vote expressions are
    integer ops inside codegen.
    """
    from capital.io import parallelize_narrow

    df = parallelize_narrow(df)
    toks = F.array_distinct(tokens(normalized(F.col(text_col))))
    exploded = df.select(
        F.col(id_col), F.explode(toks).alias("tok")
    ).withColumn("m", F.md5("tok"))
    digit = {
        p: F.instr(F.lit("0123456789abcdef"), F.substring("m", p + 1, 1)) - 1
        for p in range(bits // 4)
    }
    votes = []
    for j in range(bits):
        bit = F.shiftright(digit[j // 4], j % 4).bitwiseAND(F.lit(1))
        votes.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{j}")
        )
    summed = exploded.groupBy(id_col).agg(*votes)
    sim = F.concat(
        *[
            F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in reversed(range(bits))
        ]
    )
    return summed.select(F.col(id_col), sim.alias("simhash_bits"))


def signature_long(bits_col: Column) -> Column:
    """A ≤63-char bit string as a long (``conv(bits, 2, 10)``) — the
    packed form the pair joins carry: 8 bytes instead of a 32-char
    string, and pair hamming becomes :func:`hamming_packed`."""
    return F.conv(bits_col, 2, 10).cast("long")


def hamming_packed(a_long: Column, b_long: Column) -> Column:
    """Hamming distance via ``bit_count(a XOR b)`` on the packed
    signatures — two codegen'd integer ops per pair. The earlier
    ``size(filter(sequence(1, bits), lambda ...))`` bit-string form
    ran in Catalyst's *interpreted* higher-order path per candidate
    pair and was the fullrecall bottleneck at sf0.1 (23 s → 11.5 s
    with flat substr terms → ~7 s packed; same failure mode as the
    minhash transform+array_min rewrite)."""
    return F.bit_count(a_long.bitwiseXOR(b_long)).cast("int")


def simhash_neardup_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bits: int = 32,
    prefix_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs from SimHash signatures: block on the first
    ``prefix_bits`` (docs differing only in the suffix collide), then
    filter by exact Hamming distance. ``bits`` must be ≤ 63 — the
    packed-long hamming kernel (:func:`signature_long`) holds at most
    63 bits.

    One-table blocking is the cheap variant (recall misses pairs whose
    differing bits fall in the prefix); the full-recall construction
    repeats the join over rotated-prefix tables. The block self-join
    goes through :func:`capital.operators.skew.chunked_pair_join`, so a
    hot prefix block (near-identical boilerplate corpus) is chunked
    instead of landing its whole quadratic pair space on one task.
    """
    from capital.operators.skew import chunked_pair_join

    if bits > 63:
        raise ValueError(
            f"bits={bits} exceeds the 63-bit capacity of the packed-long "
            "hamming kernel (conv(bits,2,10) as a signed long); use ≤63 "
            "or split the signature into segments"
        )
    keyed = signatures.select(
        F.col(id_col),
        signature_long(F.col("simhash_bits")).alias("sigl"),
        F.substring("simhash_bits", 1, prefix_bits).alias("block"),
    )
    hamming = hamming_packed(F.col("sigl_a"), F.col("sigl_b"))
    # probe=False: short-prefix blocks on any self-similar corpus are
    # skewed BY CONSTRUCTION (that is what this operator exists for),
    # so the skew probe's extra pass over the signature lineage would
    # answer a question we already know.
    return (
        chunked_pair_join(
            keyed, ["block"], id_col, payload_cols=["sigl"], probe=False
        )
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_fullrecall_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Full-recall SimHash near-dup pairs via segment pigeonhole
    blocking (Manku/Jain/Sarma, "Detecting near-duplicates for web
    crawling", WWW 2007).

    Split the ``bits``-char signature into ``max_hamming + 1`` disjoint
    segments: a pair within ``max_hamming`` differing bits must agree
    *exactly* on at least one segment (pigeonhole), so blocking on
    every ``(segment index, segment bits)`` key and unioning the
    per-segment candidates misses nothing — unlike the single-prefix
    variant (:func:`simhash_neardup_pairs`), whose recall drops when
    differing bits land in the prefix. Cost: ``max_hamming + 1``
    blocking rows per doc instead of 1; each segment's self-join is
    skew-bounded through :func:`capital.operators.skew.
    chunked_pair_join`, and duplicates (pairs agreeing on several
    segments) collapse in one id-pair dedup before the Hamming filter.
    """
    from capital.operators.skew import chunked_pair_join

    segs = max_hamming + 1
    if bits % segs:
        raise ValueError(
            f"bits={bits} must divide into max_hamming+1={segs} segments"
        )
    if bits > 63:
        raise ValueError(
            f"bits={bits} exceeds the 63-bit capacity of the packed-long "
            "hamming kernel (conv(bits,2,10) as a signed long)"
        )
    seg_len = bits // segs
    # Candidates shuffle IDS ONLY: the banding explode and the pair
    # dedup would otherwise drag the signature strings through every
    # exchange; signatures re-attach from the (persisted) input after
    # the id-pair dedup — the lsh_candidate_pairs trick. (Round 5
    # negative result: carrying even the PACKED 8-byte signature
    # through the candidate dedup measured 1.5–3× worse than ids-only
    # dedup + two broadcast re-attach joins, whether the dedup ran
    # before or after the hamming filter — on a self-similar corpus
    # nearly every candidate passes the filter, so the dedup's input
    # multiset doesn't shrink and the wider aggregate rows dominate.)
    keyed = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.substring(
                            "simhash_bits", s * seg_len + 1, seg_len
                        ).alias("seg_bits"),
                    )
                    for s in range(segs)
                ]
            )
        ).alias("sb"),
    ).select(id_col, "sb.seg", "sb.seg_bits")
    # probe=False: pigeonhole segments are even shorter than the
    # prefix blocks — hot segments are the expected regime, and the
    # probe pass over the signature lineage is known-wasted here.
    cand = (
        chunked_pair_join(keyed, ["seg", "seg_bits"], id_col, probe=False)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    packed = signatures.select(
        F.col(id_col), signature_long(F.col("simhash_bits")).alias("sigl")
    )
    pairs = cand.join(
        packed.select(F.col(id_col).alias("id_a"), F.col("sigl").alias("sig_a")),
        "id_a",
    ).join(
        packed.select(F.col(id_col).alias("id_b"), F.col("sigl").alias("sig_b")),
        "id_b",
    )
    hamming = hamming_packed(F.col("sig_a"), F.col("sig_b"))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def verified_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    scope: CacheScope | None = None,
) -> DataFrame:
    """The complete near-dup pipeline: MinHash → LSH blocking → exact
    Jaccard verification on candidates only.

    This is the production shape at 100 TB: the quadratic exact-Jaccard
    step touches only LSH-candidate pairs (O(collisions)), never the
    full pair space. Returns (id_a, id_b, jaccard) for verified pairs.
    Pass a :class:`capital.operators.caching.CacheScope` to release the
    persisted signature/shingle intermediates after consuming.

    The corpus is tokenized + shingled exactly ONCE: the persisted
    shingle frame feeds both the MinHash signature aggregation and the
    exact-Jaccard verify (previously two independent full-corpus
    explodes).
    """
    from capital.io import parallelize_narrow
    from capital.operators.caching import scoped_persist

    sh = scoped_persist(
        parallelize_narrow(df).select(
            F.col(id_col).alias("__id"),
            shingles(F.col(text_col), shingle_k).alias("__sh"),
        ),
        scope,
    )
    sigs = minhash_signatures_from_shingles(
        sh.select(F.col("__id").alias(id_col), "__sh"),
        id_col=id_col,
        shingle_col="__sh",
        num_hashes=num_hashes,
    )
    # ids-only banding (round 17): the exact-Jaccard verify below
    # never reads est_jaccard, and its two signature re-attach joins
    # are not prunable by column pruning (joins survive projection).
    candidates = lsh_candidate_ids(
        sigs, id_col=id_col, bands=bands, rows_per_band=rows_per_band,
        scope=scope,
    )
    with_a = candidates.join(
        sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")),
        "id_a",
    )
    with_b = with_a.join(
        sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / F.greatest(union, F.lit(1))
    return (
        with_b.select(
            "id_a", "id_b", F.round(jac, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    scope: CacheScope | None = None,
    chunk_target: int = 1024,
    probe: bool = True,
    total_rows_hint: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs of ``df``.

    Quadratic in rows — apply only to a blocked/bounded candidate set
    (LSH buckets, a partition, or a sample). |A∩B| via
    array_intersect, |A∪B| = |A|+|B|−|A∩B|.

    Pair enumeration goes through
    :func:`capital.operators.skew.chunked_pair_join` under one
    constant block (round 11): a theta self-join (``a.id < b.id``)
    plans as a BroadcastNestedLoopJoin whose per-task pair space is
    unbounded in the input — fine for a 150-doc verification sample,
    a scale hazard the moment a caller hands in a fat frame (the
    round-10 recall-probe finding). Chunking bounds every task at
    ~``chunk_target²`` comparisons regardless of input size; output
    is identical (the chunked join's property-tested contract). Pass
    ``total_rows_hint`` when the caller already counted (plain join
    emitted with no probe job for small n), ``probe=False`` when the
    input is KNOWN to exceed the target (one constant block is always
    "skewed" — the probe's answer is pre-determined, so its eager
    count job is pure cost).
    """
    from capital.io import parallelize_narrow
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join

    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    # Materialize shingle sets once; both sides of the pair join reuse
    # them instead of re-shingling per pair.
    sh = scoped_persist(parallelize_narrow(sh), scope)
    pairs = chunked_pair_join(
        sh.withColumn("__blk", F.lit(0)),
        ["__blk"],
        id_col,
        payload_cols=["sh"],
        chunk_target=chunk_target,
        probe=probe,
        total_rows_hint=total_rows_hint,
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = inter / F.greatest(union, F.lit(1))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Exploded (id, band, band_key) LSH index rows for a signature
    frame — the *storable* form of the LSH index. Writing this to a
    band-partitioned (or band_key-bucketed) table is what makes dedup
    incremental: a new batch probes the stored index instead of
    re-banding the lake.

    The band index is hashed INTO the key (``md5(band || '|' ||
    components)``), so ``band_key`` alone is a complete join key: the
    candidate joins need one key column, and a ``band_key``-bucketed
    index table satisfies the join's distribution outright (a
    composite (band, band_key) join over a single-column bucketing
    makes the planner disable the bucketed scan). The ``band`` column
    remains for partitioned storage/pruning.
    """
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit(str(b)),
                                *[
                                    F.col("signature")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_key")


def incremental_neardup_flags(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    rows_per_band: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Incremental dedup: flag which *new-batch* docs near-collide with
    the historical corpus, touching only the stored LSH index — the
    production shape for a growing lake (dedup one day's crawl against
    100 TB of history without re-scanning the history).

    ``index`` carries (id, band, band_key) rows, e.g. a previous run's
    :func:`band_keys` output persisted as a band-partitioned table.
    The probe shuffles O(batch × bands) rows against the index's
    (band, band_key) — at scale the index is bucketed by band_key so
    the probe is a co-located join; history is never re-shingled.

    Returns one row per batch doc: ``(id, is_dup, n_index_hits,
    first_hit_id)`` — is_dup means "collides with history"; pairs
    inside the new batch are a separate (intra-batch) pass.
    """
    sigs = minhash_signatures(
        batch, id_col=id_col, text_col="text",
        num_hashes=num_hashes, shingle_k=shingle_k,
    )
    probe = band_keys(
        sigs, id_col=id_col, bands=bands, rows_per_band=rows_per_band
    )
    hits = (
        probe.join(
            index.select(F.col(id_col).alias("__hist_id"), "band_key"),
            ["band_key"],
        )
        .groupBy(id_col)
        .agg(
            F.countDistinct("__hist_id").alias("n_index_hits"),
            F.min("__hist_id").alias("first_hit_id"),
        )
    )
    # Left-join flags onto the raw batch ids, not sigs.select(id): the
    # latter would re-run the shingle explode + groupBy just to list
    # ids — a second full batch scan (signature ids == batch ids by
    # construction: explode_outer + groupBy preserves every input row).
    return (
        batch.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_index_hits").isNotNull().alias("is_dup"),
            F.coalesce("n_index_hits", F.lit(0)).alias("n_index_hits"),
            "first_hit_id",
        )
    )


def span_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 3,
    max_occurrences: int = 1,
) -> DataFrame:
    """Span-level exact dedup: segment each document into fixed
    ``span_tokens``-token windows, drop every span occurring more than
    ``max_occurrences`` times corpus-wide, and fingerprint the
    surviving per-document text — the bounded-window approximation of
    exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL 2022: repeated spans, not just
    repeated documents, degrade models; suffix arrays find *maximal*
    repeats, fixed windows find length-``span_tokens`` ones with pure
    DataFrame ops).

    Returns ``(id, n_spans, n_kept_spans, kept_md5)`` where
    ``kept_md5`` hashes the kept spans re-joined in document order —
    an atomic driver-friendly surrogate for the rebuilt text.

    Shape (round 13): narrow span explode → corpus-wide occurrence
    counts attached as a ``count() OVER (PARTITION BY span)`` window
    (high-cardinality partition key — no parallelism cap) → ONE
    per-doc aggregate computing totals, kept counts and the rebuilt
    digest together (``collect_list`` skips the nulls the keep-filter
    leaves, bounded by document length). Two exchanges total; the
    previous groupBy-count + join-back + separate totals pass
    consumed the span frame three times through five exchanges —
    measured 1.38 → 0.77 s at sf0.1, output-identical.

    Regime note: the span-partition window colocates each span's
    occurrences in one task. Stride-k spans bound the damage (a doc
    contributes n/k spans, and a mega-boilerplate span at lake scale
    is exactly what ``max_occurrences`` drops) — if a corpus carries
    a span hot enough to bottleneck one task, flag the sparse
    DROPPED set via groupBy + broadcast left-join instead (A/B'd:
    1.32 s here vs 0.78 — the partial-agg + broadcast job only pays
    off once the hot span is real).
    """
    from capital.io import parallelize_narrow

    k = span_tokens
    toks = tokens(normalized(F.col(text_col)))
    n_spans_arr = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
    spans_arr = F.transform(
        F.sequence(F.lit(0), n_spans_arr - F.lit(1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", F.slice(toks, i * F.lit(k) + F.lit(1), F.lit(k))
            ).alias("span"),
        ),
    )
    spans = (
        parallelize_narrow(df)
        .select(F.col(id_col), F.explode(spans_arr).alias("s"))
        .select(id_col, "s.pos", "s.span")
    )
    flagged = spans.withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy("span"))
    )
    keep = F.col("__cnt") <= max_occurrences
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(keep, F.lit(1))).alias("n_kept_spans"),
        # collect_list skips the nulls the keep-filter leaves; an
        # all-dropped doc joins to "" — md5("") like before.
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "span")))
                    ),
                    lambda x: x["span"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    ).select(F.col(id_col), "n_spans", "n_kept_spans", "kept_md5")


def jaccard_fullrecall_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold over the FULL corpus with
    ZERO false negatives and no all-pairs join — prefix filtering
    (Chaudhuri et al. 2006; Xiao et al., PPJoin, 2008), the
    set-similarity member of the engine's full-recall tier next to
    FastSS deletion neighborhoods (edit distance) and pigeonhole
    segments (hamming).

    Principle: order every shingle by a GLOBAL total order
    (document-frequency ascending, then lexicographic — rare-first
    minimizes candidates); if ``J(A,B) ≥ τ`` then
    ``|A∩B| ≥ ⌈τ·max(|A|,|B|)⌉``, and two sets with overlap ≥ α must
    share an element within their first ``|s|−α+1`` elements — so
    every qualifying pair collides on at least one token of both
    prefixes of length ``pₛ = |s| − ⌈τ·|s|⌉ + 1``. Candidates =
    prefix-token collisions (skew-bounded via ``chunked_pair_join``
    — a boilerplate-shared shingle cannot blow up one task), then the
    exact Jaccard verify; output ≡ :func:`jaccard_pairs` on the same
    input, minus its quadratic join.

    The prefix length uses EXACT integer arithmetic
    (``⌈τ|s|⌉ = (num·|s| + den − 1) div den`` with τ as a fraction):
    a float ceil that lands one too high would silently shorten the
    prefix and break the zero-false-negative guarantee.

    Shuffle account: shingle explode (narrow) → 1 small groupBy on
    shingles (doc frequencies) → 1 window on doc id (prefix rank) →
    the chunked candidate join on prefix tokens → 2 id joins for the
    verify. Candidate volume is the prefix-collision count — for
    rare-first ordering, orders of magnitude under n²/2 — further cut
    by the PPJoin length filter (τ·max(|A|,|B|) ≤ min(|A|,|B|),
    exact integers) before the dedup shuffle and verify joins.
    """
    from fractions import Fraction

    from capital.io import parallelize_narrow
    from capital.operators.caching import scoped_persist
    from capital.operators.skew import chunked_pair_join

    fr = Fraction(threshold).limit_denominator(1_000_000)
    num, den = fr.numerator, fr.denominator

    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    sh = scoped_persist(parallelize_narrow(sh), scope)

    # The prefix machinery runs on 8-byte xxhash64 keys, not the
    # 3-gram strings (round 9): the df groupBy, the per-doc window
    # and the candidate join all shuffle docs×shingles rows, and the
    # key is most of the row. Correctness is hash-robust, not
    # collision-free-by-assumption: ANY global total order satisfies
    # the prefix lemma, and (df(h), h, shingle) IS one; the
    # implementation's row_number breaks (df, h) ties arbitrarily,
    # but tied rows share the same h, so the prefix HASH SET — the
    # only thing the candidate join sees — is identical to the
    # canonical order's. A collision can only merge two shingles
    # into one join key (extra candidates, killed by the exact
    # verify), never hide a qualifying pair.
    tok = sh.select(
        F.col(id_col),
        F.explode("sh").alias("__s"),
        F.size("sh").alias("__sz"),
    ).select(
        F.col(id_col), F.xxhash64("__s").alias("__h"), "__sz"
    )
    dfreq = tok.groupBy("__h").agg(F.count(F.lit(1)).alias("__dfc"))
    w = Window.partitionBy(id_col).orderBy("__dfc", "__h")
    # exact ceil(τ·sz) in integers; prefix p = sz − ceil + 1
    ceil_tau_sz = F.floor(
        (F.lit(num) * F.col("__sz") + F.lit(den - 1)) / F.lit(den)
    )
    prefix = (
        tok.join(dfreq, "__h")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__sz") - ceil_tau_sz + 1)
        .select(F.col(id_col), "__h", "__sz")
    )
    # Persist before the chunked join's eager skew probe (its first
    # pass would otherwise re-run the explode+freq-join+window).
    prefix = scoped_persist(prefix, scope)
    # PPJoin length filter (round 9): J(A,B) ≥ τ forces
    # τ·max(|A|,|B|) ≤ min(|A|,|B|) — J ≤ min/max always — so a
    # size-mismatched prefix collision can be dropped BEFORE the
    # candidate dedup shuffle and the shingle-array verify joins.
    # Exact integer form (den·min ≥ num·max): no float ceil to erode
    # the zero-false-negative guarantee. __sz rides the chunked join
    # as a 1-int payload per side — unlike the round-5/6 negative
    # payload-carry results this does not REPLACE the ids-only dedup,
    # it shrinks the dedup's input.
    cand = (
        chunked_pair_join(prefix, ["__h"], id_col, payload_cols=["__sz"])
        .filter(
            F.lit(den) * F.least("__sz_a", "__sz_b")
            >= F.lit(num) * F.greatest("__sz_a", "__sz_b")
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("__sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("__shb"))
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size("__sha") + F.size("__shb") - inter
    jac = inter / F.greatest(union, F.lit(1))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _island_stats(dup_pos: DataFrame, id_col: str, window_len: int) -> DataFrame:
    """Merge duplicated window POSITIONS into maximal spans and reduce
    to per-document stats — the shared tail of the substring-dedup
    family. Positions whose gap exceeds ``window_len`` start a new
    island (coverage would break); island token length is exactly
    ``max_pos − min_pos + window_len``. One window partitioned by doc
    (bounded by doc length) + two map-side-combinable aggregates."""
    L = int(window_len)
    w = Window.partitionBy(id_col).orderBy("__pos")
    islands = (
        dup_pos.withColumn(
            "__new",
            F.when(
                F.col("__pos") - F.lag("__pos").over(w) > L, 1
            ).otherwise(F.when(F.lag("__pos").over(w).isNull(), 1).otherwise(0)),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "__island")
        .agg(
            F.count(F.lit(1)).alias("__wins"),
            (
                F.max("__pos") - F.min("__pos") + F.lit(L)
            ).alias("__span_len"),
        )
    )
    return islands.groupBy(id_col).agg(
        F.sum("__wins").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("__span_len").alias("dup_tokens"),
    )


def _token_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The tokenized narrow frame ``(id, __toks)``, MATERIALIZED via
    ``localCheckpoint`` before any window-building expression touches
    it (round 12): Catalyst's projection collapse inlines the regex
    tokenization into every slice child of the ``arrays_zip`` window
    build (plus the width/size terms — ~17 evaluations per row), and
    the generator path has no subexpression elimination, so the sf0.1
    stride-1 window explode measured 8.1 s of which ~7 s was repeated
    tokenization; against the checkpointed leaf the same explode is
    0.6 s. At lake scale this is one narrow executor-local
    materialization of (id, tokens) — strictly cheaper than
    re-running the tokenizer L+2 times per row inside the explode.
    LAZY since round 13: the barrier works identically at plan-build
    time (the checkpoint node truncates the logical plan before any
    optimizer pass), but eager=True paid a separate sequential
    materialization job per caller — 1.92 → 1.44 s on
    dedup_substring_spans, 1.79 → 1.61 s on the multiscale ladder.
    Callers stay ``memoize=False`` (the checkpoint still pins a
    specific materialization)."""
    from capital.io import parallelize_narrow

    return parallelize_narrow(df).select(
        F.col(id_col), tokens(normalized(F.col(text_col))).alias("__toks")
    ).localCheckpoint(eager=False)


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    min_occurrences: int = 2,
    broadcast_dups: bool = True,
    hash_keyed_count: bool = False,
) -> DataFrame:
    """MAXIMAL duplicated token spans per document — the rolling
    (stride-1) member of the exact-substring dedup family (Lee et
    al., ACL 2022: suffix arrays find maximal repeats; a duplicated
    substring of ≥ ``window_tokens`` tokens appears as a RUN of
    consecutive duplicated windows, so merging adjacent duplicated
    positions reconstructs the maximal spans at window resolution).
    Complements :func:`span_dedup_stats` (tiled windows, which miss
    repeats straddling tile boundaries) and the CDC chunk tier
    (shift-robust, but chunk-granular).

    Returns one row per document:
    ``(id, n_tokens, n_dup_windows, n_dup_spans, dup_tokens,
    dup_frac)`` where ``dup_tokens`` is the union length of the
    merged spans and ``dup_frac`` its share of the document — the
    gate signal (Lee et al. drop or trim docs past a threshold).

    Shape at scale: stride-1 window explode (n rows per doc — the
    same order as every shingle pipeline here) → ONE corpus-wide
    count aggregate (map-side combined, boilerplate windows collapse
    per partition before the exchange) → join back filtered to
    duplicated windows only (hot windows never fan out: the filter
    precedes the join) → per-doc sort-free island merge (one window
    function partitioned by doc, bounded by doc length). Positions
    whose gap exceeds ``window_tokens`` start a new island; a gap
    ≤ ``window_tokens`` keeps coverage contiguous, so island length
    is exactly ``max_pos − min_pos + window_tokens``.
    """
    from capital.llm.text import round6_stable

    L = window_tokens
    tk = _token_frame(df, id_col, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    width = F.greatest(n - F.lit(L - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(L)]
    )
    base = tk.select(F.col(id_col), n.alias("__n"), z.alias("__z"))
    wins = base.select(
        F.col(id_col),
        "__n",
        F.posexplode("__z").alias("__pos0", "__s"),
    ).select(
        F.col(id_col),
        "__n",
        (F.col("__pos0") + 1).alias("__pos"),
        F.concat_ws(
            " ", *[F.col(f"__s.t{i}") for i in range(L)]
        ).alias("__gram"),
    )
    # The duplicated-gram set (cnt ≥ min) is sparse by nature
    # (boilerplate + verbatim reuse), so BROADCAST it: the probe side
    # never shuffles, and the count stays map-side combined —
    # skew-immune on both legs (a count window over the gram
    # partition measured slightly faster here but colocates a hot
    # boilerplate gram into one task; this shape doesn't). The set is
    # CORPUS-DERIVED, so the hint is a regime switch, not a law: pass
    # ``broadcast_dups=False`` when a lake's dup-gram set outgrows a
    # broadcast and the plain shuffle join (AQE-skew-split) takes
    # over. 1.35 → 1.20 s at sf0.1 with the hint.
    if hash_keyed_count:
        # Round-15 experiment (the round-9 xxhash64-join-key trick,
        # adapted for exactness): the corpus-wide count groups on
        # 8-byte ``xxhash64(gram)`` longs instead of gram strings, so
        # the big exchange ships (long, count) partials. Hash-count ≥
        # min is a SUPERSET of true dups (collisions only merge
        # counts upward), so candidate rows are filtered by hash and
        # then RECOUNTED exactly by gram — a true dup gram's rows all
        # survive the prefilter (its own count already clears min),
        # so the residual count equals the global count and the
        # output is byte-identical to the string-keyed form
        # (property-tested). MEASURED REJECTED as the default
        # (round 15, idle min-of-2 after warmup): 3.06 vs 2.10 s at
        # 1x sf0.1, 4.40 vs 3.74 at 10x, 8.47 vs 8.68 at 30x — the
        # extra candidate barrier + sparse recount stages cost more
        # than the long-key shuffle saves until ~30x, where they
        # wash. The flag stays for the true-lake regime (shuffle-
        # byte-bound, where an 8-byte key vs a ~45-byte gram string
        # is the dominant term and two extra sparse stages are
        # noise). With map-side combine the exchange carries one row
        # per (partition, distinct gram) either way.
        winh = wins.withColumn("__gh", F.xxhash64("__gram"))
        hcounts = winh.groupBy("__gh").agg(
            F.count(F.lit(1)).alias("__hcnt")
        )
        cand_h = hcounts.filter(
            F.col("__hcnt") >= min_occurrences
        ).select("__gh")
        cand = winh.join(
            F.broadcast(cand_h) if broadcast_dups else cand_h, "__gh"
        ).select(F.col(id_col), "__pos", "__gram")
        # sparse (dup positions + hash-collision noise): barrier it —
        # consumed by the exact recount AND the join-back.
        cand = cand.localCheckpoint(eager=False)
        gcounts = cand.groupBy("__gram").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        dup_grams = gcounts.filter(
            F.col("__cnt") >= min_occurrences
        ).select("__gram")
        dup_pos = cand.join(
            F.broadcast(dup_grams) if broadcast_dups else dup_grams,
            "__gram",
        ).select(F.col(id_col), "__pos")
    else:
        counts = wins.groupBy("__gram").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        dup_grams = counts.filter(
            F.col("__cnt") >= min_occurrences
        ).select("__gram")
        dup_pos = wins.join(
            F.broadcast(dup_grams) if broadcast_dups else dup_grams,
            "__gram",
        ).select(F.col(id_col), "__pos")
    per_doc = _island_stats(dup_pos, id_col, L)
    return (
        tk.select(F.col(id_col), n.alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            round6_stable(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1))
            ).alias("dup_frac"),
        )
    )


def self_repetition_trim(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 3,
) -> DataFrame:
    """INTRA-document repetition trim: drop every token covered by a
    stride-1 ``window_tokens``-gram whose gram already occurred
    EARLIER in the same document, keeping each gram's first
    occurrence — the self-dedup pass that cleans degenerate
    model-generated text and within-page boilerplate loops, where the
    corpus-wide substring tiers (:func:`substring_dup_spans`,
    cross-document by construction) see nothing unless another doc
    shares the repeat. "aaa bb aaa bb aaa bb" trims to one period.

    One row per document: ``(id, n_tokens, n_repeat_windows,
    n_removed_tokens, clean_md5)`` — clean_md5 the digest of the
    surviving tokens joined by single spaces, the
    :func:`~capital.llm.assemble.decontaminate_spans` atomic-surrogate
    convention (drop the md5 from the aggregate to rebuild the text).
    A repeat window at position p covers tokens ``[p, p+L)``; covered
    unions may overlap the first occurrence (adjacent self-overlap:
    "a a a" at L=2 keeps exactly one token) — deliberate, matching
    the span-removal posture.

    Shape at scale (round 13): everything here is PER-DOCUMENT, so
    the right plan is a single shuffle-free narrow pass — one
    Arrow-batched ``mapInPandas`` kernel doing the O(doc_len) dict
    walk per document. The previous all-DataFrame form expressed the
    same per-doc logic through FOUR corpus-sized exchanges (gram
    first-occurrence agg, covered-position distinct, anti-join,
    rebuild agg) plus an eager token-frame checkpoint — measured
    1.84 s vs 0.37 s at sf0.1, and at 100 TB those exchanges are
    pure waste (nothing crosses a document boundary). Tokenization
    uses :func:`capital.llm.text.py_tokens`, the asserted driver/
    kernel twin of ``tokens(normalized(.))``; output is byte-
    identical to the DataFrame form (A/B'd) and the SQL oracle is
    unchanged.
    """
    import pandas as pd  # noqa: F401 — kernel-local batches

    from capital.io import parallelize_narrow
    from capital.llm.text import py_tokens

    L = int(window_tokens)

    def _trim(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {
                "__id": [], "n_tokens": [], "n_repeat_windows": [],
                "n_removed_tokens": [], "clean_md5": [],
            }
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    # NULL text must neither kill the stage nor
                    # masquerade as the [""] empty-string row: the
                    # SQL oracle's token array is NULL, so counts are
                    # NULL with 0 repeat windows and the md5('')
                    # digest (round-14 review).
                    out["__id"].append(did)
                    out["n_tokens"].append(None)
                    out["n_repeat_windows"].append(0)
                    out["n_removed_tokens"].append(None)
                    out["clean_md5"].append(
                        hashlib.md5(b"").hexdigest()
                    )
                    continue
                toks = py_tokens(text)
                n = len(toks)
                seen: dict[tuple, int] = {}
                covered: set[int] = set()
                n_rep = 0
                for p in range(n - L + 1):
                    g = tuple(toks[p : p + L])
                    if g in seen:
                        n_rep += 1
                        covered.update(range(p, p + L))
                    else:
                        seen[g] = p
                kept = [t for i, t in enumerate(toks) if i not in covered]
                out["__id"].append(did)
                out["n_tokens"].append(n)
                out["n_repeat_windows"].append(n_rep)
                out["n_removed_tokens"].append(n - len(kept))
                out["clean_md5"].append(
                    hashlib.md5(" ".join(kept).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(out).astype(
                {
                    "n_tokens": "Int32",
                    "n_repeat_windows": "int64",
                    "n_removed_tokens": "Int64",
                }
            ).rename(columns={"__id": id_col})

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # The id column keeps its INPUT type (the old DataFrame form was
    # generic over it; a hardcoded `long` would Arrow-cast or fail on
    # string keys — round-14 review).
    out_schema = StructType(
        [df.schema[id_col]]
        + [
            StructField("n_tokens", IntegerType()),
            StructField("n_repeat_windows", LongType()),
            StructField("n_removed_tokens", LongType()),
            StructField("clean_md5", StringType()),
        ]
    )
    return parallelize_narrow(df.select(id_col, text_col)).mapInPandas(
        _trim, schema=out_schema
    )


def substring_dup_multiscale(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_window: int = 8,
    levels: int = 4,
    min_occurrences: int = 2,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Duplicated-substring profile at MULTIPLE scales — finishes the
    Lee et al. 2022 claim beyond :func:`substring_dup_spans`' fixed
    window: one row per (document, window length) for window lengths
    ``base_window · 2^0 … 2^{levels−1}`` (default 8/16/32/64 tokens),
    each with the doc's duplicated-window count, merged maximal-span
    stats and duplicated-token fraction at that scale. Reading the
    profile separates short boilerplate (dup_frac high at 8, zero at
    64) from long verbatim plagiarism/mirrors (high at every scale) —
    the distinction a single L cannot make, and the basis for
    length-thresholded trimming at any ``threshold ≥ base_window``.

    Scale shape (round 13 — the corpus is scanned ONCE and the whole
    ladder rides ONE per-doc window chain):

    1. one stride-1 window explode builds the base level's positions
       with the md5 of each ``base_window``-gram (the proven
       substring_dup_spans shape);
    2. every doubling composes ``h_{2L}(pos) = md5(h_L(pos) ||
       h_L(pos+L))`` via ``lead(h, L)`` — and all the leads share one
       ``(doc, pos)`` window spec, so Catalyst runs the ENTIRE Merkle
       ladder as one exchange + one sort with stacked Window nodes
       (positions are dense, so row-lead == position-lead). Nulls
       propagate validity for free: ``concat``/``md5`` of a null
       lead are null, which is exactly "no window of length 2L starts
       here" — no per-level filters;
    3. the levels then UNION via a single struct explode to
       ``(id, pos, window_tokens, h)`` rows (persisted — consumed by
       the count and the join-back), and ALL levels share ONE
       corpus-wide ``(window_tokens, h)`` count (map-side combined),
       ONE duplicated-hash join-back, and ONE island merge windowed
       by ``(doc, window_tokens)`` with the per-level gap read off
       the ``window_tokens`` column.

    The previous one-groupBy-join-island-pass-PER-LEVEL form shuffled
    the same total rows through 4× the exchanges and paid ~16 local
    stage floors — measured 4.79 → 1.80 s at sf0.1,
    output-identical. At 100 TB the exchanges carry (hash, count)
    partials and (id, pos, level) dup positions only; level widths
    shrink as L grows (width_L = n − L + 1), so the unioned frame is
    < levels× the base volume.
    """
    from capital.llm.text import round6_stable
    from capital.operators.caching import scoped_persist

    L0 = int(base_window)
    tk = _token_frame(df, id_col, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    width = F.greatest(n - F.lit(L0 - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(L0)]
    )
    base = (
        tk.select(F.col(id_col), z.alias("__z"))
        .select(F.col(id_col), F.posexplode("__z").alias("__pos0", "__s"))
        .select(
            F.col(id_col),
            (F.col("__pos0") + 1).alias("__pos"),
            F.md5(
                F.concat_ws(" ", *[F.col(f"__s.t{i}") for i in range(L0)])
            ).alias("__h0"),
        )
    )
    wdoc = Window.partitionBy(id_col).orderBy("__pos")
    ladder = base
    hs = ["__h0"]
    L = L0
    for i in range(1, int(levels)):
        prev = hs[-1]
        ladder = ladder.withColumn(
            f"__h{i}",
            F.md5(F.concat(F.col(prev), F.lead(prev, L).over(wdoc))),
        )
        L *= 2
        hs.append(f"__h{i}")
    lvl = (
        ladder.select(
            F.col(id_col),
            "__pos",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(L0 * 2 ** i).alias("window_tokens"),
                            F.col(h).alias("__h"),
                        )
                        for i, h in enumerate(hs)
                    ]
                )
            ).alias("__lh"),
        )
        .select(F.col(id_col), "__pos", "__lh.window_tokens", "__lh.__h")
        .filter(F.col("__h").isNotNull())
    )
    # Barrier the unioned level frame (consumed by the count AND the
    # join-back). Default is localCheckpoint rather than persist: the
    # InMemoryRelation displaces the partial-agg/exchange-reuse shape
    # (the round-5 pattern — measured 2.6 vs 2.1 s here); an explicit
    # CacheScope still wins when the caller manages lifecycles across
    # several operators.
    lvl = (
        scoped_persist(lvl, scope)
        if scope is not None
        else lvl.localCheckpoint(eager=False)
    )
    counts = lvl.groupBy("window_tokens", "__h").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    dup_pos = lvl.join(
        counts.filter(F.col("__cnt") >= min_occurrences),
        ["window_tokens", "__h"],
    ).select(F.col(id_col), "window_tokens", "__pos")
    wl = Window.partitionBy(id_col, "window_tokens").orderBy("__pos")
    gap = F.col("window_tokens")
    islands = (
        dup_pos.withColumn(
            "__new",
            F.when(F.col("__pos") - F.lag("__pos").over(wl) > gap, 1)
            .otherwise(
                F.when(F.lag("__pos").over(wl).isNull(), 1).otherwise(0)
            ),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "window_tokens", "__island")
        .agg(
            F.count(F.lit(1)).alias("__wins"),
            (
                F.max("__pos") - F.min("__pos") + F.col("window_tokens")
            ).alias("__span_len"),
        )
    )
    per = islands.groupBy(id_col, "window_tokens").agg(
        F.sum("__wins").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("__span_len").alias("dup_tokens"),
    )
    # Levels fan out via a literal-array explode (narrow — a 4-row
    # crossJoin would plan as a Cross BNLJ the plan audits ban).
    spine = tk.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.explode(
            F.array(*[F.lit(L0 * 2 ** i) for i in range(int(levels))])
        ).alias("window_tokens"),
    )
    return spine.join(per, [id_col, "window_tokens"], "left").select(
        F.col(id_col),
        "window_tokens",
        "n_tokens",
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        round6_stable(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest("n_tokens", F.lit(1))
        ).alias("dup_frac"),
    )


def lsh_recall_probe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_frac: float = 0.3,
    seed: str = "lshprobe",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    scope: CacheScope | None = None,
    max_sample_docs: int | None = 20_000,
    truth_chunk_target: int = 256,
) -> DataFrame:
    """Candidate-recall monitor for a PRODUCTION LSH configuration
    (round 10): "what recall is my banding actually achieving on my
    corpus?" — the operational twin of the analytic 1−(1−s^r)^b
    curve, which assumes uniform similarity and says nothing about a
    real corpus's boilerplate/near-dup structure.

    Method: a deterministic md5-fraction sample of documents gets an
    EXACT ground truth (all-pairs Jaccard within the bounded sample —
    :func:`jaccard_pairs`), the production banding CONFIGURATION is
    applied to the sample, and the resulting candidate pairs are
    compared to the truth. (Round 17: banding the sample gives the
    same in-sample candidate set as banding the full corpus and
    restricting — band collision of (a, b) depends only on a's and
    b's own signatures — so the full-corpus pass the probe previously
    ran was discarded work; the report is bit-identical.) One row
    out: sample size, truth pairs, in-sample candidate pairs, hits,
    and candidate recall (null when the sample holds no true pair —
    never NaN, the ks_terms rule).

    Scale (round 11): the truth side is BOUNDED twice. (1)
    ``max_sample_docs`` caps the sample in ROWS, not fraction — one
    cheap count of the (persisted) sampled frame, and when it
    overshoots the md5-fraction threshold is tightened to
    ``sample_frac · max_sample_docs / n`` (the ``total_rows_hint``
    precedent: derive a plan decision from a count the caller pays
    once) — a deterministic subset of the original sample, so a
    careless ``sample_frac=0.3`` against a 100 TB lake probes ~20k
    docs, not 30 TB. (2) Truth pairs are enumerated through
    :func:`chunked_pair_join` (via :func:`jaccard_pairs`
    ``probe=False`` — a constant block is known-degenerate, the
    probe's count job would re-answer the cap's count), so even a fat
    sample is ≤ ``truth_chunk_target²`` comparisons per task, spread
    over ~(n/target)²/2 tasks instead of one BNLJ task group. The
    production side is the usual O(docs × bands) band-key shuffle.
    Periodic probes of a growing lake catch banding drift (e.g.
    shingle distribution shifts pushing true pairs below the
    collision curve) before a dedup run silently under-recalls.
    """
    from capital.llm.assemble import hash_fraction
    from capital.llm.text import round6_stable
    from capital.operators.caching import scoped_persist

    # Count the UNPERSISTED sample first (count() prunes the plan to
    # the id hash — cheap), so the oversized frame the row cap exists
    # to avoid is never materialized into cache, and nothing needs
    # unpersisting when the cap tightens the fraction (round-11
    # advice). Only the final (capped) sample is persisted — it is
    # the frame consumed 3× below (truth pairs, semi-joins, report).
    eff_frac = sample_frac
    n_sample = df.filter(
        hash_fraction(F.col(id_col), seed) < sample_frac
    ).count()
    if max_sample_docs is not None and n_sample > max_sample_docs:
        eff_frac = sample_frac * (float(max_sample_docs) / float(n_sample))
    sampled = scoped_persist(
        df.filter(hash_fraction(F.col(id_col), seed) < eff_frac), scope
    )
    truth = scoped_persist(
        jaccard_pairs(
            sampled,
            id_col=id_col,
            text_col=text_col,
            shingle_k=shingle_k,
            threshold=threshold,
            scope=scope,
            chunk_target=truth_chunk_target,
            probe=False,
        ).select("id_a", "id_b"),
        scope,
    )
    # The banding side runs over the SAMPLE, not the full corpus
    # (round 17, guide §1.2 "don't compute things you throw away"):
    # LSH candidacy is a PAIRWISE property — (a, b) collide iff their
    # own band slices are equal, independent of every other document
    # in the bucket — so the full-corpus candidate set restricted to
    # sample×sample is exactly the candidate set of the sample alone.
    # The full-corpus signature/banding pipeline (the probe's single
    # fattest job) and the two restriction semi-joins were computing
    # pairs the report then discarded. The probed CONFIGURATION is
    # unchanged; the measured recall is bit-identical (oracle-pinned).
    sigs = minhash_signatures(
        sampled, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_k=shingle_k,
    )
    # n_sample bounds the capped sample (the tightened fraction keeps
    # a subset of the counted sample), and each doc contributes one
    # row per band — so no band bucket can exceed n_sample: the
    # already-paid count skips the banding-side skew-probe job when
    # the bound is plain-join-safe (round 17, total_rows_hint
    # precedent; at lake scale the bound exceeds the safe threshold
    # and the probe runs as before).
    cands = lsh_candidate_ids(
        sigs, id_col=id_col, bands=bands, rows_per_band=rows_per_band,
        scope=scope, max_block_hint=n_sample,
    )
    in_sample = scoped_persist(cands, scope)
    hits = truth.join(in_sample, ["id_a", "id_b"], "left_semi")
    report = (
        sampled.agg(F.count(F.lit(1)).alias("n_sample_docs"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_truth_pairs")))
        .crossJoin(
            in_sample.agg(F.count(F.lit(1)).alias("n_candidate_pairs"))
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
    )
    return report.select(
        "n_sample_docs",
        "n_truth_pairs",
        "n_candidate_pairs",
        "n_hits",
        F.when(
            F.col("n_truth_pairs") > 0,
            round6_stable(F.col("n_hits") / F.col("n_truth_pairs")),
        ).alias("recall"),
    )
