"""Physical-plan audits: the properties that make queries survive a
100× scale-up (SURVEY.md §4). Catches regressions like a lost filter
pushdown or a broadcast join degrading to sort-merge."""

from __future__ import annotations

import contextlib
import io

import pytest

from capital.queries import all_queries

_QUERIES = all_queries()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(_QUERIES["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    # At least the range predicates on l_shipdate/l_discount push down.
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "IsNotNull(l_discount)" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(_QUERIES["p1_project_cast"](spark, sf_dir))
    # ReadSchema must carry only the projected columns, not all 11.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema
    assert "l_extendedprice" not in read_schema
    assert "l_tax" not in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_region_revenue",
                 "j4_dim_fanout_revenue", "j5_registry_lookup"):
        plan = plan_of(_QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        # Never a cartesian/nested-loop for these equi-joins.
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(_QUERIES["o2_topk_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # No global Exchange rangepartitioning for a limit-k.
    assert "rangepartitioning" not in plan.lower()


def test_q1_has_partial_aggregation(spark, sf_dir):
    df = _QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # Two-phase hash aggregate: map-side partial + final after shuffle.
    assert plan.count("HashAggregate") >= 2
    # Whole-stage codegen covers the scan→partial-agg pipeline
    # (simple-mode explain marks codegen stages with '*(n)'; AQE only
    # shows them once the plan is final, so execute first).
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "*(" in buf.getvalue()


def test_semi_and_anti_joins_stay_joins(spark, sf_dir):
    plan = plan_of(_QUERIES["j3_anti_join_missing"](spark, sf_dir))
    assert "LeftAnti" in plan
    plan = plan_of(_QUERIES["j2_semi_join_open_days"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_asof_join_single_shuffle_no_explosion(spark, sf_dir):
    """The union+window as-of join must shuffle once per side on the
    key and never produce a join explosion (no CartesianProduct, no
    row-multiplying equi-join before the window)."""
    plan = plan_of(_QUERIES["j1_asof_latest_order"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_no_python_udfs_in_relational_surface(spark, sf_dir):
    """Everything except the explicitly-Pandas multimodal stage must
    stay JVM-side (no BatchEvalPython / ArrowEvalPython in plans)."""
    explicitly_python = {
        "mm_decode_stub",
        "ud2_pandas_udf_tokens",
        "ud3_group_apply_rank",
        # PQ encode/ADC tables are deliberate Arrow kernels: the
        # expression forms exceed janino's method limit and fall back
        # to interpreted (see llm/pq.py); pair SCORING stays codegen.
        "sim_pq_topk",
        "sim_pq_topk_pinned",
        "sim_ivfpq_stored_fullprobe",
        # The unigram apply-pass runs the per-DISTINCT-WORD Viterbi DP
        # as an Arrow pandas_udf over the vocabulary-sized word table
        # (capital/llm/unigram.py _apply_frames) — bounded closure
        # state, never corpus-sized; the corpus side joins the result
        # JVM-side (broadcast).
        "llm_unigram_fertility",
        "llm_unigram_apply_oov",  # same Arrow per-word Viterbi pass
    }
    for name, fn in _QUERIES.items():
        if name in explicitly_python:
            continue
        plan = plan_of(fn(spark, sf_dir))
        assert "EvalPython" not in plan, name


def test_tpc_extended_join_strategy(spark, sf_dir):
    """Q7/Q8/Q14/Q19: every dim side must broadcast; the only
    sort-merge-eligible shuffle is fact↔fact on orderkey."""
    for name in ("q7_volume_shipping", "q8_market_share",
                 "q14_promo_revenue", "q19_discounted_revenue"):
        plan = plan_of(_QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q18_topk_and_semi_join(spark, sf_dir):
    plan = plan_of(_QUERIES["q18_large_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan


def test_q22_anti_join_not_nested_loop(spark, sf_dir):
    plan = plan_of(_QUERIES["q22_global_sales_opportunity"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The 100 TB training side must never shuffle for the shingle
    join: the benchmark shingle set broadcasts, and the split filter
    pushes to the scan."""
    plan = plan_of(_QUERIES["asm_contamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_assembly_ops_are_narrow_scans(spark, sf_dir):
    """Mixing and splitting are pure per-row maps: no Exchange may
    appear in their plans (any shuffle at 100 TB would be a bug)."""
    for name in ("asm_mixture_sample", "asm_split_assign"):
        plan = plan_of(_QUERIES[name](spark, sf_dir))
        assert "Exchange" not in plan, name


def test_new_tpc_shapes_join_strategy(spark, sf_dir):
    """Q17's part set and Q21's supplier dim must broadcast; Q21's
    EXISTS/NOT-EXISTS must decorrelate to semi/anti hash joins, never
    a nested loop over lineitem."""
    plan = plan_of(_QUERIES["q17_small_quantity_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    plan = plan_of(_QUERIES["q21_returns_sole_blame"](spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_band_shuffle_carries_ids_only(spark, sf_dir):
    """The band-bucket self-join and the pair dedup must exchange id
    rows only — a 32x32-hex signature riding the docs x bands explode
    is shuffle fat at 100 TB. Signatures re-attach after dedup (those
    later exchanges partition on a single id and may carry them).

    Since the skew probe landed, unskewed fixtures take the plain
    single-bucket join and AQE broadcasts the small sides — the band
    movement is a BroadcastExchange (still ids-only, still checked
    here) and the pair dedup can ride the signature aggregation's
    doc_id partitioning with no exchange at all. The chunked scale
    path's shuffle shape is pinned separately below on a skewed
    fixture with ``probe=False``."""
    # Cached frames left by earlier tests swap scan nodes for
    # InMemoryTableScan and can collapse the band exchange into a
    # differently-shaped block; pin the cold plan.
    spark.catalog.clearCache()
    plan = plan_of(_QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    checked = 0
    for block in plan.split("\n\n"):
        s = block.strip()
        if not s.startswith("(") or "Exchange" not in s.splitlines()[0]:
            continue
        inp = next((l for l in s.splitlines() if l.startswith("Input")), "")
        fat = "signature" in inp or "sig_a" in inp or "sig_b" in inp
        if "band_key" in inp or ("id_a" in inp and "id_b" in inp):
            checked += 1
            assert not fat, f"signature rides a blocking exchange:\n{s}"
    assert checked >= 1  # at least the band-key movement is audited


def test_lsh_chunked_path_shuffles_ids_only(spark):
    """The 100 TB shape: force the chunked pair join (``probe=False``)
    and assert its exchanges carry ids + chunk metadata only, never
    the signature arrays."""
    from pyspark.sql import functions as F

    from capital.llm.dedup import lsh_candidate_pairs, minhash_signatures

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common boilerplate text block "),
            (F.col("id") % 5).cast("string"),
        ).alias("text"),
    )
    sigs = minhash_signatures(docs, num_hashes=16)
    import capital.operators.skew as skew

    orig = skew.chunked_pair_join

    def no_probe(*args, **kwargs):
        kwargs["probe"] = False
        return orig(*args, **kwargs)

    skew.chunked_pair_join = no_probe
    try:
        pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    finally:
        skew.chunked_pair_join = orig
    plan = plan_of(pairs)
    checked = 0
    for block in plan.split("\n\n"):
        s = block.strip()
        if not s.startswith("(") or "Exchange" not in s.splitlines()[0]:
            continue
        inp = next((l for l in s.splitlines() if l.startswith("Input")), "")
        fat = "signature" in inp or "sig_a" in inp or "sig_b" in inp
        if "band_key" in inp or ("id_a" in inp and "id_b" in inp):
            checked += 1
            assert not fat, f"signature rides a blocking exchange:\n{s}"
    assert checked >= 2  # the chunk-bucket join sides / pair dedup


def test_fullrecall_segment_shuffle_carries_ids_only(spark, sf_dir):
    """The pigeonhole segment join and the candidate dedup exchange id
    rows only; packed signatures re-attach after dedup (the same
    shuffle-fat rule as the LSH band join)."""
    spark.catalog.clearCache()
    plan = plan_of(_QUERIES["dedup_simhash_fullrecall"](spark, sf_dir))
    checked = 0
    for block in plan.split("\n\n"):
        s = block.strip()
        if not s.startswith("(") or "Exchange" not in s.splitlines()[0]:
            continue
        inp = next((l for l in s.splitlines() if l.startswith("Input")), "")
        fat = "simhash_bits" in inp or "sig_a" in inp or "sig_b" in inp
        if "seg_bits" in inp or ("id_a" in inp and "id_b" in inp):
            checked += 1
            assert not fat, f"signature rides a blocking exchange:\n{s}"
    # Unskewed fixtures take the plain probe path, where small sides
    # broadcast (ids-only BroadcastExchange, still audited above).
    assert checked >= 1
    assert "CartesianProduct" not in plan


def test_chunked_pair_plans_have_no_nested_loops(spark, sf_dir):
    """Every chunked pair path stays an equi-join on
    (block..., chunk, chunk) — no nested-loop fallback anywhere."""
    spark.catalog.clearCache()
    for q in (
        "dedup_simhash_pairs",
        "dedup_embedding_cosine",
        "dedup_fuzzy_keys",
    ):
        plan = plan_of(_QUERIES[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_partsupp_queries_plan_shapes(spark, sf_dir):
    """The derived-partsupp pack must keep the canonical shapes: dims
    and the ps projection broadcast, never a cartesian fallback; q16's
    NOT IN lands as a broadcast anti-join. BroadcastNestedLoopJoin is
    permitted ONLY as the single-row scalar crossJoin inside the ps
    derivation (the supplier-count literal) — each occurrence must
    build from a one-row aggregate, never a table."""
    for name in (
        "q2_min_cost_supplier",
        "q9_product_profit",
        "q11_important_stock",
        "q16_supplier_part_counts",
        "q20_excess_stock_suppliers",
    ):
        plan = plan_of(_QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        # Scalar crossJoins (supplier count / q11 threshold) broadcast
        # a single aggregate row and plan as Cross-type BNLJ (the q11
        # threshold filter may fuse in as the join condition). An
        # equi-join DEGRADING to nested-loop keeps its Inner/Outer
        # type — that is the regression this guards; big-big
        # cartesians are caught by the assert above.
        for block in plan.split("\n\n"):
            if "BroadcastNestedLoopJoin" in block.splitlines()[0]:
                assert "Join type: Cross" in block, (name, block)
    plan = plan_of(_QUERIES["q16_supplier_part_counts"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_zorder_and_bloom_plan_shapes(spark, sf_dir):
    """Round-6 operators keep their map-side posture: the z-order
    dictionary rank joins back via broadcast (no sort-merge of the
    fact side), and the bloom-prefiltered decontamination probes the
    word table through broadcast joins only."""
    plan = plan_of(_QUERIES["p16_zorder_string_key"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    plan = plan_of(_QUERIES["asm_contamination_bloom"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_round9_new_ops_plan_shapes(spark, sf_dir):
    """Round-9 additions stay JVM-side and partial-aggregated:

    - substring spans: stride-1 window count aggregates map-side
      (partial_count before the gram exchange), no Python eval, no
      nested-loop join anywhere in the pipeline;
    - gopher rules: a narrow projection over the fan-out repartition
      (round 10: a single-file corpus is ONE split, so the query
      right_size_narrows the scan — exactly one RoundRobin exchange,
      no aggregation/join exchange) of a scan of only the needed
      columns;
    - jaccard prefix (hashed keys): the candidate join keys on the
      xxhash64 long, so no raw 3-gram string column survives into
      the prefix exchange.
    """
    spark.catalog.clearCache()  # plan-shape tests audit cold plans
    plan = plan_of(_QUERIES["dedup_substring_spans"](spark, sf_dir))
    assert "partial_count" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = plan_of(_QUERIES["cur_gopher_rules"](spark, sf_dir))
    # Exactly the one deliberate fan-out exchange (RoundRobin), never
    # a hash/range exchange — the signals stay aggregation-free.
    # (formatted plans print each node twice: tree + detail section)
    # The memoized df may already have EXECUTED (oracle-parity tests
    # share the (name, sf_dir) key), and explain() on an executed AQE
    # frame prints final+initial plans (the repartition hint appears
    # twice, `roundrobinpartitioning` not at all) — assert PRESENCE
    # of the deliberate fan-out and ABSENCE of real shuffles, which
    # holds in both plan states.
    assert "REPARTITION_BY_NUM" in plan
    for shuffle_kind in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert shuffle_kind not in plan, shuffle_kind
    assert "EvalPython" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "lang" not in read_schema[0]

    plan = plan_of(_QUERIES["drift_incremental_psi"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "partial_count" in plan  # map-side combined histogram


def test_round10_new_ops_plan_shapes(spark, sf_dir):
    """Round-10 operator plan pins:

    - multi-scale substring: the base window count is map-side
      combined (partial_count), level hashes derive via window lead —
      no Python eval, no cartesian/nested-loop join anywhere;
    - k-means assignment: centroids are broadcast literals — the
      final labeling pass has NO join operator at all, and the only
      exchanges in the full pipeline are the (cell, dim) mean
      aggregates;
    - mm near-dup: exactly one Arrow-batched Python stage (the
      featurizer mapInPandas) — the pair scoring stays JVM-side;
      no cartesian product (the bucket join is chunk-equi-keyed).
    """
    spark.catalog.clearCache()  # plan-shape tests audit cold plans

    plan = plan_of(_QUERIES["dedup_substring_multiscale"](spark, sf_dir))
    assert "partial_count" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    from capital.io import load_table
    from capital.llm.kmeans import lloyd_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assignments, _ = lloyd_kmeans(emb, k=4, iterations=1)
    plan = plan_of(assignments)
    for join_kind in ("Join", "CartesianProduct"):
        assert join_kind not in plan, join_kind  # literals, not a join
    assert "Exchange" not in plan  # labeling is one narrow scan

    plan = plan_of(_QUERIES["mm_neardup_pairs"](spark, sf_dir))
    # Featurizer nodes only: one per self-join side on the small-input
    # plain-join path (plain_by_hint skips the persist; the scale path
    # persists the keyed frame and runs it once).
    assert plan.count("MapInPandas (") <= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_semantic_decontamination_broadcasts_bench_no_corpus_shuffle(
    spark, sf_dir
):
    """Dense decontamination (round 12): the benchmark vectors
    broadcast into a nested-loop pass over the training side, with
    the threshold pushed INTO the join condition so unfiltered pairs
    never materialize; the exchanges left are id-sized (the hit
    aggregation and the zero-fill outer join), never the vector
    pair space."""
    plan = plan_of(
        _QUERIES["asm_semantic_decontamination"](spark, sf_dir)
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # threshold filters at the pair source: the formatted plan's join
    # condition carries the >= 0.35 comparison
    cond = [l for l in plan.splitlines() if "Join condition:" in l]
    assert cond and any(">= 0.35" in l for l in cond)


def test_cross_snapshot_band_exchanges_carry_no_text(spark, sf_dir):
    """Round-12 cross-snapshot dedup: the re-crawl probe's band-key
    movement must be ids-only — document TEXT or signature arrays
    riding a band exchange is shuffle fat at 100 TB (the
    dedup_minhash_lsh audit applied to the composition)."""
    spark.catalog.clearCache()
    plan = plan_of(_QUERIES["dedup_cross_snapshot"](spark, sf_dir))
    checked = 0
    for block in plan.split("\n\n"):
        s = block.strip()
        if not s.startswith("(") or "Exchange" not in s.splitlines()[0]:
            continue
        inp = next((l for l in s.splitlines() if l.startswith("Input")), "")
        if "band_key" in inp:
            checked += 1
            assert "text" not in inp and "signature" not in inp, (
                f"fat band exchange:\n{s}"
            )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # r12 advice: >= 0 was vacuous. The loop's header check matches
    # BroadcastExchange too, so ANY band-key movement (shuffle or
    # broadcast) is audited; the fixture plan carries at least one.
    assert checked >= 1, "no band-key exchange found — audit is vacuous"


def test_cdc_broadcast_dup_set_probe_shape(spark, sf_dir):
    """dedup_cdc_stats (round 14): the sparse dup-digest set must
    BROADCAST into the probe — a shuffle join on digest would
    colocate a hot boilerplate digest's chunk rows into one task
    (the count-window-vs-broadcast regime note). With the probe
    map-side, the chunk window's id-partitioning carries both the
    (id, chunk) digest aggregate and the final per-doc aggregate."""
    spark.catalog.clearCache()
    plan = plan_of(_QUERIES["dedup_cdc_stats"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # No digest-keyed shuffle join anywhere in the probe.
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_v2_plan_shapes(spark, sf_dir):
    """Funnel plan audits in two scopes (the checkpoints truncate
    lineage, so one plan cannot see everything — round-16 review):
    (a) the post-checkpoint TAIL (decon kernel + final joins) has no
    cartesian/nested-loop joins and no row-at-a-time Python; (b) the
    pre-barrier GATE TIER plan (built with an identity barrier) has
    no cartesian products and its only BNLJ is the sanctioned
    single-row/broadcast scalar attach (CLAUDE.md: Cross BNLJ with a
    1-row build side is allowed; degraded equi-joins are not)."""
    from pyspark.sql import functions as F

    from capital.io import load_table
    from capital.llm.pipeline_v2 import gate_flags, v2_work_split

    spark.catalog.clearCache()
    plan = plan_of(_QUERIES["pipe_curation_v2"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python
    assert "MapInPandas" in plan  # the Arrow decon kernel

    work, _bench = v2_work_split(load_table(spark, sf_dir, "documents"))
    _c0, flagged = gate_flags(work, barrier=lambda df: df)
    gplan = plan_of(flagged)
    assert "CartesianProduct" not in gplan
    assert "BatchEvalPython" not in gplan
    # the NB grid's broadcast scalar attach is the one allowed BNLJ
    # shape; a second would be a degraded equi-join. Count node
    # DETAIL headers — formatted explain prints each node in the
    # tree AND the detail section.
    assert gplan.count(") BroadcastNestedLoopJoin") <= 1
