"""Corpus-assembly invariants: determinism, split exhaustiveness,
packing bounds, decontamination correctness, shard layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.assemble import (
    contamination,
    decontaminate,
    mixture_sample,
    pack_chunks,
    split_assign,
    with_shard,
    write_shards,
)
from capital.queries.assemble_queries import MIX_RATES


def test_mixture_sample_deterministic_and_rate_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = mixture_sample(docs, MIX_RATES, seed="mix1")
    b = mixture_sample(docs, MIX_RATES, seed="mix1")
    assert sorted(r.doc_id for r in a.select("doc_id").collect()) == sorted(
        r.doc_id for r in b.select("doc_id").collect()
    )
    # A different seed draws a different (overlapping) sample.
    c = mixture_sample(docs, MIX_RATES, seed="mix2")
    assert {r.doc_id for r in c.select("doc_id").collect()} != {
        r.doc_id for r in a.select("doc_id").collect()
    }
    # Unknown sources are dropped entirely.
    none = mixture_sample(docs, {"no_such_source": 1.0})
    assert none.count() == 0


def test_split_assign_disjoint_exhaustive_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    splits = split_assign(docs)
    counts = {
        r.split: r.n
        for r in splits.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(counts.values()) == n
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    # Stability under corpus growth: a doc's split on a subset equals
    # its split on the full corpus.
    sub = split_assign(docs.filter(F.col("doc_id") % 2 == 0))
    full = {r.doc_id: r.split for r in splits.collect()}
    assert all(full[r.doc_id] == r.split for r in sub.collect())


def test_pack_chunks_contiguous_and_cost_preserving(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 4000
    packed = pack_chunks(docs, budget)
    # Total cost is preserved and chunk ids start at 0 per source.
    assert packed.count() == docs.count()
    per_source = packed.groupBy("source").agg(
        F.min("chunk_id").alias("lo"), F.max("chunk_id").alias("hi")
    )
    rows = per_source.collect()
    assert all(r.lo == 0 for r in rows)
    # A chunk's *start offset* is below (chunk_id+1)*budget by
    # construction; verify per-chunk cost stays under budget + one
    # max-document overhang.
    stats = (
        packed.groupBy("source", "chunk_id")
        .agg(F.sum("n_chars").alias("cost"))
        .join(docs.groupBy("source").agg(F.max("n_chars").alias("mx")),
              "source")
    )
    bad = stats.filter(F.col("cost") > budget + F.col("mx")).count()
    assert bad == 0


def test_decontaminate_removes_exactly_the_flagged_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    hits = contamination(train, bench)
    clean = decontaminate(train, bench)
    assert clean.count() == train.count() - hits.count()
    assert hits.filter(F.col("n_shared") < 1).count() == 0
    # No benchmark doc appears among the flagged training docs.
    assert (
        hits.join(bench.select("doc_id"), "doc_id", "left_semi").count() == 0
    )
    # A benchmark doc trivially contaminates itself: planting one in
    # the training side must flag it.
    planted = contamination(train.unionByName(bench.limit(1)), bench)
    assert planted.count() >= hits.count()


def test_shard_write_layout_and_order(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_shards = 8
    out = str(tmp_path / "shards")
    write_shards(docs, out, n_shards)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("shard_id").distinct().count() <= n_shards
    assert back.agg(F.max("shard_id")).collect()[0][0] < n_shards
    # Rows inside each parquet file are in shuffle-key order (the
    # data-loader streaming order).
    per_file = back.select(
        "shard_id",
        "shuffle_key",
        F.input_file_name().alias("f"),
    )
    import pandas as pd  # noqa: F401

    pdf = per_file.toPandas()
    for _, grp in pdf.groupby("f"):
        keys = list(grp["shuffle_key"])
        assert keys == sorted(keys)
    # Assignment is deterministic.
    again = with_shard(docs, n_shards).select("doc_id", "shard_id")
    first = {
        r.doc_id: r.shard_id
        for r in back.select("doc_id", "shard_id").collect()
    }
    assert all(first[r.doc_id] == r.shard_id for r in again.collect())


def test_select_within_budget_semantics(spark):
    from capital.llm.assemble import select_within_budget

    rows = [
        # source a: quality order is d3 (0.9), d1 (0.8), d2 (0.7)
        ("a", 1, 40, 0.8),
        ("a", 2, 40, 0.7),
        ("a", 3, 40, 0.9),
        # source b: one giant doc exceeding the budget alone
        ("b", 4, 500, 0.5),
        ("b", 5, 10, 0.4),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens int, quality_score double"
    )
    out = select_within_budget(df, budget=60).collect()
    got = {(r.source, r.doc_id): r.budget_used for r in out}
    # a: best doc d3 enters at 0, d1 at 40 (< 60), d2 at 80 (cut).
    assert got == {("a", 3): 0, ("a", 1): 40, ("b", 4): 0}
    # Every source keeps its best doc even when it alone busts the
    # budget (greedy-prefix convention), and never a second one after.
    assert ("b", 5) not in got


def test_select_within_budget_tiebreak_is_id(spark):
    from capital.llm.assemble import select_within_budget

    df = spark.createDataFrame(
        [("s", 9, 50, 0.5), ("s", 2, 50, 0.5), ("s", 5, 50, 0.5)],
        "source string, doc_id long, n_tokens int, quality_score double",
    )
    out = select_within_budget(df, budget=101).collect()
    assert sorted((r.doc_id, r.budget_used) for r in out) == [
        (2, 0), (5, 50), (9, 100)
    ]


def test_leakage_safe_split_keeps_clusters_together(spark):
    from capital.llm.assemble import leakage_safe_split, split_assign

    comps = spark.createDataFrame(
        [(i, i % 7) for i in range(200)],
        "doc_id long, component_id long",
    )
    out = leakage_safe_split(comps, val_frac=0.2, test_frac=0.2)
    # Every member of a component lands in the same split.
    assert (
        out.groupBy("component_id")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
    # The property is not vacuous: per-doc hashing on the same data
    # does straddle clusters (the leak this operator exists to stop).
    naive = split_assign(comps, val_frac=0.2, test_frac=0.2)
    straddled = (
        naive.groupBy("component_id")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddled > 0


def test_temperature_mixture_flattens_and_upsamples(spark):
    from capital.llm.assemble import temperature_mixture, temperature_rates

    # 400-doc "web" source vs 20-doc "books" source: alpha=0.5 must
    # upsample books (rate > 1 => repeats) and subsample web.
    docs = spark.createDataFrame(
        [(i, "web") for i in range(400)] + [(1000 + i, "books") for i in range(20)],
        "doc_id long, source string",
    )
    rates = {r.source: r.rate for r in temperature_rates(
        docs, alpha=0.5, target_docs=200).collect()}
    assert rates["books"] > 1.0 > rates["web"]
    out = temperature_mixture(docs, alpha=0.5, target_docs=200)
    per_src = {r.source: r.n for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # Expected counts: 200 * q_s; realized counts are within the
    # Bernoulli noise of the fractional part (<= n_docs/2 swing bound,
    # generous and deterministic given the fixed seed).
    import math
    n = {"web": 400, "books": 20}
    q_raw = {s: math.sqrt(n[s] / 420) for s in n}
    q = {s: q_raw[s] / sum(q_raw.values()) for s in n}
    for s in n:
        assert abs(per_src[s] - 200 * q[s]) < 25
    # Repeats carry distinct copy_idx values.
    books = out.filter(F.col("source") == "books")
    assert books.count() > 20  # genuinely upsampled
    assert books.groupBy("doc_id", "copy_idx").count().filter(
        F.col("count") > 1).count() == 0
    # Deterministic: same seed, same output.
    again = temperature_mixture(docs, alpha=0.5, target_docs=200)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


# --- UniMax water-filling budget allocation -----------------------------


def _unimax_brute(caps, budget):
    """Bisection solve of sum(min(c, L)) = budget — the definitional
    answer the closed form must match."""
    total = sum(caps.values())
    if budget >= total:
        return dict(caps)
    lo, hi = 0.0, max(caps.values())
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(c, mid) for c in caps.values()) < budget:
            lo = mid
        else:
            hi = mid
    return {s: min(c, hi) for s, c in caps.items()}


def _unimax_rows(spark, toks, **kw):
    from capital.llm.assemble import unimax_allocation

    df = spark.createDataFrame(
        [(s, t) for s, t in toks.items()], "source string, n_tokens long"
    )
    return {r.source: r for r in unimax_allocation(df, **kw).collect()}


def test_unimax_matches_bisection_on_skewed_sources(spark):
    toks = {"web": 1_000_000, "books": 50_000, "code": 300_000,
            "wiki": 10_000, "news": 140_000}
    e = 4.0
    rows = _unimax_rows(spark, toks, budget_fraction=0.5, epoch_cap=e)
    caps = {s: e * t for s, t in toks.items()}
    budget = 0.5 * e * sum(toks.values())
    want = _unimax_brute(caps, budget)
    for s in toks:
        assert abs(rows[s].alloc_tokens - want[s]) < 1e-3, s
    # small sources saturate at the cap, the giant is cut at the level
    assert rows["wiki"].saturated and rows["books"].saturated
    assert not rows["web"].saturated
    assert abs(rows["wiki"].epochs_alloc - e) < 1e-6
    # budget exactly spent (exact-int construction, rounding only)
    assert abs(sum(r.alloc_tokens for r in rows.values()) - budget) < 1e-2


def test_unimax_budget_covers_everything(spark):
    toks = {"a": 100, "b": 900}
    rows = _unimax_rows(spark, toks, budget_fraction=1.0, epoch_cap=2.0)
    for s, t in toks.items():
        assert rows[s].saturated
        assert rows[s].alloc_tokens == 2.0 * t
        assert rows[s].epochs_alloc == 2.0


def test_unimax_uniform_sources_share_level(spark):
    toks = {f"s{i}": 1000 for i in range(8)}
    rows = _unimax_rows(spark, toks, budget_fraction=0.25, epoch_cap=4.0)
    allocs = {r.alloc_tokens for r in rows.values()}
    assert allocs == {1000.0}  # 0.25 · 4 epochs = exactly 1 epoch each
    assert all(not r.saturated for r in rows.values())


def test_unimax_absolute_budget_and_arg_validation(spark):
    import pytest

    toks = {"a": 1000, "b": 3000}
    rows = _unimax_rows(spark, toks, budget_tokens=5000.0, epoch_cap=4.0)
    want = _unimax_brute({"a": 4000.0, "b": 12000.0}, 5000.0)
    for s in toks:
        assert abs(rows[s].alloc_tokens - want[s]) < 1e-3
    from capital.llm.assemble import unimax_allocation

    df = next(iter([None]))  # placeholder, never touched before raise
    with pytest.raises(ValueError):
        unimax_allocation(df)
    with pytest.raises(ValueError):
        unimax_allocation(df, budget_fraction=0.5, budget_tokens=1.0)


def test_unimax_non_default_source_col(spark):
    """Regression (round-10 advice): the ordering window must reference
    the RENAMED "source" column — ordering by the caller's source_col
    raised an unresolved-column AnalysisException for any non-default
    name."""
    from capital.llm.assemble import unimax_allocation

    df = spark.createDataFrame(
        [("web", 1000), ("wiki", 100)], "domain string, tok long"
    )
    rows = {
        r.source: r
        for r in unimax_allocation(
            df,
            budget_fraction=0.5,
            epoch_cap=4.0,
            source_col="domain",
            token_col="tok",
        ).collect()
    }
    want = _unimax_brute({"web": 4000.0, "wiki": 400.0}, 0.5 * 4400.0)
    for s in ("web", "wiki"):
        assert abs(rows[s].alloc_tokens - want[s]) < 1e-3


def test_epoch_shuffle_permutation_properties(spark, sf_dir):
    """Each epoch's (shard, position) is a dense permutation of the
    corpus; different epochs order differently; the same epoch is
    bit-stable across reruns (restart-reproducible mid-epoch)."""
    from capital.llm.assemble import epoch_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = epoch_shuffle(d, 0, n_shards=4)
    rows0 = {(r.shard, r.position): r.doc_id for r in e0.collect()}
    n = d.count()
    assert len(rows0) == n  # every doc exactly once, no slot collision
    from collections import Counter

    per_shard = Counter(s for s, _ in rows0)
    for s, cnt in per_shard.items():
        # dense 1..cnt positions within each shard
        assert sorted(p for sh, p in rows0 if sh == s) == list(
            range(1, cnt + 1)
        )
    rows0_again = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(d, 0, n_shards=4).collect()
    }
    assert rows0_again == rows0  # same-epoch rerun is identical
    order1 = {
        (r.shard, r.position): r.doc_id
        for r in epoch_shuffle(d, 1, n_shards=4).collect()
    }
    assert len(order1) == n and order1 != rows0  # epochs reorder


def test_decontaminate_spans_hand_computed(spark):
    """Span-surgical decontamination: only benchmark-covered windows
    are removed, overlapping hits merge, fully-contaminated docs
    yield the empty digest, clean docs lose nothing."""
    import hashlib

    from capital.llm.assemble import decontaminate_spans

    bench = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "x x a b c d e y y"),        # middle window hit
            (2, "a b c d q e"),              # near miss: nothing removed
            (3, "a b c d e a b c d e"),      # two hits cover everything
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in decontaminate_spans(train, bench, k=5).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1].n_tokens == 9 and out[1].n_removed_tokens == 5
    assert out[1].clean_md5 == md5("x x y y")
    assert out[2].n_removed_tokens == 0
    assert out[2].clean_md5 == md5("a b c d q e")
    assert out[3].n_removed_tokens == 10
    assert out[3].clean_md5 == md5("")


def test_decontaminate_spans_bench_size_guard(spark):
    """The plan-build collect's by-contract bound is ASSERTED: a
    benchmark whose distinct gram count exceeds max_bench_grams must
    raise at plan time (limit(max+1) caps the transfer) instead of
    silently stalling the driver (round-15 advice)."""
    import pytest

    from capital.llm.assemble import decontaminate_spans

    bench = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "x y z")], "doc_id long, text string"
    )
    # 10 tokens -> 6 distinct 5-grams > 4
    with pytest.raises(ValueError, match="exceeds 4 distinct"):
        decontaminate_spans(train, bench, k=5, max_bench_grams=4)
    # at the bound it still works
    out = decontaminate_spans(
        train, bench, k=5, max_bench_grams=6
    ).collect()
    assert len(out) == 1 and out[0].n_removed_tokens == 0


def test_semantic_contamination_hand_computed(spark):
    """Dense decontamination on constructed vectors: hand-computed
    cosines pin the flag, hit count, round6 max_sim and the min-id
    attribution; a training vector sharing an id with a benchmark
    vector must not self-match."""
    from capital.llm.assemble import semantic_contamination

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0]), (17, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),      # cos=1.0 with bid 0, 0.0 with 17
            (2, [1.0, 1.0]),      # cos≈0.7071 with both
            (3, [-1.0, 0.0]),     # cos=-1 / 0 → no hits
            (17, [0.0, 5.0]),     # same id as a bench vector: no self
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_contamination(
            train, bench, threshold=0.7
        ).collect()
    }
    assert len(out) == 4
    assert out[1].is_contaminated and out[1].n_bench_hits == 1
    assert out[1].max_sim == 1.0 and out[1].first_bench_id == 0
    assert out[2].is_contaminated and out[2].n_bench_hits == 2
    assert abs(out[2].max_sim - 0.707107) < 1e-9  # round6(√2/2)
    assert out[2].first_bench_id == 0
    assert not out[3].is_contaminated and out[3].n_bench_hits == 0
    assert out[3].max_sim is None and out[3].first_bench_id is None
    # vec 17: cos=1.0 with bench 17 but ids match → only the bench-0
    # comparison (cos 0.0) remains, below threshold
    assert not out[17].is_contaminated and out[17].n_bench_hits == 0


def test_semantic_contamination_via_ivf_exhaustive_equals_broadcast(
    spark, sf_dir, tmp_path
):
    """The r12-verdict ask: via_ivf at nprobe=n_cells must reproduce
    the broadcast-BNLJ result row-for-row (every (train, bench) pair
    is still compared exactly once — each bench vector lives in one
    cell), over the real embeddings table."""
    from capital.io import load_table
    from capital.llm.assemble import semantic_contamination
    from capital.llm.ivf import write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 7 == 0).limit(40)
    train = emb
    n_cells = 4
    idx = str(tmp_path / "bench_ivf")
    write_ivf_index(bench, idx, n_cells=n_cells)
    exact = sorted(
        map(tuple, semantic_contamination(train, bench, 0.35).collect())
    )
    via = sorted(
        map(
            tuple,
            semantic_contamination(
                train, bench, 0.35, via_ivf=idx
            ).collect(),
        )
    )
    assert exact == via and exact
    assert any(r[1] for r in exact), "fixture should contain hits"


def test_semantic_contamination_via_ivf_partial_probe_is_subset(
    spark, sf_dir, tmp_path
):
    """nprobe < n_cells trades recall: flags must be a subset of the
    exhaustive flags, never a superset (no false positives — every
    compared pair uses the true cosine)."""
    from capital.io import load_table
    from capital.llm.assemble import semantic_contamination
    from capital.llm.ivf import write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 5 == 0).limit(50)
    idx = str(tmp_path / "bench_ivf_p")
    write_ivf_index(bench, idx, n_cells=4)
    full = {
        r.vec_id
        for r in semantic_contamination(
            emb, bench, 0.35, via_ivf=idx
        ).collect()
        if r.is_contaminated
    }
    part = {
        r.vec_id
        for r in semantic_contamination(
            emb, bench, 0.35, via_ivf=idx, nprobe=1
        ).collect()
        if r.is_contaminated
    }
    assert part <= full


def test_decontaminate_spans_null_text_matches_oracle(spark):
    """NULL-text train docs must mirror the SQL oracle's NULL token
    array — (NULL, NULL, md5('')) — not the [""] row (round-14
    review; DuckDB-verified oracle values pinned here)."""
    import hashlib

    from capital.llm.assemble import decontaminate_spans

    train = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(0, "bench text here only")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r for r in decontaminate_spans(train, bench).collect()
    }
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert rows[1].n_tokens is None
    assert rows[1].n_removed_tokens is None
    assert rows[1].clean_md5 == empty_md5
    assert rows[2].n_tokens == 1
    assert rows[2].n_removed_tokens == 0
    assert rows[2].clean_md5 == empty_md5
