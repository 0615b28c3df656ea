"""Sketch-rollup validation: bounded error vs exact answers, and the
merge invariant (rollup-then-merge == direct sketch of the union) that
makes pre-aggregation sound."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.operators.sketches import (
    daily_distinct_sketches,
    daily_value_sketches,
    rollup_distinct,
    rollup_quantiles,
)


def test_hll_rollup_within_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = rollup_distinct(daily_distinct_sketches(ev))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    joined = {
        r.event_type: (r.approx_distinct, r.exact_distinct)
        for r in approx.join(exact, "event_type").collect()
    }
    assert joined
    for et, (a, e) in joined.items():
        # lgK=12 → relative standard error ~1.6%; allow 5 sigma.
        assert abs(a - e) <= max(0.08 * e, 2), (et, a, e)


def test_hll_merge_equals_direct_sketch(spark, sf_dir):
    # Sketching per day then merging must estimate the same as one
    # global sketch — determinism makes this exact equality.
    ev = load_table(spark, sf_dir, "events")
    merged = rollup_distinct(daily_distinct_sketches(ev))
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).cast("long").alias("approx_distinct")
    )
    m = {r.event_type: r.approx_distinct for r in merged.collect()}
    d = {r.event_type: r.approx_distinct for r in direct.collect()}
    assert m == d


def test_kll_quantiles_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = rollup_quantiles(
        daily_value_sketches(ev), quantiles=(0.5, 0.95)
    )
    exact = ev.filter(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95"),
    )
    rows = approx.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        # KLL k=200 → ~1.7% rank error; translate via the value spread
        # per group rather than assuming a distribution: the sketch
        # value must lie between nearby exact quantiles.
        lo50, hi50 = _exact_band(spark, sf_dir, r.event_type, 0.5)
        lo95, hi95 = _exact_band(spark, sf_dir, r.event_type, 0.95)
        assert lo50 <= r.q50 <= hi50, (r.event_type, "q50", r.q50)
        assert lo95 <= r.q95 <= hi95, (r.event_type, "q95", r.q95)


def _exact_band(spark, sf_dir, event_type, q, eps=0.05):
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == event_type)
            & F.col("value").isNotNull()
        )
    )
    row = ev.agg(
        F.expr(f"percentile(value, {max(q - eps, 0.0)})").alias("lo"),
        F.expr(f"percentile(value, {min(q + eps, 1.0)})").alias("hi"),
    ).collect()[0]
    return row.lo, row.hi


# --- count-min sketch ----------------------------------------------------


def test_cms_never_underestimates_and_hits_exact_counts(spark, sf_dir):
    """CMS property: est >= true count for every key; with width 256
    over this vocab most probes are collision-free and exact."""
    from pyspark.sql import functions as F

    from capital.io import load_table
    from capital.llm.text import normalized, tokens
    from capital.operators.sketches import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(tokens(normalized(F.col("text")))).alias("token")
    )
    exact = {
        r.token: r.n
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    probes = spark.createDataFrame(
        [(t,) for t in sorted(exact)[:30]] + [("never_seen_zz",)],
        "token string",
    )
    sketch = cms_build(tok)
    est = {
        r.token: r.est_count
        for r in cms_estimate(sketch, probes).collect()
    }
    for t, e in est.items():
        assert e >= exact.get(t, 0), (t, e, exact.get(t))
    assert est["never_seen_zz"] == 0
    exact_hits = sum(
        1 for t in est if t != "never_seen_zz" and est[t] == exact[t]
    )
    assert exact_hits >= 25  # collisions are the exception, not the rule


def test_cms_merge_equals_at_once_build(spark, sf_dir):
    """Mergeability: batch sketches summed bucket-wise are
    BIT-IDENTICAL to sketching the union at once — the rollup
    invariant shared with the HLL/KLL tier."""
    from pyspark.sql import functions as F

    from capital.io import load_table
    from capital.llm.text import normalized, tokens
    from capital.operators.sketches import cms_build, cms_merge

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens(normalized(F.col("text")))).alias("token")
    )
    whole = cms_build(tok)
    merged = cms_merge(
        cms_build(tok.filter(F.col("doc_id") % 2 == 0)),
        cms_build(tok.filter(F.col("doc_id") % 2 == 1)),
    )
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b
