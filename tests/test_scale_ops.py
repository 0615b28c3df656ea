"""Scale operators: salting correctness + bucketed shuffle-free joins +
pipeline orchestration."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from capital.io import Lake, load_table
from capital.operators.bucketing import bucketed_join, write_bucketed
from capital.operators.skew import salted_agg, salted_broadcast_left_join
from capital.pipelines import (
    daily_market_ingest,
    market_open_anchor,
    silver_industry_code_daily,
)
from capital.operators.calendar import build_calendar


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", F.col("l_quantity").cast("decimal(28,6)")),
            "n_rows": ("count", None),
            "min_ship": ("min", F.col("l_shipdate")),
            "max_price": ("max", F.col("l_extendedprice")),
        },
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_extendedprice").alias("max_price"),
    )
    s = {r.l_returnflag: (r.sum_qty, r.n_rows, r.min_ship, r.max_price)
         for r in salted.collect()}
    p = {r.l_returnflag: (r.sum_qty, r.n_rows, r.min_ship, r.max_price)
         for r in plain.collect()}
    assert s == p
    import pytest as _pytest

    with _pytest.raises(ValueError, match="supported"):
        salted_agg(li, ["l_returnflag"], {"bad": ("avg", F.col("l_quantity"))})


def test_salt_is_partition_layout_independent(spark, sf_dir):
    """The whole-row xxhash64 salt (round 6, replacing rand(seed))
    must assign each row the same bucket regardless of how the input
    happens to be partitioned — the retry-determinism property: a
    recomputed/speculated task re-derives identical buckets."""
    from capital.operators.skew import _row_salt

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )

    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # testdata, so compare the full (row, salt) multiset — the salt is
    # a pure function of the row, so identical rows salt identically.
    def buckets(df):
        return sorted(
            tuple(r) for r in df.withColumn("salt", _row_salt(df, 16)).collect()
        )

    a = buckets(li.repartition(4))
    b = buckets(li.repartition(17, "l_quantity"))
    assert a == b


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dim = part.withColumnRenamed("p_partkey", "l_partkey")
    salted = salted_broadcast_left_join(li, dim, "l_partkey")
    plain = li.join(dim, "l_partkey", "left")
    assert salted.count() == plain.count()
    s = salted.groupBy("p_brand").count().collect()
    p = plain.groupBy("p_brand").count().collect()
    assert {(r.p_brand, r["count"]) for r in s} == {
        (r.p_brand, r["count"]) for r in p
    }


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", "o_orderkey", 8)
    # At toy scale the planner prefers broadcast (which bypasses
    # buckets); disable it to exercise the co-located sort-merge path a
    # big fact↔fact join would take.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert joined.count() == li.count()
        plan = _plan(joined)
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_market_open_anchor(spark):
    cal = build_calendar(spark, "2024-01-01", "2024-01-31")
    is_open, prev = market_open_anchor(cal, "2024-01-08")  # Monday
    assert is_open and prev.isoformat() == "2024-01-05"  # Friday before
    is_open_sat, _ = market_open_anchor(cal, "2024-01-06")  # Saturday
    assert not is_open_sat


def test_daily_market_ingest_pipeline(spark, tmp_path):
    lake = Lake(str(tmp_path))
    cal = build_calendar(spark, "2023-01-01", "2025-12-31")

    def fetch(day):
        return spark.createDataFrame(
            [("069500", "KODEX 200", 36000.0)],
            "srtnCd string, itmsNm string, clpr double",
        )

    out = daily_market_ingest(
        spark, lake, "2024-01-08", fetch, calendar=cal
    )
    assert out is not None
    back = spark.read.parquet(lake.path("bronze", "kr_etf"))
    assert back.count() == 1
    assert back.collect()[0].ymd.isoformat() == "2024-01-05"

    # Saturday → short-circuit, nothing written beyond what exists.
    skipped = daily_market_ingest(
        spark, lake, "2024-01-06", fetch, calendar=cal
    )
    assert skipped is None


def test_silver_industry_code_daily(spark, tmp_path):
    lake = Lake(str(tmp_path))
    bronze = spark.createDataFrame(
        [
            {"item_code": "005930", "item_name": "삼성전자",
             "industry_code": "전기전자", "market": "kospi",
             "issue_date": "2024-01-02"},
        ]
    )
    bronze.write.mode("overwrite").json(lake.path("bronze", "industry_code"))
    silver = silver_industry_code_daily(spark, lake)
    assert silver.count() == 1
    stored = spark.read.parquet(lake.path("silver", "dim_industry_code"))
    assert stored.collect()[0].item_name == "삼성전자"


def test_bucketed_lsh_index_probe_no_index_exchange(spark, tmp_path):
    """The incremental-dedup claim at 100 TB: store the LSH band index
    bucketed by band_key and the daily probe join reads it
    co-partitioned — only the (small) probe batch shuffles, the
    history-sized index side has NO Exchange above its scan."""
    from capital.llm.dedup import band_keys, minhash_signatures
    from capital.operators.bucketing import write_bucketed

    import shutil

    spark.catalog.clearCache()
    spark.sql("DROP TABLE IF EXISTS lsh_index_bucketed")
    # A failed prior run can leave the managed-table directory behind
    # while the catalog entry is gone; saveAsTable then refuses.
    shutil.rmtree(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        .removeprefix("file:") + "/lsh_index_bucketed",
        ignore_errors=True,
    )
    history = spark.createDataFrame(
        [(i, f"history document number {i} with shared boilerplate tail")
         for i in range(50)],
        "doc_id bigint, text string",
    )
    write_bucketed(
        band_keys(minhash_signatures(history, num_hashes=16), bands=4),
        "lsh_index_bucketed",
        bucket_col="band_key",
        n_buckets=8,
    )
    batch = spark.createDataFrame(
        [(1000, "history document number 7 with shared boilerplate tail"),
         (1001, "completely fresh material nothing in common at all")],
        "doc_id bigint, text string",
    )
    probe = band_keys(minhash_signatures(batch, num_hashes=16), bands=4)
    index = spark.table("lsh_index_bucketed").select(
        F.col("doc_id").alias("hist_id"), "band_key"
    )
    # band_key embeds the band index (dedup.band_keys), so the single
    # bucket column IS the complete join key.
    joined = probe.join(index, ["band_key"])
    # At test scale the planner would broadcast the tiny index (and
    # rightly skip bucketed reading); disable auto-broadcast to see
    # the plan the 100 TB index gets — a sort-merge join fed by the
    # bucketed scan.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import io as _io
        import contextlib

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    # No Exchange on the index side: history never reshuffles; the
    # only exchanges belong to the (small) probe batch lineage.
    for block in plan.split("\n\n"):
        s = block.strip()
        if s.startswith("(") and "Exchange" in s.splitlines()[0]:
            inp = next(
                (l for l in s.splitlines() if l.startswith("Input")), ""
            )
            assert "hist_id" not in inp, f"index side shuffled:\n{s}"
    # Join result is correct: the near-identical doc collides.
    hits = {r.doc_id for r in joined.select("doc_id").distinct().collect()}
    assert 1000 in hits


def test_right_size_narrow_targets(spark, sf_dir):
    """Splits scale with rows: tiny input -> few partitions; the cap
    engages at default parallelism (cluster behavior unchanged)."""
    from capital.io import right_size_narrow

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    small = right_size_narrow(emb, rows_per_task=max(1, n // 3))
    assert small.rdd.getNumPartitions() <= 4
    capped = right_size_narrow(emb, rows_per_task=1, max_partitions=8)
    assert capped.rdd.getNumPartitions() == 8


def test_parallelize_narrow_probe_decisions(spark, sf_dir):
    """The round-15 cheap split-starvation probe must reproduce the
    old RDD-probe decisions: scan-rooted starved frames repartition;
    exchange-rooted frames (agg/window/sort/repartition) pass through
    untouched; column names that LOOK like node names must not
    suppress the repartition; non-file roots fall back to the exact
    probe."""
    from pyspark.sql.window import Window

    from capital.io import parallelize_narrow

    d = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    p = parallelize_narrow(d)
    assert p is not d and p.rdd.getNumPartitions() == target
    agg = d.groupBy("source").count()
    assert parallelize_narrow(agg) is agg
    w = d.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")),
    )
    assert parallelize_narrow(w) is w
    # empty-spec window = single partition: must NOT shortcut.
    w0 = d.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    assert parallelize_narrow(w0) is not w0
    srt = d.orderBy("doc_id")  # global sort = range exchange
    assert parallelize_narrow(srt) is srt
    # sortWithinPartitions exchanges nothing: a starved scan stays
    # starved and must be repartitioned (round-15 review).
    swp = d.sortWithinPartitions("doc_id")
    assert parallelize_narrow(swp) is not swp
    # coalesce(1) IS a Repartition node but IS starved.
    co = d.repartition(target).coalesce(1)
    assert parallelize_narrow(co) is not co
    rp = d.repartition(target)
    assert parallelize_narrow(rp).rdd.getNumPartitions() == target
    # node-name-shaped COLUMN names must not read as exchange nodes.
    tricky = d.select(
        "doc_id", F.col("text").alias("sort_key"), F.lit(1).alias("WindowX")
    )
    assert parallelize_narrow(tricky) is not tricky
    # LocalRelation / checkpoint roots: exact-probe fallback still
    # returns a correct frame (decision parity with the old form).
    loc = spark.createDataFrame([(1, "a")], "id long, t string")
    out = parallelize_narrow(loc)
    assert out.count() == 1
    # an exchange node on a join's BUILD side must not mask a starved
    # probe: join-containing plans always take the exact probe.
    dim = d.groupBy("source").count()
    j = d.join(F.broadcast(dim), "source")
    assert parallelize_narrow(j) is not j
    # an explicit min_partitions ABOVE the shuffle width must not be
    # swallowed by the exchange shortcut (round-16 ADVICE): the old
    # RDD probe would have repartitioned — so must the cheap form.
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    over = parallelize_narrow(d.groupBy("source").count(),
                              min_partitions=width + 8)
    assert over.rdd.getNumPartitions() == width + 8


def test_cluster_conf_applies(spark):
    """CLUSTER_CONF keys are all settable Spark confs (a typo'd key
    would only surface on a real cluster otherwise)."""
    from capital.session import CLUSTER_CONF

    saved = {}
    for k, v in CLUSTER_CONF.items():
        if k.startswith("spark.sql."):
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)  # raises on unknown/static SQL conf
            assert spark.conf.get(k) == v
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_salted_agg_layout_salt_spreads_key_only_projection(spark):
    """The documented degenerate shape: count(*) over a key-only
    projection has all hot-key rows identical, so the pure-row salt
    maps them to ONE bucket. layout_salt=True mixes in the partition
    id and spreads them — with identical aggregate results."""
    from capital.operators.skew import _row_salt

    hot = spark.range(0, 4000).select(F.lit("HOT").alias("k")).repartition(8)
    # Pure-row salt: one bucket (the degenerate case, documented).
    pure = hot.withColumn("s", _row_salt(hot, 16)).select("s").distinct()
    assert pure.count() == 1
    # Layout salt: spreads across partitions.
    spread = (
        hot.withColumn("s", _row_salt(hot, 16, layout_salt=True))
        .select("s")
        .distinct()
    )
    assert spread.count() > 1
    # Aggregate results identical either way.
    out = salted_agg(
        hot, ["k"], {"n": ("count", None)}, layout_salt=True
    ).collect()
    assert [(r.k, r.n) for r in out] == [("HOT", 4000)]


def test_salted_agg_skips_map_columns(spark):
    """xxhash64 rejects map types (undefined entry order); the salt
    must exclude them instead of raising."""
    df = spark.createDataFrame(
        [("a", {"x": 1}, 2.0), ("a", {"y": 2}, 3.0)],
        "k string, m map<string,int>, v double",
    )
    out = salted_agg(df.select("k", "m", "v"), ["k"], {"s": ("sum", F.col("v"))})
    assert [(r.k, r.s) for r in out.collect()] == [("a", 5.0)]
