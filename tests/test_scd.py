"""SCD2 history maintenance (operators/scd.py): versioning semantics,
null-transition changes, replay idempotence, current-snapshot view."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.operators.scd import (
    scd2_apply,
    scd2_current,
    scd2_init,
)


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
        "k int, attr string, price double",
    )
    return scd2_init(snap, "2024-01-01")


def test_apply_versions_changes_and_keeps_rest(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [
            (1, "a", 15.0),      # price change -> close + reopen
            (2, "b", 20.0),      # no-op re-send
            (3, "c", 30.0),      # NULL -> value transition counts
            (9, "new", 1.0),     # brand-new key
        ],
        "k int, attr string, price double",
    )
    out = scd2_apply(dim, updates, ["k"], ["attr", "price"], "2024-06-01")
    rows = {
        (r.k, r.attr, r.price, str(r.valid_from), str(r.valid_to))
        for r in out.collect()
    }
    assert rows == {
        (1, "a", 10.0, "2024-01-01", "2024-06-01"),
        (1, "a", 15.0, "2024-06-01", "None"),
        (2, "b", 20.0, "2024-01-01", "None"),
        (3, None, 30.0, "2024-01-01", "2024-06-01"),
        (3, "c", 30.0, "2024-06-01", "None"),
        (9, "new", 1.0, "2024-06-01", "None"),
    }
    cur = {
        (r.k, r.attr, r.price) for r in scd2_current(out).collect()
    }
    assert cur == {(1, "a", 15.0), (2, "b", 20.0), (3, "c", 30.0), (9, "new", 1.0)}


def test_replaying_same_batch_is_noop(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [(1, "a", 15.0)], "k int, attr string, price double"
    )
    once = scd2_apply(dim, updates, ["k"], ["attr", "price"], "2024-06-01")
    twice = scd2_apply(once, updates, ["k"], ["attr", "price"], "2024-06-01")
    a = sorted(tuple(map(str, r)) for r in once.collect())
    b = sorted(tuple(map(str, r)) for r in twice.collect())
    assert a == b


def test_second_batch_extends_history(spark):
    dim = _dim(spark)
    u1 = spark.createDataFrame(
        [(1, "a", 15.0)], "k int, attr string, price double"
    )
    u2 = spark.createDataFrame(
        [(1, "a", 17.0)], "k int, attr string, price double"
    )
    out = scd2_apply(
        scd2_apply(dim, u1, ["k"], ["attr", "price"], "2024-06-01"),
        u2,
        ["k"],
        ["attr", "price"],
        "2024-09-01",
    )
    versions = sorted(
        (r.price, str(r.valid_from), str(r.valid_to))
        for r in out.filter(F.col("k") == 1).collect()
    )
    assert versions == [
        (10.0, "2024-01-01", "2024-06-01"),
        (15.0, "2024-06-01", "2024-09-01"),
        (17.0, "2024-09-01", "None"),
    ]


def test_asof_lookup_plans_as_broadcast_hash_join(spark, sf_dir):
    """The interval predicate must ride a broadcast HASH join on the
    equi-key (the residual-condition shape) — never a nested loop."""
    import contextlib
    import io as _io

    from capital.queries import all_queries

    df = all_queries()["j8_scd2_asof_lookup"](spark, sf_dir)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # Every fact resolves to exactly one version.
    from capital.io import load_table
    n_facts = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 11 == 0)
        .count()
    )
    assert df.count() == n_facts


def test_asof_lookup_broadcast_escape_hatch(spark):
    """broadcast=False must degrade to a shuffled sort-merge join (a
    fact-sized 'dimension' cannot be forced through a broadcast OOM);
    broadcast=True keeps the forced hint even for frames whose size
    Catalyst cannot estimate as small."""
    import contextlib
    import io as _io

    from capital.operators.scd import scd2_asof_lookup

    facts = spark.range(0, 1000).select(
        (F.col("id") % 50).cast("int").alias("k"),
        F.to_date(F.lit("2024-06-15")).alias("d"),
    )
    dim = scd2_init(
        spark.range(0, 50).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("double").alias("price"),
        ),
        "2024-01-01",
    )

    def plan_of(df):
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    forced = plan_of(
        scd2_asof_lookup(facts, dim, ["k"], "d", broadcast=True)
    )
    assert "BroadcastHashJoin" in forced

    merged = scd2_asof_lookup(facts, dim, ["k"], "d", broadcast=False)
    plan = plan_of(merged)
    # No forced broadcast: the compile-time plan shuffles both sides
    # (AQE may still pick a broadcast at runtime from measured sizes —
    # that is the safe direction).
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # Semantics identical either way.
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(
        tuple(r)
        for r in scd2_asof_lookup(
            facts, dim, ["k"], "d", broadcast=True
        ).collect()
    )
    assert a == b and len(a) == 1000


def _split_updates(spark):
    return spark.createDataFrame(
        [
            (1, "a", 15.0),      # price change -> close + reopen
            (2, "b", 20.0),      # no-op re-send
            (9, "new", 1.0),     # brand-new key
        ],
        "k int, attr string, price double",
    )


def test_split_layout_matches_in_memory_apply(spark, tmp_path):
    """scd2_apply_split over the split lake layout must recombine to
    exactly the in-memory scd2_apply history, with the closed slice
    landing as ONE valid_to partition (append-only archive)."""
    import os

    from capital.operators.scd import (
        scd2_apply_split,
        scd2_init_split,
        scd2_read_split,
    )

    path = str(tmp_path / "dim")
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
        "k int, attr string, price double",
    )
    scd2_init_split(snap, path, "2024-01-01")
    scd2_apply_split(
        spark, path, _split_updates(spark), ["k"], ["attr", "price"],
        "2024-06-01",
    )

    got = {
        (r.k, r.attr, r.price, str(r.valid_from), str(r.valid_to))
        for r in scd2_read_split(spark, path).collect()
    }
    want = {
        (r.k, r.attr, r.price, str(r.valid_from), str(r.valid_to))
        for r in scd2_apply(
            _dim(spark), _split_updates(spark), ["k"], ["attr", "price"],
            "2024-06-01",
        ).collect()
    }
    assert got == want

    # The closed slice is partitioned by valid_to: exactly the batch
    # date's partition exists; the open slice carries no closures.
    parts = sorted(
        d for d in os.listdir(f"{path}/closed") if d.startswith("valid_to=")
    )
    assert parts == ["valid_to=2024-06-01"]


def test_split_layout_replay_is_idempotent(spark, tmp_path):
    """Re-applying the identical batch must converge: the closed
    partition is regenerated (dynamic overwrite), never duplicated,
    and the open slice is unchanged."""
    from capital.operators.scd import (
        scd2_apply_split,
        scd2_init_split,
        scd2_read_split,
    )

    path = str(tmp_path / "dim")
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "k int, attr string, price double",
    )
    scd2_init_split(snap, path, "2024-01-01")
    for _ in range(3):  # original + two replays
        scd2_apply_split(
            spark, path, _split_updates(spark), ["k"], ["attr", "price"],
            "2024-06-01",
        )
    rows = sorted(
        (r.k, r.attr, r.price, str(r.valid_from), str(r.valid_to))
        for r in scd2_read_split(spark, path).collect()
    )
    assert rows == [
        (1, "a", 10.0, "2024-01-01", "2024-06-01"),
        (1, "a", 15.0, "2024-06-01", "None"),
        (2, "b", 20.0, "2024-01-01", "None"),
        (9, "new", 1.0, "2024-06-01", "None"),
    ]


def test_split_layout_second_batch_appends_partition(spark, tmp_path):
    """A later batch adds its own valid_to partition; earlier closed
    partitions are untouched (mtime check — the append-only
    contract)."""
    import os

    from capital.operators.scd import (
        scd2_apply_split,
        scd2_init_split,
        scd2_read_split,
    )

    path = str(tmp_path / "dim")
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "k int, attr string, price double",
    )
    scd2_init_split(snap, path, "2024-01-01")
    scd2_apply_split(
        spark, path, _split_updates(spark), ["k"], ["attr", "price"],
        "2024-06-01",
    )
    first = f"{path}/closed/valid_to=2024-06-01"
    stamp = max(
        os.path.getmtime(os.path.join(first, f)) for f in os.listdir(first)
    )

    batch2 = spark.createDataFrame(
        [(1, "a", 99.0)], "k int, attr string, price double"
    )
    scd2_apply_split(
        spark, path, batch2, ["k"], ["attr", "price"], "2024-09-01"
    )
    parts = sorted(
        d for d in os.listdir(f"{path}/closed") if d.startswith("valid_to=")
    )
    assert parts == ["valid_to=2024-06-01", "valid_to=2024-09-01"]
    stamp2 = max(
        os.path.getmtime(os.path.join(first, f)) for f in os.listdir(first)
    )
    assert stamp2 == stamp  # June's archive partition never rewritten

    hist = scd2_read_split(spark, path)
    assert hist.count() == 5  # closed: k1@10, k1@15; open: k1, k2, k9
    open_k1 = hist.filter(
        (F.col("k") == 1) & F.col("valid_to").isNull()
    ).collect()
    assert len(open_k1) == 1 and open_k1[0].price == 99.0
