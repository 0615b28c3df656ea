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
