"""Skew-bounded pair enumeration (capital.operators.skew.
chunked_pair_join): identical output to the naive block self-join on a
pathological one-hot-block fixture, with per-bucket candidate counts
hard-bounded — the property AQE's skew split cannot give a self-join
(it bounds input, not quadratic output)."""

from __future__ import annotations

import contextlib
import io
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from capital.llm.dedup import (
    simhash_bits,
    simhash_fullrecall_pairs,
    simhash_neardup_pairs,
)
from capital.operators.skew import chunked_blocks, chunked_pair_join

CHUNK_TARGET = 25


def _skewed(spark):
    """One 200-row hot block + two small blocks + a singleton."""
    rows = (
        [(i, "HOT", f"sig{i % 7}") for i in range(200)]
        + [(1000 + i, "small1", "x") for i in range(5)]
        + [(2000 + i, "small2", "y") for i in range(3)]
        + [(3000, "lonely", "z")]
    )
    return spark.createDataFrame(rows, "id bigint, block string, p string")


def _naive_pairs(df):
    data = [(r.id, r.block) for r in df.collect()]
    by_block: dict[str, list[int]] = {}
    for i, b in data:
        by_block.setdefault(b, []).append(i)
    return {
        (a, b)
        for ids in by_block.values()
        for a, b in itertools.combinations(sorted(ids), 2)
    }


def test_chunked_pairs_match_naive_under_skew(spark):
    df = _skewed(spark)
    got = {
        (r.id_a, r.id_b)
        for r in chunked_pair_join(
            df, ["block"], "id", chunk_target=CHUNK_TARGET
        ).collect()
    }
    assert got == _naive_pairs(df)
    # 200*199/2 + 5*4/2 + 3*2/2 pairs; the singleton contributes none.
    assert len(got) == 19900 + 10 + 3


def test_total_rows_hint_fast_path_matches(spark):
    """total_rows_hint small enough -> plain join with NO probe job,
    identical pairs; a big hint falls through to the probed path."""
    df = _skewed(spark)
    n = df.count()
    expect = _naive_pairs(df)
    # n=209, chunk_target=74: 209^2 < 8*74^2 -> hint path engages.
    got = {
        (r.id_a, r.id_b)
        for r in chunked_pair_join(
            df, ["block"], "id", chunk_target=74, total_rows_hint=n
        ).collect()
    }
    assert got == expect
    # Oversized hint: must NOT take the plain path blindly — falls
    # back to probe, and with the hot block over target, chunks.
    got2 = {
        (r.id_a, r.id_b)
        for r in chunked_pair_join(
            df,
            ["block"],
            "id",
            chunk_target=CHUNK_TARGET,
            total_rows_hint=10_000_000,
        ).collect()
    }
    assert got2 == expect

    from capital.operators.skew import plain_by_hint

    assert plain_by_hint(209, 74)
    assert not plain_by_hint(10_000_000, 1024)


def test_chunked_pairs_payload_sides(spark):
    df = _skewed(spark)
    out = chunked_pair_join(
        df, ["block"], "id", payload_cols=["p"], chunk_target=CHUNK_TARGET
    )
    assert {"id_a", "id_b", "p_a", "p_b"} <= set(out.columns)
    row = out.filter((F.col("id_a") == 1000) & (F.col("id_b") == 1001)).first()
    assert (row.p_a, row.p_b) == ("x", "x")


def test_per_bucket_candidates_bounded(spark):
    """The scale property: no (block, chunk, chunk) bucket ever holds
    more than ~chunk_target^2 candidate comparisons, so a boilerplate
    mega-block cannot produce a straggler task."""
    df = _skewed(spark)
    chunks = chunked_blocks(df, ["block"], "id", chunk_target=CHUNK_TARGET)
    sizes = (
        chunks.groupBy("block", "__s", "__c")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    hot = [r for r in sizes if r.block == "HOT"]
    assert hot and hot[0]["__s"] == 8  # ceil(200 / 25)
    # Hash chunking is approximately uniform; 3x slack on the target.
    max_chunk = max(r.n for r in sizes)
    assert max_chunk <= 3 * CHUNK_TARGET
    # Worst bucket comparisons = max_i n_i * max_j n_j.
    assert max_chunk * max_chunk <= (3 * CHUNK_TARGET) ** 2
    # Singleton blocks are pruned before the explode.
    assert not [r for r in sizes if r.block == "lonely"]


def test_chunked_pairs_plan_has_no_cartesian(spark):
    df = _skewed(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunked_pair_join(df, ["block"], "id").explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_on_boilerplate_corpus(spark):
    """End-to-end through simhash_neardup_pairs on a corpus where every
    doc shares the same prefix block (identical text => hamming 0):
    chunking must not lose or duplicate any pair."""
    n = 60
    docs = spark.createDataFrame(
        [(i, "the same boilerplate footer text") for i in range(n)],
        "doc_id bigint, text string",
    )
    sigs = simhash_bits(docs)
    pairs = simhash_neardup_pairs(sigs).collect()
    assert len(pairs) == n * (n - 1) // 2
    assert all(r.hamming == 0 and r.id_a < r.id_b for r in pairs)


def _sig_df(spark, sigs: dict[int, str]):
    return spark.createDataFrame(
        list(sigs.items()), "doc_id bigint, simhash_bits string"
    )


def test_fullrecall_catches_prefix_blind_spot(spark):
    """Pair differing in 2 bits, both inside the 16-bit prefix: the
    prefix variant misses it; the pigeonhole segments (8 bits each)
    still agree on segments 3-4, so full recall finds it."""
    a = "1" * 32
    b = "0" + "1" * 6 + "0" + "1" * 24  # bits 1 and 8 flipped
    sigs = _sig_df(spark, {1: a, 2: b})
    prefix = simhash_neardup_pairs(sigs, prefix_bits=16, max_hamming=3)
    full = simhash_fullrecall_pairs(sigs, max_hamming=3)
    assert prefix.count() == 0
    got = full.collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 2)]


def test_fullrecall_matches_bruteforce(spark):
    """Property: on random signatures, full-recall output == exact
    brute-force hamming<=k pair enumeration (no false negatives, no
    duplicates, no over-threshold pairs)."""
    import random

    rng = random.Random(7)
    base = [rng.choice("01") for _ in range(32)]
    sigs = {}
    for i in range(40):
        s = list(base)
        for pos in rng.sample(range(32), rng.randint(0, 5)):
            s[pos] = "1" if s[pos] == "0" else "0"
        sigs[i] = "".join(s)
    expected = {
        (i, j, sum(x != y for x, y in zip(sigs[i], sigs[j])))
        for i in sigs
        for j in sigs
        if i < j
        and sum(x != y for x, y in zip(sigs[i], sigs[j])) <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_fullrecall_pairs(
            _sig_df(spark, sigs), max_hamming=3
        ).collect()
    }
    assert got == expected


_hyp = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_hyp
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1,
                   max_size=6),
    chunk_target=st.integers(min_value=2, max_value=30),
)
def test_chunked_pairs_equivalence_property(spark, sizes, chunk_target):
    """For ANY block-size distribution and chunk target, the chunked
    enumeration equals naive within-block i<j pairs exactly."""
    rows, next_id = [], 0
    for b, n in enumerate(sizes):
        for _ in range(n):
            rows.append((next_id, f"b{b}"))
            next_id += 1
    df = spark.createDataFrame(rows, "id bigint, block string")
    got = {
        (r.id_a, r.id_b)
        for r in chunked_pair_join(
            df, ["block"], "id", chunk_target=chunk_target
        ).collect()
    }
    assert got == _naive_pairs(df)
