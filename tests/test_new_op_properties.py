"""Property tests for the round's new operators: entropy/repetition
bounds, PII-scrub idempotence, and cluster-partition invariants on the
real corpus."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from capital.llm.text import (
    with_char_entropy,
    with_pii_scrub,
    with_repetition,
)

_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00"
    ),
    min_size=0,
    max_size=60,
)
_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(texts=st.lists(_text, min_size=1, max_size=6))
@_slow
def test_entropy_and_repetition_bounds(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = with_repetition(with_char_entropy(df)).collect()
    assert len(rows) == len(texts)
    for r in rows:
        # Entropy: 0 <= H <= log2(#chars) <= log2(len).
        assert r.char_entropy >= 0.0
        n = len(r.text)
        if n:
            assert r.char_entropy <= math.log2(max(n, 2)) + 1e-6
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_token_frac <= 1.0


@given(texts=st.lists(_text, min_size=1, max_size=6))
@_slow
def test_pii_scrub_idempotent(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = with_pii_scrub(df).select(
        "doc_id", F.col("scrubbed_text").alias("text")
    )
    twice = with_pii_scrub(once)
    # Redaction placeholders must not re-match: scrub∘scrub == scrub.
    bad = twice.filter(
        (F.col("n_emails") > 0)
        | (F.col("n_urls") > 0)
        | (F.col("scrubbed_text") != F.col("text"))
    ).count()
    assert bad == 0


def test_clusters_partition_and_pair_consistency(spark, sf_dir):
    """On the real corpus: components cover every doc exactly once,
    every verified near-dup pair lands inside one component, and the
    component id is a member of its own component."""
    from capital.llm.clusters import connected_components
    from capital.llm.dedup import verified_neardup_pairs
    from capital.io import load_table

    d = load_table(spark, sf_dir, "documents")
    pairs = verified_neardup_pairs(
        d, num_hashes=16, bands=4, rows_per_band=4, threshold=0.5
    ).persist()
    comps = connected_components(pairs, d.select("doc_id")).persist()

    assert comps.count() == d.count()
    assert comps.select("doc_id").distinct().count() == d.count()

    labels = {r.doc_id: r.component_id for r in comps.collect()}
    for r in pairs.select("id_a", "id_b").collect():
        assert labels[r.id_a] == labels[r.id_b], (r.id_a, r.id_b)
    # component_id = min member id, and it is itself in the component.
    for doc, comp in labels.items():
        assert comp <= doc
        assert labels[comp] == comp


@given(
    n_tokens=st.integers(min_value=0, max_value=400),
    chunk=st.integers(min_value=2, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_covers_every_token_exactly(spark, n_tokens, chunk,
                                             overlap_frac):
    from capital.llm.text import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    step = chunk - overlap
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_index,
    )
    # tokens("") is [""] — the engine-wide one-empty-token convention.
    n_eff = max(n_tokens, 1)
    # Chunk starts step uniformly; indexes are dense from 0.
    assert [r.chunk_index for r in rows] == list(range(len(rows)))
    # Every token is covered: the last chunk reaches token n_eff, and
    # consecutive chunks leave no gap (start_{i+1} = start_i + step
    # <= start_i + len_i since step <= chunk).
    last_start = (len(rows) - 1) * step + 1
    assert last_start + rows[-1].n_chunk_tokens - 1 == n_eff
    for r in rows[:-1]:
        assert r.n_chunk_tokens == chunk  # only the tail may be short


_key = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    min_size=0,
    max_size=24,
)


@given(
    members=st.lists(_key, min_size=1, max_size=20, unique=True),
    probes=st.lists(_key, min_size=1, max_size=30, unique=True),
)
@_slow
def test_bloom_never_false_negative_and_merge_associative(
    spark, members, probes
):
    """For ANY member/probe sets (arbitrary unicode keys): every
    member probes true, and a two-batch merged filter is bit-identical
    to the at-once build."""
    from capital.llm.bloom import (
        bloom_might_contain,
        bloom_words,
        merge_bloom_words,
    )

    m_bits, k = 1 << 14, 3
    mdf = spark.createDataFrame([(x,) for x in members], "g string")
    words = bloom_words(mdf, "g", m_bits, k)
    probed = bloom_might_contain(
        spark.createDataFrame([(x,) for x in probes], "g string"),
        words,
        "g",
        m_bits,
        k,
    )
    got = {r.g: r.might_contain for r in probed.collect()}
    for x in probes:
        if x in set(members):
            assert got[x] is True, x

    half = max(1, len(members) // 2)
    a = spark.createDataFrame([(x,) for x in members[:half]], "g string")
    b_rows = [(x,) for x in members[half:]]
    if b_rows:
        b = spark.createDataFrame(b_rows, "g string")
        merged = merge_bloom_words(
            bloom_words(a, "g", m_bits, k), bloom_words(b, "g", m_bits, k)
        )
    else:
        merged = bloom_words(a, "g", m_bits, k)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in words.collect()
    }


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB"]),
            st.lists(st.integers(0, 99), min_size=0, max_size=17),
        ),
        min_size=1,
        max_size=8,
    ),
    seq_len=st.integers(1, 9),
)
@_slow
def test_pack_token_ids_stream_property(spark, docs, seq_len):
    """For ANY corpus and seq_len: per-partition chunks reassemble to
    the exact doc-order id stream, every chunk except the last is
    exactly seq_len ids, and doc_starts lists exactly the offsets
    where documents begin in that chunk."""
    from capital.llm.assemble import pack_token_ids

    rows = [(src, i, ids) for i, (src, ids) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, token_ids array<int>"
    )
    out = pack_token_ids(df, seq_len=seq_len).collect()
    chunks = {(r.source, r.chunk_id): r for r in out}
    for src in {s for s, _ in docs}:
        stream, starts = [], []
        for s, i, ids in sorted(rows, key=lambda r: r[1]):
            if s == src:
                if ids:
                    starts.append(len(stream))
                stream.extend(ids)
        cids = sorted(c for s, c in chunks if s == src)
        if not stream:
            assert cids == []
            continue
        assert cids == list(range((len(stream) + seq_len - 1) // seq_len))
        got = []
        for c in cids:
            r = chunks[(src, c)]
            assert r.n_tokens == len(r.token_ids)
            if c < cids[-1]:
                assert len(r.token_ids) == seq_len
            got.extend(r.token_ids)
            want_starts = sorted(
                o - c * seq_len
                for o in starts
                if c * seq_len <= o < (c + 1) * seq_len
            )
            assert r.doc_starts == want_starts
            assert r.n_docs == sum(
                1
                for s, i, ids in rows
                if s == src
                and ids
                and max(_prior(rows, src, i), c * seq_len)
                < min(_prior(rows, src, i) + len(ids), (c + 1) * seq_len)
            )
        assert got == stream


def _prior(rows, src, doc_i):
    """Exclusive running id-count before doc_i within src (doc order)."""
    return sum(
        len(ids)
        for s, i, ids in rows
        if s == src and i < doc_i
    )
