"""Product quantization (capital/llm/pq.py): ADC exactness on a
centroid grid (lossless-reconstruction property), recall vs the exact
brute force, code packing bounds, and codebook determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.pq import (
    adc_score,
    encode_pq,
    pq_topk,
    query_adc_tables,
    train_codebooks,
)
from capital.llm.similarity import cosine_topk

_K = 5
_N_QUERIES = 8


def test_adc_exact_on_centroid_grid(spark):
    """Vectors sitting exactly on the codebook grid reconstruct
    losslessly, so ADC must equal the true squared distance to the
    (normalized) query — the property that pins the whole
    encode/table/lookup machinery without KMeans in the loop."""
    # dim=4, m=2 subspaces of d=2, unit-norm vectors on the grid.
    books = [
        [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0], [9.0, 9.0]],
        [[0.0, 0.0], [0.6, 0.8], [0.0, 1.0], [9.0, 9.0]],
    ]
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # subs: b0[0], b1[0]
        (1, [0.0, 1.0, 0.0, 0.0]),   # subs: b0[1], b1[0]
        (2, [0.0, 0.0, 0.6, 0.8]),   # subs: b0[2], b1[1]
        (3, [0.0, 0.0, 0.0, 1.0]),   # subs: b0[2], b1[2]
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    coded = encode_pq(df, books)
    q = [0.5, 0.5, 0.5, 0.5]  # unit-norm query
    qdf = query_adc_tables(
        spark.createDataFrame([(99, q)], "vec_id long, embedding array<double>"),
        books,
    )
    out = {
        r.vec_id: r.adc
        for r in coded.crossJoin(qdf.select("qtab"))
        .withColumn("adc", adc_score(F.col("pq_code"), F.col("qtab"), m=2, ks=4))
        .collect()
    }
    for vid, v in vecs:
        true = sum((a - b) ** 2 for a, b in zip(q, v))
        assert math.isclose(out[vid], true, rel_tol=1e-9), (vid, out[vid], true)


def test_pq_codes_pack_and_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_codebooks(emb, dim=64)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    codes = encode_pq(emb, books)
    row = codes.agg(
        F.min("pq_code"), F.max("pq_code"), F.count_distinct("pq_code")
    ).collect()[0]
    assert row[0] >= 0
    assert row[1] < (1 << 32)  # 8 x 4-bit fields
    assert row[2] > 1  # the corpus doesn't collapse to one code


def test_pq_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = cosine_topk(emb, queries, k=_K)
    approx = pq_topk(emb, queries, k=_K, dim=64)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 4-bit codes decide the shortlist, exact cosine decides the
    # order (rerank=8k default): measured 0.68 on the near-random
    # synthetic embeddings vs 0.17 for pure-ADC rank@5 — quantization
    # alone cannot order this data, which is exactly why the
    # two-phase shape is the production one. Bound set under the
    # measurement; the qualitative claim (rerank ≫ raw ADC) is the
    # stable property.
    assert recall >= 0.6, f"recall {recall:.2f}"
    raw = pq_topk(emb, queries, k=_K, dim=64, rerank=_K)  # ≈ pure ADC
    r = {(x.query_id, x.neighbor_id) for x in raw.collect()}
    assert recall > len(e & r) / len(e), "rerank must beat raw ADC order"
    counts = {
        r.query_id: r.n
        for r in approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(v == _K for v in counts.values()), counts


def test_codebooks_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    b1 = train_codebooks(emb, dim=64)
    b2 = train_codebooks(emb, dim=64)
    assert b1 == b2


def test_stored_ivfpq_fullprobe_equals_brute_force(spark, sf_dir, tmp_path):
    """nprobe = all cells and rerank >= corpus: the stored two-phase
    path degenerates to exact search — pins the whole
    write→prune→ADC→rerank machinery against the brute-force truth."""
    from capital.llm.pq import probe_ivfpq_index, write_ivfpq_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, dim=64, n_cells=8)
    n = emb.count()
    stored = probe_ivfpq_index(
        spark, path, queries, k=_K, nprobe=8, rerank=n
    )
    exact = cosine_topk(emb, queries, k=_K)
    s = sorted((r.query_id, r.rank, r.neighbor_id) for r in stored.collect())
    e = sorted((r.query_id, r.rank, r.neighbor_id) for r in exact.collect())
    assert s == e


def test_stored_ivfpq_prunes_partitions_and_columns(spark, sf_dir, tmp_path):
    """The ADC scan must read only the probed cell partitions
    (PartitionFilters) and only the code column (ReadSchema without
    c_vec) — partition pruning = list selection, column pruning = the
    32x memory win, both at the storage layer."""
    import contextlib
    import io as _io

    from capital.llm.pq import probe_ivfpq_index, write_ivfpq_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, dim=64, n_cells=8)
    out = probe_ivfpq_index(spark, path, queries, k=_K, nprobe=3)
    assert out.count() > 0

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    adc_scans = [
        l
        for l in plan.splitlines()
        if "ReadSchema" in l and "pq_code" in l
    ]
    assert adc_scans, "no ADC scan found"
    assert all("c_vec" not in l for l in adc_scans), adc_scans


def test_stored_ivfpq_realistic_probe_recall(spark, sf_dir, tmp_path):
    """Realistic settings (nprobe < cells, rerank = 8k): the pruned
    two-phase search must still recover most true neighbors — the
    recall check every ANN index ships with."""
    from capital.llm.pq import probe_ivfpq_index, write_ivfpq_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, dim=64, n_cells=8)
    approx = probe_ivfpq_index(spark, path, queries, k=_K, nprobe=4)
    exact = cosine_topk(emb, queries, k=_K)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # Half the cells probed + PQ shortlist + exact rerank; measured
    # on the synthetic embeddings at sf0.001/sf0.01 fixtures.
    assert recall >= 0.5, f"recall {recall:.2f}"
