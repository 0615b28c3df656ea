"""IVF ANN validation: the index is not SQL-expressible (KMeans
model), so correctness is held the way ANN indexes are validated in
production — recall against the exact brute-force baseline, plus
structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.ivf import assign_cells, ivf_topk, train_centroids
from capital.llm.similarity import cosine_topk

_K = 5
_N_QUERIES = 8


def _tables(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") < _N_QUERIES)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb, queries = _tables(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=_K)
    approx = ivf_topk(emb, queries, k=_K, n_cells=8, nprobe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # nprobe=4 of 8 cells: half the space probed; recall must be high
    # for clustered data and is deterministic (fixed KMeans seed).
    assert recall >= 0.6, f"recall {recall:.2f}"
    # Every query returns exactly k ranked neighbors.
    counts = {r.query_id: r.n for r in approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == _K for v in counts.values()), counts


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    # Probing every cell must recover the exact result: the cell
    # partition is lossless, only the pruning is approximate.
    emb, queries = _tables(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=_K)
    full = ivf_topk(emb, queries, k=_K, n_cells=8, nprobe=8)
    e = sorted((r.query_id, r.rank, r.neighbor_id) for r in exact.collect())
    f = sorted((r.query_id, r.rank, r.neighbor_id) for r in full.collect())
    assert e == f


def test_assign_cells_partitions_corpus(spark, sf_dir):
    emb, _ = _tables(spark, sf_dir)
    centroids = train_centroids(emb, n_cells=8)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    assigned = assign_cells(emb, centroids, nprobe=1)
    # nprobe=1: a partition, not a replication.
    assert assigned.count() == emb.count()
    n_cells_used = assigned.select("cell").distinct().count()
    assert 1 < n_cells_used <= 8


def test_stored_index_probe_matches_in_memory(spark, sf_dir, tmp_path):
    """write_ivf_index -> probe_ivf_index with the same centroids must
    return exactly what the in-memory ivf_topk returns, and the list
    scan must prune to the probed cell partitions (PartitionFilters —
    the Hive layout IS the inverted list)."""
    from capital.llm.ivf import probe_ivf_index, write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivf")
    centroids = write_ivf_index(emb, path, n_cells=8)

    stored = probe_ivf_index(spark, path, queries, k=5, nprobe=3)
    mem = ivf_topk(
        emb, queries, k=5, n_cells=8, nprobe=3, centroids=centroids
    )
    assert {tuple(r) for r in stored.collect()} == {
        tuple(r) for r in mem.collect()
    }

    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        stored.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cell IN" in plan or "cell#" in plan


def test_stored_index_appends_with_shared_centroids(spark, sf_dir, tmp_path):
    """Growing-lake shape: a second batch indexed with the SAME stored
    centroids lands in the same cell layout; probing sees both."""
    from capital.llm.ivf import probe_ivf_index, write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    centroids = write_ivf_index(first, path, n_cells=8)

    # Append the second batch under the same centroids (no retrain).
    from capital.llm.ivf import assign_cells as _ac

    _ac(
        second.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
        ),
        centroids,
        vec_col="c_vec",
        nprobe=1,
    ).write.mode("append").partitionBy("cell").parquet(f"{path}/lists")

    queries = emb.filter(F.col("vec_id") < 4)
    stored = probe_ivf_index(spark, path, queries, k=5, nprobe=8)
    full = ivf_topk(
        emb, queries, k=5, n_cells=8, nprobe=8, centroids=centroids
    )
    assert {tuple(r) for r in stored.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_index_rebuild_drops_stale_cells(spark, sf_dir, tmp_path):
    """A full rebuild at an existing path must DELETE cell partitions
    the new assignment doesn't produce. The engine session default is
    dynamic partition-overwrite (right for appends); the index writers
    force static mode for rebuilds — otherwise stale cell= dirs
    survive and probes scan them under the NEW centroids (silently
    wrong neighbors)."""
    import os

    from capital.llm.ivf import write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, n_cells=8)
    cells_before = {
        d for d in os.listdir(f"{path}/lists") if d.startswith("cell=")
    }
    assert len(cells_before) > 2

    # Rebuild with a 2-cell quantizer: only cells {0, 1} can exist.
    write_ivf_index(emb, path, n_cells=2)
    cells_after = {
        d for d in os.listdir(f"{path}/lists") if d.startswith("cell=")
    }
    assert cells_after <= {"cell=0", "cell=1"}, cells_after

    # Probing the rebuilt index sees only the new corpus rows.
    from capital.llm.ivf import probe_ivf_index

    queries = emb.filter(F.col("vec_id") < 4)
    got = probe_ivf_index(spark, path, queries, k=5, nprobe=2)
    assert got.count() == 4 * 5
