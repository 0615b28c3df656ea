#!/usr/bin/env python
"""Stream-vs-batch equality for the modern curation funnel at 1x-10x
(round-16 verdict ask #7's scale stratum): replicate the sf0.001
corpus with fresh ascending ids — plain replication makes every
replica an EXACT text copy, so the line-dedup and MinHash tiers face
N-sized duplicate clusters spanning batch boundaries, the hardest
regime for the incremental state semantics — split into 3
doc_id-ascending files, run ``incremental_curation_run`` against a
stored NB model + static benchmark, and assert the union of flag
partitions equals the batch funnel (same model) row-for-row.

Also reports per-scale wall and survivor counts. Note the replica
corpus is NOT survivor-identical to 1x: ``id' = id*N + rep`` puts one
replica of EVERY original doc into the benchmark stratum (id' % 10 ==
0 iff rep == 0), so at N>1 the benchmark covers the whole corpus
text-wise and decontamination fires on nearly every survivor — the
hardest decon regime — while each original doc's N-1 work replicas
collapse to one survivor via the exact-dup cluster tiers.

Results recorded in DESIGN_SCALE.md (round 16).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SCALES = (1, 10)


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from capital.io import load_table
    from capital.llm.nbayes import nb_load, nb_save, nb_train
    from capital.llm.pipeline_v2 import (
        V2_BENCH_MOD,
        curation_v2,
        gate_flags,
    )
    from capital.session import get_spark
    from capital.streaming.incremental import incremental_curation_run

    spark = get_spark(app_name="curation-stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
        ]
    )
    base_survivors = None
    base_docs = base.count()
    for n in SCALES:
        if n == 1:
            docs = base
        else:
            rep = spark.range(n).withColumnRenamed("id", "rep")
            # id' = doc_id * n + rep keeps ascending order grouped by
            # original id; bench membership (id' % MOD) varies per
            # replica — fine, both paths see the same corpus.
            docs = base.crossJoin(rep).select(
                (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
                "text", "lang", "source",
            )
        docs = docs.localCheckpoint(eager=True)
        root = tempfile.mkdtemp(prefix=f"cur_stream_{n}x_")
        try:
            work = docs.filter((F.col("doc_id") % V2_BENCH_MOD) != 0)
            c0, _ = gate_flags(work)
            model_dir = os.path.join(root, "model")
            nb_save(
                nb_train(c0.select("doc_id", "lang", "text")),
                model_dir,
            )
            model = nb_load(spark, model_dir)
            bench_path = os.path.join(root, "bench")
            docs.filter(
                (F.col("doc_id") % V2_BENCH_MOD) == 0
            ).select("doc_id", "text").write.parquet(bench_path)

            t0 = time.perf_counter()
            batch_rows = {
                r.doc_id: (
                    r.n_lines, r.n_removed_lines, r.n_tokens,
                    r.n_removed_tokens, r.scrubbed_md5,
                )
                for r in curation_v2(docs, nb_model=model).collect()
            }
            t_batch = time.perf_counter() - t0

            src = os.path.join(root, "src")
            ids = sorted(
                r.doc_id for r in docs.select("doc_id").collect()
            )
            cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
            parts = [
                docs.filter(F.col("doc_id") < cuts[0]),
                docs.filter(
                    (F.col("doc_id") >= cuts[0])
                    & (F.col("doc_id") < cuts[1])
                ),
                docs.filter(F.col("doc_id") >= cuts[1]),
            ]
            for p in parts:
                p.coalesce(1).write.mode("append").parquet(src)
            dirs = {
                k: os.path.join(root, k)
                for k in ("lines", "bands", "shingles", "flags", "ckpt")
            }
            t0 = time.perf_counter()
            q = incremental_curation_run(
                spark, src, schema,
                model_dir=model_dir,
                bench_path=bench_path,
                lines_state_dir=dirs["lines"],
                bands_state_dir=dirs["bands"],
                shingles_state_dir=dirs["shingles"],
                flags_dir=dirs["flags"],
                checkpoint_dir=dirs["ckpt"],
                max_files_per_trigger=1,
            )
            q.awaitTermination(1800)
            t_stream = time.perf_counter() - t0
            stream_rows = {
                r.doc_id: (
                    r.n_lines, r.n_removed_lines, r.n_tokens,
                    r.n_removed_tokens, r.scrubbed_md5,
                )
                for r in spark.read.parquet(dirs["flags"]).collect()
            }
            assert stream_rows == batch_rows, (
                n,
                len(stream_rows),
                len(batch_rows),
                dict(list(
                    (set(stream_rows.items())
                     ^ set(batch_rows.items()))
                ))
                if len(stream_rows) < 50_000 else "diff large",
            )
            print(
                f"{n:3d}x: docs={docs.count()} "
                f"survivors={len(batch_rows)} "
                f"batch={t_batch:6.2f}s stream(3 batches)="
                f"{t_stream:6.2f}s — stream == batch row-for-row"
            )
            if n == 1:
                base_survivors = len(batch_rows)
            else:
                # each surviving cluster keeps exactly ONE of the
                # N-1 work replicas: survivors never exceed the
                # distinct original-doc count.
                assert len(batch_rows) <= base_docs
        finally:
            shutil.rmtree(root, ignore_errors=True)
        spark.catalog.clearCache()
    print(f"1x survivors={base_survivors}; replica clusters collapse "
          "to one survivor each (<= distinct original docs)")


if __name__ == "__main__":
    main()
