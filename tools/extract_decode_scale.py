#!/usr/bin/env python
"""Scale guards for the two round-15 shuffle-free kernels
(round-16 verdict ask #5, closing the round-14 convention that every
kernel rewrite ships a 1x-30x replica run):

- ``extract_main_content`` (HTML boilerplate stripping): PER-DOCUMENT
  and a pure function of the text, so replicating documents under
  fresh ids is an EXACT invariant — every integer signal sum
  (n_blocks, n_kept, main_chars) grows exactly N-fold and the
  distinct main_md5 set is unchanged.
- ``real_decode_assets`` on baseline JPEG payloads: PER-ASSET and a
  pure function of the payload bytes, so replicating the 1x ASSET
  table (same payloads, fresh ids) makes every decoded integer sum
  (width, height, pix_sum, pix_dot) exactly N-fold.

Both kernels are the round-13 per-document shape: nothing crosses a
document/asset boundary, so wall must scale ~linearly in rows.
Results recorded in DESIGN_SCALE.md (round 16).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 30)


def main() -> None:
    from pyspark.sql import functions as F

    from bm25_index_scale import replicate

    from capital.io import clear_engine_cache, load_table
    from capital.llm.extract import extract_main_content, with_html_fixture
    from capital.llm.multimodal import (
        real_decode_assets,
        synthesize_jpeg_assets,
    )
    from capital.session import get_spark

    spark = get_spark(app_name="extract-decode-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # --- HTML main-content extraction -------------------------------
    ex_cols = ["n_blocks", "n_kept", "main_chars"]
    base = None
    for n in SCALES:
        rep = replicate(spark, docs, n)
        t0 = time.perf_counter()
        out = extract_main_content(with_html_fixture(rep))
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"),
            *[F.sum(c).cast("long").alias(c) for c in ex_cols],
            F.count_distinct("main_md5").alias("n_md5"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        got = tuple(int(agg[c]) for c in ["rows"] + ex_cols)
        print(f"html_extract {n:3d}x: rows={got[0]} "
              f"distinct_md5={agg['n_md5']} {dt:6.2f}s")
        if n == 1:
            base = got
            base_md5 = int(agg["n_md5"])
        else:
            assert got == tuple(v * n for v in base), (n, got, base)
            assert int(agg["n_md5"]) == base_md5
            print(f"  every signal sum exactly {n}x, md5 set fixed"
                  " — linear")
        clear_engine_cache(spark)

    # --- REAL JPEG decode --------------------------------------------
    assets1 = synthesize_jpeg_assets(
        docs.select("doc_id")
    ).persist()
    n1 = assets1.count()
    mm_cols = ["width", "height", "pix_sum", "pix_dot"]
    base = None
    for n in SCALES:
        if n == 1:
            rep = assets1
        else:
            r = spark.range(n).withColumnRenamed("id", "rep")
            rep = assets1.crossJoin(r).select(
                (F.col("asset_id") * n + F.col("rep")).alias(
                    "asset_id"
                ),
                "payload",
            )
        t0 = time.perf_counter()
        agg = real_decode_assets(rep).agg(
            F.count(F.lit(1)).alias("rows"),
            *[F.sum(c).cast("long").alias(c) for c in mm_cols],
            F.sum(F.isnull("width").cast("long")).alias("n_dead"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        got = tuple(int(agg[c]) for c in ["rows"] + mm_cols)
        print(f"jpeg_decode {n:3d}x: rows={got[0]} "
              f"dead={agg['n_dead']} {dt:6.2f}s")
        assert int(agg["n_dead"]) == 0
        if n == 1:
            assert got[0] == n1
            base = got
        else:
            assert got == tuple(v * n for v in base), (n, got, base)
            print(f"  every decoded integer sum exactly {n}x — linear")
        clear_engine_cache(spark)
    assets1.unpersist()


if __name__ == "__main__":
    main()
