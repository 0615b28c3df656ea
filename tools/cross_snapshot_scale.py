#!/usr/bin/env python
"""Cross-snapshot dedup at design scale (round 12): the flagship new
composition — snapshot_diff classes the re-crawl, ONLY added/changed
docs are shingled and probed against crawl N's LSH band index — run
at 1x/10x/30x the sf0.1 corpus with replica-TAGGED tokens (every
token suffixed with its replica id, the round-2 methodology: the
within-replica diff/duplicate structure is identical and there are
zero cross-replica gram or band collisions, so every output count
must scale EXACTLY linearly — asserted in-run).

Phases per scale: (a) the keyed full-outer diff, (b) crawl N's band
index build (the stored-table write stand-in: materialized band
rows), (c) the added/changed probe against the index. The claim to
evidence: probe volume is churn-sized (added+changed docs only), the
band join carries ids only, and wall grows sub-linearly as the local
stage floors amortize.

Results recorded in DESIGN_SCALE.md (round 12).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SCALES = (1, 10, 30)
SF_DIR = "/root/testdata/sf0.1"


def replicated(spark, n_rep):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(n_rep).withColumnRenamed("id", "rep")
    tagged = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda t: F.concat(t, F.lit("_r"), F.col("rep")),
        ),
        " ",
    )
    return base.crossJoin(reps).select(
        F.col("rep"),
        F.col("doc_id").alias("orig_id"),
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        tagged.alias("text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from capital.llm.dedup import (
        band_keys,
        incremental_neardup_flags,
        minhash_signatures,
    )
    from capital.operators.diff import snapshot_diff
    from capital.queries.llm_queries import (
        _MH_BANDS,
        _MH_HASHES,
        _MH_ROWS,
        _XS_DROP_MOD,
        _XS_EDIT,
        _XS_EDIT_MOD,
        _XS_OLD_MOD,
    )
    from capital.session import get_spark

    spark = get_spark(app_name="cross-snapshot-scale")
    spark.sparkContext.setLogLevel("ERROR")

    base_counts = None
    for n_rep in SCALES:
        d = replicated(spark, n_rep).repartition(32).persist()
        d.count()
        # crawl splits on the ORIGINAL id so every replica carries the
        # same churn structure (exact-linearity assertion)
        old = d.filter(F.col("orig_id") % _XS_OLD_MOD != 0).select(
            "doc_id", "text"
        )
        # The edit suffix is replica-tagged like every other token —
        # an untagged shared suffix gram can become a minhash minimum
        # for many replicas' changed docs and break exact linearity
        # (observed: dups 11,984 vs 11,990 at 10x).
        edit = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(w), F.lit("_r"), F.col("rep"))
                for w in _XS_EDIT.split()
            ],
        )
        new = d.filter(F.col("orig_id") % _XS_DROP_MOD != 0).select(
            "doc_id",
            F.when(
                F.col("orig_id") % _XS_EDIT_MOD == 0,
                F.concat(F.col("text"), F.lit(" "), edit),
            ).otherwise(F.col("text")).alias("text"),
        )

        t0 = time.perf_counter()
        diff = snapshot_diff(old, new, ["doc_id"], ["text"]).persist()
        by_status = dict(
            (r.diff_status, r.n)
            for r in diff.groupBy("diff_status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        t_diff = time.perf_counter() - t0

        t0 = time.perf_counter()
        index = band_keys(
            minhash_signatures(old, num_hashes=_MH_HASHES, shingle_k=3),
            bands=_MH_BANDS,
            rows_per_band=_MH_ROWS,
        ).persist()
        n_index = index.count()
        t_index = time.perf_counter() - t0

        probe_docs = new.join(
            diff.filter(
                F.col("diff_status").isin("added", "changed")
            ).select("doc_id"),
            "doc_id",
        )
        t0 = time.perf_counter()
        flags = incremental_neardup_flags(
            probe_docs, index,
            num_hashes=_MH_HASHES, bands=_MH_BANDS,
            rows_per_band=_MH_ROWS, shingle_k=3,
        )
        agg = flags.agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
        ).collect()[0]
        t_probe = time.perf_counter() - t0

        counts = {
            **by_status,
            "index_rows": n_index,
            "probed": agg.n_probed,
            "dups": agg.n_dups,
        }
        if base_counts is None:
            base_counts = counts
        else:
            for k, v in counts.items():
                if k == "dups":
                    # MinHash minima depend on the hash VALUES of the
                    # replica-tagged shingles, so each replica is an
                    # independent draw of the banding experiment —
                    # dup flags are ≈linear (LLN), not exactly linear
                    # (observed ±0.03% at 10x). Everything upstream of
                    # the probabilistic banding must be EXACT.
                    lo, hi = 0.97 * n_rep, 1.03 * n_rep
                    assert lo <= v / base_counts[k] <= hi, (k, v, n_rep)
                else:
                    assert v == base_counts[k] * n_rep, (k, v, n_rep)
        print(
            f"{n_rep:>2}x: docs={d.count():>9,}  diff={t_diff:6.2f}s "
            f"(added={by_status.get('added', 0):,} "
            f"changed={by_status.get('changed', 0):,} "
            f"removed={by_status.get('removed', 0):,})  "
            f"index={t_index:6.2f}s ({n_index:,} band rows)  "
            f"probe={t_probe:6.2f}s "
            f"(probed={agg.n_probed:,} dups={agg.n_dups:,})"
        )
        if n_rep > 1:
            print(
                f"    diff/index/probe counts exactly {n_rep}x the 1x "
                f"run; dup flags within the LLN band"
            )
        index.unpersist()
        diff.unpersist()
        d.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
