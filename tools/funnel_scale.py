#!/usr/bin/env python
"""End-to-end cleaning funnel (pipe_funnel_stats) at 1x-10x the sf0.1
corpus.

Plain replication (identical text under fresh doc_ids) gives the
funnel a TWO-SIDED exact invariant, no LLN band needed:

- the quality/repetition gates are per-document, so ``n_input`` and
  ``n_after_gates`` must grow exactly N-fold;
- MinHash signatures are deterministic functions of the text, so a
  replica introduces NO band key beyond its original's — the pair
  graph at Nx is exactly the 1x pair graph with each vertex blown up
  into an n-clique (identical docs verify at Jaccard 1), every 1x
  component becomes one Nx component, and ``n_survivors`` /
  ``tokens_kept`` must equal the 1x values EXACTLY (the funnel
  returns the same survivor corpus no matter how many times the
  corpus is duplicated — the semantics a dedup funnel exists for).

This is also a deliberate skew stress: every band bucket holds >= N
docs at Nx, so candidate-pair volume grows ~N^2 per bucket and all of
it must flow through operators/skew.chunked_pair_join's bounded-task
enumeration (scales capped at 10x; 30x would be ~435x the 1x pair
verifications, all pathological identity pairs).

Results recorded in DESIGN_SCALE.md (round 14).
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
SCALES = (1, 4, 10)


def main() -> None:
    from bm25_index_scale import replicate

    from capital.io import clear_engine_cache, load_table
    from capital.llm.pipeline import funnel_stats
    from capital.session import get_spark

    spark = get_spark(app_name="funnel-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    base = None
    for n in SCALES:
        rep = replicate(spark, docs, n)
        t0 = time.perf_counter()
        row = funnel_stats(rep).collect()[0]
        dt = time.perf_counter() - t0
        got = (
            int(row["n_input"]),
            int(row["n_after_gates"]),
            int(row["n_survivors"]),
            int(row["tokens_kept"]),
        )
        print(
            f"{n:3d}x: input/gates/survivors/tokens = {got}, {dt:6.2f}s"
        )
        if n == 1:
            base = got
        else:
            want = (base[0] * n, base[1] * n, base[2], base[3])
            assert got == want, (n, got, want)
            print(
                f"{n}x: gates exactly {n}x, survivor corpus exactly "
                f"the 1x corpus — dedup collapsed every replica"
            )
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
