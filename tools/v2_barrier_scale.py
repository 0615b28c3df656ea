#!/usr/bin/env python
"""Scale validation of the round-16 lazy local-checkpoint barriers
(round-17, VERDICT r16 ask #4): the r14 rule — scale-run 1x-30x before
trusting a rewrite — was applied to kernels but never to the barrier
change itself.

For each scale N, the sf0.01 corpus is replicated with fresh ids and
the modern curation funnel (``pipe_curation_v2``'s builder) runs under
BOTH barrier modes — the shipped LAZY ``localCheckpoint(eager=False)``
and a monkeypatched EAGER arm — in one session. Asserted per scale:

- survivor rows AND an order-canonical md5 over the survivor frame are
  IDENTICAL between arms (the lazy barrier changes scheduling only);
- the lazy arm schedules strictly FEWER jobs (the r16 win), with the
  per-scale delta recorded;
- the funnel's internal partial action (the ``take(1)`` empty-graph
  probe over a lazy checkpoint) completes correctly at every
  partition count — covered by the equality assert: a fill-in
  pathology would surface as wrong rows or a recompute divergence.

Results recorded in DESIGN_SCALE.md (round 17).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SCALES = (1, 10, 30)


def main() -> None:
    from pyspark.sql import functions as F

    import capital.io as cio
    from capital.io import clear_engine_cache, load_table
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark

    spark = get_spark(app_name="v2-barrier-scale")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    real_ckpt = cio.plan_checkpointer

    def eager_ckpt(spark_, checkpoint_dir):
        if checkpoint_dir is None:
            return lambda df: df.localCheckpoint(eager=True)
        return real_ckpt(spark_, checkpoint_dir)

    def run(rep, arm: str, scale: int):
        import capital.llm.pipeline_v2 as p2

        cio.plan_checkpointer = eager_ckpt if arm == "eager" else real_ckpt
        try:
            clear_engine_cache(spark)
            clear_plan_cache()
            group = f"v2scale-{scale}-{arm}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            final = p2.curation_v2(rep)
            digest = final.agg(
                F.count(F.lit(1)).alias("n"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct("doc_id", "scrubbed_md5")
                                )
                            ),
                            lambda s: s["scrubbed_md5"],
                        ),
                        "",
                    )
                ).alias("m"),
            ).collect()[0]
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            time.sleep(0.3)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            return int(digest["n"]), digest["m"], jobs, dt
        finally:
            cio.plan_checkpointer = real_ckpt

    for n in SCALES:
        if n == 1:
            rep = docs
        else:
            # explode first, arithmetic after (generators cannot nest
            # in expressions — the r9 gotcha)
            rep = docs.select(
                "doc_id", "text", "lang", "source", "n_chars",
                F.explode(
                    F.array(*[F.lit(i) for i in range(n)])
                ).alias("__rep"),
            ).select(
                (F.col("doc_id") * n + F.col("__rep")).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        # warm both code paths once at this scale
        run(rep, "lazy", 0)
        ln, lm, lj, lt = run(rep, "lazy", n)
        en, em, ej, et = run(rep, "eager", n)
        same = "OK" if (ln, lm) == (en, em) else "MISMATCH"
        print(
            f"scale {n:>2}x: rows {ln} [{same}]  "
            f"jobs lazy={lj} eager={ej} (delta {lj - ej:+d})  "
            f"wall lazy={lt:.2f}s eager={et:.2f}s"
        )
        assert (ln, lm) == (en, em), f"arm divergence at {n}x"
        assert lj < ej, f"lazy arm did not save jobs at {n}x"
    spark.stop()
    print("v2_barrier_scale: all scales green")


if __name__ == "__main__":
    main()
