#!/usr/bin/env python
"""Per-stage wall attribution of the pipe_curation_v2 funnel.

Times each eager action of ``curation_v2_stages`` + the final
materialization by monkey-timing the plan checkpointer and the
driver collects, warm (one throwaway full run first — the bench
methodology). Prints a stage → seconds table for the doc row and the
profile row.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from capital.io import clear_engine_cache, load_table
    from capital.queries.registry import clear_plan_cache
    from capital.session import get_spark

    spark = get_spark(app_name="capital-v2-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    import capital.llm.pipeline_v2 as p2

    def timed_run(profile: bool, label: str) -> None:
        clear_engine_cache(spark)
        clear_plan_cache()
        events: list[tuple[str, float]] = []
        t_start = time.perf_counter()
        last = [t_start]

        def mark(name: str) -> None:
            now = time.perf_counter()
            events.append((name, now - last[0]))
            last[0] = now

        import capital.io as cio

        real_ckpt = cio.plan_checkpointer

        def traced_ckpt(spark_, checkpoint_dir):
            inner = real_ckpt(spark_, checkpoint_dir)
            state = {"n": 0}

            def wrapped(df):
                t0 = time.perf_counter()
                state["n"] += 1
                events.append(
                    (f"gap_before_ckpt#{state['n']}", t0 - last[0])
                )
                out = inner(df)
                events.append(
                    (f"ckpt#{state['n']}", time.perf_counter() - t0)
                )
                last[0] = time.perf_counter()
                return out

            return wrapped

        cio.plan_checkpointer = traced_ckpt
        try:
            d2 = load_table(spark, sf_dir, "documents")
            mark("load_table")
            if profile:
                df = p2.curation_v2_profile(d2)
            else:
                df = p2.curation_v2(d2)
            mark("build_rest(plan+collects)")
            n = df.toArrow().num_rows
            mark("final_action")
        finally:
            cio.plan_checkpointer = real_ckpt
        total = time.perf_counter() - t_start
        print(f"== {label}: total {total:.3f}s ({n} rows)")
        for name, dt in events:
            print(f"   {name:30s} {dt:7.3f}")

    # warm-up full pass (both rows) to amortize codegen/page cache
    p2.curation_v2(docs).toArrow()
    clear_engine_cache(spark)
    clear_plan_cache()
    p2.curation_v2_profile(load_table(spark, sf_dir, "documents")).toArrow()

    timed_run(False, "pipe_curation_v2 (warm)")
    timed_run(True, "pipe_curation_v2_profile (warm)")
    timed_run(False, "pipe_curation_v2 (warm2)")
    spark.stop()


if __name__ == "__main__":
    main()
