#!/usr/bin/env python
"""HLL distinct-count rollup at 1x-30x the sf0.1 events stream.

A DISTINCT-COUNT monitor must be replication-invariant: duplicating
every event N times adds no new user_id, and an HLL register is a max
over hashed values — identical value sets produce IDENTICAL registers
no matter how many times each value arrives or how rows are
partitioned. Asserted here exactly: per-type approx_distinct (and the
estimate itself) must be bit-equal across scales while n_rows grows
exactly N-fold. This is also the merge-correctness property that lets
a 100 TB lake keep daily sketch blobs and answer range-distinct
queries without rescanning facts — replication is just a degenerate
merge.

Results recorded in DESIGN_SCALE.md (round 14).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 10, 30)


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import clear_engine_cache, load_table
    from capital.operators.sketches import (
        daily_distinct_sketches,
        rollup_distinct,
    )
    from capital.session import get_spark

    spark = get_spark(app_name="sketch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, SF_DIR, "events")
    base = None
    for n in SCALES:
        rep = ev
        if n > 1:
            rep = ev.crossJoin(
                spark.range(n).select(F.col("id").alias("__rep"))
            ).drop("__rep")
        t0 = time.perf_counter()
        rows = {
            r["event_type"]: (int(r["approx_distinct"]), int(r["n_rows"]))
            for r in rollup_distinct(daily_distinct_sketches(rep)).collect()
        }
        dt = time.perf_counter() - t0
        print(f"{n:3d}x: types={len(rows)}  {dt:5.2f}s")
        if n == 1:
            base = rows
        else:
            assert set(rows) == set(base), (n, rows.keys())
            for k, (est, nr) in rows.items():
                want_est, want_nr = base[k]
                assert est == want_est, (n, k, est, want_est)
                assert nr == want_nr * n, (n, k, nr, want_nr)
            print(
                f"{n}x: every estimate BIT-identical to 1x, "
                f"n_rows exactly {n}x"
            )
        clear_engine_cache(spark)


if __name__ == "__main__":
    main()
