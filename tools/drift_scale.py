#!/usr/bin/env python
"""PSI / KS drift monitors at 1x-30x the sf0.1 events stream.

Drift statistics are scale-invariant up to smoothing: replicating
every event N times multiplies every per-bin count by N, and IEEE
division is correctly rounded to the exact rational quotient, so an
UNSMOOTHED ratio (N*n)/(N*T) is BIT-IDENTICAL to n/T. KS is exactly
that (integer cumulative counts / integer totals), so its full
per-bin output is asserted == across scales. PSI applies +0.5
Laplace smoothing — (N*n + 0.5)/(N*T + 0.5k) is a DIFFERENT rational,
converging to n/T as N grows — so PSI asserts counts exactly N-fold
and every probability/term within 1e-4 of the 1x reading — the
smoothing shift is |(n+0.5)/(T+0.5k) - n/T| <= 3/T (~5e-5 at the
sf0.1 half-period totals, k=5 bins), plus 6-decimal rounding on
each side. A drift monitor whose reading moved more than its
smoothing term under replication would be broken.

Events replicate by plain duplication (the period/bin expressions
depend only on ts/value/event_type, which are copied verbatim).

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
COUNT_COLS = {"n_ref", "n_cur"}


def main() -> None:
    from pyspark.sql import functions as F

    from capital.io import clear_engine_cache
    from capital.session import get_spark

    spark = get_spark(app_name="drift-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("drift_event_type_psi", "drift_value_psi",
                 "drift_value_ks"):
        base = None
        for n in SCALES:
            # Rebuild the registered query's exact expressions over a
            # replicated events frame (same constants module).
            from capital.io import load_table
            from capital.operators.drift import ks_drift, psi_drift
            from capital.queries.curation_queries import (
                _PSI_SPLIT,
                _PSI_VALUE_EDGES,
            )

            e = load_table(spark, SF_DIR, "events")
            if n > 1:
                e = e.crossJoin(
                    spark.range(n).select(F.col("id").alias("__rep"))
                ).drop("__rep")
            period = F.when(
                F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), "ref"
            ).otherwise("cur")
            if name == "drift_event_type_psi":
                out = psi_drift(e, "event_type", period, "ref", "cur")
            else:
                bin_expr = F.lit(None).cast("string")
                for i, edge in reversed(list(enumerate(_PSI_VALUE_EDGES))):
                    bin_expr = F.when(
                        F.col("value") < edge, f"b{i}"
                    ).otherwise(
                        bin_expr if i < len(_PSI_VALUE_EDGES) - 1
                        else f"b{len(_PSI_VALUE_EDGES)}"
                    )
                op = psi_drift if name == "drift_value_psi" else ks_drift
                out = op(e, bin_expr, period, "ref", "cur")
            t0 = time.perf_counter()
            rows = {r["bin"]: r.asDict() for r in out.collect()}
            dt = time.perf_counter() - t0
            norm = {
                b: {
                    k: (v // n if k in COUNT_COLS else v)
                    for k, v in r.items()
                }
                for b, r in rows.items()
            }
            raw_counts_ok = all(
                r[k] % n == 0
                for r in rows.values() for k in COUNT_COLS & r.keys()
            )
            print(f"{name} {n:3d}x: bins={len(rows)}  {dt:5.2f}s")
            if n == 1:
                base = norm
            elif name == "drift_value_ks":
                assert raw_counts_ok, (name, n, "counts not divisible")
                assert norm == base, (name, n)
                print(
                    f"  counts exactly {n}x, every CDF/gap/ks_stat "
                    f"BIT-identical to 1x"
                )
            else:
                assert raw_counts_ok, (name, n, "counts not divisible")
                assert set(norm) == set(base), (name, n)
                for b in norm:
                    for k, v in norm[b].items():
                        want = base[b][k]
                        if k == "bin":
                            assert v == want, (name, n, b)
                        elif k in COUNT_COLS:
                            assert v == want, (name, n, b, k, v, want)
                        elif v is None or want is None:
                            assert v == want, (name, n, b, k)
                        else:
                            assert abs(v - want) <= 1e-4, (
                                name, n, b, k, v, want)
                print(
                    f"  counts exactly {n}x, probabilities/terms within "
                    f"1e-4 of 1x (smoothing-bounded: 3/T ~ 5e-5)"
                )
            clear_engine_cache(spark)


if __name__ == "__main__":
    main()
