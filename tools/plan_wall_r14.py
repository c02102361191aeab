"""Driver plan-construction wall profiler (r14, guide §1 / §7.3).

For each named registry query, separates the bench wall into
  t_build : Python gate call (DataFrame construction incl. eager analysis)
  t_plan  : forcing queryExecution().executedPlan() (optimize + physical plan)
  t_exec  : the noop write (includes AQE re-planning + cluster work)

Each query is measured twice back-to-back; the SECOND sample is the
steady-state number (first pays JIT/classload). The warmup at sf0.001
mirrors bench.py so the comparison holds.

Usage: SPARK_GRAFT_SF_DIR=... python tools/plan_wall_r14.py q1 q2 ...
"""

from __future__ import annotations

import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from seqarray_spark.session import get_spark

    qs = entry_mod.queries()
    bad = [n for n in names if n not in qs]
    if bad:
        print(f"unknown queries: {bad}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("plan-wall-r14")
    spark.sparkContext.setLogLevel("ERROR")

    for n in names:
        try:
            qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    print(f"{'query':30s} {'t_build':>8s} {'t_plan':>8s} {'t_exec':>8s} {'total':>8s}")
    for n in names:
        for rep in range(2):
            gc.collect()
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            df = qs[n](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            tag = "warm" if rep else "cold"
            print(
                f"{n:30s} {t1 - t0:8.3f} {t2 - t1:8.3f} {t3 - t2:8.3f} "
                f"{t3 - t0:8.3f}  [{tag}]"
            )

    spark.stop()


if __name__ == "__main__":
    main()
