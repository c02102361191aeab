"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a noop write (full plan execution, no
driver-side collect) — what a cluster job would do.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry_mod
    from seqarray_spark.session import get_spark

    spark = get_spark("seqarray-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/shuffle-service warmup for EVERY query family at the
    # smallest SF, so per-query numbers measure the plan, not first-run
    # compilation (a cold first touch once inflated doc_quality ~9x).
    for name, fn in entry_mod.queries().items():
        try:
            materialize(fn(spark, "/root/testdata/sf0.001"))
        except Exception:
            pass

    # best-of-3 per query: a single sample is vulnerable to GC pauses /
    # background load, and two samples still let one pause set the
    # number; the min of three runs is a stable plan-cost proxy
    # (cross-session shared-query subtotals previously drifted ~12% with
    # zero code change — round-5 verdict — purely from session state).
    # Between queries, reset to a fresh-state scope deterministically:
    # Python gc runs the release_on_gc unpersists, clearCache sweeps the
    # rest, and an explicit JVM System.gc() compacts the executor heap so
    # earlier queries' allocation debris can't tax later queries'
    # measurements (otherwise per-query numbers depend on when the JVM
    # decides to collect — observed 3-5x swings on persist-using ops).
    import gc

    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        gc.collect()
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                materialize(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                break
        timings[name] = round(best, 3) if best is not None else -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
