"""bench.py's exact protocol (full-registry-free): warmup at sf0.001,
then best-of-3 with gc+clearCache+System.gc() between queries — for a
NAMED SUBSET, so optimization iterations get bench-comparable numbers
without the full 130-query run.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
           python tools/bench_subset.py q1 q2 ...
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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

    spark = get_spark("seqarray-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    for n in names:
        try:
            materialize(qs[n](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass

    timings = {}
    spreads = {}
    for n in names:
        gc.collect()
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                materialize(qs[n](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            except Exception as e:
                print(f"bench: {n} failed: {e}", file=sys.stderr)
                break
        timings[n] = round(min(samples), 3) if samples else -1.0
        spreads[n] = [round(s, 3) for s in sorted(samples)]

    print(json.dumps({"queries": timings, "spreads": spreads}))


if __name__ == "__main__":
    main()
