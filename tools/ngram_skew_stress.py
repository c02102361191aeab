"""Hot-shingle skew stress for the n-gram Jaccard df count.

VERDICT r10 item 2: the r10 df computation used
``count().over(Window.partitionBy("shingle"))`` — every occurrence of a
hot shingle lands in ONE task with no map-side combine, a guaranteed
straggler once the shingle distribution is Zipfian (any natural-language
corpus at scale). The r11 shape is ``groupBy("shingle").count()`` +
join-back over a persisted exploded relation: the hot key is collapsed
by partial aggregation BEFORE its exchange, and the join-back's residual
skew is AQE-splittable.

Metric: MAX TASK DURATION (from the Spark status REST API), not local
wall — on local[32] total work hides the straggler (32 cores chew the
tail while one drains the hot partition), but on a 1000-executor
cluster the job's wall IS the max task. The groupBy shape trades ~1.7x
total rows moved (join-back) for a bounded max task; the window shape
has an unbounded max task that grows linearly with the hot key. AQE's
skew-join threshold (256MB default) is lowered here so the join-back
split engages at stress scale the way it would at 100x corpus size.

Usage: python tools/ngram_skew_stress.py [n_docs] [hot_pct] [uniq]
Prints one JSON line with per-shape wall and max-task-duration ms.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

UI_PORT = 4071


def _rest(app_path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def max_task_ms(sc, group: str) -> int:
    """Largest single task duration across all stages of the jobs in
    `group` — the cluster-wall proxy."""
    app_id = sc.applicationId
    worst = 0
    for job in _rest(f"/{app_id}/jobs"):
        if job.get("jobGroup") != group:
            continue
        for sid in job["stageIds"]:
            try:
                summ = _rest(
                    f"/{app_id}/stages/{sid}/0/taskSummary?quantiles=1.0"
                )
            except Exception:
                continue  # skipped stage (AQE reuse) has no tasks
            dur = summ.get("duration") or [0]
            worst = max(worst, int(dur[-1]))
    return worst


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 0.20
    uniq = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.appName("ngram-skew-stress")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # emulate at-scale AQE behavior: a 100x corpus's hot-shingle
        # join partition exceeds the default 256MB skew threshold and
        # gets split; at stress scale the same partition is ~100MB,
        # under it — lower the threshold so the mechanism the operator
        # RELIES on actually engages (the window shape has no such
        # mechanism at any threshold)
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    # synthetic exploded (doc, shingle) relation: every doc carries
    # `uniq` unique shingles; hot docs additionally carry THE hot
    # shingle — exactly the relation ngram_jaccard_pairs' df count runs
    # over, without paying for text shingling in the measurement
    docs = spark.range(n_docs).select(
        F.col("id").alias("_id"),
        (F.col("id") % F.lit(int(1.0 / hot_pct)) == 0).alias("_hot"),
    )
    sh = docs.select(
        "_id",
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(uniq - 1)),
                    lambda i: F.concat_ws(
                        ":", F.col("_id").cast("string"), i.cast("string")
                    ),
                ),
                F.when(F.col("_hot"), F.array(F.lit("__HOT__"))).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        ).alias("shingle"),
    ).persist()
    n_rows = sh.count()  # materialize the persisted relation once

    def run(df, group: str) -> float:
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        # reduce to one row so the measurement is the aggregation, not
        # result transfer; bit_xor keeps every df value load-bearing
        df.select(
            F.bit_xor(F.col("df").cast("long") + F.crc32(F.col("shingle")))
        ).collect()
        sc.setJobGroup("idle", "idle")
        return round(time.perf_counter() - t0, 3)

    # old r10 shape: count window over shingle (no partial agg)
    win = sh.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    # r11 shape: partial-agg count + join-back (what the operator ships)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    gj = sh.join(dfreq, "shingle")

    # warmup both plans once (codegen/JVM), measured groups after
    run(win, "warm_w")
    run(gj, "warm_g")
    w_wall = run(win, "window")
    g_wall = run(gj, "groupby")

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "explode_rows": n_rows,
                "hot_df": int(n_docs * hot_pct),
                "window_wall_sec": w_wall,
                "groupby_join_wall_sec": g_wall,
                "window_max_task_ms": max_task_ms(sc, "window"),
                "groupby_join_max_task_ms": max_task_ms(sc, "groupby"),
            }
        )
    )


if __name__ == "__main__":
    main()
