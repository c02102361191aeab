"""Batch-key pushdown stress: corpus-index scan cost vs batch size.

Measures the r9 lever (VERDICT r8 item 4): joining an ingest batch's
band keys against the stored bucketed corpus band-key index, WITH the
batch's distinct keys pushed into the corpus scan as an IN filter vs
WITHOUT (the plain bucket-aligned join). The index rows are synthetic
(band keys shaped exactly like corpus_band_index's '<b>:<md5>' output)
so corpus size can be swept without minhashing millions of documents;
the join code is the same code path incremental_dup_pairs takes after
its batch minhash.

The pruning mechanism — and what it needs to engage, found empirically
here and recorded in SCALE.md: bucket pruning only pays when the
batch's distinct keys number well under n_buckets (random md5 keys hit
buckets ~uniformly, so k keys touch ≈ min(k, n_buckets) buckets — size
n_buckets for the CORPUS, thousands at 100 TB, so a batch touches a
sliver), and the IN filter only prunes parquet row groups if
spark.sql.parquet.pushdown.inFilterThreshold exceeds the key count
(above it Spark pushes a min..max RANGE filter, which random hash keys
stretch over the whole keyspace — no row group survives pruning).

Usage: python tools/dedup_pushdown_stress.py [corpus_docs] [batch_docs]
                                             [n_buckets]
Prints one JSON line with wall times and the scan's SelectedBucketsCount.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

BANDS = 4


def main() -> None:
    corpus_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from pyspark.sql import functions as F

    from seqarray_spark.session import get_spark

    spark = get_spark("pushdown-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # IN-list must reach parquet as a real IN (dictionary/stats per row
    # group), not a min..max range — see module docstring
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "100000")

    # synthetic index: every doc contributes BANDS keys '<b>:<md5>'
    def keyed(ids, alias):
        return ids.select(
            F.col("id").alias(alias),
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            ":",
                            F.lit(str(b)),
                            F.md5(
                                F.concat_ws(
                                    "|", F.lit(str(b)), (F.col("id") / 20).cast("long").cast("string")
                                )
                            ),
                        )
                        for b in range(BANDS)
                    ]
                )
            ).alias("band_key"),
        )

    spark.sql("DROP TABLE IF EXISTS pushdown_stress_idx")
    t0 = time.perf_counter()
    (
        keyed(spark.range(corpus_docs).select(F.col("id")), "__cid")
        .repartition(n_buckets, "band_key")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "band_key")
        .sortBy("band_key")
        .saveAsTable("pushdown_stress_idx")
    )
    t_index = time.perf_counter() - t0

    tbl = spark.table("pushdown_stress_idx")
    # the batch: fresh ids whose keys collide with a slice of the corpus
    batch = keyed(
        spark.range(batch_docs).select((F.col("id") + corpus_docs).alias("id")),
        "_id",
    ).withColumn(
        "band_key",
        F.concat_ws(
            ":",
            F.substring("band_key", 1, 1),
            F.md5(
                F.concat_ws(
                    "|",
                    F.substring("band_key", 1, 1),
                    ((F.col("_id") - corpus_docs) / 20).cast("long").cast("string"),
                )
            ),
        ),
    ).persist()
    batch.count()

    def run(pushdown: bool):
        corpus = tbl
        sel = None
        if pushdown:
            keys = [r[0] for r in batch.select("band_key").distinct().collect()]
            corpus = corpus.where(F.col("band_key").isin(keys))
        j = batch.join(corpus, "band_key").select("_id", "__cid")
        plan = j._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        if m:
            sel = f"{m.group(1)}/{m.group(2)}"
        t0 = time.perf_counter()
        n = j.count()
        return time.perf_counter() - t0, n, sel

    # warm both paths once, then measure best-of-2
    run(False), run(True)
    off = min(run(False)[0] for _ in range(2))
    t_on, n_on, sel = run(True)
    t_on = min(t_on, run(True)[0])
    _, n_off, _ = run(False)
    assert n_on == n_off, (n_on, n_off)

    # corpus scan bytes: buckets are near-uniform (hash of random md5
    # keys), so bytes read scale with selected/total — the metric that
    # IS the cost on object-storage clusters, where local wall times
    # are scheduling-dominated at this SF
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    idx_dir = os.path.join(wh, "pushdown_stress_idx")
    idx_bytes = sum(
        os.path.getsize(os.path.join(idx_dir, f))
        for f in os.listdir(idx_dir)
        if f.endswith(".parquet")
    )
    n_sel, n_tot = (int(x) for x in sel.split("/")) if sel else (None, None)

    print(
        json.dumps(
            {
                "corpus_docs": corpus_docs,
                "batch_docs": batch_docs,
                "index_rows": corpus_docs * BANDS,
                "index_build_sec": round(t_index, 2),
                "join_no_pushdown_sec": round(off, 3),
                "join_pushdown_sec": round(t_on, 3),
                "speedup": round(off / t_on, 2) if t_on > 0 else None,
                "selected_buckets": sel,
                "index_bytes": idx_bytes,
                "est_scan_bytes_pushdown": (
                    int(idx_bytes * n_sel / n_tot) if n_sel is not None else None
                ),
                "matched_pairs": n_on,
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS pushdown_stress_idx")


if __name__ == "__main__":
    main()
