"""Embedding-index stress: the r10 levers measured at corpus scale.

Three numbers the plan tests assert in shape and this tool puts a ruler
on (SCALE.md r10):

1. index BUILD throughput, exact vs fast assignment — cell_assign_expr's
   rounded inlined argmax runs interpreted higher-order folds (~µs·k per
   row: oracle-reproducible, fine for batches), ivf_assign's mapInPandas
   numpy argmax is one BLAS matvec per Arrow batch (the corpus-scale
   path).
2. incremental semantic candidate join, batch-key pushdown ON vs OFF —
   SelectedBucketsCount + estimated corpus scan bytes (the metric that
   IS the cost on object-storage clusters).
3. IVF-PQ over the cells-partitioned codes index: ADC scan of the
   nprobe probed cells vs all cells — partition-pruned bytes fraction.

Vectors are synthetic (JVM-side hash-derived floats; no Python per row)
so corpus size sweeps freely. Usage:
  python tools/emb_index_stress.py [corpus_vecs] [batch_vecs] [ncells]
                                   [n_buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

DIM = 64
BANDS = 8


def main() -> None:
    corpus_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batch_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    ncells = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 256

    from pyspark.sql import functions as F

    from seqarray_spark.operators.similarity import (
        incremental_semantic_pairs,
        ivf_pq_topk,
        pq_adc_topk,
        write_embedding_cell_index,
        write_pq_codes_index,
    )
    from seqarray_spark.session import get_spark

    spark = get_spark("emb-index-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "100000")

    def vecs(n, offset=0):
        # deterministic JVM-side synthetic vectors in [-0.5, 0.5)
        return spark.range(n).select(
            (F.col("id") + offset).alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {DIM}), d -> "
                f"cast(pmod(hash(id + {offset}, d), 1000) as float) / 1000.0 "
                "- cast(0.5 as float))"
            ).alias("embedding"),
        )

    # materialize the corpus to parquet first — an index build reads a
    # STORED corpus; leaving the generator lazy also lets Catalyst
    # collapse the vector-producing transform into every centroid
    # cosine term (k× duplication, deep codegen)
    wh_tmp = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    corpus_path = os.path.join(wh_tmp, "emb_stress_corpus")
    vecs(corpus_vecs).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    init = corpus.orderBy("vec_id").limit(max(ncells, 4)).collect()
    cents = [(i, [float(x) for x in r["embedding"]])
             for i, r in enumerate(init[:ncells])]

    # 1. index build: exact (oracle-reproducible expr) vs fast (numpy)
    import shutil

    wh0 = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("emb_stress_idx", "emb_stress_idx_exact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh0, t), ignore_errors=True)
    shutil.rmtree(os.path.join(wh0, "emb_stress_pq"), ignore_errors=True)
    t0 = time.perf_counter()
    write_embedding_cell_index(corpus, cents, "emb_stress_idx",
                               n_buckets=n_buckets, assign="fast")
    t_fast = time.perf_counter() - t0
    spark.sql("DROP TABLE IF EXISTS emb_stress_idx_exact")
    t0 = time.perf_counter()
    write_embedding_cell_index(corpus, cents, "emb_stress_idx_exact",
                               n_buckets=n_buckets, assign="exact")
    t_exact = time.perf_counter() - t0
    spark.sql("DROP TABLE IF EXISTS emb_stress_idx_exact")

    # 2. candidate join: pushdown on/off (raw candidates, tau=None)
    batch_path = os.path.join(wh_tmp, "emb_stress_batch")
    vecs(batch_vecs, offset=corpus_vecs).write.mode("overwrite").parquet(batch_path)
    batch = spark.read.parquet(batch_path)
    tbl = spark.table("emb_stress_idx")

    def run(pushdown):
        cand = incremental_semantic_pairs(
            batch, cents, tau=None, mode="banded", assign="fast",
            include_new_pairs=False, corpus_cell_table=tbl,
            batch_key_pushdown=(200_000 if pushdown else None),
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        sel = f"{m.group(1)}/{m.group(2)}" if m else None
        t0 = time.perf_counter()
        n = cand.count()
        return time.perf_counter() - t0, n, sel

    run(True), run(False)  # warm
    t_on, n_on, sel = run(True)
    t_on = min(t_on, run(True)[0])
    t_off = min(run(False)[0] for _ in range(2))
    _, n_off, _ = run(False)
    assert n_on == n_off, (n_on, n_off)

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    idx_dir = os.path.join(wh, "emb_stress_idx")
    idx_bytes = sum(
        os.path.getsize(os.path.join(idx_dir, f))
        for f in os.listdir(idx_dir) if f.endswith(".parquet")
    )
    if sel:
        n_sel, n_tot = (int(x) for x in sel.split("/"))
    else:
        n_sel = n_tot = None

    # 3. IVF-PQ over the cells-partitioned codes index
    cbk_rows = []
    sub_d = DIM // 4
    for code, r in enumerate(init[:4]):
        v = [float(x) for x in r["embedding"]]
        for j in range(4):
            cbk_rows.append((j, code, v[j * sub_d:(j + 1) * sub_d]))
    cbk = spark.createDataFrame(
        cbk_rows, "sub_ord int, code int, cvec array<float>"
    )
    pq_path = os.path.join(wh, "emb_stress_pq")
    t0 = time.perf_counter()
    write_pq_codes_index(corpus, cents, cbk, m=4, path=pq_path)
    t_pq_build = time.perf_counter() - t0
    codes = spark.read.parquet(pq_path)
    qv = [float(x) for x in init[0]["embedding"]]
    nprobe = max(1, ncells // 8)

    def adc(probed):
        if probed:
            out = ivf_pq_topk(None, qv, cents, cbk, m=4, k=20,
                              nprobe=nprobe, codes=codes)
        else:
            out = pq_adc_topk(codes, qv, cbk, m=4, k=20)
        t0 = time.perf_counter()
        out.count()
        return time.perf_counter() - t0

    adc(True), adc(False)  # warm
    t_probe = min(adc(True) for _ in range(2))
    t_full = min(adc(False) for _ in range(2))

    # 4. residual encode+index build (same layout, per-cell ADC LUTs)
    pq_res_path = os.path.join(wh, "emb_stress_pq_res")
    shutil.rmtree(pq_res_path, ignore_errors=True)
    t0 = time.perf_counter()
    write_pq_codes_index(corpus, cents, cbk, m=4, path=pq_res_path,
                         residual=True)
    t_pq_res_build = time.perf_counter() - t0
    codes_res = spark.read.parquet(pq_res_path)
    shutil.rmtree(os.path.join(wh, "emb_stress_pq_res_fast"),
                  ignore_errors=True)
    t0 = time.perf_counter()
    write_pq_codes_index(corpus, cents, cbk, m=4,
                         path=os.path.join(wh, "emb_stress_pq_res_fast"),
                         residual=True, assign="fast")
    t_pq_res_fast = time.perf_counter() - t0
    shutil.rmtree(os.path.join(wh, "emb_stress_pq_res_fast"),
                  ignore_errors=True)

    def adc_res():
        out = ivf_pq_topk(None, qv, cents, cbk, m=4, k=20, nprobe=nprobe,
                          codes=codes_res, residual=True)
        t0 = time.perf_counter()
        out.count()
        return time.perf_counter() - t0

    adc_res()  # warm
    t_probe_res = min(adc_res() for _ in range(2))

    # 5. batched k-NN join: 100 queries against the full corpus —
    # exact (broadcast NLJ) vs IVF-celled (corpus never shuffled)
    from seqarray_spark.operators.similarity import knn_join

    queries = spark.read.parquet(batch_path).limit(100)

    def knn(mode):
        if mode == "ivf":
            out = knn_join(queries, corpus, k=10, centroids=cents,
                           nprobe=nprobe)
        else:
            out = knn_join(queries, corpus, k=10)
        t0 = time.perf_counter()
        out.count()
        return time.perf_counter() - t0

    # warm-vs-warm like every other section (one warm-up then one
    # timed run each — min-of-2 on the ~60s exact NLJ is not worth
    # another minute of tool wall)
    knn("ivf"), knn("exact")  # warm
    t_knn_ivf = knn("ivf")
    t_knn_exact = knn("exact")

    # 5b. batched k-NN over the STORED codes index (knn_join_codes —
    # the compressed serve path): same 100 queries, float corpus never
    # read; plus a small 5-query batch whose probed-cell pushdown
    # partition-prunes the index scan (a wide batch probes most cells,
    # so the bytes win belongs to focused batches — measured, not
    # assumed)
    from seqarray_spark.operators.similarity import (
        knn_join_codes,
        probe_cells_py,
    )

    def knn_codes(q):
        # timer INCLUDES construction: cell_pushdown runs the
        # probe-collect job at build time, which is real serve work
        # the knn_join timings it is A/B'd against also pay inside
        # count() (r10 review)
        t0 = time.perf_counter()
        out = knn_join_codes(q, codes, cents, cbk, m=4, k=10,
                             nprobe=nprobe)
        out.count()
        return time.perf_counter() - t0

    knn_codes(queries)  # warm
    t_knn_codes = knn_codes(queries)
    small_q = spark.read.parquet(batch_path).limit(5)
    knn_codes(small_q)  # warm
    t_knn_codes_small = knn_codes(small_q)
    # probed-cell accounting under the LIBRARY's own probe rule
    # (rounded sequential-fold cosine DESC, ord ASC) — not a hand
    # re-derivation that could count partitions the query never read
    cvec_list = [v for _, v in cents]
    small_cells = set()
    for r in small_q.collect():
        small_cells.update(
            probe_cells_py(cvec_list, list(r["embedding"]), nprobe)
        )

    def dir_bytes(d):
        total = 0
        for root, _, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files if f.endswith(".parquet"))
        return total

    probe = probe_cells_py([v for _, v in cents], qv, nprobe)
    pq_bytes = dir_bytes(pq_path)
    probed_bytes = sum(
        dir_bytes(os.path.join(pq_path, f"ivf_cell={c}"))
        for c in probe
        if os.path.isdir(os.path.join(pq_path, f"ivf_cell={c}"))
    )

    print(json.dumps({
        "corpus_vecs": corpus_vecs, "batch_vecs": batch_vecs,
        "ncells": ncells, "n_buckets": n_buckets, "dim": DIM,
        "index_build_fast_sec": round(t_fast, 2),
        "index_build_exact_sec": round(t_exact, 2),
        "build_speedup_fast": round(t_exact / t_fast, 2),
        "index_rows": corpus_vecs * BANDS, "index_bytes": idx_bytes,
        "join_pushdown_sec": round(t_on, 3),
        "join_no_pushdown_sec": round(t_off, 3),
        "selected_buckets": sel,
        "est_scan_bytes_pushdown": (
            int(idx_bytes * n_sel / n_tot) if sel else None
        ),
        "candidates": n_on,
        "pq_index_build_sec": round(t_pq_build, 2),
        "pq_index_bytes": pq_bytes,
        "adc_probed_sec": round(t_probe, 3),
        "adc_full_sec": round(t_full, 3),
        "nprobe": nprobe,
        "probed_partition_bytes": probed_bytes,
        "pq_res_index_build_sec": round(t_pq_res_build, 2),
        "pq_res_index_build_fast_sec": round(t_pq_res_fast, 2),
        "adc_res_probed_sec": round(t_probe_res, 3),
        "knn100_ivf_sec": round(t_knn_ivf, 3),
        "knn100_exact_sec": round(t_knn_exact, 3),
        "knn100_codes_sec": round(t_knn_codes, 3),
        "knn5_codes_sec": round(t_knn_codes_small, 3),
        "knn5_probed_cells": f"{len(small_cells)}/{ncells}",
        "knn5_probed_bytes": sum(
            dir_bytes(os.path.join(pq_path, f"ivf_cell={c}"))
            for c in small_cells
            if os.path.isdir(os.path.join(pq_path, f"ivf_cell={c}"))
        ),
    }))
    spark.sql("DROP TABLE IF EXISTS emb_stress_idx")
    shutil.rmtree(pq_res_path, ignore_errors=True)


if __name__ == "__main__":
    main()
