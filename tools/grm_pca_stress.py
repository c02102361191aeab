"""grm_pca assembly stress — the honest driver bound (VERDICT r10 #1).

r10's grm_pca collected n^2/2 pairs as Python Row objects; at n=30k
that is 450M Rows (~10x memory overhead, hours of deserialization).
r11 assembles via blocked Arrow blobs (applyInPandas tiles, persisted,
pulled down one block-row chunk at a time so no single collect trips
spark.driver.maxResultSize), so the driver cost is the n x n float64
matrix itself plus one block-row of tiles. This tool builds a synthetic n-sample pair
relation ENTIRELY executor-side (range x exploded sequence — no driver
materialization of pairs), runs the assembly, and reports wall time and
the Python driver's peak RSS so the docstring's claim is a measurement.

The eigensolve itself (numpy.linalg.eigh, O(n^3)) is gated behind
--eigh: at n=30k it is ~2.7e13 flops of LAPACK — the REAL reason
biobank n belongs on grm_pca_distributed, which never assembles G and
whose driver memory is O(n * (k+oversample)).

--distributed runs grm_pca_distributed's full randomized eigensolve
instead (k=10, oversample 8, power_iters 2 -> 4 matmul passes over the
pair relation): the driver never holds more than O(n * 18) floats, so
its RSS stays flat where the exact path's grows as n^2 — the measured
contrast that justifies routing biobank n to the distributed path.

Usage: python tools/grm_pca_stress.py [n_samples] [--eigh|--distributed]
Prints one JSON line.
"""

from __future__ import annotations

import json
import resource
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_eigh = "--eigh" in sys.argv
    distributed = "--distributed" in sys.argv
    n = int(args[0]) if args else 30_000

    import numpy as np
    from pyspark.sql import functions as F

    from seqarray_spark.operators.ld import _fix_signs, _grm_pair_positions
    from seqarray_spark.session import get_spark

    spark = get_spark("grm-pca-stress", driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")

    ids = [f"S{i:06d}" for i in range(n)]
    # executor-side pair generation: row i explodes to its (i, j>i)
    # partners; value is a cheap deterministic hash-derived double
    pairs = (
        spark.range(n)
        .withColumn("_j", F.explode(F.sequence(F.col("id") + 1, F.lit(n - 1))))
        .select(
            F.concat(F.lit("S"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
                "sample_i"
            ),
            F.concat(F.lit("S"), F.lpad(F.col("_j").cast("string"), 6, "0")).alias(
                "sample_j"
            ),
            F.lit(100).alias("m_used"),
            ((F.pmod(F.crc32(F.concat_ws(":", "id", "_j")), F.lit(2001)) - 1000)
             / 10000.0).alias("grm"),
        )
    )

    if distributed:
        from seqarray_spark.operators.ld import grm_pca_distributed

        t0 = time.perf_counter()
        out = grm_pca_distributed(pairs, k=10, sample_ids=ids)
        n_rows = out.count()
        print(
            json.dumps(
                {
                    "mode": "distributed",
                    "n_samples": n,
                    "n_pairs": n * (n - 1) // 2,
                    "pc_rows": n_rows,
                    "wall_sec": round(time.perf_counter() - t0, 1),
                    "driver_py_peak_rss_gb": round(
                        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                        / 1e6,
                        2,
                    ),
                }
            )
        )
        assert n_rows == n
        return

    # run the same assembly grm_pca performs, without paying the
    # eigensolve unless asked (import the internals so the measurement
    # IS the shipped code path)
    import pandas as pd

    t0 = time.perf_counter()
    b = 2048
    coded = _grm_pair_positions(pairs, ids).withColumns(
        {
            "_bi": (F.col("_pi") / b).cast("int"),
            "_bj": (F.col("_pj") / b).cast("int"),
        }
    )

    def _tile(pdf: "pd.DataFrame") -> "pd.DataFrame":
        bi = int(pdf["_bi"].iloc[0])
        bj = int(pdf["_bj"].iloc[0])
        h = min(b, n - bi * b)
        w = min(b, n - bj * b)
        m = np.zeros((h, w), dtype=np.float64)
        m[pdf["_pi"].to_numpy() - bi * b, pdf["_pj"].to_numpy() - bj * b] = (
            pdf["_v"].to_numpy()
        )
        return pd.DataFrame({"bi": [bi], "bj": [bj], "blob": [m.tobytes()]})

    tiles = coded.groupBy("_bi", "_bj").applyInPandas(
        _tile, schema="bi int, bj int, blob binary"
    ).persist()
    tiles.count()  # parallel build; chunks below read the cache
    a = np.zeros((n, n), dtype=np.float64)
    n_tiles = 0
    for bi in range((n + b - 1) // b):  # block-row chunks: each under
        for r in tiles.where(F.col("bi") == bi).collect():  # maxResultSize
            bj = int(r["bj"])
            h = min(b, n - bi * b)
            w = min(b, n - bj * b)
            a[bi * b : bi * b + h, bj * b : bj * b + w] += np.frombuffer(
                r["blob"], dtype=np.float64
            ).reshape(h, w)
            n_tiles += 1
    tiles.unpersist()
    a = a + a.T
    np.fill_diagonal(a, 1.0)
    assemble_sec = round(time.perf_counter() - t0, 1)

    eigh_sec = None
    if do_eigh:
        t1 = time.perf_counter()
        vals, vecs = np.linalg.eigh(a)
        _fix_signs(vecs[:, np.argsort(vals)[::-1][:10]])
        eigh_sec = round(time.perf_counter() - t1, 1)

    print(
        json.dumps(
            {
                "n_samples": n,
                "n_pairs": n * (n - 1) // 2,
                "n_tiles": n_tiles,
                "assemble_sec": assemble_sec,
                "eigh_sec": eigh_sec,
                "matrix_gb": round(a.nbytes / 1e9, 2),
                "driver_py_peak_rss_gb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
                ),
                "checksum": float(a[:8, :8].sum()),
            }
        )
    )
    assert n_tiles > 0 and not np.array_equal(a, np.eye(n))


if __name__ == "__main__":
    main()
