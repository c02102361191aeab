"""IBD-MLE kernel stress (r13): measures ibd_mle_from_packed at a
cohort-panel scale bigger than the gate's 40-sample panel so SCALE.md
carries a measured envelope for the EM estimator family.

Reports the end-to-end operator wall (cells build via per-bin one-hot
matmuls + the vectorized EM over the aggregated cell table) plus the
cell-table row count — the quantity that drives both the shuffle and
the EM input (bounded by pairs x min(M, 6*(B-1))).

Usage: python tools/ibd_mle_stress.py [n_samples] [n_variants]
           [n_bins] [em_iters]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(
    0,
    __import__("os").path.dirname(
        __import__("os").path.dirname(__import__("os").path.abspath(__file__))
    ),
)

import numpy as np


def packed_frame(spark, codes: np.ndarray, n_samp: int):
    """(V, S) dosage codes -> packed rows, vectorized bit-packing."""
    import pandas as pd

    v, s = codes.shape
    stride = (s + 3) // 4
    pad = np.full((v, stride * 4 - s), 3, np.uint8)
    all_codes = np.concatenate([codes, pad], axis=1)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    packed = (
        (all_codes.reshape(v, stride, 4) << shifts).sum(axis=2).astype(np.uint8)
    )
    pdf = pd.DataFrame(
        {
            "variant_id": np.arange(v, dtype=np.int64),
            "n_samples": np.full(v, s, np.int32),
            "packed": [row.tobytes() for row in packed],
        }
    )
    return spark.createDataFrame(pdf)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_bins = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    from seqarray_spark.operators.ld import ibd_mle_from_packed
    from seqarray_spark.session import get_spark

    spark = get_spark("ibd-mle-stress")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(13)
    p = rng.uniform(0.05, 0.95, v)
    codes = rng.binomial(2, p[:, None], size=(v, n)).astype(np.uint8)
    sids = [f"S{i:06d}" for i in range(n)]
    pf = packed_frame(spark, codes, n).repartition(32).persist()
    pf.count()

    t0 = time.time()
    out = ibd_mle_from_packed(
        pf, sids, n_bins=n_bins, em_iters=iters
    )
    rows = out.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "ibd_mle_operator",
                "n_samples": n,
                "n_variants": v,
                "n_pairs": n * (n - 1) // 2,
                "n_bins": n_bins,
                "em_iters": iters,
                "out_pairs": int(rows),
                "wall_sec": round(wall, 2),
                "calls": n * v,
                "calls_per_sec": round(n * v / wall),
            }
        )
    )


if __name__ == "__main__":
    main()
