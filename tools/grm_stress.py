"""GRM scale stress: the relation form vs the blocked-matmul form.

The relation form (grm_pairs, the oracle twin) materializes
m x n^2 / 2 contribution rows — correct, exactly hashable, and
intentionally gate-sized. The blocked form (grm_pairs_blas) shuffles
each call row ONCE into a variant-hash block and runs one BLAS Gram
matmul per block, so its cost is (calls shuffled once) + (blocks x n^2
partials). This script measures both at sizes where the relation form
is feasible, then pushes the blas form to sizes where it is not —
the numbers SCALE.md cites.

Usage: python tools/grm_stress.py [variants samples [blocks]]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")


def synth_calls(spark, n_variants: int, n_samples: int):
    """Synthetic diploid calls with ~8% missing and MAF spread, built
    from pure expressions over range() — no driver data."""
    n = n_variants * n_samples
    df = spark.range(n).select(
        (F.col("id") % n_variants).alias("variant_id"),
        F.concat(F.lit("S"), (F.col("id") / n_variants).cast("long").cast("string")).alias(
            "sample_id"
        ),
        F.xxhash64("id").alias("_h"),
    )
    # per-variant MAF from a hash of the variant id; per-call alleles
    # from independent hash bits; ~8% of calls fully missing
    maf = (F.pmod(F.xxhash64("variant_id"), F.lit(1000)).cast("double") / 2500.0) + 0.05
    a1 = (F.pmod(F.col("_h"), F.lit(10_000)).cast("double") / 10_000.0 < maf).cast("int")
    a2 = (
        F.pmod(F.xxhash64("_h"), F.lit(10_000)).cast("double") / 10_000.0 < maf
    ).cast("int")
    missing = F.pmod(F.xxhash64("variant_id", "sample_id"), F.lit(100)) < 8
    return df.select(
        "variant_id",
        "sample_id",
        F.when(missing, F.array(F.lit(None).cast("int"), F.lit(None).cast("int")))
        .otherwise(F.array(a1, a2))
        .alias("alleles"),
    )


def synth_packed(spark, n_variants: int, n_samples: int):
    """Packed-column synth: per-variant 2-bit rows generated INSIDE a
    mapInArrow kernel (hash-seeded numpy; ~8% missing) — no long-format
    stage at all, mirroring a corpus where the packed export already
    exists."""
    stride = (n_samples + 3) // 4

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0).to_numpy()
            if not len(ids):
                continue
            out = []
            for vid in ids:
                rng = np.random.default_rng(int(vid) * 2654435761 % (1 << 63))
                maf = 0.05 + (int(vid) % 1000) / 2500.0
                codes = (
                    (rng.random(n_samples) < maf).astype(np.uint8)
                    + (rng.random(n_samples) < maf).astype(np.uint8)
                )
                codes[rng.random(n_samples) < 0.08] = 3
                padded = np.concatenate(
                    [codes, np.full(stride * 4 - n_samples, 3, np.uint8)]
                )
                shifts = padded.reshape(stride, 4) << np.array([0, 2, 4, 6], np.uint8)
                out.append(shifts[:, 0] | shifts[:, 1] | shifts[:, 2] | shifts[:, 3])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array([n_samples] * len(ids), type=pa.int32()),
                    pa.array([o.tobytes() for o in out], type=pa.binary()),
                ],
                names=["variant_id", "n_samples", "packed"],
            )

    sc = spark.sparkContext
    return spark.range(0, n_variants, 1, sc.defaultParallelism).mapInArrow(
        kernel, schema="variant_id long, n_samples int, packed binary"
    )


def main() -> None:
    from seqarray_spark.operators.ld import (
        grm_from_packed,
        grm_pairs,
        grm_pairs_blas,
    )
    from seqarray_spark.session import get_spark

    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = get_spark("grm-stress")
    calls = synth_calls(spark, n_v, n_s).persist()
    print(f"calls: {calls.count():,} ({n_v:,} variants x {n_s} samples)")

    t0 = time.time()
    # synth_calls emits one observation per (variant, sample) cell, so
    # the MIN-dedupe pre-aggregation shuffle can be skipped
    out = grm_pairs_blas(calls, blocks=blocks, assume_unique=True)
    n_pairs = out.count()
    dt = time.time() - t0
    rate = n_v * n_s / dt
    print(
        f"blas GRM: {dt:.2f}s for {n_pairs:,} pairs "
        f"({rate / 1e6:.1f}M call-entries/s through the Gram kernel)"
    )

    # packed-column form: zero wide shuffles, 2-bit substrate
    pk = synth_packed(spark, n_v, n_s).persist()
    pk.count()
    sample_ids = [f"S{i}" for i in range(n_s)]
    for dt_name in ("float64", "float32"):
        t0 = time.time()
        n3 = grm_from_packed(pk, sample_ids, dtype=dt_name).count()
        dt3 = time.time() - t0
        print(
            f"packed GRM [{dt_name}]: {dt3:.2f}s for {n3:,} pairs "
            f"({n_v * n_s / dt3 / 1e6:.0f}M calls/s, "
            f"{dt / dt3:.1f}x the long-format blas)"
        )
    pk.unpersist()

    # relation form only at sizes where m x n^2/2 rows are sane
    if n_v * n_s * n_s / 2 <= 2e9:
        t0 = time.time()
        n2 = grm_pairs(calls).count()
        dt2 = time.time() - t0
        print(f"relation GRM: {dt2:.2f}s for {n2:,} pairs ({dt2 / dt:.1f}x the blas form)")
    else:
        print(
            f"relation GRM skipped: would materialize "
            f"~{n_v * n_s * n_s / 2:.1e} contribution rows"
        )
    calls.unpersist()


if __name__ == "__main__":
    main()
