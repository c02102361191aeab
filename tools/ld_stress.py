"""Packed-LD scale stress — the SCALE.md 'genomics pair operators'
numbers for ld_pairs_from_packed.

Usage: python tools/ld_stress.py [variants samples bp_window]
Default 1M x 1000 at W=2000 (~20 neighbours/variant on the synthetic
100bp grid over 22 chromosomes) = 1G calls -> ~20M exact r² pairs.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")


def main() -> None:
    from seqarray_spark.operators.ld import ld_pairs_from_packed
    from seqarray_spark.session import get_spark
    from tools.grm_stress import synth_packed

    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    spark = get_spark("ld-stress")
    pk = synth_packed(spark, n_v, n_s).persist()
    print(f"packed rows: {pk.count():,} ({n_v:,} variants x {n_s} samples)")
    variants = spark.range(n_v).select(
        F.col("id").alias("variant_id"),
        (1 + F.col("id") % 22).cast("string").alias("chromosome"),
        (100 + (F.col("id") / 22).cast("long") * 100).cast("int").alias("position"),
    )
    best = None
    for _ in range(2):
        t0 = time.time()
        n = ld_pairs_from_packed(pk, variants, bp_window=w).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"packed LD at {n_v * n_s / 1e9:.1f}G calls, W={w}: {best:.1f}s, "
        f"{n:,} pairs = {n / best / 1e6:.1f}M exact r2 pairs/s, "
        f"{n_v * n_s / best / 1e6:.0f}M calls/s"
    )
    pk.unpersist()


if __name__ == "__main__":
    main()
