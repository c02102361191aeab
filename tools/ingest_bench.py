"""VCF ingest + allele-frequency scan throughput probe.

The reference's headline benchmark is a ref-allele-frequency scan over
1KG chr1 (6.47M variants x 2504 samples; BASELINE.md: 1.5 min with C
kernels ≈ 180M genotype calls/s on one core). This probe generates a
VCF of the requested shape, ingests it with read_vcf, runs the fused
AF+AC+missing aggregate, and prints one JSON line with rows/s and
calls/s so rounds can be compared.

Usage: python tools/ingest_bench.py [n_variants] [n_samples]
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, ".")


def generate_vcf(path: str, n_variants: int, n_samples: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    gts = ["0|0", "0|1", "1|0", "1|1", "./.", "0/0", "1/1"]
    weights = [40, 15, 15, 10, 5, 10, 5]
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n')
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n')
        fh.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i:04d}" for i in range(n_samples))
            + "\n"
        )
        bases = "ACGT"
        for v in range(n_variants):
            chrom = str(v % 22 + 1)
            pos = v * 7 + 1
            ref = bases[v % 4]
            alt = bases[(v + 1) % 4]
            row = rng.choices(gts, weights, k=n_samples)
            fh.write(
                f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t30\tPASS\tDP={v % 100}\tGT\t"
                + "\t".join(row)
                + "\n"
            )


def main():
    n_variants = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from seqarray_spark.operators.aggregates import af_ac_missing
    from seqarray_spark.session import get_spark
    from seqarray_spark.sources.vcf import read_vcf

    spark = get_spark("ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ingest-bench-")
    vcf_path = os.path.join(tmp, "gen.vcf")
    t0 = time.perf_counter()
    generate_vcf(vcf_path, n_variants, n_samples)
    gen_sec = time.perf_counter() - t0
    size_mb = os.path.getsize(vcf_path) / 1e6

    # ingest: parse + write the canonical parquet layout
    t0 = time.perf_counter()
    ds = read_vcf(spark, vcf_path, assign_ids="hash")
    out = os.path.join(tmp, "ds")
    ds.export(out, partition_by_chrom=False)
    ingest_sec = time.perf_counter() - t0

    # AF scan over the ingested layout (the reference's benchmark shape)
    from seqarray_spark.dataset import SeqDataset

    stored = SeqDataset.read(spark, out)
    t0 = time.perf_counter()
    stored._base_calls.sparkSession  # touch
    af_ac_missing(stored._base_calls).write.format("noop").mode("overwrite").save()
    af_sec = time.perf_counter() - t0

    # packed-column fast path (the reference's bit2+SIMD design point):
    # pack once, then scan AF from the packed bytes
    from seqarray_spark.sources.packed import af_from_packed, pack_2bit_genotypes

    t0 = time.perf_counter()
    packed_path = os.path.join(tmp, "packed.parquet")
    pack_2bit_genotypes(stored).write.mode("overwrite").parquet(packed_path)
    pack_sec = time.perf_counter() - t0
    packed = spark.read.parquet(packed_path)
    t0 = time.perf_counter()
    af_from_packed(packed).write.format("noop").mode("overwrite").save()
    af_packed_sec = time.perf_counter() - t0

    n_calls = n_variants * n_samples
    print(
        json.dumps(
            {
                "n_variants": n_variants,
                "n_samples": n_samples,
                "n_calls": n_calls,
                "vcf_mb": round(size_mb, 1),
                "gen_sec": round(gen_sec, 2),
                "ingest_sec": round(ingest_sec, 2),
                "ingest_calls_per_sec": round(n_calls / ingest_sec),
                "af_scan_sec": round(af_sec, 2),
                "af_calls_per_sec": round(n_calls / af_sec),
                "pack_sec": round(pack_sec, 2),
                "af_packed_scan_sec": round(af_packed_sec, 2),
                "af_packed_calls_per_sec": round(n_calls / af_packed_sec),
            }
        )
    )


if __name__ == "__main__":
    main()
