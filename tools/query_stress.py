"""Read/QUERY-path scale stress (r8 counterpart of the r7 write stress).

The r7 50M-genotype stress covered container WRITE (81 s) and read+AF
(15-19 s). This probe stresses the query surface itself at the same
magnitude, entirely on synthetic Spark-generated frames (no driver-side
text generation):

1. set_filter_chrom(+bp) -> get_data over a 50M-call dataset, long AND
   packed forms: the filter must reach the scan as pruning/pushdown and
   the packed path must only unpack selected variants.
2. seqMerge sample mode of two 10M-variant datasets — the reference's
   heaviest real-world op (SEQ_MergeAllele/Geno loop,
   src/FileMerge.cpp:110-228): one full-outer sort-merge join on
   (chrom,pos,ref,alts) plus calls relabel joins.

Prints one JSON line per stage with wall seconds and peak driver RSS.

Usage: python tools/query_stress.py [n_variants] [n_samples] [merge_variants]
"""

from __future__ import annotations

import json
import resource
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def stage(name, fn):
    t0 = time.time()
    out = fn()
    print(json.dumps({"stage": name, "wall_sec": round(time.time() - t0, 2),
                      "driver_rss_mb": round(rss_mb(), 1), "result": out}),
          flush=True)
    return out


def synth_dataset(spark, n_var: int, n_samp: int, chrom_mod: int = 22,
                  seed_tag: int = 0):
    """Distributed synthetic SeqDataset: n_var variants x n_samp samples
    of pseudo-random biallelic diploid calls (hash-derived, so fully
    deterministic and generated in parallel)."""
    from seqarray_spark.dataset import SeqDataset

    v = (
        spark.range(1, n_var + 1, 1, 64)
        .select(
            F.col("id").alias("variant_id"),
            (F.col("id") % chrom_mod + 1).cast("string").alias("chromosome"),
            ((F.col("id") * 7 + seed_tag) % 200_000_000 + 1).cast("int").alias("position"),
            F.lit(None).cast("string").alias("id"),
            F.element_at(
                F.array(F.lit("A"), F.lit("C"), F.lit("G"), F.lit("T")),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("ref"),
            F.array(
                F.element_at(
                    F.array(F.lit("A"), F.lit("C"), F.lit("G"), F.lit("T")),
                    ((F.col("id") + 1) % 4 + 1).cast("int"),
                )
            ).alias("alt"),
            F.lit(30.0).alias("qual"),
            F.lit("PASS").alias("filter"),
        )
    )
    s = spark.createDataFrame(
        [(f"S{i:05d}", i + 1) for i in range(n_samp)],
        "sample_id string, sample_ordinal int",
    )
    c = (
        spark.range(1, n_var + 1, 1, 256)
        .select(F.col("id").alias("variant_id"))
        .crossJoin(F.broadcast(s.select("sample_id")))
        .select(
            "variant_id",
            "sample_id",
            F.array(
                (F.xxhash64("variant_id", "sample_id", F.lit(seed_tag)) % 2)
                .cast("smallint"),
                (F.xxhash64("sample_id", "variant_id", F.lit(seed_tag + 1)) % 2)
                .cast("smallint"),
            ).alias("alleles"),
            F.array(F.lit(False)).alias("phased"),
        )
        .withColumn(
            "alleles",
            F.transform("alleles", lambda x: F.abs(x).cast("smallint")),
        )
    )
    return SeqDataset(v, c, s)


def main():
    n_var = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_samp = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_merge = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000

    from seqarray_spark.session import get_spark

    spark = get_spark("query-stress", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # --- stage 0: materialize the 50M-call dataset as parquet ---------
    import tempfile

    tmp = tempfile.mkdtemp(prefix="qstress_")
    ds0 = synth_dataset(spark, n_var, n_samp)

    def _write():
        ds0.variants.write.mode("overwrite").parquet(f"{tmp}/variants.parquet")
        ds0.calls.write.mode("overwrite").parquet(f"{tmp}/calls.parquet")
        ds0.samples.write.mode("overwrite").parquet(f"{tmp}/samples.parquet")
        return {"calls": n_var * n_samp}

    stage("synth_write_parquet", _write)

    from seqarray_spark.dataset import SeqDataset

    v = spark.read.parquet(f"{tmp}/variants.parquet")
    c = spark.read.parquet(f"{tmp}/calls.parquet")
    s = spark.read.parquet(f"{tmp}/samples.parquet")
    ds = SeqDataset(v, c, s)

    # --- stage 1: chrom+bp filter -> genotype projection (long form) --
    def _filter_long():
        ds.reset_filter()
        ds.set_filter_chrom(["7", "8"], from_bp=1, to_bp=150_000_000)
        n = ds.get_data("genotype").count()
        return {"selected_calls": n}

    stage("set_filter_chrom_get_genotype_long", _filter_long)

    # --- stage 2: dosage aggregate under the same filter --------------
    def _filter_af():
        from seqarray_spark.operators.aggregates import af_ac_missing

        out = af_ac_missing(ds.calls).agg(
            F.count(F.lit(1)), F.sum("ac"), F.sum("an")
        ).first()
        return {"variants": out[0], "ac": int(out[1]), "an": int(out[2])}

    stage("filtered_af_ac_missing", _filter_af)

    # --- stage 3: pack 2-bit, then filtered read over the packed table
    def _pack():
        from seqarray_spark.sources.packed import pack_2bit_genotypes

        ds.reset_filter()
        pack_2bit_genotypes(ds).write.mode("overwrite").parquet(
            f"{tmp}/packed.parquet"
        )
        return {}

    stage("pack_2bit_write", _pack)

    def _packed_filtered_scan():
        from seqarray_spark.sources.packed import af_from_packed

        packed = spark.read.parquet(f"{tmp}/packed.parquet")
        # variant selection arrives as a broadcast semi-join exactly like
        # the dataset filter path
        sel = v.filter(
            (F.col("chromosome").isin("7", "8"))
            & F.col("position").between(1, 150_000_000)
        ).select("variant_id")
        af = af_from_packed(packed.join(F.broadcast(sel), "variant_id"))
        out = af.agg(F.count(F.lit(1)), F.avg("af_alt")).first()
        return {"variants": out[0], "mean_af": round(float(out[1]), 4)}

    t0 = time.time()
    r1 = _packed_filtered_scan()
    warm = time.time()
    r2 = _packed_filtered_scan()
    print(json.dumps({"stage": "packed_filtered_af", "wall_sec_cold": round(warm - t0, 2),
                      "wall_sec_warm": round(time.time() - warm, 2),
                      "driver_rss_mb": round(rss_mb(), 1), "result": r1}), flush=True)
    assert r1 == r2

    # --- stage 4: sample-mode merge of two n_merge-variant datasets ---
    def _merge():
        from seqarray_spark.operators.merge import merge_samples_pair

        a = synth_dataset(spark, n_merge, 2, seed_tag=0)
        b = synth_dataset(spark, n_merge, 2, seed_tag=1)
        b = SeqDataset(
            b.variants,
            b._base_calls.withColumn(
                "sample_id", F.concat(F.lit("B"), "sample_id")
            ),
            b.samples.withColumn(
                "sample_id", F.concat(F.lit("B"), "sample_id")
            ),
        )
        m = merge_samples_pair(a, b)
        nv = m.variants.count()
        nc = m.calls.count()
        return {"merged_variants": nv, "merged_calls": nc}

    stage(f"merge_sample_mode_{n_merge // 1_000_000}M_x2", _merge)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
