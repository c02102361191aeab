"""Chromosome-pruned GDS container read stress (r8).

Measures the payoff of `from_gds(chromosomes=...)` — the Spark analogue
of the reference's per-chromosome run-list index (src/Index.cpp:382+) —
at the 50M-genotype magnitude of the r7/r8 write/query stresses.

Two container layouts:
- sorted  : chromosomes contiguous in variant order (how real VCF->GDS
            imports land, and the only layout the reference's run-list
            index helps on). Pruning to 2/22 chromosomes should skip
            ~20/22 of every decode plane.
- shuffled: chromosome interleaved per variant (runs of length 1 —
            adversarial; nothing prunable). Pruning cost = the extra
            chromosome-only pre-scan, results identical.

Per layout, times three reads of the same container:
  full        from_gds() + AF over everything
  filter_only from_gds() then chromosome filter + AF (the pre-r8 path:
              full-file decode, then discard 20/22)
  pruned      from_gds(chromosomes=['7','8']) + AF

and asserts pruned == filter_only results.

Usage: python tools/prune_stress.py [n_variants] [n_samples] [layout]
  layout in {sorted, shuffled, both}
"""

from __future__ import annotations

import json
import resource
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def synth(spark, n_var: int, n_samp: int, layout: str):
    """Deterministic hash-derived biallelic diploid dataset; chromosome
    assignment contiguous (sorted) or interleaved (shuffled)."""
    from seqarray_spark.dataset import SeqDataset

    per_chrom = (n_var + 21) // 22
    if layout == "sorted":
        # how real VCF->GDS imports land: chromosome-contiguous AND
        # position-sorted within each chromosome (what makes zone-map
        # bp_range pruning O(window))
        chrom = ((F.col("id") - 1) / per_chrom + 1).cast("int")
        pos = (((F.col("id") - 1) % per_chrom) * 400 + 1).cast("int")
    else:
        chrom = (F.col("id") % 22 + 1).cast("int")
        pos = ((F.col("id") * 7) % 200_000_000 + 1).cast("int")
    v = spark.range(1, n_var + 1, 1, 64).select(
        F.col("id").alias("variant_id"),
        chrom.cast("string").alias("chromosome"),
        pos.alias("position"),
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
                F.abs(F.xxhash64("variant_id", "sample_id") % 2).cast(
                    "smallint"
                ),
                F.abs(F.xxhash64("sample_id", "variant_id") % 2).cast(
                    "smallint"
                ),
            ).alias("alleles"),
            F.array(F.lit(False)).alias("phased"),
        )
    )
    return SeqDataset(v, c, s)


def af_summary(ds):
    from seqarray_spark.operators.aggregates import af_ac_missing

    row = (
        af_ac_missing(ds.calls)
        .agg(F.count(F.lit(1)), F.sum("ac"), F.sum("an"))
        .first()
    )
    return {"variants": row[0], "ac": int(row[1]), "an": int(row[2])}


def sample_stress(spark, n_var: int, n_samp: int) -> None:
    """Sample-axis prune on a WIDE container (r9: the bit-plane decode
    itself is column-pruned — VERDICT r8 item 6): from_gds(samples=10)
    vs full-read-then-filter, result-asserted equal. Run with
    variants << samples (e.g. 20000 2500 samples) — the biobank shape
    where row width, not variant count, is the cost."""
    import shutil

    from seqarray_spark.sources.gds_spark import from_gds

    tmp = tempfile.mkdtemp(prefix="prune_samples_")
    path = f"{tmp}/stress.gds"
    ds0 = synth(spark, n_var, n_samp, "sorted")
    t0 = time.time()
    ds0.to_gds(path, coder="LZ4_ra")
    t_write = time.time() - t0

    pick = [f"S{i:05d}" for i in range(0, n_samp, max(1, n_samp // 10))][:10]

    t0 = time.time()
    full = af_summary(from_gds(spark, path))
    t_full = time.time() - t0

    t0 = time.time()
    ds = from_gds(spark, path)
    ds.set_filter_sample_id(pick)
    f_only = af_summary(ds)
    t_filter = time.time() - t0

    t0 = time.time()
    pruned = af_summary(from_gds(spark, path, samples=pick))
    t_pruned = time.time() - t0

    assert pruned == f_only, (pruned, f_only)
    print(
        json.dumps(
            {
                "stage": "samples_read_af",
                "n_variants": n_var,
                "n_samples": n_samp,
                "n_selected": len(pick),
                "write_sec": round(t_write, 2),
                "full_sec": round(t_full, 2),
                "filter_only_sec": round(t_filter, 2),
                "pruned_sec": round(t_pruned, 2),
                "speedup_vs_filter_only": round(t_filter / t_pruned, 2),
                "driver_rss_mb": round(rss_mb(), 1),
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_var = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_samp = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    which = sys.argv[3] if len(sys.argv) > 3 else "both"

    from seqarray_spark.session import get_spark
    from seqarray_spark.sources.gds_spark import from_gds

    spark = get_spark("prune-stress", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    if which == "samples":
        sample_stress(spark, n_var, n_samp)
        return

    layouts = ["sorted", "shuffled"] if which == "both" else [which]
    for layout in layouts:
        tmp = tempfile.mkdtemp(prefix=f"prune_{layout}_")
        path = f"{tmp}/stress.gds"
        ds0 = synth(spark, n_var, n_samp, layout)
        t0 = time.time()
        ds0.to_gds(path, coder="LZ4_ra")
        print(
            json.dumps(
                {
                    "stage": f"{layout}_write_gds",
                    "wall_sec": round(time.time() - t0, 2),
                    "driver_rss_mb": round(rss_mb(), 1),
                }
            ),
            flush=True,
        )

        t0 = time.time()
        full = af_summary(from_gds(spark, path))
        t_full = time.time() - t0

        t0 = time.time()
        ds = from_gds(spark, path)
        ds.set_filter_chrom(["7", "8"])
        f_only = af_summary(ds)
        t_filter = time.time() - t0

        t0 = time.time()
        pruned = af_summary(from_gds(spark, path, chromosomes=["7", "8"]))
        t_pruned = time.time() - t0

        # gene-window read: chromosome + bp window — on the sorted
        # layout the zone-map stats cut within the chromosome too, so
        # cost tracks the WINDOW, not the chromosome
        per_chrom = (n_var + 21) // 22
        # ~10% of chrom 7's position span, starting 20% in
        span = per_chrom * 400
        win = (int(span * 0.2) + 1, int(span * 0.3))
        t0 = time.time()
        wds = from_gds(spark, path, chromosomes=["7"], bp_range=win)
        w_pruned = af_summary(wds)
        t_win = time.time() - t0

        t0 = time.time()
        cds = from_gds(spark, path, chromosomes=["7"])
        t_chrom_only = time.time() - t0  # open+prescan only; AF below
        ref = from_gds(spark, path)
        ref.set_filter_chrom(["7"], from_bp=win[0], to_bp=win[1])
        w_ref = af_summary(ref)
        assert w_pruned == w_ref, (w_pruned, w_ref)
        t0 = time.time()
        c_only = af_summary(cds)
        t_chrom_af = time.time() - t0
        print(
            json.dumps(
                {
                    "stage": f"{layout}_gene_window_af",
                    "window_variants": w_pruned["variants"],
                    "chrom_variants": c_only["variants"],
                    "window_read_sec": round(t_win, 2),
                    "chrom_only_read_sec": round(t_chrom_af + t_chrom_only, 2),
                    "driver_rss_mb": round(rss_mb(), 1),
                }
            ),
            flush=True,
        )

        assert pruned == f_only, (pruned, f_only)
        print(
            json.dumps(
                {
                    "stage": f"{layout}_read_af",
                    "full_sec": round(t_full, 2),
                    "filter_only_sec": round(t_filter, 2),
                    "pruned_sec": round(t_pruned, 2),
                    "speedup_vs_filter_only": round(t_filter / t_pruned, 2),
                    "driver_rss_mb": round(rss_mb(), 1),
                    "full": full,
                    "selected": pruned,
                }
            ),
            flush=True,
        )

        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
