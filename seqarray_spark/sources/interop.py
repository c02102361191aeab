"""Interop sinks/sources beyond VCF/PLINK.

- as_pandas: materialize the current selection as pandas frames
  (reference: seqAsVCF R/asVCF.R:5-57 — the in-memory interop object;
  VariantAnnotation's VCF S4 becomes a dict of DataFrames).
- read_bcf / bcf2gds: BCF via the pure-Python BCF2 record decoder
  (sources/bcf.py; reference: seqBCF2GDS R/ConvVCF2GDS.R:1473-1508
  shells out to bcftools — this engine needs no external binary).
- GDS container files ARE read (and written) directly:
  `SeqDataset.from_gds` (sources/gds.py + gds_spark.py, a pure-Python
  CoreArray parser with distributed block decode) and
  `SeqDataset.to_gds` (sources/gds_write.py). The engine's analytical
  storage remains Parquet (SURVEY.md §1.5); from_gds/to_gds are the
  migration bridge to/from an existing GDS deployment — no R required.
"""

from __future__ import annotations



def as_pandas(ds, max_rows: int = 1_000_000, info="all", geno="all") -> dict:
    """Collect the current selection into pandas frames (driver-side;
    guarded so a full-scale dataset can't be pulled onto the driver by
    accident).

    `info` / `geno` mirror seqAsVCF's column subsetting (R/asVCF.R:5-57,
    exercised by the reference's test_asVCF.R test_info_geno /
    test_info_geno_na): 'all' keeps everything; a list keeps only those
    INFO fields / FORMAT variables ('GT' names the genotype+phase pair);
    None (the reference's NA) keeps none — with geno=None the calls
    frame is omitted entirely, like a zero-length geno(vcf)."""
    from pyspark.sql import functions as F

    n = ds.variants.count()
    if n > max_rows:
        raise ValueError(
            f"selection has {n} variants > max_rows={max_rows}; filter first"
        )
    v = ds.variants
    if info != "all" and "info" in v.columns:
        keep = list(info or [])
        have = [f.name for f in v.schema["info"].dataType.fields]
        missing = set(keep) - set(have)
        if missing:
            raise ValueError(f"unknown INFO fields: {sorted(missing)}")
        if not keep:
            v = v.drop("info")
        else:
            v = v.withColumn(
                "info", F.struct(*[F.col(f"info.{k}").alias(k) for k in keep])
            )
    out = {"variants": v.toPandas()}
    if ds._base_calls is not None and geno is not None:
        c = ds.calls
        if geno != "all":
            keep = list(geno)
            fixed = ["variant_id", "sample_id"]
            gt_cols = [x for x in ("alleles", "phased") if x in c.columns]
            fmt = [
                x for x in c.columns
                if x not in fixed + gt_cols + ["vcf_errors"]
            ]
            missing = set(keep) - set(fmt) - {"GT"}
            if missing:
                raise ValueError(f"unknown FORMAT variables: {sorted(missing)}")
            cols = fixed + (gt_cols if "GT" in keep else []) + [
                x for x in fmt if x in keep
            ]
            c = c.select(*cols)
        out["calls"] = c.toPandas()
    if ds.samples is not None:
        # canonical (file) order; sample_ordinal itself is engine
        # bookkeeping, not a sample.annotation column
        from seqarray_spark.dataset import sample_order_cols

        out["samples"] = (
            ds.samples.orderBy(*sample_order_cols(ds.samples))
            .drop("sample_ordinal")
            .toPandas()
        )
    return out


def vcf2gds(spark, vcf_path, gds_path: str, *, read_opts: dict | None = None,
            **write_opts) -> None:
    """One-step VCF -> GDS container conversion (reference: seqVCF2GDS,
    R/ConvVCF2GDS.R:559-1465 — its single most-used entry point).
    Distributed both directions: expression-only VCF parse, executor-side
    frame-compressed container encode. write_opts pass to write_gds
    (coder=, format_storage=, scenario=, transposed=, ...); read_opts to read_vcf
    (assign_ids=, validate=, ...)."""
    from seqarray_spark.sources.vcf import read_vcf

    read_vcf(spark, vcf_path, **(read_opts or {})).to_gds(gds_path, **write_opts)


def gds2vcf(spark, gds_path: str, out_path: str, **write_opts) -> None:
    """One-step GDS -> VCF export (reference: seqGDS2VCF,
    R/Conversion.R:30-402), preserving the container's description
    metadata in the regenerated header. write_opts pass to write_vcf
    (compression='bgzf' for a tabix-indexable .vcf.bgz, ...)."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.vcf import write_vcf

    write_vcf(SeqDataset.from_gds(spark, gds_path), out_path, **write_opts)


def read_bcf(spark, path: str, **kwargs):
    """BCF -> SeqDataset via the pure-Python BCF2 record decoder
    (sources/bcf.py — reference: seqBCF2GDS, R/ConvVCF2GDS.R:1473-1508,
    which shells out to `bcftools view`; this engine decodes the binary
    records itself, distributed, with no external binary)."""
    from seqarray_spark.sources.bcf import read_bcf as _read_bcf

    return _read_bcf(spark, path, **kwargs)


def bcf2gds(spark, bcf_path: str, gds_path: str, *,
            read_opts: dict | None = None, **write_opts) -> None:
    """One-step BCF -> GDS container conversion (reference: seqBCF2GDS's
    full pipeline) — pure Python end to end."""
    read_bcf(spark, bcf_path, **(read_opts or {})).to_gds(gds_path, **write_opts)


def snp2gds(spark, snp_fn: str, out_fn: str, **kwargs) -> str:
    """SNPRelate snp.gds -> SeqArray .gds, incl. the major-allele-as-ref
    recode (reference: seqSNP2GDS, R/Conversion.R:555-825). True
    container form — see sources/snp_gds.py."""
    from seqarray_spark.sources.snp_gds import snp2gds as _s2g

    return _s2g(spark, snp_fn, out_fn, **kwargs)


def gds2snp(spark, gds_fn: str, out_fn: str, **kwargs) -> str:
    """SeqArray .gds -> SNPRelate snp.gds (bit2 'SNP_ARRAY' or
    packedreal 'IMPUTED_DOSAGE' dosage form; reference: seqGDS2SNP,
    R/Conversion.R:410-547)."""
    from seqarray_spark.sources.snp_gds import gds2snp as _g2s

    return _g2s(spark, gds_fn, out_fn, **kwargs)
