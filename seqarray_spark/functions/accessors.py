"""VariantAnnotation-style accessors over a SeqDataset — the reference's
S4 methods on SeqVarGDSClass (R/Methods-SeqVarGDSClass.R:9-292):
granges / rowRanges / colData / fixed / ref / alt / qual / filt.

All pure Column projections over the CURRENT selection (each method in
the reference calls seqGetData, which honors the filter stack), no
shuffles: a GRanges row is (seqnames, start, end) with
end = start + max(nchar(REF), 1) - 1, exactly the reference's
reflen[reflen < 1] <- 1 rule. ref() scrubs characters outside the
IUPAC/indel alphabet to '.' like the reference's gsub before
DNAStringSet construction (R/Methods-SeqVarGDSClass.R:28-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's DNAStringSet-safe alphabet (IUPAC codes + - + .)
_REF_SCRUB = r"[^ACGTMRWSYKVHDBNacgtmrwsykvhdbn\-\+\.]"


def ref_scrubbed(col=F.col("ref")):
    """REF with invalid characters replaced by '.' (reference ref()
    method's gsub; keeps DNAStringSet-constructible strings)."""
    return F.regexp_replace(col, _REF_SCRUB, ".")


def granges(ds) -> DataFrame:
    """(variant_id, seqnames, start, end) over the current selection
    (reference granges method R/Methods-SeqVarGDSClass.R:9-24):
    end = pos + max(nchar(REF), 1) - 1."""
    v = ds.variants
    reflen = F.greatest(F.coalesce(F.length("ref"), F.lit(1)), F.lit(1))
    return v.select(
        "variant_id",
        F.col("chromosome").alias("seqnames"),
        F.col("position").alias("start"),
        (F.col("position") + reflen - 1).alias("end"),
    )


def row_ranges(ds) -> DataFrame:
    """granges + ID/REF/ALT/QUAL/FILTER metadata columns (reference
    rowRanges, R/Methods-SeqVarGDSClass.R:262-270). ALT renders as the
    comma-joined allele list like the ALT strings the alt() method's
    CharacterList carries."""
    v = ds.variants
    reflen = F.greatest(F.coalesce(F.length("ref"), F.lit(1)), F.lit(1))
    return v.select(
        "variant_id",
        F.col("chromosome").alias("seqnames"),
        F.col("position").alias("start"),
        (F.col("position") + reflen - 1).alias("end"),
        F.col("id").alias("ID") if "id" in v.columns else F.lit(None).cast("string").alias("ID"),
        ref_scrubbed().alias("REF"),
        F.concat_ws(",", "alt").alias("ALT"),
        (F.col("qual") if "qual" in v.columns else F.lit(None).cast("double")).alias("QUAL"),
        (F.col("filter") if "filter" in v.columns else F.lit(None).cast("string")).alias("FILTER"),
    )


def fixed(ds) -> DataFrame:
    """The fixed-field frame (REF/ALT/QUAL/FILTER — reference fixed(),
    R/Methods-SeqVarGDSClass.R:64-70)."""
    v = ds.variants
    return v.select(
        "variant_id",
        ref_scrubbed().alias("REF"),
        F.concat_ws(",", "alt").alias("ALT"),
        (F.col("qual") if "qual" in v.columns else F.lit(None).cast("double")).alias("QUAL"),
        (F.col("filter") if "filter" in v.columns else F.lit(None).cast("string")).alias("FILTER"),
    )


def col_data(ds) -> DataFrame:
    """(Samples ordinal, sample_id, annotation columns...) over the
    current sample selection (reference colData,
    R/Methods-SeqVarGDSClass.R:273-292 — Samples = seq_along(sample.id),
    plus every sample.annotation variable). Ordinals follow the
    dataset's canonical sample order (file order when the importer
    preserved sample_ordinal, else ascending sample_id — the reference
    ranks by sample.id node order). The unpartitioned window is safe by
    construction: the samples axis is ≤~10^6 rows even for biobanks."""
    from pyspark.sql.window import Window

    from seqarray_spark.dataset import sample_order_cols

    if ds.samples is None:
        raise ValueError("dataset has no samples table")
    s = ds.samples
    out_cols = [c for c in s.columns if c != "sample_ordinal"]
    return s.select(
        F.row_number()
        .over(Window.orderBy(*sample_order_cols(s)))
        .alias("Samples"),
        *out_cols,
    )


def geno_gt(ds) -> DataFrame:
    """The VariantAnnotation `geno(x)$GT` accessor (reference
    R/Methods-SeqVarGDSClass.R:182-214): per-call diploid genotype
    strings 'a1<sep>a2' with '|' when phased — R paste() quirks
    preserved: a missing slot renders the literal 'NA', and only the
    exact unphased all-missing string 'NA/NA' collapses to '.'
    (`gt[gt == "NA/NA"] <- "."`, :213). Long-format (variant_id,
    sample_id, gt) instead of the reference's samples x variants
    matrix — the matrix is a pivot away and never materializes at
    engine scale."""
    c = ds.calls
    phased1 = (
        # try_element_at: the phased array is empty for haploid calls
        # (ploidy-1 separators) and ANSI element_at would abort on it
        F.coalesce(F.try_element_at("phased", F.lit(1)), F.lit(False))
        if "phased" in c.columns
        else F.lit(False)
    )
    sep = F.when(phased1, F.lit("|")).otherwise(F.lit("/"))
    # try_element_at: haploid calls carry 1-element allele arrays (the
    # engine supports them end-to-end) and the session runs ANSI mode,
    # where element_at on a short array aborts the job; slot 2's NULL
    # then renders 'NA' via coalesce — exactly the R paste() quirk.
    gt = F.concat(
        F.coalesce(F.try_element_at("alleles", F.lit(1)).cast("string"), F.lit("NA")),
        sep,
        F.coalesce(F.try_element_at("alleles", F.lit(2)).cast("string"), F.lit("NA")),
    )
    return c.select(
        "variant_id",
        "sample_id",
        F.when(gt == "NA/NA", F.lit(".")).otherwise(gt).alias("gt"),
    )


def header_df(ds) -> dict[str, DataFrame]:
    """The VariantAnnotation `header(x)` accessor (reference
    NAMESPACE:72, R/Methods-SeqVarGDSClass.R): the declared INFO /
    FORMAT / FILTER catalogs as three DataFrames keyed by ID —
    {'info': (ID, Number, Type, Description),
     'format': (ID, Number, Type, Description),
     'filter': (ID, Description)}.

    Sources, in order: the dataset's stored declarations
    (meta['info_meta'/'format_meta'/'filter_meta'], preserved from the
    VCF/BCF header at import and from Number/Type/Description node
    attrs in GDS containers — reference pins them at
    R/ConvVCF2GDS.R:1245-1260); else synthesized from the schema with
    the same rules the VCF exporter uses (arrays declare Number='.').
    GT is always declared when the dataset carries genotype calls, like
    the reference's geno(x)$GT surface. Catalogs are header-sized
    (driver-local lists -> tiny DataFrames), never data-scan derived."""
    from seqarray_spark.sources.vcf import _header_from_dataset

    meta = getattr(ds, "meta", None) or {}
    spark = ds.variants.sparkSession

    info_cat = list(meta.get("info_meta") or [])
    fmt_cat = list(meta.get("format_meta") or [])
    if not info_cat or not fmt_cat:
        v = ds.variants
        info_fields = (
            [f.name for f in v.schema["info"].dataType.fields]
            if "info" in v.columns
            else []
        )
        calls = ds._base_calls
        fmt_fields = (
            [
                c for c in calls.columns
                if c not in ("variant_id", "sample_id", "alleles", "phased",
                             "vcf_errors")
            ]
            if calls is not None
            else []
        )
        hdr = _header_from_dataset(ds, info_fields, fmt_fields)
        if not info_cat:
            info_cat = [
                {"ID": f.id, "Number": f.number, "Type": f.type,
                 "Description": f.description or ""}
                for f in hdr.info.values()
            ]
        if not fmt_cat:
            fmt_cat = [
                {"ID": f.id, "Number": f.number, "Type": f.type,
                 "Description": f.description or ""}
                for f in hdr.formats.values()
            ]
    if (
        ds._base_calls is not None
        and "alleles" in ds._base_calls.columns
        and not any(d.get("ID") == "GT" for d in fmt_cat)
    ):
        fmt_cat.insert(0, {"ID": "GT", "Number": "1", "Type": "String",
                           "Description": "Genotype"})
    filt_cat = [
        {"ID": d.get("ID", ""), "Description": d.get("Description", "") or ""}
        for d in (meta.get("filter_meta") or [])
    ]
    cat_schema = "ID string, Number string, Type string, Description string"

    def _local(rows, schema):
        # header-sized catalogs: ONE partition, not defaultParallelism —
        # the default slicing turns a 9-row union into ~100 empty tasks
        # (measured: a 1.4 s count job for a toy header)
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema
        ) if rows else spark.createDataFrame([], schema)

    return {
        "info": _local(
            [(d["ID"], d.get("Number", "."), d.get("Type", ""),
              d.get("Description", "") or "") for d in info_cat],
            cat_schema,
        ),
        "format": _local(
            [(d["ID"], d.get("Number", "."), d.get("Type", ""),
              d.get("Description", "") or "") for d in fmt_cat],
            cat_schema,
        ),
        "filter": _local(
            [(d["ID"], d["Description"]) for d in filt_cat],
            "ID string, Description string",
        ),
    }


def info_df(ds, infovar: list[str] | None = None) -> DataFrame:
    """The VariantAnnotation `info(x, infovar=)` accessor (reference
    R/Methods-SeqVarGDSClass.R:132-179): one row per selected variant,
    one column per INFO field (optionally restricted to `infovar`),
    keyed by variant_id (the reference's row.names). Unknown names are
    simply absent, matching `des[des$ID %in% infovar, ]`."""
    v = ds.variants
    if "info" not in v.columns:
        return v.select("variant_id")
    names = [f.name for f in v.schema["info"].dataType.fields]
    if infovar is not None:
        names = [n for n in names if n in set(infovar)]
    return v.select("variant_id", *[F.col(f"info.{n}").alias(n) for n in names])
