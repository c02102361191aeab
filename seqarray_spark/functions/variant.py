"""Variant-domain scalar/column functions.

Each function replaces a C kernel from the reference with a built-in
Spark expression (SURVEY.md §2.10) so it stays inside whole-stage codegen:

- dosage_ref / dosage_alt   <- get_dosage* (src/GetData.cpp:311-410) and the
  SIMD count kernels (src/vectorization.h:333-341)
- num_allele                <- GetNumOfAllele (src/Index.h:685)
- chrom_pos / chrom_pos2 / chrom_pos_allele <- src/GetData.cpp:683-780
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def allele_count_in_call(alleles: str | Column, k: int) -> Column:
    """#slots in one call equal to allele index k (missing slots excluded)."""
    a = _col(alleles)
    return F.size(F.filter(a, lambda x: x == k))


def nonmissing_in_call(alleles: str | Column) -> Column:
    """#non-missing allele slots in one call (NULL array → 0)."""
    a = _col(alleles)
    return F.when(a.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(a, lambda x: x.isNotNull()))
    )


def dosage_ref(alleles: str | Column) -> Column:
    """Count of REF alleles per call; NULL if any slot missing
    (reference: get_dosage src/GetData.cpp:311-344)."""
    a = _col(alleles)
    any_missing = a.isNull() | (F.size(F.filter(a, lambda x: x.isNull())) > 0)
    return F.when(any_missing, F.lit(None)).otherwise(
        F.size(F.filter(a, lambda x: x == 0))
    ).cast("int")


def dosage_alt(alleles: str | Column, partial_missing: bool = False) -> Column:
    """Count of ALT (non-REF) alleles per call.

    partial_missing=False: NULL if any slot is missing
      (reference: get_dosage_alt src/GetData.cpp:345-378).
    partial_missing=True: only fully-missing calls are NULL; partially
      missing calls count their known ALT slots
      (reference: get_dosage_alt2 src/GetData.cpp:379-410).
    """
    a = _col(alleles)
    alt_cnt = F.size(F.filter(a, lambda x: x.isNotNull() & (x != 0)))
    if partial_missing:
        all_missing = a.isNull() | (F.size(F.filter(a, lambda x: x.isNotNull())) == 0)
        return F.when(all_missing, F.lit(None)).otherwise(alt_cnt).cast("int")
    any_missing = a.isNull() | (F.size(F.filter(a, lambda x: x.isNull())) > 0)
    return F.when(any_missing, F.lit(None)).otherwise(alt_cnt).cast("int")


def num_allele(alt: str | Column = "alt") -> Column:
    """#alleles per variant = 1 + #alt (reference: get_num_allele
    src/GetData.cpp:619)."""
    return (F.size(_col(alt)) + F.lit(1)).cast("int")


def allele_string(ref: str | Column = "ref", alt: str | Column = "alt") -> Column:
    """Rebuild the reference's comma-separated 'REF,ALT1,...' encoding
    (reference: R/ConvVCF2GDS.R:981)."""
    return F.concat_ws(",", F.concat(F.array(_col(ref)), _col(alt)))


def chrom_pos(chrom: str | Column = "chromosome", pos: str | Column = "position") -> Column:
    """'chr:pos' key (reference: get_chrom_pos src/GetData.cpp:683)."""
    return F.concat_ws(":", _col(chrom), _col(pos).cast("string"))


def chrom_pos_allele(
    chrom: str | Column = "chromosome",
    pos: str | Column = "position",
    ref: str | Column = "ref",
    alt: str | Column = "alt",
) -> Column:
    """'chr:pos_REF,ALT' merge key (reference: get_chrom_pos_allele
    src/GetData.cpp:751; merge key R/UtilsMerge.R:328-352)."""
    return F.concat_ws(
        "_", chrom_pos(chrom, pos), allele_string(ref, alt)
    )


def _dense_order_index(df: DataFrame, order_col: str = "variant_id") -> DataFrame:
    """Append a dense 0-based `__idx` in `order_col` order WITHOUT a
    single-partition global window: range-partition, enumerate per
    partition, broadcast-join the per-partition offsets (the same
    pattern as the VCF importer's order ids)."""
    import numpy as np

    spark = df.sparkSession
    part = (
        df.repartitionByRange(order_col)
        .sortWithinPartitions(order_col)
        .withColumn("__p", F.spark_partition_id())
    )
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in part.schema.fields
    ) + ", __i long"

    def _enum(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__i"] = np.arange(i, i + len(pdf), dtype="int64")
            i += len(pdf)
            yield pdf

    t = part.mapInPandas(_enum, schema).persist()
    rows = sorted(
        t.groupBy("__p").agg(F.count(F.lit(1)).alias("n")).collect(),
        key=lambda r: r["__p"],
    )
    off, offs = 0, []
    for r in rows:
        offs.append((r["__p"], off))
        off += r["n"]
    odf = spark.createDataFrame(offs or [(0, 0)], "__p int, __off long")
    out = (
        t.join(F.broadcast(odf), "__p")
        .withColumn("__idx", F.col("__off") + F.col("__i"))
        .drop("__p", "__i", "__off")
        .localCheckpoint()
    )
    t.unpersist()
    return out


def chrom_pos2(variants: DataFrame, dense_ids: bool = False) -> DataFrame:
    """'chr:pos' with CONSECUTIVE duplicates (in variant_id order)
    suffixed '_1','_2',... — the first of a run stays bare, and the dup
    counter RESETS when the key changes, so non-adjacent repeats are
    unsuffixed too (reference: get_chrom_pos2 src/GetData.cpp:710-748
    compares each key against the immediately preceding one).

    Runs are found gaps-and-islands style over a dense order index
    (built scalably — no one-partition global window): within a
    (chrom, pos) group, idx - row_number is constant exactly for
    consecutive rows.

    The enumeration pass (persist + per-partition count collect) is
    skipped when it is redundant: a precomputed `__idx` column is used
    as-is, and `dense_ids=True` declares that variant_id itself is a
    gapless consecutive sequence (what the importers' assign_ids='order'
    guarantee) so it serves as the index directly. Only valid on an
    UNFILTERED frame — subsetting reintroduces gaps, which would split
    runs that the reference's selection walk sees as consecutive."""
    base = variants.select("variant_id", "chromosome", "position")
    if "__idx" in variants.columns:
        t = variants.select("variant_id", "chromosome", "position", "__idx")
    elif dense_ids:
        t = base.withColumn("__idx", F.col("variant_id").cast("long"))
    else:
        t = _dense_order_index(base)
    w = Window.partitionBy("chromosome", "position").orderBy("__idx")
    grp = (F.col("__idx") - F.row_number().over(w)).alias("__grp")
    t = t.select("variant_id", "chromosome", "position", "__idx", grp)
    w2 = Window.partitionBy("chromosome", "position", "__grp").orderBy("__idx")
    return (
        t.withColumn("__rn", F.row_number().over(w2))
        .select(
            "variant_id",
            F.when(F.col("__rn") == 1, chrom_pos())
            .otherwise(
                F.concat_ws("_", chrom_pos(), (F.col("__rn") - 1).cast("string"))
            )
            .alias("chrom_pos2"),
        )
    )
