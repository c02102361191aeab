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


def chrom_pos2(variants: DataFrame) -> DataFrame:
    """'chr:pos' with the FIRST occurrence bare and subsequent
    duplicates suffixed '_1','_2',... (reference: get_chrom_pos2
    src/GetData.cpp:710-748 — the dup counter starts at 0 and the
    unsuffixed name is emitted before it increments). The reference's
    sequential counter becomes a window row_number partitioned by
    (chrom,pos) ordered by variant_id, so it scales without a global
    sort (equivalent to the reference's file-order walk on
    position-sorted data)."""
    w = Window.partitionBy("chromosome", "position").orderBy("variant_id")
    return (
        variants.withColumn("__rn", F.row_number().over(w))
        .select(
            "variant_id",
            F.when(F.col("__rn") == 1, chrom_pos())
            .otherwise(
                F.concat_ws("_", chrom_pos(), (F.col("__rn") - 1).cast("string"))
            )
            .alias("chrom_pos2"),
        )
    )
