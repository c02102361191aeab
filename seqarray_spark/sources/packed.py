"""Packed-genotype export (reference: seqGet2bGeno R/Methods.R:1224-1342;
FC_SetPackedGeno* src/Methods.cpp:1119-1232) and dosage-matrix interop
(reference: seqGDS2SNP / seqSNP2GDS, R/Conversion.R:410-825).

seqGet2bGeno materializes the whole genotype matrix as 2-bit codes
(0/1/2 = #ALT copies... actually #REF in SNP coding; 3 = missing) for
ML-style consumers. Here: one BINARY row per variant (sample-ordered) —
Parquet-storable, mmap-friendly downstream, assembled by an Arrow-batched
kernel per variant group.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset
from seqarray_spark.functions.variant import dosage_alt


def pack_2bit_genotypes(ds: SeqDataset, sample_ids: list[str] | None = None) -> DataFrame:
    """Per-variant packed 2-bit genotype row: code = #ALT copies (0..2),
    3 = missing; 4 samples per byte in `sample_ids` order.

    Returns: variant_id LONG, n_samples INT, packed BINARY.
    """
    if sample_ids is None:
        sample_ids = [
            r[0] for r in ds.samples.select("sample_id").orderBy("sample_id").collect()
        ]
    n_samp = len(sample_ids)
    stride = math.ceil(n_samp / 4)
    pad = stride * 4 - n_samp

    # one shuffle builds the sample-ordered dosage row per variant; the
    # byte-packing then runs vectorized over whole Arrow batches (a
    # per-variant grouped-apply here was 4x slower: thousands of tiny
    # Python groups instead of a few hundred batches)
    matrix = to_dosage_matrix(ds, sample_ids=sample_ids)

    def pack(batches):
        shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            # whole-batch vectorization: (batch, n_samp) float matrix with
            # NaN for missing -> codes -> 4-lane bit packing, no per-row
            # Python loop
            mat = np.array(
                [[np.nan if d is None else d for d in row] for row in pdf["dosages"]],
                dtype=np.float64,
            )
            codes = np.where(np.isnan(mat), 3, np.minimum(mat, 2)).astype(np.uint8)
            if pad:
                codes = np.pad(codes, ((0, 0), (0, pad)))
            words = np.bitwise_or.reduce(
                codes.reshape(len(pdf), -1, 4) << shifts, axis=2
            ).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "variant_id": pdf["variant_id"],
                    "n_samples": n_samp,
                    "packed": [w.tobytes() for w in words],
                }
            )

    return matrix.mapInPandas(
        pack, schema="variant_id long, n_samples int, packed binary"
    )


def unpack_2bit_genotypes(packed: DataFrame, sample_ids: list[str]) -> DataFrame:
    """Inverse of pack_2bit_genotypes → (variant_id, sample_id, dosage_alt)."""
    n_samp = len(sample_ids)

    def unpack(iterator):
        for pdf in iterator:
            vids, sids, dos = [], [], []
            for vid, blob in zip(pdf["variant_id"], pdf["packed"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                for i in range(n_samp):
                    code = (arr[i // 4] >> (2 * (i % 4))) & 0b11
                    vids.append(vid)
                    sids.append(sample_ids[i])
                    dos.append(None if code == 3 else int(code))
            yield pd.DataFrame({"variant_id": vids, "sample_id": sids, "dosage_alt": dos})

    return packed.mapInPandas(
        unpack, schema="variant_id long, sample_id string, dosage_alt int"
    )


def to_dosage_matrix(ds: SeqDataset, sample_ids: list[str] | None = None) -> DataFrame:
    """Wide dosage export (reference: seqGDS2SNP dosage mode,
    R/Conversion.R:410-547): one row per variant with an ARRAY<INT> of
    alt-dosages in sample order — the long→wide pivot without pivot()
    (collect_list of (order, value) structs, sorted, projected)."""
    if sample_ids is None:
        sample_ids = [
            r[0] for r in ds.samples.select("sample_id").orderBy("sample_id").collect()
        ]
    order_expr = F.map_from_arrays(
        F.array(*[F.lit(s) for s in sample_ids]),
        F.array(*[F.lit(i) for i in range(len(sample_ids))]),
    )
    dos = ds.calls.select(
        "variant_id",
        order_expr.getItem(F.col("sample_id")).alias("__ord"),
        dosage_alt("alleles").alias("d"),
    )
    # duplicate (variant, sample) rows collapse via max; absent samples
    # surface as NULL slots — alignment to sample order is by map lookup,
    # not collect order, so sparse call tables stay correct
    per_slot = dos.groupBy("variant_id", "__ord").agg(F.max("d").alias("d"))
    return per_slot.groupBy("variant_id").agg(
        F.map_from_entries(F.collect_list(F.struct("__ord", "d"))).alias("__m")
    ).select(
        "variant_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(len(sample_ids) - 1)),
            lambda i: F.element_at(F.col("__m"), i),
        ).alias("dosages"),
    )


def from_dosage_matrix(
    matrix: DataFrame, sample_ids: list[str], ploidy: int = 2
) -> DataFrame:
    """Dosage matrix → long calls with reconstructed alleles arrays
    (reference: seqSNP2GDS, R/Conversion.R:555-825): dosage d becomes
    d ALT copies + (ploidy-d) REF copies; NULL dosage → missing call."""
    sample_arr = F.array(*[F.lit(s) for s in sample_ids])
    exploded = matrix.select(
        "variant_id", F.posexplode("dosages").alias("__pos", "d")
    ).withColumn("sample_id", F.element_at(sample_arr, F.col("__pos") + 1))
    alleles = F.when(
        F.col("d").isNotNull(),
        F.concat(
            F.array_repeat(F.lit(1).cast("smallint"), F.col("d").cast("int")),
            F.array_repeat(
                F.lit(0).cast("smallint"), F.lit(ploidy) - F.col("d").cast("int")
            ),
        ),
    ).otherwise(F.array_repeat(F.lit(None).cast("smallint"), ploidy))
    return exploded.select("variant_id", "sample_id", alleles.alias("alleles"))
