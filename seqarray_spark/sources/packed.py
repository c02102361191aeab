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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset
from seqarray_spark.functions.variant import dosage_alt


def pack_2bit_genotypes(ds: SeqDataset, sample_ids: list[str] | None = None) -> DataFrame:
    """Per-variant packed 2-bit genotype row: code = #ALT copies (0..2)
    with "$dosage_alt2" semantics (partially-missing calls keep their
    observed ALT count — the reference's seqGet2bGeno reads the same
    variable, R/Methods.R:1247), 3 = fully missing; 4 samples per byte
    in `sample_ids` order. Like the reference's 2-bit form, partial
    missingness is NOT representable — scans over the packed column
    treat a partial call as ploidy observed slots.

    Returns: variant_id LONG, n_samples INT, packed BINARY.
    """
    if sample_ids is None:
        from seqarray_spark.dataset import ordered_sample_ids

        sample_ids = ordered_sample_ids(ds.samples)
    n_samp = len(sample_ids)
    stride = math.ceil(n_samp / 4)
    pad = stride * 4 - n_samp

    # ONE calls-scale shuffle: collect each variant's (sample-ordinal,
    # dosage) pairs; alignment, missing-fill, and bit-packing all happen
    # as numpy scatter over whole Arrow batches. (An earlier two-shuffle
    # map_from_entries + per-slot element_at formulation was 5x slower.)
    # The sample -> ordinal mapping is a BROADCAST hash join: a literal
    # map_from_arrays + getItem evaluates as a linear scan of the map
    # per row (O(n_samp) per call — measured dominating this operator),
    # where the hash join probe is O(1).
    spark = ds.calls.sparkSession
    from seqarray_spark.plans.localrel import ordinal_frame

    # JVM-native local relation: the createDataFrame(list) path costs a
    # 16-task Python parallelize job per query (profile r13)
    ord_df = ordinal_frame(spark, sample_ids)
    # (sample-ordinal, 2-bit code) fused into one integer so the Arrow
    # batch arrives as plain int arrays — no Python-level struct decode.
    # NB: least() skips NULLs, so the missing case must be tested first.
    # "$dosage_alt2" semantics like the reference's seqGet2bGeno
    # (R/Methods.R:1247): a partially-missing call keeps its OBSERVED
    # ALT count; only fully-missing calls pack as the missing code 3
    dos = dosage_alt("alleles", partial_missing=True)
    code = F.when(dos.isNull(), F.lit(3)).otherwise(F.least(dos, F.lit(2)))
    sel = ds.calls.join(F.broadcast(ord_df), "sample_id").select(
        "variant_id", (F.col("__ord") * 4 + code).alias("oc")
    )
    # Scan-layout-adaptive spread (r13 opt, guide §2.5 — the _dose_flat
    # rule): when the input scan provides fewer partitions than the
    # cluster has cores (the single-row-group testdata layout), the
    # collect_list agg AND everything downstream of it (the pack
    # mapInPandas, the consumers' pair kernels) inherit that 1-3-task
    # parallelism after AQE coalesces the tiny shuffle (measured: the
    # KING/IBS kernels ran as ONE task at sf0.1). Hash-repartitioning
    # on the grouping key BEFORE the groupBy sizes those stages by
    # compute, not shuffle bytes; collect_list has no map-side partial
    # aggregation to lose, and the per-variant list order stays
    # arbitrary (pack() collapses it order-insensitively via
    # np.maximum.at). REPARTITION_BY_NUM is not AQE-coalesced, so the
    # pack and the kernels run at cluster width; multi-split inputs
    # (the 100 TB posture) keep their native layout.
    sc = spark.sparkContext
    try:
        scan_parts = ds.calls.rdd.getNumPartitions()
    except Exception:
        scan_parts = sc.defaultParallelism
    if scan_parts < sc.defaultParallelism:
        sel = sel.repartition(sc.defaultParallelism, "variant_id")
    pairs = sel.groupBy("variant_id").agg(F.collect_list("oc").alias("ocs"))
    # A selected variant whose call rows were ALL removed (e.g. by a
    # sample filter) must still emit a packed row — all-missing, like the
    # reference's seqGet2bGeno grid over the full selection. Left join
    # from the variant axis; pack() turns the NULL ocs into code-3 bytes.
    pairs = ds.variants.select("variant_id").join(pairs, "variant_id", "left")

    def pack(batches):
        shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            # NULL ocs = zero-call variant (left-join miss): packs all-missing
            lens = np.fromiter(
                (0 if p is None else len(p) for p in pdf["ocs"]),
                dtype=np.int64, count=n,
            )
            row_idx = np.repeat(np.arange(n), lens)
            flat = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in pdf["ocs"] if p is not None]
                or [np.empty(0, dtype=np.int64)]
            )
            ords = flat >> 2
            cvals = (flat & 3).astype(np.uint8)
            # duplicate (variant, sample) rows collapse via max over the
            # non-missing codes (same semantics as to_dosage_matrix);
            # untouched cells keep the missing code 3
            valid = cvals != 3
            vals = np.zeros((n, n_samp + pad), dtype=np.uint8)
            touched = np.zeros((n, n_samp + pad), dtype=bool)
            np.maximum.at(vals, (row_idx[valid], ords[valid]), cvals[valid])
            touched[row_idx[valid], ords[valid]] = True
            codes = np.where(touched, vals, np.uint8(3))
            words = np.bitwise_or.reduce(
                codes.reshape(n, -1, 4) << shifts, axis=2
            ).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "variant_id": pdf["variant_id"],
                    "n_samples": n_samp,
                    "packed": [w.tobytes() for w in words],
                }
            )

    return pairs.mapInPandas(
        pack, schema="variant_id long, n_samples int, packed binary"
    )


def unpack_2bit_genotypes(packed: DataFrame, sample_ids: list[str]) -> DataFrame:
    """Inverse of pack_2bit_genotypes → (variant_id, sample_id, dosage_alt)."""
    n_samp = len(sample_ids)

    sid_arr = np.asarray(sample_ids, dtype=object)

    def unpack(iterator):
        lut = _code_lut()
        for pdf in iterator:
            if not len(pdf):
                continue
            n = len(pdf)
            # whole-batch: bytes -> (n, stride) matrix -> LUT-expand to
            # 2-bit codes -> flat long format (same kernel shape as
            # af_from_packed; no per-sample Python loop)
            mat = np.frombuffer(b"".join(pdf["packed"]), dtype=np.uint8).reshape(n, -1)
            codes = lut[mat].reshape(n, -1)[:, :n_samp].ravel()
            dos = pd.array(codes, dtype="Int32")
            dos[codes == 3] = pd.NA
            yield pd.DataFrame(
                {
                    "variant_id": np.repeat(pdf["variant_id"].to_numpy(), n_samp),
                    "sample_id": np.tile(sid_arr, n),
                    "dosage_alt": dos,
                }
            )

    return packed.mapInPandas(
        unpack, schema="variant_id long, sample_id string, dosage_alt int"
    )


_CODE_LUT = None
_AGG_LUTS = None


def _code_lut() -> np.ndarray:
    """256 -> 4 unpacked 2-bit codes (alt-dosage 0..2, 3 = missing)."""
    global _CODE_LUT
    if _CODE_LUT is None:
        lut = np.empty((256, 4), dtype=np.uint8)
        for byte in range(256):
            for k in range(4):
                lut[byte, k] = (byte >> (2 * k)) & 0b11
        _CODE_LUT = lut
    return _CODE_LUT


def _agg_luts() -> tuple[np.ndarray, np.ndarray]:
    """(alt_sum, missing_count) per BYTE — the whole-byte aggregation
    tables that let the AF scan gather one uint8 per byte instead of
    expanding to 4 codes (4x less memory traffic; the numpy analogue of
    the reference's SIMD popcount tables, src/vectorization.h:320-341)."""
    global _AGG_LUTS
    if _AGG_LUTS is None:
        codes = _code_lut().astype(np.int16)
        alt = np.where(codes == 3, 0, codes).sum(axis=1).astype(np.uint8)
        miss = (codes == 3).sum(axis=1).astype(np.uint8)
        _AGG_LUTS = (alt, miss)
    return _AGG_LUTS


def decode_packed_matrix(pk, n: int, stride: int) -> np.ndarray:
    """Arrow binary array -> (n, stride) uint8 matrix, zero-copy when the
    rows are fixed-width (the pack writer's invariant, checked PER ROW —
    a total-length check would accept ragged rows whose widths merely
    sum to n*stride and misparse every row after the first). Ragged or
    null-bearing input falls back to a copying path with 0xff (= all
    lanes missing) padding."""
    import pyarrow as pa

    bufs = pk.buffers()
    width = np.int64 if pa.types.is_large_binary(pk.type) else np.int32
    offs = np.frombuffer(
        bufs[1], dtype=width, count=n + 1,
        offset=pk.offset * np.dtype(width).itemsize,
    )
    if pk.null_count == 0 and bool(np.all(np.diff(offs) == stride)):
        return np.frombuffer(
            bufs[2], dtype=np.uint8, count=n * stride, offset=int(offs[0])
        ).reshape(n, stride)
    return np.frombuffer(
        b"".join(
            (v.as_py() or b"").ljust(stride, b"\xff")[:stride] for v in pk
        ),
        dtype=np.uint8,
    ).reshape(n, stride)


def af_from_packed(packed: DataFrame, ploidy: int = 2) -> DataFrame:
    """Fused AF+AC+missing scan over the 2-bit packed genotype column —
    the engine's answer to the reference's headline benchmark (bit2
    storage + SIMD count kernels, src/vectorization.h:320-341;
    BASELINE.md #3: 180M calls/s/core in C).

    One variant per row, whole-batch numpy: unpack via a 256->4 LUT and
    reduce along samples. No shuffle at all — per-variant stats come out
    of the same row their genotypes live in. ~20-40x the long-format
    aggregate's throughput; use it when the packed layout is already
    materialized (ML export pipelines).

    The 2-bit code caps dosage at 2, so the packed layout itself is
    diploid-biased; `ploidy` only adjusts the AN denominator (AN =
    ploidy * non-missing) for callers who packed haploid data as 0/1
    codes. Mixed-ploidy data should stay on the long-format
    `af_ac_missing` aggregate, which derives AN from actual allele
    slots.

    Returns: variant_id, af_alt, ac_alt, an, missing_rate.

    Arrow-native kernel (mapInArrow, r10): the packed column is read
    straight out of the Arrow binary array's data buffer (one
    frombuffer + reshape — rows are fixed-width by construction), so
    no per-row Python bytes objects are ever materialized and no
    pandas conversion runs on either side. The pandas form of this
    kernel spent more time assembling 10^5 bytes objects and joining
    them than it spent counting; at the 100M-call SCALE.md shape the
    whole scan is Arrow decode + two byte-LUT gathers.
    """

    def _stats(mat, n_samp, alt_lut, miss_lut, codes_lut):
        # whole-byte LUT sums, never a 4x expansion; the last byte's
        # pad lanes are excluded via dedicated tail LUTs (r valid
        # lanes), so no assumption about the pad encoding is made
        alt = alt_lut[mat].sum(axis=1, dtype=np.int64)
        miss = miss_lut[mat].sum(axis=1, dtype=np.int64)
        r = n_samp % 4
        if r:
            tcodes = codes_lut[:, :r]
            tail_alt = np.where(tcodes == 3, 0, tcodes).sum(axis=1) \
                .astype(np.int64)
            tail_miss = (tcodes == 3).sum(axis=1).astype(np.int64)
            tail = mat[:, -1]
            alt += tail_alt[tail] - alt_lut[tail]
            miss += tail_miss[tail] - miss_lut[tail]
        return alt, miss

    def kernel(batches):
        import pyarrow as pa

        alt_lut, miss_lut = _agg_luts()
        codes_lut = _code_lut().astype(np.int16)
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            names = rb.schema.names
            vid = rb.column(names.index("variant_id"))
            pk = rb.column(names.index("packed"))
            n_samp = int(rb.column(names.index("n_samples"))[0].as_py())
            stride = (n_samp + 3) // 4
            mat = decode_packed_matrix(pk, n, stride)
            alt, miss = _stats(mat, n_samp, alt_lut, miss_lut, codes_lut)
            an = ploidy * (n_samp - miss)
            with np.errstate(invalid="ignore", divide="ignore"):
                af = np.where(an > 0, alt / np.maximum(an, 1), np.nan)
            yield pa.RecordBatch.from_arrays(
                [
                    vid,
                    pa.array(af, type=pa.float64()),
                    pa.array(alt, type=pa.int64()),
                    pa.array(an.astype(np.int64), type=pa.int64()),
                    pa.array(miss / n_samp, type=pa.float64()),
                ],
                names=["variant_id", "af_alt", "ac_alt", "an",
                       "missing_rate"],
            )

    return packed.mapInArrow(
        kernel,
        schema="variant_id long, af_alt double, ac_alt long, an long, missing_rate double",
    )


def to_dosage_matrix(ds: SeqDataset, sample_ids: list[str] | None = None) -> DataFrame:
    """Wide dosage export as a DataFrame (the in-memory analogue of
    seqGDS2SNP's dosage mode, R/Conversion.R:410-547): one row per
    variant with an ARRAY<INT> of alt-dosages in sample order — the
    long→wide pivot without pivot() (collect_list of (order, value)
    structs, sorted, projected). For the actual SNPRelate snp.gds
    CONTAINER on disk use sources/snp_gds.write_snp_gds / gds2snp."""
    if sample_ids is None:
        from seqarray_spark.dataset import ordered_sample_ids

        sample_ids = ordered_sample_ids(ds.samples)
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
    (the in-memory analogue of seqSNP2GDS, R/Conversion.R:555-825):
    dosage d becomes d ALT copies + (ploidy-d) REF copies; NULL dosage
    → missing call. For reading an actual snp.gds container use
    sources/snp_gds.read_snp_gds / snp2gds."""
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
