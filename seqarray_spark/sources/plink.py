"""PLINK BED/BIM/FAM source & sink (reference: seqBED2GDS / seqGDS2BED,
R/Conversion.R:833-1450; 2-bit decode kernel SEQ_ConvBED2GDS
src/ConvToGDS.cpp:70-137).

Format: BED is SNP-major — 3 magic bytes (0x6c 0x1b 0x01) then
ceil(n_samples/4) bytes per variant; each byte packs 4 calls, 2 bits
each, little-endian within the byte:
    00 -> homozygous A1   (alleles [1,1] when ref=A2)
    01 -> missing         ([None, None])
    10 -> heterozygous    ([0, 1])
    11 -> homozygous A2   ([0, 0])

Scale shape: BIM/FAM are text (driver-small); the BED payload is decoded
by Arrow-batched kernels that each read only their byte range
(offset = 3 + variant_idx * stride), so the decode parallelizes over
variants without ever loading the whole file — the same slicing the
reference does in C, expressed as mapInPandas over an index frame.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset

_MAGIC = b"\x6c\x1b\x01"

# 2-bit code -> (#ref copies as alleles array) with ref = A2
_CODE_TO_ALLELES = {
    0b00: [1, 1],
    0b01: [None, None],
    0b10: [0, 1],
    0b11: [0, 0],
}


def read_plink(
    spark: SparkSession,
    bed_path: str,
    bim_path: str | None = None,
    fam_path: str | None = None,
    batch_variants: int = 512,
) -> SeqDataset:
    """PLINK fileset → SeqDataset (reference: seqBED2GDS)."""
    prefix = bed_path[:-4] if bed_path.endswith(".bed") else bed_path
    bim_path = bim_path or prefix + ".bim"
    fam_path = fam_path or prefix + ".fam"

    with open(bed_path, "rb") as fh:
        magic = fh.read(3)
    if magic != _MAGIC:
        raise ValueError(f"{bed_path}: bad magic {magic!r} (not SNP-major BED)")

    fam = pd.read_csv(
        fam_path,
        sep=r"\s+",
        header=None,
        names=["fid", "iid", "father", "mother", "sex", "pheno"],
        dtype=str,
    )
    sample_ids = list(fam["iid"])
    n_samp = len(sample_ids)
    stride = math.ceil(n_samp / 4)

    bim = pd.read_csv(
        bim_path,
        sep=r"\s+",
        header=None,
        names=["chromosome", "id", "cm", "position", "a1", "a2"],
        dtype={"chromosome": str, "id": str, "a1": str, "a2": str},
    )
    bim["variant_id"] = range(1, len(bim) + 1)

    variants = spark.createDataFrame(
        bim[["variant_id", "chromosome", "position", "id", "a2", "a1"]].rename(
            columns={"a2": "ref"}
        )
    ).select(
        F.col("variant_id").cast("long"),
        "chromosome",
        F.col("position").cast("int"),
        "id",
        "ref",
        F.array("a1").alias("alt"),
        F.lit(None).cast("double").alias("qual"),
        F.lit(None).cast("string").alias("filter"),
    )

    # sample_ordinal = 1-based .fam row order (the reference's sample order)
    samples = spark.createDataFrame(
        fam[["iid", "fid", "sex", "pheno"]].assign(
            sample_ordinal=range(1, len(fam) + 1)
        )
    ).select(
        F.col("iid").alias("sample_id"), "fid", "sex", "pheno", "sample_ordinal"
    )

    # RANGE partitioning: each task must own a CONTIGUOUS index span so
    # its lo..hi byte-range read covers only its own variants — a plain
    # round-robin repartition scatters indices across the whole file and
    # every task would read (and hold) nearly the entire BED
    idx = spark.createDataFrame(
        [(int(i),) for i in range(len(bim))], "variant_idx long"
    ).repartitionByRange(
        max(1, len(bim) * n_samp // 2_000_000 + 1), "variant_idx"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lut = np.empty((256, 4), dtype=np.int8)
        for byte in range(256):
            for k in range(4):
                code = (byte >> (2 * k)) & 0b11
                lut[byte, k] = {0b00: 2, 0b01: -1, 0b10: 1, 0b11: 0}[code]
        with open(bed_path, "rb") as fh:
            for pdf in batches:
                idxs = np.sort(pdf["variant_idx"].to_numpy())
                if idxs.size == 0:
                    continue
                out_vid, out_sid, out_alleles = [], [], []
                lo, hi = int(idxs[0]), int(idxs[-1])
                fh.seek(3 + lo * stride)
                blob = fh.read((hi - lo + 1) * stride)
                arr = np.frombuffer(blob, dtype=np.uint8).reshape(-1, stride)
                for vi in idxs:
                    row = arr[int(vi) - lo]
                    # a1_copies per sample: 2/1/0, -1 = missing
                    a1 = lut[row].reshape(-1)[:n_samp]
                    for si in range(n_samp):
                        c = int(a1[si])
                        if c < 0:
                            alleles = [None, None]
                        else:
                            # ref = A2: #alt(=A1) copies = c
                            alleles = [1] * c + [0] * (2 - c)
                        out_vid.append(int(vi) + 1)
                        out_sid.append(sample_ids[si])
                        out_alleles.append(alleles)
                yield pd.DataFrame(
                    {
                        "variant_id": out_vid,
                        "sample_id": out_sid,
                        "alleles": out_alleles,
                    }
                )

    calls = idx.mapInPandas(
        decode, schema="variant_id long, sample_id string, alleles array<smallint>"
    ).withColumn("phased", F.array(F.lit(False)))

    return SeqDataset(variants, calls, samples, ploidy=2)


def write_plink(ds: SeqDataset, out_prefix: str) -> None:
    """SeqDataset → PLINK fileset (reference: seqGDS2BED). Biallelic
    diploid only. BED bytes are assembled per variant distributed, then
    streamed to the single output file in variant order (BED is not a
    splittable sink, so the final concatenation is inherently sequential)."""
    from seqarray_spark.functions.variant import dosage_alt

    from seqarray_spark.dataset import ordered_sample_ids

    sample_ids = ordered_sample_ids(ds.samples)
    n_samp = len(sample_ids)
    order = {s: i for i, s in enumerate(sample_ids)}

    v = ds.variants.select("variant_id", "chromosome", "position", "id", "ref", "alt")
    multi = v.filter(F.size("alt") > 1).limit(1).count()
    if multi:
        raise ValueError("write_plink requires biallelic variants (split first)")

    dos = ds.calls.select(
        "variant_id", "sample_id", dosage_alt("alleles").alias("d")
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        codes = np.full(n_samp, 0b01, dtype=np.uint8)  # missing
        for sid, d in zip(pdf["sample_id"], pdf["d"]):
            if d is None or (isinstance(d, float) and np.isnan(d)):
                c = 0b01
            else:
                c = {0: 0b11, 1: 0b10, 2: 0b00}[int(d)]
            codes[order[sid]] = c
        stride = math.ceil(n_samp / 4)
        out = np.zeros(stride, dtype=np.uint8)
        for i, c in enumerate(codes):
            out[i // 4] |= c << (2 * (i % 4))
        return pd.DataFrame({"variant_id": [key[0]], "bed_bytes": [out.tobytes()]})

    packed = (
        dos.groupBy("variant_id")
        .applyInPandas(pack, schema="variant_id long, bed_bytes binary")
        .join(v.select("variant_id", "chromosome", "position", "id", "ref", "alt"), "variant_id")
        .orderBy("chromosome", "position", "variant_id")
    )

    # stream rows in sort order instead of collecting every variant's
    # packed bytes at once — driver memory stays O(1 row) for BED files
    # of any height (the sink is single-file/driver-side by format)
    with open(out_prefix + ".bed", "wb") as bed, \
            open(out_prefix + ".bim", "w") as bim:
        bed.write(_MAGIC)
        for r in packed.toLocalIterator():
            bed.write(bytes(r["bed_bytes"]))
            bim.write(
                f"{r['chromosome']}\t{r['id'] or '.'}\t0\t{r['position']}\t"
                f"{r['alt'][0]}\t{r['ref']}\n"
            )
    with open(out_prefix + ".fam", "w") as fh:
        for s in sample_ids:
            fh.write(f"{s} {s} 0 0 0 -9\n")
