"""PLINK BED round-trip, packed genotypes, dosage matrix interop,
mutation ops (reference: seqBED2GDS/seqGet2bGeno/seqGDS2SNP/seqAddValue)."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset


@pytest.fixture(scope="module")
def ds(spark):
    v = spark.createDataFrame(
        [
            (1, "1", 100, "rs1", "A", ["G"]),
            (2, "1", 200, "rs2", "C", ["T"]),
            (3, "2", 50, "rs3", "G", ["A"]),
        ],
        "variant_id long, chromosome string, position int, id string, ref string, alt array<string>",
    )
    c = spark.createDataFrame(
        [
            (1, "s1", [0, 0]), (1, "s2", [0, 1]), (1, "s3", [1, 1]), (1, "s4", [None, None]),
            (2, "s1", [1, 0]), (2, "s2", [0, 0]), (2, "s3", [0, 0]), (2, "s4", [0, 1]),
            (3, "s1", [1, 1]), (3, "s2", [1, 1]), (3, "s3", [0, 1]), (3, "s4", [0, 0]),
        ],
        "variant_id long, sample_id string, alleles array<smallint>",
    )
    s = spark.createDataFrame([("s1",), ("s2",), ("s3",), ("s4",)], "sample_id string")
    return SeqDataset(v, c, s)


def test_plink_roundtrip(spark, ds, tmp_path):
    from seqarray_spark.sources import plink

    prefix = str(tmp_path / "toy")
    plink.write_plink(ds, prefix)

    with open(prefix + ".bed", "rb") as fh:
        blob = fh.read()
    assert blob[:3] == b"\x6c\x1b\x01"
    assert len(blob) == 3 + 3 * math.ceil(4 / 4)

    back = plink.read_plink(spark, prefix + ".bed")
    assert back.variants.count() == 3
    assert back.samples.count() == 4
    # dosages survive the round trip
    from seqarray_spark.functions.variant import dosage_alt

    def dos(d):
        return {
            (r["variant_id"], r["sample_id"]): r["d"]
            for r in d.calls.select(
                "variant_id", "sample_id", dosage_alt("alleles").alias("d")
            ).collect()
        }

    orig = dos(ds)
    # read_plink renumbers variant ids by bim order (chrom,pos sorted =
    # same order here); sample ids preserved
    got = dos(back)
    assert got == orig


def test_pack_unpack_2bit(spark, ds):
    from seqarray_spark.sources import packed

    p = packed.pack_2bit_genotypes(ds)
    rows = p.collect()
    assert len(rows) == 3
    assert all(len(bytes(r["packed"])) == 1 for r in rows)  # 4 samples -> 1 byte
    back = packed.unpack_2bit_genotypes(p, ["s1", "s2", "s3", "s4"])
    got = {(r["variant_id"], r["sample_id"]): r["dosage_alt"] for r in back.collect()}
    assert got[(1, "s1")] == 0 and got[(1, "s2")] == 1 and got[(1, "s3")] == 2
    assert got[(1, "s4")] is None
    assert got[(2, "s1")] == 1


def test_pack_2bit_zero_call_variant(spark, ds):
    """A selected variant with NO surviving call rows still packs — as an
    all-missing (code 3) row, matching the oracle's variants x samples
    grid and the reference's seqGet2bGeno selection semantics."""
    from seqarray_spark.sources import packed

    extra_v = ds.variants.sparkSession.createDataFrame(
        [(4, "2", 999, "rs4", "T", ["C"])],
        "variant_id long, chromosome string, position int, id string, ref string, alt array<string>",
    )
    ds2 = SeqDataset(ds.variants.unionByName(extra_v), ds._base_calls, ds._base_samples)
    p = {r["variant_id"]: bytes(r["packed"]) for r in packed.pack_2bit_genotypes(ds2).collect()}
    assert set(p) == {1, 2, 3, 4}
    assert p[4] == b"\xff"  # 4 samples x code 3 = 0b11111111


def test_af_from_packed_matches_long_form(spark, ds):
    """The packed-column fast scan must agree with the long-format fused
    aggregate (ALT-side AF/AC)."""
    from seqarray_spark.operators.aggregates import af_ac_missing
    from seqarray_spark.sources import packed

    p = packed.pack_2bit_genotypes(ds)
    fast = {r["variant_id"]: r for r in packed.af_from_packed(p).collect()}
    slow = {r["variant_id"]: r for r in af_ac_missing(ds.calls, alt=True).collect()}
    assert set(fast) == set(slow)
    for vid in slow:
        assert fast[vid]["ac_alt"] == slow[vid]["ac"]
        assert fast[vid]["an"] == slow[vid]["an"]
        assert fast[vid]["af_alt"] == pytest.approx(slow[vid]["af"])
        assert fast[vid]["missing_rate"] == pytest.approx(slow[vid]["missing_rate"])


def test_dosage_matrix_roundtrip(spark, ds):
    from seqarray_spark.sources import packed

    m = packed.to_dosage_matrix(ds)
    rows = {r["variant_id"]: r["dosages"] for r in m.collect()}
    assert rows[1] == [0, 1, 2, None]
    back = packed.from_dosage_matrix(m, ["s1", "s2", "s3", "s4"])
    from seqarray_spark.operators.aggregates import af_ac_missing

    orig = {r["variant_id"]: r["ac"] for r in af_ac_missing(ds.calls).collect()}
    new = {r["variant_id"]: r["ac"] for r in af_ac_missing(back).collect()}
    assert orig == new


def test_dosage_aggregates(spark):
    from seqarray_spark.operators import aggregates as agg

    calls = spark.createDataFrame(
        [(1, "a", 0.5), (1, "b", 1.5), (1, "c", None), (2, "a", 2.0), (2, "b", 0.0)],
        "variant_id int, sample_id string, DS double",
    )
    af = {r["variant_id"]: r["af_alt"] for r in agg.allele_freq_dosage(calls).collect()}
    assert af[1] == pytest.approx(2.0 / 4.0)
    assert af[2] == pytest.approx(2.0 / 4.0)
    miss = {r["variant_id"]: r["missing_rate"] for r in agg.missing_rate_dosage(calls).collect()}
    assert miss[1] == pytest.approx(1 / 3)
    ac = {r["variant_id"]: (r["ac_alt"], r["an"]) for r in agg.allele_count_dosage(calls).collect()}
    assert ac[1] == (2.0, 4)


def test_mutate_ops(spark, ds):
    from seqarray_spark.operators import mutate as M

    ds2 = M.add_variant_value(ds, "is_snv", F.length("ref") == 1)
    assert ds2.variants.filter("is_snv").count() == 3
    aux = spark.createDataFrame([(1, 0.9), (2, 0.1)], "variant_id long, score double")
    ds3 = M.add_variant_value(ds2, "score", aux)
    got = {r["variant_id"]: r["score"] for r in ds3.variants.collect()}
    assert got[1] == 0.9 and got[3] is None
    ds4 = M.add_sample_value(ds3, "batch", F.lit("b1"))
    assert ds4.samples.select("batch").distinct().first()[0] == "b1"
    ds5 = M.delete_vars(ds4, samp_vars=["batch"])
    assert "batch" not in ds5.samples.columns
    info = M.system_info(spark)
    assert info["spark_version"].startswith("4.")
    empty = M.empty_dataset(spark)
    assert empty.variants.count() == 0 and empty.calls.count() == 0


def test_transpose_and_optimize(spark, ds, tmp_path):
    from seqarray_spark.operators import mutate as M

    t = M.transpose_sample_major(ds)
    assert t.count() == ds._base_calls.count()
    out = str(tmp_path / "opt")
    M.optimize_by_chromosome(ds, out)
    back = SeqDataset.read(spark, out)
    assert back.variants.count() == 3
    assert back.calls.count() == 12
    # chromosome partition pruning is structural: partition dir exists
    import os

    assert any("chromosome=" in d for d in os.listdir(f"{out}/variants.parquet"))


def test_recompress(spark, ds, tmp_path):
    from seqarray_spark.operators import mutate as M

    src = str(tmp_path / "src")
    ds.export(src, partition_by_chrom=False)
    dst = str(tmp_path / "dst")
    M.recompress(spark, src, dst, codec="zstd")
    back = SeqDataset.read(spark, dst)
    assert back.variants.count() == 3


def test_export_read_restores_ploidy_and_meta(spark, tmp_path):
    """The parquet layout's _meta.json sidecar restores ploidy and header
    metadata — a haploid dataset must not silently reopen as diploid."""
    src = tmp_path / "hap.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        "##reference=GRCh38\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=X>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "X\t100\t.\tA\tT\t10\tPASS\t.\tGT\t1\n"
        "X\t200\t.\tC\tG\t10\tPASS\t.\tGT\t0\n"
    )
    from seqarray_spark.sources.vcf import read_vcf

    ds = read_vcf(spark, str(src), assign_ids="order")
    assert ds.ploidy == 1
    out = str(tmp_path / "hapds")
    ds.export(out, partition_by_chrom=False)
    back = SeqDataset.read(spark, out)
    assert back.ploidy == 1
    assert back.meta["reference"] == "GRCh38"
    # and the restored meta still feeds the GDS description writer
    gds = str(tmp_path / "hap.gds")
    back.to_gds(gds)
    from seqarray_spark.sources.gds import GdsFile

    assert GdsFile(gds).read_array("description/reference") == ["GRCh38"]


def test_vcf2gds_gds2vcf_oneliners(spark, tmp_path):
    """The reference's two headline conversions as single calls, with
    header metadata surviving the full cycle."""
    from seqarray_spark.sources import interop as I
    from seqarray_spark.sources.gds import GdsFile

    src = tmp_path / "a.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        "##reference=GRCh38\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=7>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "7\t100\t.\tA\tT\t10\tPASS\t.\tGT\t0|1\n"
    )
    gds = str(tmp_path / "a.gds")
    I.vcf2gds(spark, str(src), gds, read_opts={"assign_ids": "order"})
    f = GdsFile(gds)
    assert f.read_array("description/reference") == ["GRCh38"]
    out = str(tmp_path / "back")
    I.gds2vcf(spark, gds, out)
    hdr = open(f"{out}/_header.vcf").read()
    assert "##reference=GRCh38" in hdr and "contig=<ID=7" in hdr


def test_recompress_gds(spark, tmp_path):
    """seqRecompress on a real container: LZMA_ra fixture -> ZIP_ra copy,
    values preserved, coder actually switched on every coded node."""
    import os

    from seqarray_spark.operators import mutate as M
    from seqarray_spark.sources.gds import GdsFile

    src = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    dst = str(tmp_path / "ceu_zip.gds")
    M.recompress_gds(spark, src, dst, coder="ZIP_ra.max")
    f = GdsFile(dst)
    assert f.node("genotype/data").coder == "ZIP_ra"
    assert list(f.read_array("variant.id")) == list(range(1, 1349))
    assert f.read_array("allele")[0] == "T,C"


def test_lz4_block_codec_edges():
    """Pure-Python LZ4 block codec: spec edge cases (empty, short,
    overlap-heavy matches, 15/255 length continuations, incompressible)
    round-trip exactly (sources/lz4_block, public LZ4 block format)."""
    import os as _os
    import random

    from seqarray_spark.sources.lz4_block import (compress_block,
                                                  decompress_block)

    random.seed(7)
    cases = [
        b"", b"x", b"x" * 12, b"x" * 13, b"abcd" * 5000,
        b"A" + b"BC" * 1000,          # offset-2 overlapping match
        bytes(range(256)) * 300,      # long literals (len ext > 255)
        _os.urandom(200_000),         # incompressible
        bytes(random.randrange(4) for _ in range(70_000)),
    ]
    for c in cases:
        assert decompress_block(compress_block(c), len(c)) == c
    # corrupt offset fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decompress_block(b"\x10A\x09\x00\x00", 100)


def test_af_from_packed_ragged_rows_fall_back(spark):
    """af_from_packed's zero-copy fast path requires FIXED-width rows,
    checked per row (r10 review: a total-length check accepted ragged
    rows whose widths merely sum to n*stride and misparsed every row
    after the first). Hand-built ragged rows — widths stride+1 and
    stride-1 for n_samples=8, stride=2 — must compute the documented
    fallback semantics (truncate long rows, pad short rows with 0xff =
    all-missing lanes), not the misparsed fast path."""
    from seqarray_spark.sources.packed import af_from_packed

    # stride = 2; row A: 3 bytes (one extra), row B: 1 byte (one short)
    # A's first 2 bytes: 0b01010101 x2 -> dosage 1 in all 8 lanes
    # B's single byte:  0b00000000 -> dosage 0 in 4 lanes, 4 pad-missing
    df = spark.createDataFrame(
        [(1, 8, bytes([0b01010101, 0b01010101, 0xAB])),
         (2, 8, bytes([0x00]))],
        "variant_id long, n_samples int, packed binary",
    )
    out = {r["variant_id"]: r for r in af_from_packed(df).collect()}
    # row 1: all 8 lanes dosage 1 -> ac=8, an=16, miss=0
    assert out[1]["ac_alt"] == 8 and out[1]["an"] == 16
    assert out[1]["missing_rate"] == 0.0
    # row 2: 4 lanes dosage 0, 4 lanes missing (0xff pad) -> ac=0, an=8
    assert out[2]["ac_alt"] == 0 and out[2]["an"] == 8
    assert out[2]["missing_rate"] == 0.5
