"""VCF reader/writer: header parse, typed INFO/FORMAT, edge cases from
FIXTURES.md fixture 4, and the reference's round-trip oracle
(reference test analogue: inst/unitTests/test_asVCF.R:70-186)."""

import os

import pytest
from pyspark.sql import functions as F

from seqarray_spark.sources import vcf as vcfmod

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "toy.vcf")


@pytest.fixture(scope="module")
def header():
    return vcfmod.parse_vcf_header(FIXTURE)


@pytest.fixture(scope="module")
def ds(spark):
    return vcfmod.read_vcf(spark, FIXTURE)


def test_header(header):
    assert header.samples == ["NA001", "NA002", "NA003"]
    assert header.ploidy == 2
    assert header.info["AF"].number == "A" and header.info["AF"].is_array
    assert header.info["DB"].type == "Flag"
    assert header.formats["HQ"].is_array
    assert "q10" in header.filters


def test_variants(ds):
    v = {r["variant_id"]: r for r in ds.variants.collect()}
    assert len(v) == 7
    assert v[1]["chromosome"] == "1" and v[1]["position"] == 100
    assert v[1]["ref"] == "G" and v[1]["alt"] == ["A"]
    assert v[1]["info"]["DP"] == 14 and v[1]["info"]["DB"] is True
    assert v[1]["info"]["AF"] == [pytest.approx(0.5)]
    assert v[2]["filter"] == "q10" and v[2]["info"]["DB"] is False
    assert v[3]["id"] is None and v[3]["info"]["BN"] == [1, 2, 3]
    # multiallelic
    assert v[4]["alt"] == ["A", "C", "G"]
    assert v[4]["info"]["AF"] == [pytest.approx(0.333), pytest.approx(0.333), pytest.approx(0.167)]
    # ALT='.' -> empty alt array
    assert v[5]["alt"] == []
    # chr prefix stripped
    assert v[7]["chromosome"] == "3" and v[7]["ref"] == "C" and v[7]["alt"] == ["CTAG"]


def test_calls_genotypes(ds):
    c = {(r["variant_id"], r["sample_id"]): r for r in ds.calls.collect()}
    assert len(c) == 21
    assert c[(1, "NA001")]["alleles"] == [0, 0] and c[(1, "NA001")]["phased"] == [True]
    assert c[(1, "NA003")]["alleles"] == [1, 1] and c[(1, "NA003")]["phased"] == [False]
    # triploid call in diploid file (the reference's 'extra' mechanism)
    assert c[(4, "NA001")]["alleles"] == [0, 0, 1]
    assert c[(4, "NA001")]["phased"] == [False, False]
    # fully missing './.'
    assert c[(4, "NA003")]["alleles"] == [None, None]
    # haploid call
    assert c[(5, "NA002")]["alleles"] == [0] and c[(5, "NA002")]["phased"] == []
    # partial missing './1'
    assert c[(5, "NA003")]["alleles"] == [None, 1]
    # single '.' GT -> one missing slot
    assert c[(7, "NA002")]["alleles"] == [None]


def test_calls_format_fields(ds):
    c = {(r["variant_id"], r["sample_id"]): r for r in ds.calls.collect()}
    assert c[(1, "NA001")]["DP"] == 1
    assert c[(1, "NA001")]["HQ"] == [51, 51]
    assert c[(1, "NA003")]["HQ"] == [None, None]  # '.,.'
    assert c[(2, "NA003")]["HQ"] is None  # bare '.' -> whole field absent
    assert c[(6, "NA001")]["DP"] is None  # GT-only FORMAT on variant 6
    assert c[(4, "NA003")]["DP"] is None  # '.' DP


def test_dosage_on_vcf(ds):
    from seqarray_spark.operators.aggregates import af_ac_missing

    stats = {r["variant_id"]: r for r in af_ac_missing(ds.calls).collect()}
    # variant 1: alleles 0|0, 1|0, 1/1 -> ref count 3 of 6
    assert stats[1]["af"] == pytest.approx(0.5)
    assert stats[1]["ac"] == 3 and stats[1]["an"] == 6
    # variant 4: 0/0/1, 2|3, ./. -> ref 2 of 5 observed slots; missing is
    # SLOT-level like the reference (2 missing of 7 total slots)
    assert stats[4]["ac"] == 2 and stats[4]["an"] == 5
    assert stats[4]["missing_rate"] == pytest.approx(2 / 7)


def test_roundtrip(spark, ds, tmp_path):
    """ingest → export → re-ingest equality on variants and genotypes."""
    out = str(tmp_path / "rt.vcf")
    hdr = vcfmod.parse_vcf_header(FIXTURE)
    vcfmod.write_vcf(ds, out, header=hdr)

    # reassemble a single file: header + sorted part files
    import glob

    txt = open(f"{out}/_header.vcf").read()
    body = []
    for part in sorted(glob.glob(f"{out}/part-*")):
        body.append(open(part).read())
    single = str(tmp_path / "single.vcf")
    with open(single, "w") as fh:
        fh.write(txt + "".join(body))

    ds2 = vcfmod.read_vcf(spark, single)
    v1 = ds.variants.select("chromosome", "position", "ref", "alt", "qual", "filter").orderBy(
        "chromosome", "position", "ref", "alt"
    )
    v2 = ds2.variants.select("chromosome", "position", "ref", "alt", "qual", "filter").orderBy(
        "chromosome", "position", "ref", "alt"
    )
    assert [tuple(r) for r in v1.collect()] == [tuple(r) for r in v2.collect()]

    key = ["chromosome", "position", "ref", "alt", "sample_id"]
    # the export renderer trims trailing missing values per cell like the
    # reference (FORMAT_Write src/ConvGDS2VCF.cpp:329-403), so an
    # all-missing array cell round-trips as field-missing — normalize the
    # pre-export side the same way before comparing
    n_trail = F.aggregate(
        F.reverse(F.col("HQ")),
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("s")),
        lambda a, x: F.struct(
            F.when(a["s"] | x.isNotNull(), a["n"]).otherwise(a["n"] + 1).alias("n"),
            (a["s"] | x.isNotNull()).alias("s"),
        ),
    )["n"]
    kept = F.size(F.col("HQ")) - n_trail
    hq_norm = F.when(kept > 0, F.slice(F.col("HQ"), 1, kept))
    c1 = (
        ds.calls.join(ds.variants, "variant_id")
        .select(*key, "alleles", "phased", "DP", hq_norm.alias("HQ"))
        .orderBy(*key)
    )
    c2 = (
        ds2.calls.join(ds2.variants, "variant_id")
        .select(*key, "alleles", "phased", "DP", "HQ")
        .orderBy(*key)
    )
    assert [tuple(r) for r in c1.collect()] == [tuple(r) for r in c2.collect()]


def test_multifile_ingest(spark, tmp_path):
    """Multi-file import with consistent samples (reference:
    R/ConvVCF2GDS.R:633-658) — union of data lines, merged header."""
    src = open(FIXTURE).read().splitlines()
    hdr = [l for l in src if l.startswith("#")]
    data = [l for l in src if not l.startswith("#")]
    p1, p2 = str(tmp_path / "a.vcf"), str(tmp_path / "b.vcf")
    with open(p1, "w") as fh:
        fh.write("\n".join(hdr + data[:4]) + "\n")
    with open(p2, "w") as fh:
        fh.write("\n".join(hdr + data[4:]) + "\n")
    ds = vcfmod.read_vcf(spark, [p1, p2], assign_ids="hash")
    single = vcfmod.read_vcf(spark, FIXTURE, assign_ids="hash")
    assert ds.variants.count() == single.variants.count()
    assert ds.calls.count() == single.calls.count()

    # inconsistent samples refused
    bad = str(tmp_path / "c.vcf")
    with open(bad, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tOTHER\n"
            "1\t5\t.\tA\tC\t1\tPASS\t.\tGT\t0/1\n"
        )
    with pytest.raises(ValueError):
        vcfmod.read_vcf(spark, [p1, bad])


def test_compressed_export(spark, ds, tmp_path):
    import glob

    out = str(tmp_path / "gz.vcf")
    vcfmod.write_vcf(ds, out, compression="gzip")
    parts = glob.glob(f"{out}/part-*.gz")
    assert parts
    import gzip

    line = gzip.open(parts[0], "rt").readline()
    assert line.count("\t") >= 7


def test_malformed_lines_tolerated(spark, tmp_path):
    """Malformed numerics degrade to NULL (try_cast), never abort the
    scan — at 100 TB a single bad line must not kill a 6-hour ingest."""
    p = str(tmp_path / "bad.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "1\t10\t.\tA\tC\tGOODQUAL\tPASS\tDP=notanint\tGT:DP\t0/1:xx\n"
            "1\tBADPOS\t.\tA\tC\t5\tPASS\tDP=3\tGT:DP\t0/1:7\n"
        )
    ds = vcfmod.read_vcf(spark, p)
    rows = {r["variant_id"]: r for r in ds.variants.collect()}
    assert rows[1]["qual"] is None and rows[1]["info"]["DP"] is None
    assert rows[2]["position"] is None  # flagged, not fatal
    calls = {r["variant_id"]: r for r in ds.calls.collect()}
    assert calls[1]["DP"] is None and calls[1]["alleles"] == [0, 1]


def test_truncated_format_tokens(spark, tmp_path):
    """A sample may omit trailing FORMAT fields ('0/0' under 'GT:DP:GQ') —
    spec-valid; the reference fills NA. Under Spark 4 ANSI mode a plain
    element_at would abort the import (SparkArrayIndexOutOfBoundsException);
    the parser must use try_element_at."""
    p = str(tmp_path / "trunc.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
            "1\t10\t.\tA\tC\t5\tPASS\t.\tGT:DP:GQ\t0/1:7:99\t0/0\n"
            "1\t20\t.\tG\tT\t5\tPASS\t.\tGT:DP:GQ\t1/1\t0/1:3\n"
        )
    ds = vcfmod.read_vcf(spark, p)
    c = {(r["variant_id"], r["sample_id"]): r for r in ds.calls.collect()}
    assert c[(1, "S1")]["DP"] == 7 and c[(1, "S1")]["GQ"] == 99
    assert c[(1, "S2")]["alleles"] == [0, 0]
    assert c[(1, "S2")]["DP"] is None and c[(1, "S2")]["GQ"] is None
    assert c[(2, "S1")]["DP"] is None
    assert c[(2, "S2")]["DP"] == 3 and c[(2, "S2")]["GQ"] is None


def test_sites_only_vcf(spark, tmp_path):
    """Empty-sample dataset (sites-only VCF; reference no_sample path
    R/Conversion.R:56-65)."""
    p = str(tmp_path / "sites.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "1\t10\t.\tA\tC\t5\tPASS\tDP=3\n"
        )
    ds = vcfmod.read_vcf(spark, p)
    assert ds.variants.count() == 1
    assert ds._base_calls is None and ds.samples is None


MALFORMED_ARITY = (
    "##fileformat=VCFv4.2\n"
    '##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n'
    '##INFO=<ID=AD,Number=R,Type=Integer,Description="ad">\n'
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
    '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="pl">\n'
    '##FORMAT=<ID=HQ,Number=2,Type=Integer,Description="hq">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    # ok: 2 ALTs -> AF needs 2, AD needs 3, PL needs 6, HQ needs 2
    "1\t10\t.\tA\tC,G\t5\tPASS\tAF=0.1,0.2;AD=9,8,7\tGT:PL:HQ\t"
    "1/2:1,2,3,4,5,6:9,9\n"
    # bad: AF has 1 value for 2 ALTs; PL has 3 of 6; HQ has 1 of 2
    "1\t20\t.\tA\tC,G\t5\tPASS\tAF=0.1;AD=9,8,7\tGT:PL:HQ\t1/2:1,2,3:9\n"
)


def test_number_arity_quarantine(spark, tmp_path):
    """Number=A/R/G/fixed-k arity violations surface in vcf_errors
    (reference hard-errors on Number=G mismatch,
    src/ConvVCF2GDS.cpp:680-704; quarantine keeps the 100 TB job alive)."""
    p = str(tmp_path / "arity.vcf")
    with open(p, "w") as fh:
        fh.write(MALFORMED_ARITY)
    ds = vcfmod.read_vcf(spark, p, validate="quarantine")
    v = {r["variant_id"]: r["vcf_errors"] for r in ds.variants.collect()}
    assert v[1] == []
    assert len(v[2]) == 1 and "INFO/AF" in v[2][0] and "Number=A" in v[2][0]
    c = {(r["variant_id"], r["sample_id"]): r["vcf_errors"] for r in ds.calls.collect()}
    assert c[(1, "S1")] == []
    errs = c[(2, "S1")]
    assert len(errs) == 2
    assert any("FORMAT/PL" in e and "expects 6 values, got 3" in e for e in errs)
    assert any("FORMAT/HQ" in e for e in errs)


def test_number_arity_strict(spark, tmp_path):
    """validate='strict' aborts the import on arity violations, matching
    the reference's hard error (src/ConvVCF2GDS.cpp:644-723)."""
    p = str(tmp_path / "arity2.vcf")
    with open(p, "w") as fh:
        fh.write(MALFORMED_ARITY)
    ds = vcfmod.read_vcf(spark, p, validate="strict")
    with pytest.raises(Exception, match="VCF arity violation.*INFO/AF"):
        ds.variants.collect()
    with pytest.raises(Exception, match="VCF arity violation"):
        ds.calls.collect()
    # a clean file passes strict untouched
    ds2 = vcfmod.read_vcf(spark, FIXTURE, validate="strict")
    assert ds2.calls.count() == 21


def test_multifile_order_ids(spark, tmp_path):
    """assign_ids='order' must number lines in (path-list order, in-file
    order) even though Spark packs scan splits by size descending — a
    small first file + big second file is exactly the case a bare
    zipWithIndex permutes."""
    hdr = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    )
    p1, p2 = str(tmp_path / "small.vcf"), str(tmp_path / "big.vcf")
    with open(p1, "w") as fh:
        fh.write(hdr)
        for i in range(3):
            fh.write(f"1\t{100 + i}\tsm{i}\tA\tC\t5\tPASS\t.\tGT\t0/1\n")
    with open(p2, "w") as fh:
        fh.write(hdr)
        for i in range(500):  # bigger file: would sort first by size
            fh.write(f"2\t{1000 + i}\tbg{i}\tG\tT\t5\tPASS\t.\tGT\t0/0\n")
    ds = vcfmod.read_vcf(spark, [p1, p2], assign_ids="order")
    got = {
        r["id"]: r["variant_id"]
        for r in ds.variants.select("id", "variant_id").collect()
    }
    assert got["sm0"] == 1 and got["sm2"] == 3
    assert got["bg0"] == 4 and got["bg499"] == 503
    # dense 1..N overall
    ids = sorted(got.values())
    assert ids == list(range(1, 504))


def test_header_tables(header):
    """contig/ALT/assembly parsed into structured tables (reference:
    seqVCF_Header data.frames, R/ConvVCF2GDS.R:92-512)."""
    assert [c["ID"] for c in header.contigs] == ["1", "2", "X"]
    assert header.filter_meta[0]["ID"] == "q10"
    assert "Quality below 10" in header.filter_meta[0]["Description"]


def test_headerless_export_regenerates_declarations(spark, ds, tmp_path):
    """Exporting WITHOUT the original header must still produce a
    declaration-complete ##-block (INFO/FORMAT/FILTER/contig) so the
    output is self-describing and re-importable (reference: seqGDS2VCF
    rebuilds the header from stored tables, R/Conversion.R:83-143)."""
    out = str(tmp_path / "noheader_out")
    vcfmod.write_vcf(ds, out)  # no header passed
    hdr_text = open(f"{out}/_header.vcf").read()
    assert "##INFO=<ID=DP" in hdr_text and "##INFO=<ID=AF" in hdr_text
    assert "##FORMAT=<ID=GT" in hdr_text and "##FORMAT=<ID=DP" in hdr_text
    assert "##contig=<ID=1>" in hdr_text and "##contig=<ID=X>" in hdr_text
    # re-import the export: same dims, dosage stats agree
    import glob

    parts = sorted(glob.glob(f"{out}/part-*"))
    merged = str(tmp_path / "merged.vcf")
    with open(merged, "w") as fh:
        fh.write(hdr_text)
        for p in parts:
            fh.write(open(p).read())
    back = vcfmod.read_vcf(spark, merged)
    assert back.variants.count() == ds.variants.count()
    assert back.calls.count() == ds.calls.count()
    from seqarray_spark.operators.aggregates import af_ac_missing

    a = {r["variant_id"]: r["af"] for r in af_ac_missing(
        ds.calls).select("variant_id", "af").collect()}
    # ids differ (hash vs order) — compare by chrom:pos key
    key = lambda d: {
        (r["chromosome"], r["position"], r["id"]): r["variant_id"]
        for r in d.variants.collect()
    }
    ka, kb = key(ds), key(back)
    b = {r["variant_id"]: r["af"] for r in af_ac_missing(
        back.calls).select("variant_id", "af").collect()}
    for ck, vida in ka.items():
        assert abs((a[vida] or 0) - (b[kb[ck]] or 0)) < 1e-12


def test_bgzf_export(spark, ds, tmp_path):
    """compression='bgzf' emits a blocked-gzip .vcf.bgz: valid BGZF
    framing (BC extra field + htslib EOF marker), readable by plain
    gzip, re-importable, and block-structured for tabix indexing
    (reference: bgzf export via Rsamtools, R/Conversion.R:118-132)."""
    import gzip
    import struct

    out = str(tmp_path / "bgz_out")
    vcfmod.write_vcf(ds, out, compression="bgzf")
    bgz = f"{out}/export.vcf.bgz"
    raw = open(bgz, "rb").read()
    # BGZF magic + FEXTRA with 'BC' subfield on the first block
    assert raw[:4] == b"\x1f\x8b\x08\x04"
    xlen = struct.unpack("<H", raw[10:12])[0]
    assert b"BC" in raw[12:12 + xlen]
    from seqarray_spark.sources.bgzf import BGZF_EOF

    assert raw.endswith(BGZF_EOF)
    # multi-member gzip decompresses with the stock gzip module
    text = gzip.open(bgz, "rt").read()
    assert text.startswith("##fileformat") and "#CHROM" in text
    # re-import the bgz directly (read_vcf handles .gz via gzip.open for
    # the header; Spark reads multi-member gzip text)
    plain = str(tmp_path / "plain.vcf.gz")
    open(plain, "wb").write(raw)
    back = vcfmod.read_vcf(spark, plain)
    assert back.variants.count() == ds.variants.count()
    assert back.calls.count() == ds.calls.count()


def test_bgzf_block_boundaries(tmp_path):
    """Payloads larger than one BGZF block split into independent
    members that each decompress standalone."""
    import gzip
    import zlib

    from seqarray_spark.sources.bgzf import BgzfWriter

    p = str(tmp_path / "big.bgz")
    payload = b"x" * 200_000 + b"END\n"
    with BgzfWriter(p) as w:
        w.write(payload)
    data = open(p, "rb").read()
    # at least 200000/65280 = 4 data blocks + EOF
    assert data.count(b"\x1f\x8b\x08\x04") >= 5
    assert gzip.decompress(data) == payload
    # each member decompresses independently at its BSIZE boundary
    import struct

    o = 0
    members = 0
    while o < len(data):
        assert data[o:o + 4] == b"\x1f\x8b\x08\x04"
        bsize = struct.unpack("<H", data[o + 16:o + 18])[0] + 1
        blob = data[o:o + bsize]
        zlib.decompress(blob[18:-8], -15)
        o += bsize
        members += 1
    assert o == len(data) and members >= 5


def test_tabix_index(spark, tmp_path):
    """write_vcf(compression='bgzf') emits a spec-level .tbi alongside
    the .vcf.bgz: names in file order, bin chunks whose virtual offsets
    seek to lines of the right chromosome, forward-filled monotonic
    linear index (reference ships index-ready output via Rsamtools
    indexTabix, R/Conversion.R:118-132). Compression happens in executor
    tasks; the driver only concatenates bytes and merges index
    fragments."""
    import struct
    import zlib

    rows = []
    for chrom in ("1", "2"):
        for i in range(2000):
            pos = 1000 + i * 37  # spans ~74kb -> >=4 linear windows
            rows.append(f"{chrom}\t{pos}\t.\tA\tT\t10\tPASS\t.\tGT\t0/1")
    src = tmp_path / "t.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=1>\n##contig=<ID=2>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        + "\n".join(rows) + "\n"
    )
    ds2 = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    out = str(tmp_path / "out")
    vcfmod.write_vcf(ds2, out, compression="bgzf")
    bgz = f"{out}/export.vcf.bgz"

    from seqarray_spark.sources.tabix import read_tbi

    names, bins_per_ref, linear_per_ref = read_tbi(bgz + ".tbi")
    assert names == ["1", "2"]
    raw = open(bgz, "rb").read()

    def read_at(voff, want=64):
        # decompress consecutive blocks from coff until `want` bytes past
        # uoff are available (a line may straddle a block boundary)
        coff, uoff = voff >> 16, voff & 0xFFFF
        data = b""
        while coff < len(raw) and len(data) < uoff + want:
            bsize = struct.unpack("<H", raw[coff + 16:coff + 18])[0] + 1
            data += zlib.decompress(raw[coff + 18:coff + bsize - 8], -15)
            coff += bsize
        return data[uoff:uoff + want].decode("utf-8", "replace")

    for name, bins, lin in zip(names, bins_per_ref, linear_per_ref):
        assert bins and lin
        for b, chunks in bins.items():
            for v0, v1 in chunks:
                assert v1 > v0
                assert read_at(v0).startswith(name + "\t")
        nz = [v for v in lin if v]
        assert nz == sorted(nz)
        assert read_at(nz[0]).startswith(name + "\t")
    # the bgz itself is still a valid multi-member gzip with all lines
    import gzip

    text = gzip.open(bgz, "rt").read()
    assert text.count("\n0/1") == 0  # sanity: GT is tab-separated
    assert sum(1 for ln in text.splitlines() if ln and not ln.startswith("#")) == 4000


def test_number_g_ploidy3(spark, tmp_path):
    """Number=G enforcement above diploid: for ploidy 3 the expected
    count is C(n_alt+3, 3) (reference enforces the full combinatorial
    count and hard-errors, src/ConvVCF2GDS.cpp:680-704). Round-2 gap:
    _expected_count returned None above ploidy 2, silently skipping the
    check."""
    body = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        '##FORMAT=<ID=GL,Number=G,Type=Float,Description="gl">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        # triploid, 1 ALT -> C(4,3) = 4 GL values expected; 4 given (ok)
        "1\t10\t.\tA\tC\t5\tPASS\t.\tGT:GL\t0/0/1:-1,-2,-3,-4\n"
        # triploid, 1 ALT -> 4 expected; 3 given (violation)
        "1\t20\t.\tA\tC\t5\tPASS\t.\tGT:GL\t0/1/1:-1,-2,-3\n"
        # triploid, 2 ALT -> C(5,3) = 10 expected; 10 given (ok)
        "1\t30\t.\tA\tC,G\t5\tPASS\t.\tGT:GL\t"
        "0/1/2:-1,-2,-3,-4,-5,-6,-7,-8,-9,-10\n"
    )
    p = str(tmp_path / "g3.vcf")
    with open(p, "w") as fh:
        fh.write(body)
    ds = vcfmod.read_vcf(spark, p, validate="quarantine")
    assert ds.ploidy == 3
    c = {r["variant_id"]: r["vcf_errors"] for r in ds.calls.collect()}
    assert c[1] == [] and c[3] == []
    assert len(c[2]) == 1
    assert "FORMAT/GL" in c[2][0] and "expects 4 values, got 3" in c[2][0]
    # strict mode hard-errors, matching the reference
    ds2 = vcfmod.read_vcf(spark, p, validate="strict")
    with pytest.raises(Exception, match="VCF arity violation.*FORMAT/GL"):
        ds2.calls.collect()


def test_ploidy_inference_skips_missing_gt(spark, tmp_path):
    """A leading missing GT '.' must not infer ploidy 1 for a diploid
    file — inference scans across samples and lines for a real call."""
    src = tmp_path / "pl.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT\t.\t0|1\n"
        "1\t200\t.\tC\tG\t10\tPASS\t.\tGT\t1/1\t0/0\n"
    )
    hdr = vcfmod.parse_vcf_header(str(src))
    assert hdr.ploidy == 2


def test_export_respects_sample_selection(spark, tmp_path):
    """Exporters write the CURRENT selection: with a sample filter the
    VCF header and data tokens agree, and to_gds round-trips the subset
    (previously the header declared the filtered samples but tokens
    carried all of them)."""
    src = tmp_path / "sel.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT\t0|1\t1|1\t0|0\n"
        "1\t200\t.\tC\tG\t10\tPASS\t.\tGT\t1|0\t0|0\t1|1\n"
    )
    ds = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    ds.set_filter_sample_id(["S1", "S3"])
    out = str(tmp_path / "sel_out")
    vcfmod.write_vcf(ds, out)
    import glob

    hdr = open(f"{out}/_header.vcf").read()
    chrom_line = [x for x in hdr.splitlines() if x.startswith("#CHROM")][0]
    assert chrom_line.split("\t")[9:] == ["S1", "S3"]
    for part in glob.glob(f"{out}/part-*"):
        for line in open(part):
            assert len(line.rstrip("\n").split("\t")) == 9 + 2, line
    # GDS export under the same selection decodes the subset
    from seqarray_spark.dataset import SeqDataset

    gds = str(tmp_path / "sel.gds")
    ds.to_gds(gds)
    back = SeqDataset.from_gds(spark, gds)
    assert {r["sample_id"] for r in back.samples.collect()} == {"S1", "S3"}
    got = {(r["variant_id"], r["sample_id"]): list(r["alleles"])
           for r in back.calls.collect()}
    assert got[(1, "S1")] == [0, 1] and got[(1, "S3")] == [0, 0]
    assert got[(2, "S3")] == [1, 1]


def test_duplicate_info_keys_survive(spark, tmp_path):
    """'DP=3;DP=4' on one line must not kill the import (first wins) —
    str_to_map under Spark's EXCEPTION dedup policy used to throw."""
    src = tmp_path / "dup.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "1\t100\t.\tA\tT\t10\tPASS\tDP=3;DP=4\tGT\t0|1\n"
        "1\t200\t.\tC\tG\t10\tPASS\tDP=7\tGT\t1|1\n"
    )
    ds = vcfmod.read_vcf(spark, str(src), assign_ids="order",
                         validate="quarantine")
    got = {r["position"]: r["info"]["DP"] for r in ds.variants.collect()}
    assert got == {100: 3, 200: 7}


def test_string_info_values_not_numerically_coerced(spark, tmp_path):
    """A String-typed INFO value like '007' must export verbatim (the
    numeric no-trailing-.0 renderer applies to numeric elements only)."""
    src = tmp_path / "str.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=CODE,Number=.,Type=String,Description="c">\n'
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "1\t100\t.\tA\tT\t10\tPASS\tCODE=007,X1\tGT\t0|1\n"
    )
    ds = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    out = str(tmp_path / "str_out")
    vcfmod.write_vcf(ds, out)
    import glob

    body = "".join(open(p).read() for p in glob.glob(f"{out}/part-*"))
    assert "CODE=007,X1" in body


def test_vcf_samp_id_and_example_files():
    """seqVCF_SampID / seqExampleFileName parity (R/ConvVCF2GDS.R sample
    probe; R/Utilities.R:42-53)."""
    import os

    import pytest as _pytest

    from seqarray_spark.sources.vcf import example_file_name, vcf_samp_id

    toy = example_file_name("toy_vcf")
    assert vcf_samp_id(toy) == ["NA001", "NA002", "NA003"]
    if os.path.exists(example_file_name("vcf")):
        assert len(vcf_samp_id(example_file_name("vcf"))) == 90
    with _pytest.raises(ValueError):
        example_file_name("nope")


def test_float_rendering_matches_c_percent_g(spark):
    """QUAL / Float INFO / Float FORMAT cells render exactly as the
    reference's snprintf("%g") (_Line_Append, ConvGDS2VCF.cpp:195-201):
    6 significant digits, stripped zeros, C exponent form, '.' for
    non-finite. Python's '%g' is the C formatter — used as the oracle."""
    import math

    from seqarray_spark.sources.vcf import _fmt_g

    vals = [0.5, 1.0, 2.0, 1 / 3, 0.0001, 0.00001, 1234567.0, 0.1234,
            123456.0, 1.5e-7, -0.25, 2 - 0.1234, 99.9999999, 0.0,
            float("nan"), float("inf"), None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["g"] for r in df.select(_fmt_g(F.col("x")).alias("g")).collect()]
    want = [
        "." if v is None or not math.isfinite(v) else ("%g" % v)
        for v in vals
    ]
    assert got == want, list(zip(vals, got, want))


def _assemble(out, tmp_path, name="single.vcf"):
    import glob

    txt = open(f"{out}/_header.vcf").read()
    body = "".join(open(p).read() for p in sorted(glob.glob(f"{out}/part-*")))
    single = str(tmp_path / name)
    with open(single, "w") as fh:
        fh.write(txt + body)
    return single


def test_haploid_export_renders_single_allele(spark, tmp_path):
    """Ploidy-1 fast path (reference SEQ_ToVCF_Haploid
    src/ConvGDS2VCF.cpp:873-940): haploid GT is ONE allele with no
    separator ('1', not '1/.' or '1/'); missing is '.'. Round-trips."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS"),
         (2, "1", 200, "rs2", "C", ["T"], 60.0, "PASS")],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    c = spark.createDataFrame(
        [(1, "s1", [0], [False]), (1, "s2", [1], [False]),
         (2, "s1", [None], [False]), (2, "s2", [0], [False])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>",
    )
    s = spark.createDataFrame([("s1",), ("s2",)], "sample_id string")
    ds = SeqDataset(v, c, s, ploidy=1)
    out = str(tmp_path / "hap_out")
    vcfmod.write_vcf(ds, out)
    single = _assemble(out, tmp_path)
    data = [l for l in open(single) if not l.startswith("#")]
    cells = {
        (f[0], f[1]): f[9:] for f in (l.rstrip("\n").split("\t") for l in data)
    }
    assert cells[("1", "100")] == ["0", "1"]
    assert cells[("1", "200")] == [".", "0"]
    back = vcfmod.read_vcf(spark, single)
    assert back.ploidy == 1
    got = {
        (r["variant_id"], r["sample_id"]): list(r["alleles"])
        for r in back.calls.collect()
    }
    assert got[(1, "s1")] == [0] and got[(1, "s2")] == [1]
    assert got[(2, "s1")] == [None] and got[(2, "s2")] == [0]


def test_nogeno_export_drops_gt(spark, tmp_path):
    """No-genotype datasets export via the reference's SEQ_ToVCF_NoGeno
    path (src/ConvGDS2VCF.cpp:948-989, dispatch R/Conversion.R:364-367):
    FORMAT lists only the format vars with NO leading GT, and the header
    declares no GT either."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS")],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    # dosage-only calls: no alleles/phased columns at all
    c = spark.createDataFrame(
        [(1, "s1", 0.5), (1, "s2", 1.25)],
        "variant_id long, sample_id string, DS double",
    )
    s = spark.createDataFrame([("s1",), ("s2",)], "sample_id string")
    ds = SeqDataset(v, c, s)
    out = str(tmp_path / "ds_out")
    vcfmod.write_vcf(ds, out)
    single = _assemble(out, tmp_path)
    hdr_text = open(f"{out}/_header.vcf").read()
    assert "##FORMAT=<ID=GT" not in hdr_text
    assert "##FORMAT=<ID=DS" in hdr_text
    line = next(l for l in open(single) if not l.startswith("#"))
    f = line.rstrip("\n").split("\t")
    assert f[8] == "DS"          # no 'GT:' prefix
    assert f[9:] == ["0.5", "1.25"]


def test_variants_only_export_has_no_format_column(spark, tmp_path):
    """With no samples at all the FORMAT column disappears entirely —
    8 fixed columns (ExportInfoFormat returns before FORMAT when
    VCF_NumSample <= 0, src/ConvGDS2VCF.cpp:528)."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS"),
         (2, "2", 200, "rs2", "C", ["T", "G"], None, "q10")],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    ds = SeqDataset(v, None, None)
    out = str(tmp_path / "vonly_out")
    vcfmod.write_vcf(ds, out)
    single = _assemble(out, tmp_path)
    lines = [l.rstrip("\n") for l in open(single)]
    chrom = next(l for l in lines if l.startswith("#CHROM"))
    assert chrom == "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    data = [l for l in lines if not l.startswith("#")]
    assert all(len(l.split("\t")) == 8 for l in data)
    assert data[0].split("\t")[:8] == [
        "1", "100", "rs1", "A", "G", "50", "PASS", "."]
    assert data[1].split("\t")[5] == "."  # NULL qual renders '.'


def test_genotype_field_located_in_format(spark, tmp_path):
    """The genotype field is found per record in FORMAT, not assumed to be
    the first colon token (reference: genotype.var.name lookup,
    R/ConvVCF2GDS.R:589-590): a record whose FORMAT omits GT decodes as
    all-missing at the header ploidy instead of misreading another field."""
    p = str(tmp_path / "nogt.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "1\t10\t.\tA\tC\t5\tPASS\t.\tGT:DP\t0|1:7\n"
            "1\t20\t.\tG\tT\t5\tPASS\t.\tDP\t7\n"
        )
    ds = vcfmod.read_vcf(spark, p)
    c = {r["variant_id"]: r for r in ds.calls.collect()}
    assert c[1]["alleles"] == [0, 1] and c[1]["phased"] == [True]
    # FORMAT=DP only: DP must remain 7, alleles all-missing at ploidy 2
    assert c[2]["DP"] == 7
    assert c[2]["alleles"] == [None, None] and c[2]["phased"] == [False]


def test_genotype_var_name_custom(spark, tmp_path):
    """seqVCF2GDS(genotype.var.name=) imports calls from an alternate
    FORMAT field (R/ConvVCF2GDS.R:561,589-590)."""
    p = str(tmp_path / "gty.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##FORMAT=<ID=GTY,Number=1,Type=String,Description="alt geno">\n'
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "1\t10\t.\tA\tC\t5\tPASS\t.\tDP:GTY\t7:1/1\n"
        )
    ds = vcfmod.read_vcf(spark, p, genotype_var_name="GTY")
    c = ds.calls.collect()[0]
    assert c["alleles"] == [1, 1] and c["DP"] == 7


def test_start_count_range_import(spark, tmp_path):
    """seqVCF2GDS(start=, count=) imports a file-order row range, ids
    renumbered 1..count like each reference chunk file
    (R/ConvVCF2GDS.R:826-837)."""
    import pytest as _pt

    p = str(tmp_path / "rng.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            + "".join(f"1\t{i * 10}\t.\tA\tC\t5\tPASS\t.\n" for i in range(1, 11))
        )
    ds = vcfmod.read_vcf(spark, p, start=4, count=3)
    rows = sorted((r["variant_id"], r["position"]) for r in ds.variants.collect())
    assert rows == [(1, 40), (2, 50), (3, 60)]
    # open-ended count
    ds = vcfmod.read_vcf(spark, p, start=9)
    rows = sorted((r["variant_id"], r["position"]) for r in ds.variants.collect())
    assert rows == [(1, 90), (2, 100)]
    with _pt.raises(ValueError):
        vcfmod.read_vcf(spark, p, start=0)
    with _pt.raises(ValueError):
        vcfmod.read_vcf(spark, p, start=2, assign_ids="hash")


def test_export_chr_prefix_and_no_sample(spark, tmp_path):
    """seqGDS2VCF(chr_prefix=, no_sample=TRUE): CHROM cells gain the
    prefix; no_sample forces a sites-only export of a genotyped dataset
    (reference R/Conversion.R:30-31)."""
    import glob

    src = str(tmp_path / "src.vcf")
    with open(src, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "1\t10\t.\tA\tC\t5\tPASS\t.\tGT\t0/1\n"
        )
    ds = vcfmod.read_vcf(spark, src)
    out = str(tmp_path / "out_vcf")
    vcfmod.write_vcf(ds, out, chr_prefix="chr", no_sample=True)
    body = "".join(
        open(f).read() for f in sorted(glob.glob(out + "/part-*"))
    )
    hdr = open(out + "/_header.vcf").read()
    assert body.startswith("chr1\t10\t")
    assert "\tFORMAT" not in hdr and "\tS1" not in hdr
    assert hdr.rstrip().splitlines()[-1].endswith("\tINFO")
    assert "\t0/1" not in body  # sites-only: no genotype columns


def test_duplicate_header_ids_keep_first(spark, tmp_path):
    """Duplicated INFO/FORMAT declarations keep the FIRST and drop later
    ones (reference: duplicated-ID removal, R/ConvVCF2GDS.R:1055 INFO,
    :734 FORMAT) — the Type of the first declaration wins."""
    p = str(tmp_path / "dup.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="first">\n'
            '##INFO=<ID=DP,Number=1,Type=Float,Description="second">\n'
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="first">\n'
            '##FORMAT=<ID=GQ,Number=1,Type=String,Description="second">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "1\t10\t.\tA\tC\t5\tPASS\tDP=3\tGT:GQ\t0/1:42\n"
        )
    hdr = vcfmod.parse_vcf_header(p)
    assert hdr.info["DP"].type == "Integer" and hdr.info["DP"].description == "first"
    assert hdr.formats["GQ"].type == "Integer"
    ds = vcfmod.read_vcf(spark, p)
    row = ds.variants.collect()[0]
    assert row["info"]["DP"] == 3
    call = ds.calls.collect()[0]
    assert call["GQ"] == 42  # Integer-typed per the first declaration


def test_export_missing_cell_rendering(spark, tmp_path):
    """Reference missing-value rendering on export (INFO_GetNum
    src/ConvGDS2VCF.cpp:245-270, FORMAT_Write :329-403): trailing missing
    values trim off array cells, interior missing keep '.', an all-missing
    FORMAT cell renders '.' (FORMAT_Write's final `if (n <= 0) '.'` —
    the r9 parity review found the engine previously rendered it EMPTY),
    a missing scalar FORMAT renders '.', and an all-missing INFO array
    omits the key (INFO requires m > 0, unlike FORMAT)."""
    import glob

    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 10, None, "A", ["C"], None, None,
          {"AC": [3, None], "AN": [None, None]}),
         (2, "1", 20, None, "G", ["T"], None, None,
          {"AC": [None, 4], "AN": [1, None]})],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string, "
        "info struct<AC: array<int>, AN: array<int>>",
    )
    c = spark.createDataFrame(
        [(1, "S1", [0, 1], [False], 7, [9.0, None]),
         (2, "S1", [1, 1], [False], None, [None, None])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP int, GL array<double>",
    )
    s = spark.createDataFrame([("S1",)], "sample_id string")
    ds = SeqDataset(v, c, s)
    out = str(tmp_path / "miss_vcf")
    vcfmod.write_vcf(ds, out)
    body = "".join(open(f).read() for f in sorted(glob.glob(out + "/part-*")))
    l1, l2 = [ln for ln in body.splitlines() if ln]
    # variant 1: AC trims to '3' (trailing missing dropped), AN omitted
    assert "AC=3" in l1 and ";3," not in l1 and "AN" not in l1
    # variant 2: AC keeps interior missing as '.,4'; AN trims to '1'
    assert "AC=.,4" in l2 and "AN=1" in l2
    # FORMAT: GL [9.0, None] trims to '9'; [None, None] renders '.';
    # missing scalar DP renders '.' between colons
    assert l1.endswith("0/1:7:9")
    assert l2.endswith("1/1:.:.")


def test_vcf_sample_ids(tmp_path):
    """seqVCF_SampID parity (R/ConvVCF2GDS.R:522-556): header-only
    sample list; a sites-only VCF errors like the reference."""
    assert vcfmod.vcf_sample_ids(FIXTURE) == ["NA001", "NA002", "NA003"]
    p = tmp_path / "nosamp.vcf"
    p.write_text("##fileformat=VCFv4.2\n"
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    with pytest.raises(ValueError):
        vcfmod.vcf_sample_ids(str(p))


def test_export_per_variant_format_presence(spark, tmp_path):
    """Per-variant FORMAT fidelity (r9, closing the PARITY.md-documented
    divergence): the reference stores ZERO rows for a field absent from
    a line's FORMAT and OMITS it from that variant's FORMAT on re-export
    (ExportInfoFormat's Rf_isNull skip, src/ConvGDS2VCF.cpp:546-554).
    read_vcf now records fmt_present per variant; write_vcf reproduces
    each line's FORMAT column and cell layout instead of padding every
    variant to the full catalog."""
    import glob

    src = tmp_path / "pvf.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT:DP:GQ\t0/1:7:40\t1/1:.:50\n"
        "1\t200\t.\tC\tG\t10\tPASS\t.\tGT\t0/0\t0/1\n"
        "1\t300\t.\tG\tA\t10\tPASS\t.\tGT:GQ\t0/1:33\t./.:.\n"
    )
    ds = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    assert "fmt_present" in ds.variants.columns
    out = str(tmp_path / "pvf_out")
    vcfmod.write_vcf(ds, out)
    body = "".join(open(f).read() for f in sorted(glob.glob(out + "/part-*")))
    lines = {ln.split("\t")[1]: ln.split("\t") for ln in body.splitlines() if ln}
    # variant 100: full catalog; DP missing for S2 renders '.'
    assert lines["100"][8] == "GT:DP:GQ"
    assert lines["100"][9] == "0/1:7:40" and lines["100"][10] == "1/1:.:50"
    # variant 200: GT only — no padded ':.' cells
    assert lines["200"][8] == "GT"
    assert lines["200"][9] == "0/0" and lines["200"][10] == "0/1"
    # variant 300: GT:GQ — DP omitted, GQ kept (catalog order)
    assert lines["300"][8] == "GT:GQ"
    assert lines["300"][9] == "0/1:33" and lines["300"][10] == "./.:."


def test_nogeno_zero_format_cells_render_empty(spark, tmp_path):
    """The SEQ_ToVCF_NoGeno corner with NO format vars at all
    (src/ConvGDS2VCF.cpp:948-989): ExportInfoFormat renders FORMAT '.'
    (the :533-541 empty-list fallback), but the per-sample loop body
    writes NOTHING per sample, so the data line ends in '.' + empty
    tab-separated cells — not '.' cells (r10 parity review: engine
    already matched; pinned here)."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS")],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    c = spark.createDataFrame(
        [(1, "s1"), (1, "s2")], "variant_id long, sample_id string"
    )
    s = spark.createDataFrame([("s1",), ("s2",)], "sample_id string")
    ds = SeqDataset(v, c, s)
    out = str(tmp_path / "nogeno_nofmt")
    vcfmod.write_vcf(ds, out)
    single = _assemble(out, tmp_path)
    line = next(l for l in open(single) if not l.startswith("#"))
    f = line.rstrip("\n").split("\t")
    assert f[8] == "."           # FORMAT column: '.' (no vars)
    assert f[9:] == ["", ""]     # sample cells: EMPTY, not '.'


def test_write_vcf_unknown_field_names_error_up_front(spark, tmp_path):
    """Reference parity: seqGDS2VCF validates info.var / fmt.var with a
    user-level 'Not exist:' error before any work
    (R/Conversion.R:76-77,90-92); write_vcf must do the same rather
    than dying later in analysis on an unresolved info.<name> column."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS", (7,))],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string, "
        "info struct<DP:int>",
    )
    c = spark.createDataFrame(
        [(1, "s1", 9)], "variant_id long, sample_id string, DP int"
    )
    s = spark.createDataFrame([("s1",)], "sample_id string")
    ds = SeqDataset(v, c, s)
    out = str(tmp_path / "nv")
    with pytest.raises(ValueError, match="Not exist: NOPE"):
        vcfmod.write_vcf(ds, out, info_fields=["NOPE"])
    with pytest.raises(ValueError, match="Not exist: GQ"):
        vcfmod.write_vcf(ds, out, format_fields=["GQ"])
    # empty selections are valid (reference: info.var=character(0)
    # strips ALL INFO) and valid names still export
    vcfmod.write_vcf(ds, out, info_fields=[], format_fields=["DP"])
    single = _assemble(out, tmp_path)
    line = next(l for l in open(single) if not l.startswith("#"))
    f = line.rstrip("\n").split("\t")
    assert f[7] == "." and f[8] == "DP" and f[9] == "9"
    # a sites-only export of a REAL field must not false-error: the
    # check runs against the dataset's FORMAT catalog, not the
    # post-no_sample calls=None (r10 review)
    vcfmod.write_vcf(ds, str(tmp_path / "ns"), format_fields=["DP"],
                     no_sample=True)


def test_write_vcf_bookkeeping_names_are_not_format_fields(spark, tmp_path):
    """format_fields naming a calls BOOKKEEPING column ('alleles',
    'phased', 'fmt_present', ...) errors like any unknown name: those
    columns are the genotype pair / presence record, not FORMAT data
    fields, and the default derivation already excludes them. The r10
    validation checked raw calls.columns, so format_fields=['alleles']
    slipped through and exported the raw genotype-allele array as a
    bogus data column duplicating GT (r10 review)."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS")],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    c = spark.createDataFrame(
        [(1, "s1", [0, 1], [False], 9)],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP int",
    )
    s = spark.createDataFrame([("s1",)], "sample_id string")
    ds = SeqDataset(v, c, s)
    out = str(tmp_path / "bk")
    for name in ("alleles", "phased", "sample_id", "fmt_present"):
        with pytest.raises(ValueError, match=f"Not exist: {name}"):
            vcfmod.write_vcf(ds, out, format_fields=[name])
    # the real data field still validates and exports
    vcfmod.write_vcf(ds, out, format_fields=["DP"])
    single = _assemble(out, tmp_path)
    line = next(l for l in open(single) if not l.startswith("#"))
    f = line.rstrip("\n").split("\t")
    assert f[8] == "GT:DP" and f[9] == "0/1:9"
