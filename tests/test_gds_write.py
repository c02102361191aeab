"""GDS writer round-trip: SeqDataset -> .gds -> SeqDataset through the
distributed reader (reference: seqVCF2GDS output layout,
R/AllClasses.R:20-24; container format sources/gds.py docstring)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from seqarray_spark.sources import vcf as vcfmod
from seqarray_spark.sources.gds import GdsFile

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "toy.vcf")


@pytest.fixture(scope="module")
def ds(spark):
    return vcfmod.read_vcf(spark, FIXTURE, assign_ids="order")


@pytest.fixture(scope="module")
def gds_path(ds, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("gdsw") / "toy.gds")
    ds.to_gds(p)
    return p


def test_container_structure(gds_path):
    """The output parses as a CoreArray container with the SeqArray node
    tree."""
    f = GdsFile(gds_path)
    paths = set(f.ls())
    for need in (
        "/sample.id", "/variant.id", "/position", "/chromosome", "/allele",
        "/genotype/data", "/genotype/@data", "/phase/data",
        "/annotation/id", "/annotation/qual", "/annotation/filter",
        "/annotation/info/DP", "/annotation/info/AF", "/annotation/info/@AF",
        "/annotation/format/DP/data", "/annotation/format/DP/@data",
    ):
        assert need in paths, f"missing node {need} in {sorted(paths)}"
    assert f.node("variant.id").dims == (7,)
    assert list(f.read_array("variant.id")) == [1, 2, 3, 4, 5, 6, 7]
    assert f.read_array("sample.id") == ["NA001", "NA002", "NA003"]
    # FORMAT folder metadata survives
    assert f.node("annotation/format/DP").attrs["Number"] == "1"


def test_roundtrip_variants(spark, ds, gds_path):
    from seqarray_spark.dataset import SeqDataset

    back = SeqDataset.from_gds(spark, gds_path)
    a = {r["variant_id"]: r for r in ds.variants.collect()}
    b = {r["variant_id"]: r for r in back.variants.collect()}
    assert set(a) == set(b)
    for vid in a:
        ra, rb = a[vid], b[vid]
        assert ra["chromosome"] == rb["chromosome"]
        assert ra["position"] == rb["position"]
        assert ra["id"] == rb["id"]
        assert ra["ref"] == rb["ref"] and list(ra["alt"] or []) == list(rb["alt"] or [])
        if ra["qual"] is None:
            assert rb["qual"] is None
        else:
            assert rb["qual"] == pytest.approx(ra["qual"], rel=1e-6)
        assert ra["filter"] == rb["filter"]
        # INFO: DP scalar int, AF Number=A float array, DB flag
        ia, ib = ra["info"], rb["info"]
        assert ia["DP"] == ib["DP"]
        if ia["AF"] is None:
            assert not ib["AF"]  # absent array -> empty list in container
        else:
            assert [pytest.approx(x, rel=1e-6) for x in ia["AF"]] == ib["AF"]
        assert bool(ia["DB"]) == bool(ib["DB"])


def test_roundtrip_calls(spark, ds, gds_path):
    from seqarray_spark.dataset import SeqDataset

    back = SeqDataset.from_gds(spark, gds_path)
    key = lambda df: {
        (r["variant_id"], r["sample_id"]): r for r in df.collect()
    }
    a, b = key(ds.calls), key(back.calls)
    assert set(a) == set(b)
    ploidy = ds.ploidy
    for k in a:
        al_a = a[k]["alleles"]
        al_b = b[k]["alleles"]
        # short calls pad to uniform ploidy with missing (reference:
        # src/ConvVCF2GDS.cpp:1770-1773); calls beyond ploidy keep their
        # overflow slots via genotype/extra (cpp:1775-1797)
        pad_a = list(al_a) + [None] * max(0, ploidy - len(al_a))
        assert pad_a == list(al_b), (k, al_a, al_b)
        # DP FORMAT scalar round-trips incl missing
        assert a[k]["DP"] == b[k]["DP"], k
    # AF computed from the container agrees with the padded
    # representation (padding ragged haploid calls to uniform ploidy is
    # the container's semantics — slot counts change accordingly)
    from seqarray_spark.operators.aggregates import af_ac_missing

    exp = {}
    for (vid, _), r in a.items():
        pad = list(r["alleles"]) + [None] * max(0, ploidy - len(r["alleles"]))
        ac, an = exp.get(vid, (0, 0))
        ac += sum(1 for x in pad if x == 0)  # af_ac_missing reports REF af
        an += sum(1 for x in pad if x is not None)
        exp[vid] = (ac, an)
    fb = {r["variant_id"]: r["af"] for r in af_ac_missing(back.calls).collect()}
    for vid, (ac, an) in exp.items():
        if an == 0:
            assert fb[vid] is None
        else:
            assert fb[vid] == pytest.approx(ac / an), vid


def test_scalar_float_info_roundtrip(spark, tmp_path):
    """Number=1 Type=Float INFO (MQ/QD-style, ubiquitous in real VCFs)
    must survive the container round trip: stored float32, missing as
    NaN -> None (regression: the writer used to pick a 'float64' kind
    with no class signature and crash)."""
    src = tmp_path / "mq.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=MQ,Number=1,Type=Float,Description="RMS mapping quality">\n'
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "1\t100\t.\tA\tT\t10\tPASS\tMQ=59.5\tGT\t0|1\n"
        "1\t200\t.\tC\tG\t10\tPASS\t.\tGT\t1|1\n"
        "1\t300\t.\tG\tA\t10\tPASS\tMQ=12.25\tGT\t0|0\n"
    )
    from seqarray_spark.dataset import SeqDataset

    ds2 = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    out = str(tmp_path / "mq.gds")
    ds2.to_gds(out)
    back = SeqDataset.from_gds(spark, out)
    got = {
        r["position"]: (r["info"]["MQ"] if r["info"] else None)
        for r in back.variants.collect()
    }
    assert got[100] == pytest.approx(59.5)
    assert got[200] is None
    assert got[300] == pytest.approx(12.25)


def test_roundtrip_reference_fixture(spark, tmp_path):
    """Read the reference's own CEU fixture, write it back out, read the
    copy — AF must match the original file's AF for every variant."""
    src = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators.aggregates import af_ac_missing

    orig = SeqDataset.from_gds(spark, src)
    out = str(tmp_path / "ceu_copy.gds")
    orig.to_gds(out)
    copy = SeqDataset.from_gds(spark, out)
    fa = {r["variant_id"]: r["af"] for r in af_ac_missing(orig.calls).collect()}
    fb = {r["variant_id"]: r["af"] for r in af_ac_missing(copy.calls).collect()}
    assert set(fa) == set(fb) and len(fa) == 1348
    for vid in fa:
        assert (fb[vid] is None) == (fa[vid] is None)
        if fa[vid] is not None:
            assert fb[vid] == pytest.approx(fa[vid])


def test_mixed_ploidy_roundtrip(spark, tmp_path):
    """Triploid (0/0/1) and haploid calls survive the container round
    trip via genotype/extra + extra.index (reference mechanism:
    src/ConvVCF2GDS.cpp:1775-1797). Short calls pad to ploidy with
    missing (cpp:1770-1773) — the same collapse the reference has."""
    src = tmp_path / "mixed.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT\t0/0/1\t0|1\t0\n"
        "1\t200\t.\tC\tG,T\t10\tPASS\t.\tGT\t1/2/2/0\t./.\t2\n"
        "1\t300\t.\tG\tA\t10\tPASS\t.\tGT\t0/.\t1|0|1\t./0/1\n"
    )
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.gds import GdsFile

    ds = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    ploidy = ds.ploidy  # max observed = 4
    out = str(tmp_path / "mixed.gds")
    ds.to_gds(out)

    # container carries the overflow side-table
    f = GdsFile(out)
    assert f.node("genotype/extra.index").dims[0] == 0 or True  # node exists
    paths = set(f.ls())
    for need in ("/genotype/extra", "/genotype/extra.index",
                 "/phase/extra", "/phase/extra.index"):
        assert need in paths

    back = SeqDataset.from_gds(spark, out)
    key = lambda df: {(r["variant_id"], r["sample_id"]): r for r in df.collect()}
    a, b = key(ds.calls), key(back.calls)
    assert set(a) == set(b)
    for k in a:
        al_a, al_b = a[k]["alleles"], b[k]["alleles"]
        pad_a = list(al_a) + [None] * max(0, ploidy - len(al_a))
        assert pad_a == list(al_b), (k, al_a, al_b)
        ph_a, ph_b = a[k]["phased"], b[k]["phased"]
        pad_p = list(ph_a) + [False] * max(0, (ploidy - 1) - len(ph_a))
        assert pad_p == list(ph_b), (k, ph_a, ph_b)


@pytest.mark.parametrize("coder", ["LZMA_ra", "ZIP_ra", "ZIP_ra.max", None])
def test_roundtrip_coders(spark, ds, tmp_path, coder):
    """Every storage coder round-trips calls bit-exactly; the node carries
    the coder name the reader dispatches on (reference seqStorageOption,
    R/Utilities.R:250-314)."""
    from seqarray_spark.dataset import SeqDataset

    out = str(tmp_path / "c.gds")
    ds.to_gds(out, coder=coder, block_variants=3)
    f = GdsFile(out)
    expected = {"LZMA_ra": "LZMA_ra", "ZIP_ra": "ZIP_ra",
                "ZIP_ra.max": "ZIP_ra", None: ""}[coder]
    assert f.node("genotype/data").coder == expected
    back = SeqDataset.from_gds(spark, out)
    a = {(r["variant_id"], r["sample_id"]): r["alleles"] for r in ds.calls.collect()}
    bb = {(r["variant_id"], r["sample_id"]): r["alleles"] for r in back.calls.collect()}
    assert set(a) == set(bb)
    ploidy = ds.ploidy
    for k in a:
        pad = list(a[k]) + [None] * max(0, ploidy - len(a[k]))
        assert pad == list(bb[k]), k


def test_ceu_rewrite_compression_ratio(spark, tmp_path):
    """Re-writing the reference's CEU fixture with the default LZMA_ra
    coder must land within 2x of the reference's own file size (the
    storage story is the container's point: ~0.013 B/call on 1KG,
    vignettes/OverviewSlides.Rmd:214-215) and stay frame-addressable."""
    src = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset

    out = str(tmp_path / "ceu_lzma.gds")
    SeqDataset.from_gds(spark, src).to_gds(out)
    assert os.path.getsize(out) <= 2 * os.path.getsize(src), \
        (os.path.getsize(out), os.path.getsize(src))
    f = GdsFile(out)
    node = f.node("genotype/data")
    assert node.coder == "LZMA_ra"
    frames, _, codec = f._frame_index(node)
    assert isinstance(frames, list) and codec == "xz"


def test_packedreal16_ds_roundtrip(spark, tmp_path):
    """Imputation dosage round-trips through the container as
    packedreal16 (the reference's imputation storage:
    "packedreal16:offset=0,scale=0.0001", R/ConvVCF2GDS.R:578-583) —
    bit-exact at the 0.0001 quantization, NaN <-> NA code."""
    src = "/root/reference/inst/extdata/Imputed_dosages.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.gds import _pack7

    orig = SeqDataset.from_gds(spark, src)
    out = str(tmp_path / "dose16.gds")
    orig.to_gds(out, format_storage={"DS": "packedreal16"}, block_variants=40)

    f = GdsFile(out)
    node = f.node("annotation/format/DS/data")
    assert node.kind == "packedreal16"
    assert node.sig == _pack7("dPackedReal16")  # signed 16-bit class
    assert node.params["scale"] == pytest.approx(0.0001)
    assert f.node("annotation/format/DS").attrs["Type"] == "Float"

    back = SeqDataset.from_gds(spark, out)
    key = lambda df: {
        (r["variant_id"], r["sample_id"]): r["DS"] for r in df.collect()
    }
    a, bb = key(orig.calls), key(back.calls)
    assert set(a) == set(bb) and len(a) == 100 * 1000
    for k in a:
        va, vb = a[k], bb[k]
        if va is None or not len(va):
            assert vb is None or not len(vb), k
            continue
        assert len(va) == len(vb), k
        for x, y in zip(va, vb):
            if x is None:
                assert y is None, k
            else:
                # decoded value is exactly round(x/scale)*scale
                assert y == pytest.approx(x, abs=5.1e-5), (k, x, y)


def test_zip_ra_random_access(spark, ds, tmp_path, monkeypatch):
    """A ranged read of a ZIP_ra node decompresses ONLY the frames
    overlapping the range (no whole-stream fallback) and decodes the
    right values."""
    import seqarray_spark.sources.gds as gds_mod
    from seqarray_spark.sources.gds import decode_values

    out = str(tmp_path / "z.gds")
    ds.to_gds(out, coder="ZIP_ra:256K", block_variants=2,
              heal_frames=False)  # multi-frame nodes, per-block run kept
    f = GdsFile(out)
    node = f.node("variant.id")
    frames, _, codec = f._frame_index(node)
    assert codec == "zip" and isinstance(frames, list) and len(frames) >= 3
    calls = []
    real = gds_mod._decompress_frame

    def spy(c, d, un=None):
        calls.append(c)
        return real(c, d, un)

    monkeypatch.setattr(gds_mod, "_decompress_frame", spy)
    got = decode_values(node, f.read_node_bytes(node, 2 * 4, 4 * 4))
    assert list(got) == [3, 4]
    assert len(calls) == 1, f"expected 1 overlapping frame, decompressed {len(calls)}"


def test_description_metadata_roundtrip(spark, tmp_path):
    """VCF header remnants (fileformat, reference genome, contigs, ALT,
    simple ##key=value pairs) survive VCF -> GDS -> VCF through the
    container's description/* nodes (reference layout:
    R/ConvVCF2GDS.R:928-957)."""
    src = tmp_path / "hdr.vcf"
    src.write_text(
        "##fileformat=VCFv4.1\n"
        "##fileDate=20240101\n"
        "##reference=GRCh38\n"
        '##ALT=<ID=DEL,Description="Deletion">\n'
        "##contig=<ID=1,length=248956422>\n"
        "##contig=<ID=2,length=242193529>\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT\t0|1\n"
        "2\t200\t.\tC\tG\t10\tPASS\t.\tGT\t1|1\n"
    )
    from seqarray_spark.dataset import SeqDataset

    ds = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    assert ds.meta["fileformat"] == "VCFv4.1"
    assert ds.meta["reference"] == "GRCh38"
    assert ("fileDate", "20240101") in ds.meta["header_pairs"]

    out = str(tmp_path / "hdr.gds")
    ds.to_gds(out)
    f = GdsFile(out)
    assert f.node("description").attrs["vcf.fileformat"] == "VCFv4.1"
    assert f.read_array("description/reference") == ["GRCh38"]
    assert f.read_array("description/vcf.contig/ID") == ["1", "2"]
    assert f.read_array("description/vcf.contig/length") == [
        "248956422", "242193529"]
    assert f.read_array("description/vcf.alt/ID") == ["DEL"]

    back = SeqDataset.from_gds(spark, out)
    assert back.meta["fileformat"] == "VCFv4.1"
    assert back.meta["reference"] == "GRCh38"
    assert back.meta["contigs"] == [
        {"ID": "1", "length": "248956422"},
        {"ID": "2", "length": "242193529"},
    ]
    assert back.meta["alts"] == [{"ID": "DEL", "Description": "Deletion"}]
    assert ("fileDate", "20240101") in back.meta["header_pairs"]

    vout = str(tmp_path / "back_vcf")
    vcfmod.write_vcf(back, vout)
    hdr_text = open(f"{vout}/_header.vcf").read()
    for needle in ("##fileformat=VCFv4.1", "##reference=GRCh38",
                   "##fileDate=20240101", "contig=<ID=1,length=248956422",
                   "ALT=<ID=DEL"):
        assert needle in hdr_text, needle


def test_description_metadata_from_reference_fixture(spark):
    """The 1KG fixture's own description nodes read back as meta."""
    src = "/root/reference/inst/extdata/1KG_phase1_release_v3_chr22.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset

    ds = SeqDataset.from_gds(spark, src)
    assert ds.meta["fileformat"] == "VCFv4.1"
    assert ds.meta["reference"] == "GRCh37"
    assert {"ID": "DEL", "Description": "Deletion"} in ds.meta["alts"]
    assert ("fileDate", "20160723") in ds.meta["header_pairs"]


def test_transposed_data_parity_with_reference(spark, tmp_path):
    """transposed=True emits the reference's seqOptimize '~data'
    sample-major copies (R/Utilities.R:1235-1323); values must match the
    reference fixture's own ~data nodes bit-for-bit (genotype/phase) and
    value-for-value (DP)."""
    import numpy as np

    src = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset

    out = str(tmp_path / "ceu_t.gds")
    SeqDataset.from_gds(spark, src).to_gds(out, transposed=True)
    f, fo = GdsFile(out), GdsFile(src)
    assert f.node("genotype/~data").dims == (90, 1348, 2)
    n = 90 * 1348 * 2
    a = np.asarray(f.read_array("genotype/~data"))[:n]
    b = np.asarray(fo.read_array("genotype/~data"))[:n]
    assert (a == b).all()
    pa = np.asarray(f.read_array("phase/~data"))[:90 * 1348]
    pb = np.asarray(fo.read_array("phase/~data"))[:90 * 1348]
    assert (pa == pb).all()
    da = np.asarray(f.read_array("annotation/format/DP/~data"))[:90 * 1348]
    db = np.asarray(fo.read_array("annotation/format/DP/~data"))[:90 * 1348]
    # original stores DP as vlint, ours as int32 — compare values on the
    # cells the original marks present (NA encodings differ by kind)
    mask = db >= 0
    assert mask.any() and (da[mask] == db[mask]).all()
    back = SeqDataset.from_gds(spark, out)
    assert back.variants.count() == 1348
    # feature interaction: transposed copies under a different coder
    out2 = str(tmp_path / "ceu_t_zip.gds")
    SeqDataset.from_gds(spark, src).to_gds(out2, transposed=True,
                                           coder="ZIP_ra")
    f2 = GdsFile(out2)
    assert f2.node("genotype/~data").coder == "ZIP_ra"
    a2 = np.asarray(f2.read_array("genotype/~data"))[:n]
    assert (a2 == b).all()


def test_multiframe_node_roundtrip(spark, tmp_path):
    """A node larger than one 64 KiB frame splits into multiple frames
    inside a single block fragment; ranged reads still decode exactly."""
    from pyspark.sql import Row

    from seqarray_spark.dataset import SeqDataset

    n = 3000
    rows = [
        (i + 1, "ctg" + "x" * 40 + str(i % 7), i + 1, None, "A", ["T"],
         None, None)
        for i in range(n)
    ]
    variants = spark.createDataFrame(
        rows,
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    samples = spark.createDataFrame([Row(sample_id="S1")])
    ds = SeqDataset(variants, None, samples, ploidy=2)
    out = str(tmp_path / "wide.gds")
    # pin the frame size below the node's bytes so it must split
    ds.to_gds(out, coder="LZMA_ra:64K")
    f = GdsFile(out)
    node = f.node("chromosome")
    frames, _, codec = f._frame_index(node)
    assert codec == "xz" and len(frames) >= 2, len(frames)
    got = f.read_array("chromosome")
    assert len(got) == n and got[0].startswith("ctg") and got[-1].endswith(str((n - 1) % 7))
    # distributed read with block boundaries that land mid-frame: every
    # VL value must survive the byte-index seek across frame boundaries
    back = SeqDataset.from_gds(spark, out, block_variants=500)
    vals = {
        r["variant_id"]: r["chromosome"] for r in back.variants.collect()
    }
    assert len(vals) == n
    for i in (0, 499, 500, 1499, 1500, n - 1):  # block edges + interior
        assert vals[i + 1] == "ctg" + "x" * 40 + str(i % 7), i


def test_write_is_distributed(spark, ds, tmp_path, monkeypatch):
    """The writer must never materialize O(n_var x n_samp) data on the
    driver: every collect stays bounded by blocks/samples/levels and
    toLocalIterator is never used (round-2 verdict: the old writer
    collected the whole variants table and streamed every call through
    the driver)."""
    from pyspark.sql.classic.dataframe import DataFrame

    n_var = ds.variants.count()
    n_calls = n_var * 3
    sizes = []
    real_collect = DataFrame.collect

    def spy_collect(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    def no_tli(self, *a, **kw):
        raise AssertionError("toLocalIterator used in write path")

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    monkeypatch.setattr(DataFrame, "toLocalIterator", no_tli)
    out = str(tmp_path / "dist.gds")
    ds.to_gds(out, block_variants=2)  # force multiple blocks
    # every collect is O(n_blocks) or O(n_samp) or the fragment manifest
    # (n_blocks * n_nodes rows) — never O(n_var * n_samp) data rows
    n_blocks = math.ceil(n_var / 2)
    assert max(sizes) <= max(3, n_blocks * 64), sizes
    assert all(s <= n_blocks * 64 for s in sizes), sizes

    from seqarray_spark.dataset import SeqDataset

    monkeypatch.undo()
    back = SeqDataset.from_gds(spark, out)
    assert back.variants.count() == n_var


def test_lz4_ra_roundtrip_and_random_access(spark, ds, tmp_path, monkeypatch):
    """LZ4_ra — the third stock seqStorageOption codec family
    (R/Utilities.R:250-252) — round-trips bit-exactly through the
    pure-Python LZ4 block codec (sources/lz4_block), and a ranged read
    touches ONLY the frames overlapping the range."""
    import seqarray_spark.sources.gds as gds_mod
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.gds import decode_values

    out = str(tmp_path / "l.gds")
    ds.to_gds(out, coder="LZ4_ra:256K", block_variants=2, heal_frames=False)
    f = GdsFile(out)
    node = f.node("variant.id")
    assert node.coder == "LZ4_ra"
    frames, _, codec = f._frame_index(node)
    assert codec == "lz4" and isinstance(frames, list) and len(frames) >= 3

    calls = []
    real = gds_mod._decompress_frame

    def spy(c, d, un=None):
        calls.append(c)
        return real(c, d, un)

    monkeypatch.setattr(gds_mod, "_decompress_frame", spy)
    got = decode_values(node, f.read_node_bytes(node, 2 * 4, 4 * 4))
    assert list(got) == [3, 4]
    assert len(calls) == 1, f"expected 1 overlapping frame, got {len(calls)}"
    monkeypatch.undo()

    back = SeqDataset.from_gds(spark, out)
    a = {(r["variant_id"], r["sample_id"]): r["alleles"] for r in ds.calls.collect()}
    bb = {(r["variant_id"], r["sample_id"]): r["alleles"] for r in back.calls.collect()}
    assert set(a) == set(bb)
    for k in a:
        pad = list(a[k]) + [None] * max(0, ds.ploidy - len(a[k]))
        assert pad == list(bb[k]), k


def test_recompress_lz4_lzma_conversion(spark, tmp_path):
    """recompress_gds converts LZ4_ra <-> LZMA_ra containers (reference:
    seqRecompress, R/UtilsExport.R:357-463) preserving AF values."""
    src = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators.aggregates import af_ac_missing
    from seqarray_spark.operators.mutate import recompress_gds

    lz4 = str(tmp_path / "ceu_lz4.gds")
    recompress_gds(spark, src, lz4, coder="LZ4_ra")
    assert GdsFile(lz4).node("genotype/data").coder == "LZ4_ra"
    back = str(tmp_path / "ceu_back.gds")
    recompress_gds(spark, lz4, back, coder="LZMA_ra")
    assert GdsFile(back).node("genotype/data").coder == "LZMA_ra"

    fa = {r["variant_id"]: r["af"]
          for r in af_ac_missing(SeqDataset.from_gds(spark, src).calls).collect()}
    fb = {r["variant_id"]: r["af"]
          for r in af_ac_missing(SeqDataset.from_gds(spark, back).calls).collect()}
    assert set(fa) == set(fb) and len(fa) == 1348
    for vid in fa:
        if fa[vid] is not None:
            assert fb[vid] == pytest.approx(fa[vid])


def test_ultra_storage_modes(spark, tmp_path):
    """'Ultra'/'UltraMax' map to LZMA_RA.ultra/.ultra_max with widened
    frame sizes (R/Utilities.R:259-289); an Ultra CEU rewrite is no
    larger than the .max rewrite and round-trips."""
    src = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset

    orig = SeqDataset.from_gds(spark, src)
    p_max = str(tmp_path / "ceu_max.gds")
    p_ultra = str(tmp_path / "ceu_ultra.gds")
    orig.to_gds(p_max, coder="LZMA_ra.max")
    orig.to_gds(p_ultra, coder="Ultra")
    assert os.path.getsize(p_ultra) <= os.path.getsize(p_max), (
        os.path.getsize(p_ultra), os.path.getsize(p_max))
    back = SeqDataset.from_gds(spark, p_ultra)
    assert back.variants.count() == orig.variants.count()
    assert back.calls.count() == orig.calls.count()


def test_per_class_coder_overrides(spark, ds, tmp_path):
    """geno/info/format/index coder overrides mirror seqStorageOption's
    geno.compress/info.compress/format.compress/index.compress slots
    (R/Utilities.R:253-254): each node class lands under its own codec."""
    from seqarray_spark.dataset import SeqDataset

    out = str(tmp_path / "mix.gds")
    ds.to_gds(out, coder="LZMA_ra", geno_coder="LZ4_ra",
              info_coder="ZIP_ra", index_coder="none", block_variants=3)
    f = GdsFile(out)
    assert f.node("genotype/data").coder == "LZ4_ra"
    assert f.node("annotation/info/DP").coder == "ZIP_ra"
    assert f.node("genotype/@data").coder == ""
    assert f.node("position").coder == "LZMA_ra"
    back = SeqDataset.from_gds(spark, out)
    a = {(r["variant_id"], r["sample_id"]): r["alleles"] for r in ds.calls.collect()}
    bb = {(r["variant_id"], r["sample_id"]): r["alleles"] for r in back.calls.collect()}
    assert set(a) == set(bb)
    for k in a:
        pad = list(a[k]) + [None] * max(0, ds.ploidy - len(a[k]))
        assert pad == list(bb[k]), k


@pytest.mark.parametrize("pr", ["packedreal16u", "packedreal24",
                                "packedreal24u", "packedreal32"])
def test_packedreal_family_roundtrip(spark, tmp_path, pr):
    """Every packedreal width/signedness round-trips dosage bit-exactly
    at its quantization step, NaN <-> NA code (gdsfmt packedreal family;
    the reference's own pipeline uses packedreal16,
    R/ConvVCF2GDS.R:578-583 — the rest complete the format)."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.gds_write import _PR_SPEC

    src = tmp_path / "ds.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        '##FORMAT=<ID=DS,Number=1,Type=Float,Description="dosage">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "1\t100\t.\tA\tT\t10\tPASS\t.\tGT:DS\t0|1:0.5013\t1|1:1.9999\n"
        "1\t200\t.\tC\tG\t10\tPASS\t.\tGT:DS\t0|0:0.0001\t.|.:.\n"
        "1\t300\t.\tG\tA\t10\tPASS\t.\tGT:DS\t0|1:1.2345\t0|0:0\n"
    )
    ds2 = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    out = str(tmp_path / f"{pr}.gds")
    ds2.to_gds(out, format_storage={"DS": pr}, block_variants=2)

    f = GdsFile(out)
    from seqarray_spark.sources.gds import _pack7

    node = f.node("annotation/format/DS/data")
    assert node.kind == pr
    scale = _PR_SPEC[pr][0]
    assert node.params["scale"] == pytest.approx(scale)

    back = SeqDataset.from_gds(spark, out)
    got = {(r["variant_id"], r["sample_id"]): r["DS"]
           for r in back.calls.collect()}
    exp = {(r["variant_id"], r["sample_id"]): r["DS"]
           for r in ds2.calls.collect()}
    assert set(got) == set(exp)
    for k, v in exp.items():
        if v is None:
            assert got[k] is None or math.isnan(got[k]), k
        else:
            q = round(v / scale) * scale  # the width's quantization
            assert got[k] == pytest.approx(q, abs=scale / 2), (k, v)


def test_filter_factor_reference_semantics(spark, tmp_path):
    """FILTER container parity (R/ConvVCF2GDS.R:1405-1425,
    src/ConvVCF2GDS.cpp:1475-1490): a multi-filter cell 'q10;s50' is ONE
    factor level (never split on ';'), levels are first-appearance
    ordered with declared-but-unobserved filters appended, per-level
    Descriptions ride the node, and a missing FILTER stores NA_INTEGER."""
    import numpy as np

    from seqarray_spark.dataset import SeqDataset

    src = tmp_path / "f.vcf"
    src.write_text(
        "##fileformat=VCFv4.2\n"
        '##FILTER=<ID=q10,Description="Quality below 10">\n'
        '##FILTER=<ID=s50,Description="Less than half">\n'
        '##FILTER=<ID=never,Description="Declared only">\n'
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "1\t100\t.\tA\tT\t10\tq10;s50\t.\tGT\t0|1\n"
        "1\t200\t.\tC\tG\t10\tPASS\t.\tGT\t1|1\n"
        "1\t300\t.\tG\tA\t10\t.\t.\tGT\t0|0\n"
        "1\t400\t.\tT\tC\t10\tq10\t.\tGT\t0|1\n"
    )
    ds2 = vcfmod.read_vcf(spark, str(src), assign_ids="order")
    out = str(tmp_path / "f.gds")
    ds2.to_gds(out)

    f = GdsFile(out)
    node = f.node("annotation/filter")
    # first-appearance order, then the declared-unobserved level
    # 's50' never occurs ALONE (the composite cell is its own level), so
    # it is appended with the other declared-unobserved ids — exactly
    # R's c(s, setdiff(header$filter$ID, s))
    assert node.attrs["R.levels"] == ["q10;s50", "PASS", "q10", "s50", "never"]
    assert node.attrs["Description"] == [
        "", "", "Quality below 10", "Less than half", "Declared only"]
    codes = np.asarray(f.read_array("annotation/filter"))
    assert list(codes) == [1, 2, -(2 ** 31), 3]

    back = SeqDataset.from_gds(spark, out)
    got = {r["position"]: r["filter"] for r in back.variants.collect()}
    assert got == {100: "q10;s50", 200: "PASS", 300: None, 400: "q10"}


@pytest.mark.parametrize("coder", ["ZIP_ra.fast", "LZMA_ra.fast", "LZ4_ra"])
def test_strict_frames_exact_bsize_grid(spark, tmp_path, coder):
    """write_gds(strict_frames=True) re-frames every compressed node on
    the exact 64 KiB grid: all frames but the last cover _RA_BSIZE
    uncompressed bytes, so a fixed-stride reader (offset // bsize) lands
    on frame boundaries — the layout a single-writer gdsfmt produces.
    The default multi-block assembly leaves irregular per-block tail
    frames (asserted here as the contrast), which only an entry-walking
    reader can seek."""
    from pyspark.sql import Row

    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.gds_write import _RA_BSIZE

    n = 3000
    rows = [
        (i + 1, "ctg" + "x" * 40 + str(i % 7), i + 1, None, "A", ["T"],
         None, None)
        for i in range(n)
    ]
    variants = spark.createDataFrame(
        rows,
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    samples = spark.createDataFrame([Row(sample_id="S1")])
    ds = SeqDataset(variants, None, samples, ploidy=2)

    loose = str(tmp_path / "loose.gds")
    strict = str(tmp_path / "strict.gds")
    # pin the stock 64 KiB grid and keep the raw per-block frame runs on
    # the loose side (the contrast the strict mode exists to fix)
    ds.to_gds(loose, coder=coder + ":64K", block_variants=500,
              heal_frames=False)
    ds.to_gds(strict, coder=coder + ":64K", block_variants=500,
              strict_frames=True)

    def uncomp_lens(path):
        f = GdsFile(path)
        frames, _, _ = f._frame_index(f.node("chromosome"))
        return [u for (_, u, _) in frames]

    lens_loose = uncomp_lens(loose)
    lens_strict = uncomp_lens(strict)
    # contrast: per-block assembly leaves >1 sub-bsize interior frame
    assert sum(1 for u in lens_loose[:-1] if u != _RA_BSIZE) >= 1
    # strict: every frame but the last is exactly one bsize
    assert all(u == _RA_BSIZE for u in lens_strict[:-1]), lens_strict
    assert 0 < lens_strict[-1] <= _RA_BSIZE
    assert sum(lens_strict) == sum(lens_loose)  # same uncompressed stream

    # value parity through the distributed reader, block edges included
    back = SeqDataset.from_gds(spark, strict, block_variants=700)
    vals = {r["variant_id"]: r["chromosome"] for r in back.variants.collect()}
    assert len(vals) == n
    for i in (0, 699, 700, 2099, 2100, n - 1):
        assert vals[i + 1] == "ctg" + "x" * 40 + str(i % 7), i


def test_strict_frames_bit_boundary_genotypes(spark, tmp_path):
    """strict_frames over a bit-packed genotype node whose Spark block
    boundary lands mid-byte: the assembler's 1-byte boundary frames must
    decode and re-frame onto the 64 KiB grid without corrupting the
    spliced byte (501-variant blocks x 1 sample x ploidy 2 = 1002 slots
    per block -> 250.5 bytes, so every boundary shares a byte)."""
    from pyspark.sql import Row

    from seqarray_spark.dataset import SeqDataset

    n = 1503  # three 501-variant blocks
    variants = spark.createDataFrame(
        [(i + 1, "1", i + 1, None, "A", ["T"], None, None) for i in range(n)],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    calls = spark.createDataFrame(
        [
            Row(variant_id=i + 1, sample_id="S1",
                alleles=[i % 3 if i % 7 else None, (i + 1) % 2],
                phased=[i % 2 == 0])
            for i in range(n)
        ],
        "variant_id long, sample_id string, alleles array<int>, "
        "phased array<boolean>",
    )
    samples = spark.createDataFrame([Row(sample_id="S1")])
    ds = SeqDataset(variants, calls, samples, ploidy=2)
    out = str(tmp_path / "strictgeno.gds")
    ds.to_gds(out, coder="ZIP_ra.fast", block_variants=501,
              strict_frames=True)

    back = SeqDataset.from_gds(spark, out, block_variants=400)
    got = {
        r["variant_id"]: r["alleles"]
        for r in back.calls.select("variant_id", "alleles").collect()
    }
    assert len(got) == n
    for i in (0, 500, 501, 1001, 1002, n - 1):  # block edges + interior
        exp = [i % 3 if i % 7 else None, (i + 1) % 2]
        assert got[i + 1] == exp, (i, got[i + 1], exp)


def test_digest_attributes(spark, ds, gds_path):
    """write_gds stamps per-node md5 attributes the way the reference
    does at import (.DigestCode via digest.gdsn, R/Internal.R:918-1003):
    md5 over the on-disk data-stream content. verify_digests recomputes
    and matches every one; overflow/extra streams stay unstamped."""
    from seqarray_spark.sources.gds import verify_digests

    r = verify_digests(gds_path)
    assert r and all(r.values()), r
    stamped = set(r)
    for need in ("/sample.id", "/variant.id", "/position", "/chromosome",
                 "/allele", "/genotype/data", "/genotype/@data",
                 "/annotation/id", "/annotation/qual", "/annotation/filter",
                 "/annotation/info/DP", "/annotation/format/DP/data"):
        assert need in stamped
    f = GdsFile(gds_path)
    assert "md5" not in f.node("genotype/extra.index").attrs
    assert "md5" not in f.node("genotype/extra").attrs
    # digest=False writes a clean container
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p2 = os.path.join(td, "nodigest.gds")
        ds.to_gds(p2, digest=False)
        assert verify_digests(p2) == {}


def test_digest_matches_reference_convention(spark, tmp_path):
    """The digest convention is the reference's own: recomputing over
    the released fixtures reproduces their stored md5 attributes, and a
    CEU rewrite's stamps all verify."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.gds import verify_digests

    ceu = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(ceu):
        pytest.skip("no reference fixture")
    r = verify_digests(ceu)
    bad = sorted(k for k, v in r.items() if not v)
    # 26/28 verify; the two DP stamps don't match their own current
    # streams in the fixture as released
    assert sum(r.values()) == 26 and bad == [
        "/annotation/format/DP/data", "/annotation/format/DP/~data",
    ]
    out = str(tmp_path / "ceu_redigest.gds")
    SeqDataset.from_gds(spark, ceu).to_gds(out)
    r2 = verify_digests(out)
    assert len(r2) >= 20 and all(r2.values()), {
        k: v for k, v in r2.items() if not v
    }


def test_scenario_imputation_equals_explicit_format_storage(spark, tmp_path):
    """to_gds(scenario="imputation") is the reference's named shorthand
    for format_storage={'DS'/'GP': 'packedreal16'} (seqVCF2GDS scenario,
    R/ConvVCF2GDS.R:572-583): byte-identical container to the explicit
    spelling, node kind pinned; an explicit format_storage entry wins
    over the scenario default; unknown scenarios refuse."""
    src = "/root/reference/inst/extdata/Imputed_dosages.gds"
    if not os.path.exists(src):
        pytest.skip("reference fixture unavailable")
    from seqarray_spark.dataset import SeqDataset

    orig = SeqDataset.from_gds(spark, src)
    a = str(tmp_path / "scen.gds")
    b = str(tmp_path / "expl.gds")
    orig.to_gds(a, scenario="imputation", block_variants=40)
    orig.to_gds(b, format_storage={"DS": "packedreal16"}, block_variants=40)
    # the fixture has only DS, so the scenario's GP default is inert
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
    assert GdsFile(a).node("annotation/format/DS/data").kind == "packedreal16"

    c = str(tmp_path / "win.gds")
    orig.to_gds(c, scenario="imputation",
                format_storage={"DS": "packedreal32"}, block_variants=40)
    assert GdsFile(c).node("annotation/format/DS/data").kind == "packedreal32"

    with pytest.raises(ValueError, match="scenario"):
        orig.to_gds(str(tmp_path / "bad.gds"), scenario="nope")


def test_gds_roundtrip_per_variant_format_presence(spark, tmp_path):
    """Per-variant FORMAT presence survives the CONTAINER round trip
    (r9): read_vcf records fmt_present; to_gds stores ZERO @data rows
    for a scalar field absent at a variant (the reference's TVCF_Format
    index-0 model); from_gds reconstructs fmt_present from the stored
    counts; write_vcf then reproduces each line's FORMAT column. Also
    pins that ungapped fields still store exactly one row per variant
    (byte-layout unchanged for legacy data)."""
    import glob

    from seqarray_spark.sources import vcf as vcfmod
    from seqarray_spark.sources.gds import GdsFile
    from seqarray_spark.sources.gds_spark import from_gds

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
    out = str(tmp_path / "pvf.gds")
    vcfmod.read_vcf(spark, str(src), assign_ids="order").to_gds(out)

    # stored counts: DP present only at variant 1; GQ at variants 1+3
    g = GdsFile(out)
    import numpy as np

    dp = np.asarray(g.read_array("annotation/format/DP/@data"))
    gq = np.asarray(g.read_array("annotation/format/GQ/@data"))
    assert dp.tolist() == [1, 0, 0]
    assert gq.tolist() == [1, 0, 1]
    assert g.node("annotation/format/DP/data").dims[0] == 1
    assert g.node("annotation/format/GQ/data").dims[0] == 2

    ds2 = from_gds(spark, out)
    vout = str(tmp_path / "pvf_rt")
    vcfmod.write_vcf(ds2, vout)
    body = "".join(open(f).read() for f in sorted(glob.glob(vout + "/part-*")))
    lines = {ln.split("\t")[1]: ln.split("\t") for ln in body.splitlines() if ln}
    assert lines["100"][8] == "GT:DP:GQ"
    assert lines["200"][8] == "GT"
    assert lines["300"][8] == "GT:GQ"
    assert lines["300"][9] == "0/1:33" and lines["300"][10] == "./.:."


def test_recompressed_container_digests_verify(spark, tmp_path):
    """Parity review r11 (VERDICT r10 item 8): seqSummary(check='full')
    re-verifies digests AFTER seqRecompress, because seqRecompress
    re-stamps md5 over the NEW coder's streams (R/UtilsExport.R:432-435,
    digest.gdsn(action='add') post-rewrite). The engine twin:
    recompress_gds(CEU, coder='ZIP_ra') must yield a container whose
    every md5 attribute matches its own re-coded stream — stale digests
    copied from the source's LZMA streams would all mismatch."""
    from seqarray_spark.operators.mutate import recompress_gds
    from seqarray_spark.sources.gds import GdsFile, verify_digests
    from seqarray_spark.sources.gds_spark import from_gds

    ceu = "/root/reference/inst/extdata/CEU_Exon.gds"
    if not os.path.exists(ceu):
        pytest.skip("no reference fixture")
    out = str(tmp_path / "ceu_zip.gds")
    recompress_gds(spark, ceu, out, coder="ZIP_ra")
    f = GdsFile(out)
    assert f.node("genotype/data").coder.upper().startswith("ZIP")
    r = verify_digests(out)
    assert len(r) >= 20 and all(r.values()), {
        k: v for k, v in r.items() if not v
    }
    # and the re-coded streams decode: same genotype content as source
    src = from_gds(spark, ceu)
    dst = from_gds(spark, out)
    from pyspark.sql import functions as F

    key = lambda d: {  # noqa: E731
        (r3["variant_id"], r3["sample_id"]): tuple(r3["alleles"] or [])
        for r3 in d.calls.filter(F.col("variant_id") <= 100).collect()
    }
    assert key(src) == key(dst) and len(key(src)) > 0
