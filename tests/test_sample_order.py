"""Round-8 ADVICE fixes: the file-order sample convention
(sample_ordinal), unknown-FORMAT-field robustness, and ANSI-safe
haploid geno$GT.

Reference semantics: sample order is FILE order everywhere —
seqGetData(., "sample.id") returns the sample.id node as stored, and
seqSetFilter(sample.id=, ret.idx=TRUE) ranks with
`match(sample.id, seqGetData(., "sample.id"))` (R/Methods.R:153-160).
The engine now preserves file order through a sample_ordinal column
written by every importer and consumed by one helper
(dataset.sample_order_cols), so ret.idx / $sample_index / colData /
export axes agree on files whose samples are NOT stored sorted.
"""

import os

import pytest
from pyspark.sql import functions as F

from seqarray_spark.sources import vcf as vcfmod

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "toy.vcf")

# samples deliberately in NON-sorted header order: ZZ before AA
UNSORTED_VCF = """##fileformat=VCFv4.2
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tZZ\tAA
1\t100\trs1\tA\tG\t50\tPASS\tDP=10\tGT:DP\t0/1:7\t1/1:9
1\t200\trs2\tC\tT\t60\tPASS\tDP=12\tGT:DP\t0/0:5\t0/1:6
"""


@pytest.fixture(scope="module")
def unsorted_ds(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("ord") / "unsorted.vcf"
    p.write_text(UNSORTED_VCF)
    return vcfmod.read_vcf(spark, str(p))


def test_sample_ordinal_is_file_order(unsorted_ds):
    rows = {r["sample_id"]: r["sample_ordinal"]
            for r in unsorted_ds.samples.collect()}
    assert rows == {"ZZ": 1, "AA": 2}


def test_sample_index_uses_file_order(unsorted_ds):
    idx = {r["sample_id"]: r["sample_index"]
           for r in unsorted_ds.get_data("$sample_index").collect()}
    assert idx == {"ZZ": 1, "AA": 2}


def test_ret_idx_matches_reference_match_semantics(unsorted_ds):
    """match(sample.id, stored-order sample.id): with both samples kept,
    AA sits at stored position 2 even though it sorts first."""
    out = unsorted_ds.set_filter_sample_id(
        ["AA", "ZZ", "missing"], ret_idx=True
    )
    rows = {r["sample_id"]: (r["req_ord"], r["idx"]) for r in out.collect()}
    assert rows["AA"] == (1, 2)
    assert rows["ZZ"] == (2, 1)
    assert rows["missing"] == (3, None)
    unsorted_ds.reset_filter()


def test_col_data_file_order_and_no_bookkeeping_column(unsorted_ds):
    from seqarray_spark.functions.accessors import col_data

    rows = col_data(unsorted_ds).collect()
    assert "sample_ordinal" not in rows[0].asDict()
    got = {r["sample_id"]: r["Samples"] for r in rows}
    assert got == {"ZZ": 1, "AA": 2}


def test_sorted_fallback_without_ordinal(spark):
    """Frames lacking sample_ordinal (ad-hoc parquet samples tables)
    keep the documented ascending-sample_id fallback."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame([(1,)], "variant_id long")
    s = spark.createDataFrame([("zz",), ("aa",)], "sample_id string")
    ds = SeqDataset(v, None, s)
    idx = {r["sample_id"]: r["sample_index"]
           for r in ds.get_data("$sample_index").collect()}
    assert idx == {"aa": 1, "zz": 2}


def test_export_axes_follow_file_order(unsorted_ds, tmp_path):
    """ordered_sample_ids drives every exporter's sample axis; the VCF
    writer's column order must round-trip the original header order."""
    from seqarray_spark.dataset import ordered_sample_ids

    assert ordered_sample_ids(unsorted_ds.samples) == ["ZZ", "AA"]


def test_gds_roundtrip_preserves_file_order(unsorted_ds, tmp_path):
    """Container write orders the sample.id node by file order and MUST
    NOT emit sample_ordinal as a sample.annotation node; re-reading
    re-derives the same ordinals from node order."""
    from seqarray_spark.sources.gds import GdsFile
    from seqarray_spark.sources.gds_spark import from_gds
    from seqarray_spark.sources.gds_write import write_gds

    path = str(tmp_path / "ord.gds")
    write_gds(unsorted_ds, path)
    f = GdsFile(path)
    assert list(f.read_array("sample.id")) == ["ZZ", "AA"]
    assert not [
        c.name for c in f.node("sample.annotation").children
        if c.name == "sample_ordinal"
    ]
    back = from_gds(unsorted_ds.variants.sparkSession, path)
    rows = {r["sample_id"]: r["sample_ordinal"]
            for r in back.samples.collect()}
    assert rows == {"ZZ": 1, "AA": 2}


def test_unknown_format_fields_are_skipped(spark, tmp_path):
    """format_fields entries not declared in the header are silently
    skipped (reference: undeclared FORMAT IDs are dropped at import) —
    regression for the __fidx_{k} producer/consumer index mismatch that
    made ['NOPE', 'DP'] crash the whole import."""
    ds = vcfmod.read_vcf(spark, FIXTURE, format_fields=["NOPE", "DP"])
    assert "NOPE" not in ds.calls.columns
    c = {(r["variant_id"], r["sample_id"]): r for r in ds.calls.collect()}
    assert c[(1, "NA001")]["DP"] == 1
    # and with validation on (the second consumer of the hoisted index)
    ds2 = vcfmod.read_vcf(
        spark, FIXTURE, format_fields=["NOPE", "DP"], validate="quarantine"
    )
    assert "NOPE" not in ds2.calls.columns
    assert ds2.calls.count() == 21


def test_geno_gt_haploid_under_ansi(spark):
    """Haploid calls (1-element alleles, EMPTY phased array) must not
    abort under spark.sql.ansi.enabled — slot 2 renders the literal
    'NA' via the R paste quirk, and a missing haploid call is 'NA/NA'
    -> '.'."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.functions.accessors import geno_gt

    c = spark.createDataFrame(
        [(1, "s1", [0], []), (1, "s2", [1], []), (2, "s1", [None], [])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>",
    )
    v = spark.createDataFrame([(1,), (2,)], "variant_id long")
    out = {(r["variant_id"], r["sample_id"]): r["gt"]
           for r in geno_gt(SeqDataset(v, c, None)).collect()}
    assert out == {(1, "s1"): "0/NA", (1, "s2"): "1/NA", (2, "s1"): "."}


# ---------------------------------------------------------------------------
# header() accessor (reference NAMESPACE:72) — r8
# ---------------------------------------------------------------------------

def test_header_accessor_matches_parsed_vcf_header(spark):
    """header(x) catalogs == the declarations parse_vcf_header read."""
    from seqarray_spark.functions.accessors import header_df

    hdr = vcfmod.parse_vcf_header(FIXTURE)
    ds = vcfmod.read_vcf(spark, FIXTURE)
    cats = header_df(ds)
    info = {r["ID"]: (r["Number"], r["Type"], r["Description"])
            for r in cats["info"].collect()}
    assert set(info) == set(hdr.info)
    for fid, f in hdr.info.items():
        assert info[fid] == (f.number, f.type, f.description or "")
    fmt = {r["ID"]: (r["Number"], r["Type"])
           for r in cats["format"].collect()}
    for fid, f in hdr.formats.items():
        assert fmt[fid] == (f.number, f.type)
    assert "GT" in fmt  # always declared when genotype calls exist
    filt = {r["ID"]: r["Description"] for r in cats["filter"].collect()}
    assert "q10" in filt


def test_header_accessor_from_reference_container(spark):
    """from_gds recovers the declared catalogs from the reference's own
    Number/Type/Description node attrs (CEU_Exon.gds)."""
    from seqarray_spark.functions.accessors import header_df
    from seqarray_spark.sources.gds_spark import from_gds

    ds = from_gds(spark, "/root/reference/inst/extdata/CEU_Exon.gds")
    cats = header_df(ds)
    info = {r["ID"]: (r["Number"], r["Type"], r["Description"])
            for r in cats["info"].collect()}
    assert info["AA"] == (".", "String", "Ancestral Allele")
    assert info["HM2"] == ("0", "Flag", "HapMap2 membership")
    assert info["DP"] == ("1", "Integer", "Total Depth")
    fmt = {r["ID"]: (r["Number"], r["Type"], r["Description"])
           for r in cats["format"].collect()}
    assert fmt["DP"] == (".", "Integer", "Read Depth from MOSAIK BAM")
    filt = {r["ID"]: r["Description"] for r in cats["filter"].collect()}
    assert filt == {"PASS": "All filters passed",
                    "q10": "Quality below 10"}


def test_declarations_survive_vcf_gds_vcf_round_trip(spark, tmp_path):
    """VCF -> GDS -> read -> VCF: ##INFO/##FORMAT/##FILTER lines carry
    the ORIGINAL Number/Type/Description (reference: seqGDS2VCF rebuilds
    the header from the stored attrs, R/Conversion.R:83-143) — not
    schema-synthesized '.' arities."""
    import glob

    from seqarray_spark.sources.gds_spark import from_gds
    from seqarray_spark.sources.gds_write import write_gds

    src = vcfmod.read_vcf(spark, FIXTURE)
    gds = str(tmp_path / "rt.gds")
    write_gds(src, gds)
    back = from_gds(spark, gds)
    assert {d["ID"]: (d["Number"], d["Type"], d["Description"])
            for d in back.meta["info_meta"]} == {
        d["ID"]: (d["Number"], d["Type"], d["Description"])
        for d in src.meta["info_meta"]
    }
    out = str(tmp_path / "rt_out")
    vcfmod.write_vcf(back, out)
    hdr_lines = open(f"{out}/_header.vcf").read().splitlines()
    orig = vcfmod.parse_vcf_header(FIXTURE)
    reparsed = vcfmod.VcfHeader()
    for line in hdr_lines:
        if line.startswith("##"):
            vcfmod.apply_header_line(reparsed, line)
    for fid, f in orig.info.items():
        g = reparsed.info[fid]
        assert (g.number, g.type, g.description) == (
            f.number, f.type, f.description
        ), fid
    for fid, f in orig.formats.items():
        g = reparsed.formats[fid]
        assert (g.number, g.type, g.description) == (
            f.number, f.type, f.description
        ), fid
    filt = {d["ID"]: d.get("Description", "")
            for d in reparsed.filter_meta}
    assert filt.get("q10") == orig.filter_meta[0].get("Description", "") \
        if orig.filter_meta else True
