"""True SNPRelate snp.gds container adapters (reference seqGDS2SNP /
seqSNP2GDS, R/Conversion.R:410-547,555-825; recode kernels
src/ConvToGDS.cpp:171-343): round-trip bit-exactness, major-allele
recode, dosage form, and CEU-fixture AF parity."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset
from seqarray_spark.sources import snp_gds
from seqarray_spark.sources.gds import GdsFile

CEU = "/root/reference/inst/extdata/CEU_Exon.gds"


@pytest.fixture(scope="module")
def ds(spark):
    v = spark.createDataFrame(
        [
            (1, "1", 100, "rs1", "A", ["G"]),
            (2, "1", 200, "rs2", "C", ["T"]),
            (3, "2", 50, "rs3", "G", ["A"]),
            (4, "2", 80, "rs4", "T", ["C", "G"]),
        ],
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>",
    )
    c = spark.createDataFrame(
        [
            (1, "s1", [0, 0]), (1, "s2", [0, 1]), (1, "s3", [1, 1]),
            (1, "s4", [None, None]),
            # rs2: ALT-heavy -> major_ref flips it
            (2, "s1", [1, 1]), (2, "s2", [1, 1]), (2, "s3", [0, 1]),
            (2, "s4", [1, 1]),
            (3, "s1", [0, 1]), (3, "s2", [0, 0]), (3, "s3", [0, 0]),
            (3, "s4", [0, 0]),
            # rs4: multiallelic + a partial-missing call (packs as 3)
            (4, "s1", [0, 2]), (4, "s2", [None, 1]), (4, "s3", [0, 0]),
            (4, "s4", [1, 2]),
        ],
        "variant_id long, sample_id string, alleles array<smallint>",
    )
    s = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",), ("s4",)], "sample_id string"
    )
    return SeqDataset(v, c, s)


def _ref_codes(d):
    """{(variant_id, sample_id): snp.gds code} = REF dosage, NULL-on-any-
    missing -> 3 (FC_GDS2SNP)."""
    from seqarray_spark.functions.variant import dosage_ref

    out = {}
    for r in d.calls.select(
        "variant_id", "sample_id", dosage_ref("alleles").alias("d")
    ).collect():
        out[(r["variant_id"], r["sample_id"])] = (
            3 if r["d"] is None else min(r["d"], 3)
        )
    return out


def test_container_layout(spark, ds, tmp_path):
    p = str(tmp_path / "toy.snp.gds")
    snp_gds.write_snp_gds(ds, p)
    f = GdsFile(p)
    names = {n.name for n in f.root.children}
    assert names == {
        "sample.id", "snp.id", "snp.rs.id", "snp.position",
        "snp.chromosome", "snp.allele", "genotype",
    }
    assert f.root.attrs.get("FileFormat") == "SNP_ARRAY"
    assert list(f.read_array("sample.id")) == ["s1", "s2", "s3", "s4"]
    assert list(f.read_array("snp.id")) == [1, 2, 3, 4]
    assert list(f.read_array("snp.position")) == [100, 200, 50, 80]
    # first comma rendered '/' (FC_AlleleStr), later ones kept
    assert list(f.read_array("snp.allele")) == ["A/G", "C/T", "G/A", "T/C,G"]
    g = f.node("genotype")
    assert tuple(g.dims) == (4, 4)
    assert "sample.order" in g.attrs
    codes = np.asarray(f.read_array("genotype")).reshape(4, 4)
    # REF-dosage codes in sample order; any-missing -> 3
    assert codes.tolist() == [
        [2, 1, 0, 3],
        [0, 0, 1, 0],
        [1, 2, 2, 2],
        [1, 3, 2, 0],
    ]


def test_roundtrip_no_flip(spark, ds, tmp_path):
    p = str(tmp_path / "rt.snp.gds")
    snp_gds.write_snp_gds(ds, p)
    back = snp_gds.read_snp_gds(spark, p, major_ref=False)
    # variants: ref/alt survive (multi-alt collapses to the comma list)
    vrows = {r["variant_id"]: r for r in back.variants.collect()}
    assert vrows[1]["ref"] == "A" and vrows[1]["alt"] == ["G"]
    assert vrows[4]["ref"] == "T" and vrows[4]["alt"] == ["C", "G"]
    assert vrows[2]["qual"] == 100.0 and vrows[2]["filter"] == "PASS"
    assert vrows[3]["id"] == "rs3"
    # calls: REF dosage is bit-exact through the container
    from seqarray_spark.functions.variant import dosage_ref

    want = _ref_codes(ds)
    got = {
        (r["variant_id"], r["sample_id"]): (
            3 if r["d"] is None else r["d"]
        )
        for r in back.calls.select(
            "variant_id", "sample_id", dosage_ref("alleles").alias("d")
        ).collect()
    }
    assert got == want


def test_major_ref_recode(spark, ds, tmp_path):
    p = str(tmp_path / "mr.snp.gds")
    snp_gds.write_snp_gds(ds, p)
    back = snp_gds.read_snp_gds(spark, p, major_ref=True)
    vrows = {r["variant_id"]: r for r in back.variants.collect()}
    # rs2 codes = [0,0,1,0]: sum 1 < nvalid 4 -> flipped to T,C
    assert vrows[2]["ref"] == "T" and vrows[2]["alt"] == ["C"]
    # rs1 codes = [2,1,0]: sum 3 >= 3 -> kept
    assert vrows[1]["ref"] == "A" and vrows[1]["alt"] == ["G"]
    from seqarray_spark.functions.variant import dosage_ref

    got = {
        (r["variant_id"], r["sample_id"]): r["d"]
        for r in back.calls.select(
            "variant_id", "sample_id", dosage_ref("alleles").alias("d")
        ).collect()
    }
    # flipped variant: new-REF(T) dosage = old ALT count = 2 - code
    assert got[(2, "s1")] == 2 and got[(2, "s3")] == 1
    # unflipped keeps REF dosage
    assert got[(1, "s1")] == 2 and got[(1, "s4")] is None


def test_dosage_container(spark, ds, tmp_path):
    dsc = ds.calls.withColumn(
        "DS",
        F.when(
            F.col("sample_id") == "s4", F.lit(None).cast("double")
        ).otherwise(F.col("variant_id").cast("double") / 2.0),
    )
    d2 = SeqDataset(ds.variants, dsc, ds._base_samples)
    p = str(tmp_path / "ds.snp.gds")
    snp_gds.write_snp_gds(d2, p, dosage=True)
    f = GdsFile(p)
    assert f.root.attrs.get("FileFormat") == "IMPUTED_DOSAGE"
    g = f.node("genotype")
    assert g.kind == "packedreal16"
    vals = np.asarray(f.read_array("genotype"), dtype=np.float64).reshape(4, 4)
    assert vals[0, 0] == pytest.approx(0.5)
    assert np.isnan(vals[0, 3])
    # read back: DS = 2 - stored (packedreal16-quantized exact here)
    back = snp_gds.read_snp_gds(spark, p, major_ref=False)
    rows = {
        (r["variant_id"], r["sample_id"]): r["DS"]
        for r in back.calls.collect()
    }
    assert rows[(1, "s1")] == pytest.approx(1.5)
    assert rows[(1, "s4")] is None
    # out-of-[0,2] dosage (variant 3: 1.5 ok, variant 4: 2.0 ok) —
    # all stored values valid here; alleles grid is all-missing
    assert all(
        r["alleles"] == [None, None] for r in back.calls.take(5)
    )


def test_snp_order_transposed_read(spark, ds, tmp_path):
    """A snp.order (SNPs contiguous per sample) container decodes to the
    same dataset through the shuffle path."""
    from seqarray_spark.sources.gds_write import _encode_values
    from seqarray_spark.sources import snp_gds as sg

    p = str(tmp_path / "t.snp.gds")
    snp_gds.write_snp_gds(ds, p)
    f = GdsFile(p)
    codes = np.asarray(f.read_array("genotype")).reshape(4, 4)

    # re-emit the same container transposed with the snp.order attr
    from seqarray_spark.sources.gds_write import _Builder

    b = _Builder()
    root = b.new_id()
    entries = []
    entries.append((
        b.array_node("vlstr", (4,),
                     _encode_values("vlstr", ["s1", "s2", "s3", "s4"])),
        "sample.id", False))
    entries.append((
        b.array_node("int32", (4,), _encode_values("int32", [1, 2, 3, 4])),
        "snp.id", False))
    entries.append((
        b.array_node("int32", (4,),
                     _encode_values("int32", [100, 200, 50, 80])),
        "snp.position", False))
    entries.append((
        b.array_node("vlstr", (4,),
                     _encode_values("vlstr", ["1", "1", "2", "2"])),
        "snp.chromosome", False))
    entries.append((
        b.array_node("vlstr", (4,),
                     _encode_values("vlstr", ["A/G", "C/T", "G/A", "T/C,G"])),
        "snp.allele", False))
    entries.append((
        b.array_node("bit2", (4, 4),
                     _encode_values("bit2", codes.T.ravel()),
                     attrs={"snp.order": None}),
        "genotype", False))
    b.folder(root, entries, attrs={"FileFormat": "SNP_ARRAY"})
    p2 = str(tmp_path / "t2.snp.gds")
    b.emit(p2)

    a = snp_gds.read_snp_gds(spark, p, major_ref=True)
    bds = snp_gds.read_snp_gds(spark, p2, major_ref=True)
    ka = sorted(map(tuple, a.calls.select(
        "variant_id", "sample_id", "alleles").collect()))
    kb = sorted(map(tuple, bds.calls.select(
        "variant_id", "sample_id", "alleles").collect()))
    assert ka == kb


@pytest.mark.skipif(not os.path.exists(CEU), reason="no reference fixture")
def test_ceu_gds2snp_af_parity(spark, tmp_path):
    """gds2snp on the reference's own CEU container; the snp.gds read
    back (no flip) preserves each variant's REF allele frequency under
    the container's whole-call missing collapse."""
    from seqarray_spark.functions.variant import dosage_ref
    from seqarray_spark.sources.gds_spark import from_gds

    p = str(tmp_path / "ceu.snp.gds")
    snp_gds.gds2snp(spark, CEU, p)
    orig = from_gds(spark, CEU)

    def af(d):
        return {
            r["variant_id"]: (r["s"], r["n"])
            for r in d.calls.select(
                "variant_id", dosage_ref("alleles").alias("d")
            )
            .groupBy("variant_id")
            .agg(
                F.sum("d").alias("s"),
                F.count(F.col("d")).alias("n"),
            )
            .collect()
        }

    back = snp_gds.read_snp_gds(spark, p, major_ref=False)
    a0, a1 = af(orig), af(back)
    assert set(a0) == set(a1)
    assert a0 == a1


def _emit_snp_container(path, sample_ids, snp_ids, pos, chroms, alleles,
                        codes, *, transposed=False, rs_ids=None,
                        annots=None):
    """Hand-build a snp.gds container (SNP_ARRAY bit2) for adversarial
    read tests: optional snp.order transpose, snp.rs.id node, and typed
    sample.annot children."""
    from seqarray_spark.sources.gds_write import _Builder, _encode_values

    n_var, n_samp = len(snp_ids), len(sample_ids)
    b = _Builder()
    root = b.new_id()
    entries = [
        (b.array_node("vlstr", (n_samp,),
                      _encode_values("vlstr", list(sample_ids))),
         "sample.id", False),
        (b.array_node("int32", (n_var,),
                      _encode_values("int32", list(snp_ids))),
         "snp.id", False),
        (b.array_node("int32", (n_var,),
                      _encode_values("int32", list(pos))),
         "snp.position", False),
        (b.array_node("vlstr", (n_var,),
                      _encode_values("vlstr", list(chroms))),
         "snp.chromosome", False),
        (b.array_node("vlstr", (n_var,),
                      _encode_values("vlstr", list(alleles))),
         "snp.allele", False),
    ]
    if rs_ids is not None:
        entries.append((
            b.array_node("vlstr", (n_var,),
                         _encode_values("vlstr", list(rs_ids))),
            "snp.rs.id", False))
    m = np.asarray(codes)          # (n_var, n_samp)
    if transposed:
        entries.append((
            b.array_node("bit2", (n_samp, n_var),
                         _encode_values("bit2", m.T.ravel()),
                         attrs={"snp.order": None}),
            "genotype", False))
    else:
        entries.append((
            b.array_node("bit2", (n_var, n_samp),
                         _encode_values("bit2", m.ravel()),
                         attrs={"sample.order": None}),
            "genotype", False))
    if annots:
        kids = []
        for name, kind, vals in annots:
            kids.append((
                b.array_node(kind, (n_samp,), _encode_values(kind, vals)),
                name, False))
        aid = b.new_id()
        b.folder(aid, kids)
        entries.append((aid, "sample.annot", True))
    b.folder(root, entries, attrs={"FileFormat": "SNP_ARRAY"})
    b.emit(path)


def test_snp_order_nonsquare_variants_match_calls(spark, tmp_path):
    """ADVICE r6 (high): on a transposed snp.order file with
    n_samp != n_var, the major_ref flip decision must come from
    variant-axis data — ref/alt in `variants` has to agree with the
    recode applied in `calls`, and both must equal the sample.order
    read of the same matrix."""
    sample_ids = ["s1", "s2", "s3"]
    snp_ids = [1, 2, 3, 4, 5]
    pos = [100, 200, 300, 400, 500]
    chroms = ["1"] * 5
    alleles = ["A/G", "C/T", "G/A", "T/C", "A/C"]
    # rows = variants, cols = samples; codes = count of FIRST allele.
    # Variants 2 and 4 are minor-first (sum < n_valid) -> flip; the
    # pattern is asymmetric so a transposed mis-read changes the flags.
    codes = np.array([
        [2, 2, 1],   # sum 5 >= 3 -> keep A/G
        [0, 0, 1],   # sum 1 <  3 -> flip to T,C
        [2, 1, 2],   # keep
        [0, 1, 0],   # flip to C,T
        [3, 2, 2],   # missing + 2,2 -> sum 4 >= 2 -> keep
    ])
    p1 = str(tmp_path / "sq.snp.gds")
    p2 = str(tmp_path / "tr.snp.gds")
    _emit_snp_container(p1, sample_ids, snp_ids, pos, chroms, alleles, codes)
    _emit_snp_container(p2, sample_ids, snp_ids, pos, chroms, alleles, codes,
                        transposed=True)

    a = snp_gds.read_snp_gds(spark, p1, major_ref=True)
    t = snp_gds.read_snp_gds(spark, p2, major_ref=True)
    va = sorted(map(tuple, a.variants.select(
        "variant_id", "ref", "alt").collect()))
    vt = sorted(map(tuple, t.variants.select(
        "variant_id", "ref", "alt").collect()))
    assert va == vt
    assert [(v, r, list(a)) for v, r, a in va] == [
        (1, "A", ["G"]), (2, "T", ["C"]), (3, "G", ["A"]),
        (4, "C", ["T"]), (5, "A", ["C"]),
    ]
    ca = sorted(map(tuple, a.calls.select(
        "variant_id", "sample_id", "alleles").collect()))
    ct = sorted(map(tuple, t.calls.select(
        "variant_id", "sample_id", "alleles").collect()))
    assert ca == ct
    # and the recode itself (FC_SNP2GDS): unflipped g=2 -> (0,0);
    # flipped g maps to g copies of allele 1, so variant 2's g=0 -> (0,0)
    # (old minor allele is now ALT) and g=1 -> (0,1); code 3 -> missing
    d = {(v, s): list(al) for v, s, al in ca}
    assert d[(1, "s1")] == [0, 0]
    assert d[(2, "s1")] == [0, 0]
    assert d[(2, "s3")] == [0, 1]
    assert d[(3, "s2")] == [0, 1]
    assert d[(5, "s1")] == [None, None]


def test_blank_rs_id_stays_blank(spark, tmp_path):
    """ADVICE r6 (low): snp.rs.id is copied verbatim when the node
    exists — blank entries do NOT fall back to snp.id
    (reference seqSNP2GDS R/Conversion.R:644-652)."""
    p = str(tmp_path / "rs.snp.gds")
    _emit_snp_container(
        p, ["s1", "s2"], [7, 8, 9], [10, 20, 30], ["1"] * 3,
        ["A/G", "C/T", "G/A"], np.array([[0, 1], [1, 2], [2, 2]]),
        rs_ids=["rs7", "", "rs9"])
    d = snp_gds.read_snp_gds(spark, p, major_ref=False)
    ids = {r["variant_id"]: r["id"] for r in
           d.variants.select("variant_id", "id").collect()}
    assert ids == {7: "rs7", 8: "", 9: "rs9"}
    # no rs node at all -> synthesize from snp.id
    p2 = str(tmp_path / "nors.snp.gds")
    _emit_snp_container(
        p2, ["s1", "s2"], [7, 8], [10, 20], ["1"] * 2,
        ["A/G", "C/T"], np.array([[0, 1], [1, 2]]))
    d2 = snp_gds.read_snp_gds(spark, p2, major_ref=False)
    ids2 = {r["variant_id"]: r["id"] for r in
            d2.variants.select("variant_id", "id").collect()}
    assert ids2 == {7: "7", 8: "8"}


def test_numeric_sample_annotations(spark, tmp_path):
    """ADVICE r6 (medium): int/float sample.annot children load with
    their storage types preserved (the reference copies annotation
    nodes as-is) instead of crashing Spark's schema verifier."""
    p = str(tmp_path / "annot.snp.gds")
    _emit_snp_container(
        p, ["s1", "s2", "s3"], [1, 2], [10, 20], ["1"] * 2,
        ["A/G", "C/T"], np.array([[0, 1, 2], [1, 2, 0]]),
        annots=[
            ("age", "int32", [31, 42, 53]),
            ("weight", "float64", [60.5, 72.25, 81.0]),
            ("pop", "vlstr", ["CEU", "YRI", "CHB"]),
        ])
    d = snp_gds.read_snp_gds(spark, p, major_ref=False)
    schema = {f.name: f.dataType.simpleString() for f in d.samples.schema}
    assert schema["age"] == "bigint"
    assert schema["weight"] == "double"
    assert schema["pop"] == "string"
    rows = {r["sample_id"]: (r["age"], r["weight"], r["pop"])
            for r in d.samples.collect()}
    assert rows == {"s1": (31, 60.5, "CEU"), "s2": (42, 72.25, "YRI"),
                    "s3": (53, 81.0, "CHB")}
