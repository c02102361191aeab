"""GDS container reader: format parse + value equivalence against the
matching VCF (the same equivalence the reference validates in
inst/unitTests/test_asVCF.R:70-186), plus distributed from_gds parity
with read_vcf."""

import math
import os

import numpy as np
import pytest

from seqarray_spark.sources.gds import GdsFile, decode_values

EXT = "/root/reference/inst/extdata"
CEU = os.path.join(EXT, "CEU_Exon.gds")
KG = os.path.join(EXT, "1KG_phase1_release_v3_chr22.gds")
DOSE = os.path.join(EXT, "Imputed_dosages.gds")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CEU), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def ceu():
    return GdsFile(CEU)


def test_tree_layout(ceu):
    paths = set(ceu.ls())
    for p in (
        "/sample.id", "/variant.id", "/position", "/chromosome", "/allele",
        "/genotype/data", "/genotype/@data", "/phase/data",
        "/annotation/id", "/annotation/qual", "/annotation/filter",
        "/annotation/info/AC", "/annotation/format/DP/data",
        "/sample.annotation/family",
    ):
        assert p in paths, p
    n = ceu.node("genotype/data")
    assert n.kind == "bit2" and n.dims == (1348, 90, 2) and n.coder == "LZMA_ra"
    assert ceu.node("annotation/filter").attrs["R.levels"] == ["PASS", "q10"]
    assert ceu.node("annotation/info/AC").attrs["Number"] == "1"


def test_basic_arrays(ceu):
    sid = ceu.read_array("sample.id")
    assert len(sid) == 90 and sid[0] == "NA06984"
    vid = ceu.read_array("variant.id")
    assert list(vid) == list(range(1, 1349))
    pos = ceu.read_array("position")
    assert pos[0] == 1105366
    assert ceu.read_array("chromosome")[0] == "1"
    assert ceu.read_array("allele")[0] == "T,C"
    assert np.isnan(ceu.read_array("annotation/qual")).all()


@pytest.fixture(scope="module")
def vcf_rows():
    import gzip

    rows, samples = [], None
    with gzip.open(os.path.join(EXT, "CEU_Exon.vcf.gz"), "rt") as fh:
        for line in fh:
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
            elif not line.startswith("#"):
                rows.append(line.rstrip("\n").split("\t"))
    return samples, rows


def test_genotypes_match_vcf(ceu, vcf_rows):
    samples, rows = vcf_rows
    gm = ceu.read_array("genotype/data")[: 1348 * 90 * 2].reshape(1348, 90, 2)
    dpm = ceu.read_array("annotation/format/DP/data").reshape(1348, 90)
    for i in (0, 1, 5, 100, 677, 1000, 1347):
        for j, tok in enumerate(rows[i][9:]):
            gt, dptok = tok.split(":")
            got = [None if v == 3 else int(v) for v in gm[i, j]]
            exp = [None if x == "." else int(x) for x in gt.split("/")]
            assert got == exp, (i, j)
            assert dpm[i, j] == int(dptok)


def test_random_access_slice(ceu):
    node = ceu.node("genotype/data")
    full = ceu.read_array("genotype/data")
    row_bytes = 90 * 2 * 2 // 8
    sl = decode_values(node, ceu.read_node_bytes(node, 500 * row_bytes, 600 * row_bytes))
    assert (sl == full[500 * 90 * 2:600 * 90 * 2]).all()


def test_1kg_and_dosage_fixtures():
    kg = GdsFile(KG)
    assert kg.node("variant.id").dims == (19773,)
    assert len(kg.read_array("sample.id")) == 1092
    ph = kg.read_array("phase/data")
    assert ph[: 19773 * 1092].all()  # 1KG is fully phased
    dose = GdsFile(DOSE)
    ds = dose.read_array("annotation/format/DS/data")
    assert sorted(set(np.round(ds, 6).tolist())) == [0.0, 1.0, 2.0]
    assert dose.node("annotation/format/DS/data").params["scale"] == pytest.approx(1 / 127)


# ---------------------------------------------------------------------------
# distributed reader == VCF reader (reference: test_asVCF.R equivalence)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gds_ds(spark):
    from seqarray_spark.sources.gds_spark import from_gds

    return from_gds(spark, CEU, block_variants=500)


@pytest.fixture(scope="module")
def vcf_ds(spark):
    from seqarray_spark.sources import vcf as vcfmod

    return vcfmod.read_vcf(spark, os.path.join(EXT, "CEU_Exon.vcf.gz"))


def test_from_gds_variants_match_read_vcf(gds_ds, vcf_ds):
    gv = {r["variant_id"]: r for r in gds_ds.variants.collect()}
    vv = {r["variant_id"]: r for r in vcf_ds.variants.collect()}
    assert set(gv) == set(vv) and len(gv) == 1348
    for k in gv:
        a, b = gv[k], vv[k]
        assert (a["chromosome"], a["position"], a["ref"], a["alt"]) == (
            b["chromosome"], b["position"], b["ref"], b["alt"]
        ), k
        assert a["id"] == b["id"] and a["filter"] == b["filter"], k
        assert (a["qual"] is None) == (b["qual"] is None), k
        ia, ib = a["info"], b["info"]
        assert ia["AC"] == ib["AC"] and ia["AN"] == ib["AN"], k
        assert ia["HM2"] == ib["HM2"] and ia["HM3"] == ib["HM3"], k
        assert (ia["AA"] or []) == (ib["AA"] or []), k
        assert (ia["BN"] or []) == (ib["BN"] or []), k
        assert ia["OR"] == ib["OR"] and ia["GP"] == ib["GP"], k


def test_from_gds_calls_match_read_vcf(gds_ds, vcf_ds):
    gc = {(r["variant_id"], r["sample_id"]): r for r in gds_ds.calls.collect()}
    vc = {(r["variant_id"], r["sample_id"]): r for r in vcf_ds.calls.collect()}
    assert set(gc) == set(vc) and len(gc) == 1348 * 90
    for k in gc:
        a, b = gc[k], vc[k]
        assert a["alleles"] == b["alleles"], k
        assert a["phased"] == b["phased"], k
        assert a["DP"] == b["DP"], k


def test_from_gds_samples(gds_ds):
    rows = {r["sample_id"]: r["family"] for r in gds_ds.samples.collect()}
    assert len(rows) == 90 and rows["NA06984"] == "1328"


def test_from_gds_dosage_file(spark):
    """Imputed_dosages.gds: packedreal8 DS decodes to exact dosages and
    feeds the dosage aggregate path end-to-end."""
    from seqarray_spark.operators.aggregates import af_ac_missing_dosage
    from seqarray_spark.sources.gds_spark import from_gds

    from pyspark.sql import functions as F

    ds = from_gds(spark, DOSE, block_variants=40)
    # DS is declared Number=A -> array column; biallelic => one element
    dcalls = ds.calls.select(
        "variant_id", "sample_id", F.element_at("DS", 1).alias("DS")
    )
    vals = {r["DS"] for r in dcalls.select("DS").distinct().collect()}
    assert vals <= {0.0, 1.0, 2.0}
    out = af_ac_missing_dosage(dcalls).collect()
    assert len(out) == 100
    assert all(0.0 <= r["af_alt"] <= 1.0 for r in out)


def test_from_gds_1kg_phased(spark):
    from seqarray_spark.sources.gds_spark import from_gds

    from pyspark.sql import functions as F

    ds = from_gds(spark, KG, block_variants=5000)
    sub = ds.calls.filter(F.col("variant_id") <= 3).collect()
    assert len(sub) == 3 * 1092
    assert all(r["phased"] == [True] for r in sub)
    assert all(r["alleles"][0] is not None for r in sub)


def test_from_gds_aggregate(gds_ds, spark):
    """End-to-end: allele frequency over the GDS-backed calls frame."""
    from seqarray_spark.operators.aggregates import af_ac_missing

    out = {r["variant_id"]: r for r in af_ac_missing(gds_ds.calls).collect()}
    # variant 1: AC=4 ALT / AN=114 -> REF af = 110/114
    r = out[1]
    assert r["an"] == 114 and r["ac"] == 110
    assert r["af"] == pytest.approx(110 / 114)


def test_vl_byte_bounds(ceu):
    """The driver-built VL byte index points exactly where a from-zero
    varint walk lands, so block tasks can seek instead of rewalking."""
    from seqarray_spark.sources.gds_spark import _vl_byte_bounds, _vl_slice

    node = ceu.node("allele")
    n = int(node.dims[0])
    bounds = list(range(0, n, 113)) + [n]
    offs = _vl_byte_bounds(ceu, node, bounds)
    full = ceu.read_array("allele")
    raw_len = len(ceu.read_node_bytes(node))
    assert offs[0] == 0 and offs[-1] == raw_len
    assert all(offs[i] < offs[i + 1] for i in range(len(offs) - 1))
    # ranged decode from each boundary reproduces the from-zero walk
    for i in (0, 3, len(bounds) - 2):
        e0, e1 = bounds[i], bounds[i + 1]
        got = _vl_slice(ceu, node, e0, e1, (offs[i], offs[i + 1], e0))
        assert got == full[e0:e1]


def test_vl_index_fast_path_engages(ceu):
    """Regression: the VL byte index must be keyed by the nodes' canonical
    paths (node.path, leading slash) — a bare-path key means every block
    kernel's (vl or {}).get(node.path) lookup misses and the task
    silently falls back to the O(N^2/B) from-zero varint walk."""
    from seqarray_spark.sources.gds_spark import (
        _build_vl_index, _node_slice, _row_vl)

    n = int(ceu.node("variant.id").dims[0])
    vaxis = np.array([0, 500, 1000, n], dtype=np.int64)
    vlpaths, vl_elem, vl_bytes = _build_vl_index(ceu, vaxis, [], [], 90)
    assert vlpaths, "no VL nodes registered"
    for p in vlpaths:
        assert p.startswith("/") and ceu.node(p).path == p, p
    # kernel-side lookup must hit for every registered VL node
    row = {"vb0": [int(vl_bytes[p][1]) for p in vlpaths],
           "vb1": [int(vl_bytes[p][2]) for p in vlpaths],
           "ve0": [int(vl_elem[p][1]) for p in vlpaths]}
    vl = _row_vl(row, vlpaths)
    allele = ceu.node("allele")
    assert vl.get(allele.path) is not None, "fast path not engaged"
    got = _node_slice(ceu, allele, 500, 1000, vl)
    assert got == ceu.read_array("allele")[500:1000]


def test_from_gds_many_blocks_parity(spark):
    """Tiny blocks (many boundary seeks through the VL index) decode the
    same variants frame as one big block."""
    from seqarray_spark.sources.gds_spark import from_gds

    small = from_gds(spark, CEU, block_variants=97).variants \
        .select("variant_id", "chromosome", "position", "ref", "alt") \
        .orderBy("variant_id").collect()
    big = from_gds(spark, CEU, block_variants=100000).variants \
        .select("variant_id", "chromosome", "position", "ref", "alt") \
        .orderBy("variant_id").collect()
    assert small == big


def test_from_gds_chromosome_pruned_read(spark):
    """from_gds(chromosomes=...) — the reference's chrom-run-index
    pruning (src/Index.cpp:382+) on the container scan: result equals
    the full read filtered after the fact, for single and multiple
    chromosomes, on the reference's own CEU fixture."""
    from pyspark.sql import functions as F

    from seqarray_spark.sources.gds_spark import from_gds

    p = "/root/reference/inst/extdata/CEU_Exon.gds"
    full = from_gds(spark, p, block_variants=64)
    for chroms in (["22"], ["1", "22"], ["nope"]):
        pruned = from_gds(spark, p, block_variants=64, chromosomes=chroms)
        want_v = sorted(
            r["variant_id"]
            for r in full.variants.filter(
                F.col("chromosome").isin(chroms)
            ).collect()
        )
        got_v = sorted(r["variant_id"] for r in pruned.variants.collect())
        assert got_v == want_v, chroms
        want_c = full.calls.join(
            full.variants.filter(F.col("chromosome").isin(chroms))
            .select("variant_id"),
            "variant_id", "left_semi",
        ).count()
        assert pruned.calls.count() == want_c, chroms


def test_from_gds_bp_range_pruned_read(spark):
    """from_gds(bp_range=...) — zone-map position pruning on the
    container scan: result equals the full read filtered after the
    fact, for two-sided / one-sided / empty windows, with and without a
    chromosome restriction, on the reference's own CEU fixture."""
    from pyspark.sql import functions as F

    from seqarray_spark.sources.gds_spark import from_gds

    p = "/root/reference/inst/extdata/CEU_Exon.gds"
    full = from_gds(spark, p, block_variants=64)
    cases = [
        (["1"], (100_000_000, 200_000_000)),
        (None, (50_000_000, 60_000_000)),
        (["22"], (None, 30_000_000)),
        (["22"], (30_000_000, None)),
        (["1"], (1, 2)),  # empty window
    ]
    for chroms, win in cases:
        pruned = from_gds(
            spark, p, block_variants=64, chromosomes=chroms, bp_range=win
        )
        cond = F.lit(True)
        if chroms is not None:
            cond = cond & F.col("chromosome").isin(chroms)
        if win[0] is not None:
            cond = cond & (F.col("position") >= win[0])
        if win[1] is not None:
            cond = cond & (F.col("position") <= win[1])
        want_v = sorted(
            r["variant_id"] for r in full.variants.filter(cond).collect()
        )
        got_v = sorted(r["variant_id"] for r in pruned.variants.collect())
        assert got_v == want_v, (chroms, win)
        want_c = full.calls.join(
            full.variants.filter(cond).select("variant_id"),
            "variant_id", "left_semi",
        ).count()
        assert pruned.calls.count() == want_c, (chroms, win)


def test_gds_chrom_pos_stats_match_driver(spark):
    """The distributed per-block run/zone-map scan equals a driver
    recomputation from the raw chromosome+position columns."""
    import numpy as np

    from seqarray_spark.sources.gds import GdsFile
    from seqarray_spark.sources.gds_spark import (_build_vl_index,
                                                  _gds_chrom_pos_stats)

    p = "/root/reference/inst/extdata/CEU_Exon.gds"
    f = GdsFile(p)
    ch = [str(c) for c in f.read_array("chromosome")]
    pos = list(f.read_array("position"))
    n_var = len(ch)
    bsize = 100
    expect = []
    for s in range(0, n_var, bsize):
        e = min(s + bsize, n_var)
        i = s
        while i < e:
            j = i
            while j < e and ch[j] == ch[i]:
                j += 1
            expect.append(
                (ch[i], i, j, min(pos[i:j]), max(pos[i:j]))
            )
            i = j

    bstarts = np.arange(0, n_var, bsize, dtype=np.int64)
    vaxis = np.append(bstarts, n_var)
    bc = spark.sparkContext.broadcast(f)
    vlpaths, vl_elem, vl_bytes = _build_vl_index(
        f, vaxis, [], [], 0, spark=spark, bc=bc
    )
    blocks = []
    for b, s in enumerate(bstarts):
        s = int(s)
        e = int(min(s + bsize, n_var))
        blocks.append((
            s, e, 0, 0, [], [], [], [], 0, 0, 0, 0, 0, 0,
            [int(vl_bytes[q][b]) for q in vlpaths],
            [int(vl_bytes[q][b + 1]) for q in vlpaths],
            [int(vl_elem[q][b]) for q in vlpaths],
        ))
    bschema = (
        "start long, end long, p0 long, p1 long, "
        "i0 array<long>, i1 array<long>, f0 array<long>, f1 array<long>, "
        "g0 long, g1 long, go long, q0 long, q1 long, qo long, "
        "vb0 array<long>, vb1 array<long>, ve0 array<long>"
    )
    rows = _gds_chrom_pos_stats(
        spark, bc, blocks, bschema, vlpaths, 8, with_pos=True
    )
    got = [(r["chrom"], r["rs"], r["re"], r["pmin"], r["pmax"]) for r in rows]
    assert got == expect


def test_gds_chrom_runs_match_column_rle(spark):
    """The distributed chromosome-run scan equals a driver RLE of the
    raw chromosome column (runs partition the variant axis exactly)."""
    import numpy as np

    from seqarray_spark.sources.gds import GdsFile
    from seqarray_spark.sources.gds_spark import (_build_vl_index,
                                                  _gds_chrom_runs, from_gds)

    p = "/root/reference/inst/extdata/CEU_Exon.gds"
    f = GdsFile(p)
    ch = list(f.read_array("chromosome"))
    expect, prev = [], None
    for i, c in enumerate(ch):
        if c != prev:
            expect.append([str(c), i, i + 1])
            prev = c
        else:
            expect[-1][2] += 1
    expect = [tuple(e) for e in expect]

    n_var = len(ch)
    bstarts = np.arange(0, n_var, 100, dtype=np.int64)
    vaxis = np.append(bstarts, n_var)
    bc = spark.sparkContext.broadcast(f)
    vlpaths, vl_elem, vl_bytes = _build_vl_index(
        f, vaxis, [], [], 0, spark=spark, bc=bc
    )
    blocks = []
    for b, s in enumerate(bstarts):
        s = int(s)
        e = int(min(s + 100, n_var))
        blocks.append((
            s, e, 0, 0, [], [], [], [], 0, 0, 0, 0, 0, 0,
            [int(vl_bytes[q][b]) for q in vlpaths],
            [int(vl_bytes[q][b + 1]) for q in vlpaths],
            [int(vl_elem[q][b]) for q in vlpaths],
        ))
    bschema = (
        "start long, end long, p0 long, p1 long, "
        "i0 array<long>, i1 array<long>, f0 array<long>, f1 array<long>, "
        "g0 long, g1 long, go long, q0 long, q1 long, qo long, "
        "vb0 array<long>, vb1 array<long>, ve0 array<long>"
    )
    runs = _gds_chrom_runs(spark, bc, blocks, bschema, vlpaths, 8)
    assert runs == expect
    assert sum(e - s for _, s, e in runs) == n_var


def test_from_gds_sample_pruned_read(spark, tmp_path):
    """from_gds(samples=...) — the sample-axis scan prune
    (seqSetFilter(sample.id=) pushed into the kernels): result equals
    the full read filtered to the same samples, on the CEU fixture
    (genotype+phase), on a FORMAT-carrying dosage fixture, and on a
    mixed-ploidy container exercising the extras remap; unknown ids
    raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from seqarray_spark.sources.gds_spark import from_gds

    p = "/root/reference/inst/extdata/CEU_Exon.gds"
    full = from_gds(spark, p, block_variants=64)
    ids = [r["sample_id"] for r in full.samples.orderBy("sample_ordinal")
           .limit(7).collect()]
    pick = [ids[0], ids[3], ids[6]]
    pruned = from_gds(spark, p, block_variants=64, samples=pick)
    assert sorted(
        r["sample_id"] for r in pruned.samples.collect()
    ) == sorted(pick)

    def key(df):
        return {
            (r["variant_id"], r["sample_id"]):
                (tuple(r["alleles"] or []), tuple(r["phased"] or []))
            for r in df.collect()
        }

    want = key(full.calls.filter(F.col("sample_id").isin(pick)))
    got = key(pruned.calls)
    assert got == want and len(got) > 0

    # FORMAT fields subset (dosage fixture)
    q = "/root/reference/inst/extdata/Imputed_dosages.gds"
    dfull = from_gds(spark, q, block_variants=40)
    dids = sorted(r["sample_id"] for r in dfull.samples.collect())[:3]
    dpruned = from_gds(spark, q, block_variants=40, samples=dids)
    wantd = {
        (r["variant_id"], r["sample_id"]): r["DS"]
        for r in dfull.calls.filter(F.col("sample_id").isin(dids)).collect()
    }
    gotd = {
        (r["variant_id"], r["sample_id"]): r["DS"]
        for r in dpruned.calls.collect()
    }
    assert gotd == wantd and len(gotd) > 0

    with _pytest.raises(ValueError, match="unknown sample"):
        from_gds(spark, p, samples=["NOPE1"])


def test_from_gds_sample_pruned_mixed_ploidy_extras(spark, tmp_path):
    """Sample pruning remaps the genotype/phase extras side-table
    correctly: entries of unselected samples are skipped (with the
    value cursor still advancing), selected ones land on the remapped
    call slot — pinned against the full read on a triploid/haploid
    container."""
    from pyspark.sql import functions as F

    from seqarray_spark.sources import vcf as vcfmod
    from seqarray_spark.sources.gds_spark import from_gds

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
    out = str(tmp_path / "mixed.gds")
    vcfmod.read_vcf(spark, str(src), assign_ids="order").to_gds(out)

    full = from_gds(spark, out)
    for pick in (["S1", "S3"], ["S2"], ["S3"]):
        pruned = from_gds(spark, out, samples=pick)
        want = {
            (r["variant_id"], r["sample_id"]):
                (tuple(r["alleles"] or []), tuple(r["phased"] or []))
            for r in full.calls.filter(
                F.col("sample_id").isin(pick)
            ).collect()
        }
        got = {
            (r["variant_id"], r["sample_id"]):
                (tuple(r["alleles"] or []), tuple(r["phased"] or []))
            for r in pruned.calls.collect()
        }
        assert got == want, pick
