"""Golden-value + randomized-equivalence tests on a CEU_Exon-shaped
synthetic fixture (90 samples x ~400 variants, diploid, ~35% missing) —
the reference's core test strategy (SURVEY.md §5; reference:
inst/unitTests/test_func.R:45-117, golden file data/Valid.RData).

Expected values are computed independently with numpy over the generator's
matrices; the engine must match them exactly, and must match itself across
partition counts (the reference's serial == parallel loop)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

N_SAMP = 90
N_VAR = 400  # CEU_Exon is 1348; 400 keeps the suite fast with same shape


def _gen(seed=42):
    rng = random.Random(seed)
    variants, geno = [], np.empty((N_VAR, N_SAMP, 2), dtype=object)
    for v in range(N_VAR):
        chrom = str(rng.randint(1, 22))
        pos = rng.randint(1, 10_000_000)
        n_alt = 1 if rng.random() < 0.9 else rng.randint(2, 3)
        variants.append((v + 1, chrom, pos, n_alt))
        for s in range(N_SAMP):
            if rng.random() < 0.35:
                geno[v, s] = (None, None)
            else:
                geno[v, s] = (rng.randint(0, n_alt), rng.randint(0, n_alt))
    return variants, geno


@pytest.fixture(scope="module")
def fixture(spark):
    variants, geno = _gen()
    vrows = [
        (vid, chrom, pos, "ACGT"[vid % 4], ["ACGT"[(vid + k) % 4] for k in range(1, n_alt + 1)])
        for vid, chrom, pos, n_alt in variants
    ]
    v = spark.createDataFrame(
        vrows, "variant_id long, chromosome string, position int, ref string, alt array<string>"
    )
    crows = [
        (vid, f"NA{s:05d}", list(geno[vid - 1, s]))
        for vid, _, _, _ in variants
        for s in range(N_SAMP)
    ]
    c = spark.createDataFrame(crows, "variant_id long, sample_id string, alleles array<int>")
    return v, c, variants, geno


def _np_expected(variants, geno):
    af, miss_v, mac = {}, {}, {}
    miss_s = np.zeros(N_SAMP)
    for vid, _, _, _ in variants:
        g = geno[vid - 1]
        flat = [a for s in range(N_SAMP) for a in g[s] if a is not None]
        nonmiss = len(flat)
        refc = sum(1 for a in flat if a == 0)
        af[vid] = refc / nonmiss if nonmiss else None
        mac[vid] = min(refc, nonmiss - refc)
        miss_v[vid] = sum(1 for s in range(N_SAMP) if g[s][0] is None) / N_SAMP
        for s in range(N_SAMP):
            miss_s[s] += g[s][0] is None
    return af, mac, miss_v, miss_s / len(variants)


def test_golden_aggregates(spark, fixture):
    from seqarray_spark.operators import aggregates as agg

    v, c, variants, geno = fixture
    af_e, mac_e, missv_e, misss_e = _np_expected(variants, geno)

    got = {r["variant_id"]: r for r in agg.af_ac_missing(c).collect()}
    for vid, _, _, _ in variants:
        assert got[vid]["af"] == pytest.approx(af_e[vid]), vid
        assert got[vid]["mac"] == mac_e[vid], vid
        assert got[vid]["missing_rate"] == pytest.approx(missv_e[vid]), vid

    ms = {r["sample_id"]: r["missing_rate"] for r in agg.missing_rate(c, per="sample").collect()}
    for s in range(N_SAMP):
        assert ms[f"NA{s:05d}"] == pytest.approx(misss_e[s])


def test_serial_equals_parallel(spark, fixture):
    """Reference loops parallel degrees 1..2 and requires bit-equality
    (test_func.R:58-90); here: partition counts 1 vs 16."""
    from seqarray_spark.operators import aggregates as agg

    _, c, _, _ = fixture
    a = {r["variant_id"]: r for r in agg.af_ac_missing(c.repartition(1)).collect()}
    b = {r["variant_id"]: r for r in agg.af_ac_missing(c.repartition(16)).collect()}
    assert set(a) == set(b)
    for k in a:
        assert tuple(a[k]) == tuple(b[k]), k


def test_random_subset_equivalence(spark, fixture):
    """10 random subsets: filtered aggregate == slice of full aggregate
    (test_func.R:92-117 pattern)."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators import aggregates as agg

    v, c, variants, _ = fixture
    samples = spark.createDataFrame(
        [(f"NA{s:05d}",) for s in range(N_SAMP)], "sample_id string"
    )
    full = {r["variant_id"]: r["af"] for r in agg.allele_freq(c).collect()}
    rng = random.Random(7)
    ds = SeqDataset(v, c, samples)
    for _ in range(10):
        ids = rng.sample([x[0] for x in variants], 40)
        ds.reset_filter()
        ds.set_filter_variant_id(ids)
        sub = {r["variant_id"]: r["af"] for r in agg.allele_freq(ds.calls).collect()}
        assert set(sub) == set(ids)
        for k, val in sub.items():
            assert val == pytest.approx(full[k])


def test_vcf_roundtrip_of_fixture(spark, fixture, tmp_path):
    """Fixture -> VCF -> engine: AF identical (the reference's asVCF
    interop oracle, test_asVCF.R:70-186)."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators.aggregates import allele_freq
    from seqarray_spark.sources import vcf as vcfmod

    v, c, _, _ = fixture
    samples = spark.createDataFrame(
        [(f"NA{s:05d}",) for s in range(N_SAMP)], "sample_id string"
    )
    ds = SeqDataset(
        v.withColumn("id", F.lit(None).cast("string"))
        .withColumn("qual", F.lit(None).cast("double"))
        .withColumn("filter", F.lit("PASS")),
        c.withColumn("phased", F.array(F.lit(False))),
        samples,
    )
    out = str(tmp_path / "fx.vcf")
    vcfmod.write_vcf(ds, out)
    import glob

    single = str(tmp_path / "single.vcf")
    with open(single, "w") as fh:
        fh.write(open(f"{out}/_header.vcf").read())
        for part in sorted(glob.glob(f"{out}/part-*")):
            fh.write(open(part).read())
    ds2 = vcfmod.read_vcf(spark, single)

    key = ["chromosome", "position", "ref"]
    a = (
        allele_freq(ds.calls)
        .join(ds.variants, "variant_id")
        .select(*key, "af")
        .collect()
    )
    b = (
        allele_freq(ds2.calls)
        .join(ds2.variants, "variant_id")
        .select(*key, "af")
        .collect()
    )
    asort = sorted([tuple(r) for r in a])
    bsort = sorted([tuple(r) for r in b])
    assert len(asort) == len(bsort)
    for x, y in zip(asort, bsort):
        assert x[:3] == y[:3] and x[3] == pytest.approx(y[3])
