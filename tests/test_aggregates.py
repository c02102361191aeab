"""Aggregation suite vs hand-computed values on a tiny in-memory dataset —
the golden-value pattern of the reference's test suite
(reference: inst/unitTests/test_func.R:45-90)."""

import pytest
from pyspark.sql import Row

from seqarray_spark.operators import aggregates as agg


@pytest.fixture(scope="module")
def tiny_calls(spark):
    # variant 1: alleles (0,1),(0,0),(None,None) -> af_ref 3/4, miss 1/3
    # variant 2: (1,1),(0,1),(1,None)            -> af_ref 1/5... a partial
    rows = [
        Row(variant_id=1, sample_id="a", alleles=[0, 1]),
        Row(variant_id=1, sample_id="b", alleles=[0, 0]),
        Row(variant_id=1, sample_id="c", alleles=[None, None]),
        Row(variant_id=2, sample_id="a", alleles=[1, 1]),
        Row(variant_id=2, sample_id="b", alleles=[0, 1]),
        Row(variant_id=2, sample_id="c", alleles=[1, None]),
    ]
    return spark.createDataFrame(rows, "variant_id int, sample_id string, alleles array<int>")


def _by_id(df, key="variant_id"):
    return {r[key]: r for r in df.collect()}


def test_allele_freq_ref(tiny_calls):
    out = _by_id(agg.allele_freq(tiny_calls, ref_allele=0))
    assert out[1]["af"] == pytest.approx(3 / 4)
    assert out[2]["af"] == pytest.approx(1 / 5)


def test_allele_freq_minor(tiny_calls):
    out = _by_id(agg.allele_freq(tiny_calls, ref_allele=0, minor=True))
    assert out[1]["maf"] == pytest.approx(1 / 4)
    assert out[2]["maf"] == pytest.approx(1 / 5)


def test_allele_count(tiny_calls):
    out = _by_id(agg.allele_count(tiny_calls, ref_allele=0, minor=True))
    assert (out[1]["ac"], out[1]["an"], out[1]["mac"]) == (3, 4, 1)
    assert (out[2]["ac"], out[2]["an"], out[2]["mac"]) == (1, 5, 1)


def test_missing_rate(tiny_calls):
    """SLOT-level missing like the reference (FC_Missing_* divide
    missing allele slots by ploidy*N slots): variant 1 has 2 of 6 slots
    missing, variant 2 has 1 of 6 — a half-missing call counts 0.5."""
    v = _by_id(agg.missing_rate(tiny_calls, per="variant"))
    assert v[1]["missing_rate"] == pytest.approx(2 / 6)
    assert v[2]["missing_rate"] == pytest.approx(1 / 6)
    s = _by_id(agg.missing_rate(tiny_calls, per="sample"), key="sample_id")
    assert s["a"]["missing_rate"] == 0.0
    assert s["c"]["missing_rate"] == pytest.approx(3 / 4)  # (2 + 1) of 4 slots


def test_missing_both(tiny_calls):
    v, s = agg.missing_rate(tiny_calls, per="both")
    assert v.count() == 2 and s.count() == 3


def test_af_ac_missing_fused(tiny_calls):
    out = _by_id(agg.af_ac_missing(tiny_calls))
    r = out[2]
    assert r["af"] == pytest.approx(1 / 5)
    assert (r["ac"], r["an"], r["mac"], r["ns"]) == (1, 5, 1, 2)
    assert r["missing_rate"] == pytest.approx(1 / 6)  # slot-level
    assert r["maf"] == pytest.approx(1 / 5)


def test_all_missing_variant_is_na(spark):
    """All slots missing -> ac/mac NA, not 0 (reference FC_AC_Ref:
    '(n < N) ? m : NA_INTEGER', src/Methods.cpp:613-627)."""
    from pyspark.sql import Row

    calls = spark.createDataFrame(
        [Row(variant_id=9, sample_id="a", alleles=[None, None])],
        "variant_id int, sample_id string, alleles array<int>",
    )
    r = agg.allele_count(calls, ref_allele=0, minor=True).first()
    assert r["an"] == 0 and r["ac"] is None and r["mac"] is None
    f = agg.af_ac_missing(calls).first()
    assert f["ac"] is None and f["af"] is None and f["mac"] is None
    assert f["missing_rate"] == 1.0


def test_per_allele_table(tiny_calls):
    rows = {(r["variant_id"], r["allele"]): r for r in agg.per_allele_table(tiny_calls).collect()}
    assert rows[(1, 0)]["count"] == 3 and rows[(1, 0)]["total"] == 4
    assert rows[(2, 1)]["count"] == 4 and rows[(2, 1)]["total"] == 5


def test_digest_is_order_insensitive(spark, tiny_calls):
    d1 = agg.digest(tiny_calls, ["variant_id", "sample_id"]).first()["digest"]
    d2 = agg.digest(tiny_calls.orderBy("sample_id"), ["variant_id", "sample_id"]).first()["digest"]
    assert d1 == d2


def test_digest_xor_matches_across_partitionings(spark, tiny_calls):
    a = agg.digest_xor(tiny_calls, ["variant_id", "sample_id"]).first()["digest"]
    b = agg.digest_xor(tiny_calls.repartition(7), ["variant_id", "sample_id"]).first()["digest"]
    assert a == b


def test_digest_ordered_reference_parity(spark):
    """ordered=True reproduces the naive in-file-order md5 fold
    (reference: seqDigest streams md5 in storage order,
    R/Summary.R:781-820) — and is partitioning-invariant."""
    import hashlib
    import os

    from seqarray_spark.sources import vcf as vcfmod

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "toy.vcf")
    ds = vcfmod.read_vcf(spark, fixture, assign_ids="order")
    v = ds.variants.select("variant_id", "position", "ref")
    got = agg.digest(
        v, ["position", "ref"], ordered=True, order_col="variant_id"
    ).first()["digest"]
    rows = sorted(v.collect(), key=lambda r: r["variant_id"])
    naive = hashlib.md5(
        ",".join(f"{r['position']}|{r['ref']}" for r in rows).encode()
    ).hexdigest()
    assert got == naive
    # invariant under physical layout
    got2 = agg.digest(
        v.repartition(7), ["position", "ref"], ordered=True, order_col="variant_id"
    ).first()["digest"]
    assert got2 == naive


def test_seq_check_full(spark):
    """seq_check validates referential integrity, allele bounds and phase
    lengths (reference: seqCheck R/Summary.R:928-1020)."""
    import os

    from seqarray_spark.sources import vcf as vcfmod

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "toy.vcf")
    ds = vcfmod.read_vcf(spark, fixture, assign_ids="order")
    rep = agg.seq_check(ds)
    # toy.vcf deliberately carries one malformed call: './1' against
    # ALT='.' (variant 2:140) references allele 1 of a monomorphic site
    assert rep["bad_allele_indexes"] == 1 and not rep["ok"]
    assert rep["n_variants"] == 7 and rep["n_calls"] == 21
    assert rep["variant_ids_unique"] and rep["orphan_call_variants"] == 0

    # drop the malformed variant -> fully green
    from seqarray_spark.dataset import SeqDataset as _SD

    ok_ds = _SD(
        ds.variants.filter("variant_id != 5"),
        ds._base_calls.filter("variant_id != 5"),
        ds.samples,
        ploidy=ds.ploidy,
    )
    assert agg.seq_check(ok_ds)["ok"]

    # corrupt: a call referencing a nonexistent variant, and an allele
    # index beyond the variant's allele count
    from pyspark.sql import functions as F

    bad_calls = ds._base_calls.unionByName(
        ds._base_calls.limit(1).withColumn("variant_id", F.lit(999))
    ).withColumn(
        "alleles",
        F.when(
            F.col("variant_id") == 1, F.array(F.lit(7).cast("smallint"))
        ).otherwise(F.col("alleles")),
    )
    from seqarray_spark.dataset import SeqDataset

    bad = SeqDataset(ds.variants, bad_calls, ds.samples, ploidy=ds.ploidy)
    rep2 = agg.seq_check(bad)
    assert not rep2["ok"]
    assert rep2["orphan_call_variants"] == 1
    assert rep2["bad_allele_indexes"] >= 3
    assert rep2["bad_phase_lengths"] >= 3


@pytest.fixture(scope="module")
def tiny_variants(spark):
    # variant 1: A / [C]      -> 'A' at index 0, 'G' absent
    # variant 2: C / [A, G]   -> 'A' at index 1, 'G' at index 2
    # variant 3: T / [C]      -> 'A' absent
    rows = [
        Row(variant_id=1, ref="A", alt=["C"]),
        Row(variant_id=2, ref="C", alt=["A", "G"]),
        Row(variant_id=3, ref="T", alt=["C"]),
    ]
    return spark.createDataFrame(
        rows, "variant_id int, ref string, alt array<string>"
    )


@pytest.fixture(scope="module")
def tiny_calls3(spark, tiny_calls):
    # tiny_calls + variant 3 with ALL slots missing (FC_* NA guard path)
    extra = spark.createDataFrame(
        [Row(variant_id=3, sample_id="a", alleles=[None, None])],
        "variant_id int, sample_id string, alleles array<int>",
    )
    return tiny_calls.unionByName(extra)


def test_allele_freq_at_character(tiny_calls3, tiny_variants):
    """seqAlleleFreq(ref.allele=<character>): named-allele lookup in the
    REF,ALT list (FC_AF_Allele src/Methods.cpp:538-560). Variant 1: 'A'
    is index 0 -> 3/4; variant 2: 'A' is index 1 -> 4/5; variant 3: 'A'
    absent -> NULL (A = -1 -> NaN in the reference)."""
    out = _by_id(agg.allele_freq_at(tiny_calls3, tiny_variants, "A"))
    assert out[1]["af"] == pytest.approx(3 / 4)
    assert out[2]["af"] == pytest.approx(4 / 5)
    assert out[3]["af"] is None


def test_allele_freq_at_all_missing_is_null(spark, tiny_variants):
    """Allele present but every slot missing -> NULL ('n > 0' guard)."""
    calls = spark.createDataFrame(
        [Row(variant_id=1, sample_id="a", alleles=[None, None])],
        "variant_id int, sample_id string, alleles array<int>",
    )
    out = _by_id(agg.allele_freq_at(calls, tiny_variants, "A"))
    assert out[1]["af"] is None


def test_allele_freq_at_minor_fold(tiny_calls3, tiny_variants):
    """minor=True folds p > 0.5 to 1-p (FC_AF_Allele 'if (AFreq_Minor &&
    p>0.5) p = 1 - p')."""
    out = _by_id(agg.allele_freq_at(tiny_calls3, tiny_variants, "A", minor=True))
    assert out[1]["af"] == pytest.approx(1 / 4)
    assert out[2]["af"] == pytest.approx(1 / 5)


def test_allele_count_at_character(tiny_calls3, tiny_variants):
    """seqAlleleCount(ref.allele=<character>) (FC_AC_Allele
    src/Methods.cpp:698-734): count of the named allele; minor folds to
    min(m, non-missing - m); absent allele or all-missing -> NULL."""
    out = _by_id(agg.allele_count_at(tiny_calls3, tiny_variants, "A"))
    assert out[1]["ac"] == 3
    assert out[2]["ac"] == 4
    assert out[3]["ac"] is None
    m = _by_id(agg.allele_count_at(tiny_calls3, tiny_variants, "A", minor=True))
    assert m[1]["ac"] == 1  # min(3, 4-3)
    assert m[2]["ac"] == 1  # min(4, 5-4)


def test_allele_freq_index_per_variant(tiny_calls3, tiny_variants):
    """seqAlleleFreq(ref.allele=<numeric vector>) (FC_AF_Index
    src/Methods.cpp:333-360): per-variant 0-based index; an index >=
    num_allele yields NULL ('if (A < nAllele)' leaves n = 0 -> NaN)."""
    from pyspark.sql import functions as F

    # idx = variant_id - 1 -> v1: 0 (3/4), v2: 1 (4/5), v3: 2 >= 2 -> NULL
    out = _by_id(
        agg.allele_freq_index(
            tiny_calls3, tiny_variants, F.col("variant_id") - 1
        )
    )
    assert out[1]["af"] == pytest.approx(3 / 4)
    assert out[2]["af"] == pytest.approx(4 / 5)
    assert out[3]["af"] is None


def test_allele_freq_index_scalar_matches_allele_freq(tiny_calls, tiny_variants):
    """Scalar-index form must agree with the existing allele_freq(k) on
    fully-declared data (same kernel family, two code paths)."""
    a = _by_id(agg.allele_freq(tiny_calls, ref_allele=1))
    b = _by_id(
        agg.allele_freq_index(tiny_calls, tiny_variants.filter("variant_id <= 2"), 1)
    )
    for v in (1, 2):
        assert b[v]["af"] == pytest.approx(a[v]["af"])


def test_summary_var_forms(spark, tiny_calls, tiny_variants):
    """seqSummary(varname=) parity (R/Summary.R:74-200): genotype dims
    follow (ploidy, n_samples, n_variants) with seldim tracking the
    filter stack; annotation folders report field catalogs."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from seqarray_spark.dataset import SeqDataset

    samples = spark.createDataFrame(
        [Row(sample_id=s, pop="P1") for s in ("a", "b", "c")]
    )
    ds = SeqDataset(tiny_variants, tiny_calls, samples, ploidy=2)
    s = agg.summary_var(ds, "genotype")
    assert s["dim"] == (2, 3, 3)
    assert s["seldim"] == (2, 3, 3)

    ds.set_filter_variant(F.col("variant_id") <= 2)
    s = agg.summary_var(ds, "genotype")
    assert s["dim"] == (2, 3, 3)
    assert s["seldim"] == (2, 3, 2)
    ds.reset_filter()

    fmt = agg.summary_var(ds, "annotation/format")
    assert fmt == {"fields": []}  # tiny_calls carries no FORMAT fields
    sa = agg.summary_var(ds, "sample.annotation")
    assert [f["ID"] for f in sa["fields"]] == ["pop"]
    with pytest.raises(KeyError):
        agg.summary_var(ds, "nope")


def test_summary_seldim_tracks_filter_stack(spark, tiny_calls, tiny_variants):
    """seqSummary(f,'genotype')$seldim under push/pop (reference .seldim
    R/Internal.R:110-116 reads the CURRENT TSelection; seqFilterPush/Pop
    src/SeqArray.cpp:77-124 save/restore it): seldim shrinks with each
    intersecting filter, pop restores the pushed dims exactly, and both
    sample and variant axes track independently."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from seqarray_spark.dataset import SeqDataset

    samples = spark.createDataFrame(
        [Row(sample_id=s, pop="P1") for s in ("a", "b", "c")]
    )
    ds = SeqDataset(tiny_variants, tiny_calls, samples, ploidy=2)
    ds.set_filter_variant(F.col("variant_id") <= 2)
    ds.set_filter_sample(F.col("sample_id") != "c")
    assert agg.summary_var(ds, "genotype")["seldim"] == (2, 2, 2)

    ds.filter_push()
    ds.set_filter_variant(F.col("variant_id") == 1, intersect=True)
    assert agg.summary_var(ds, "genotype")["seldim"] == (2, 2, 1)
    ds.filter_pop()
    s = agg.summary_var(ds, "genotype")
    assert s["seldim"] == (2, 2, 2)      # restored, not the inner state
    assert s["dim"] == (2, 3, 3)         # full dims never move
    ds.reset_filter()
    assert agg.summary_var(ds, "genotype")["seldim"] == (2, 3, 3)


def test_summary_var_extended_names(spark, tmp_path):
    """The remaining seqSummary varnames (R/Summary.R:750-773 dispatch):
    node lengths, the per-chromosome table with numeric-first ordering,
    declared ALT/contig/reference metadata, and FILTER levels joined
    with observed counts."""
    from seqarray_spark.operators import aggregates as agg
    from seqarray_spark.sources import vcf as vcfmod

    p = str(tmp_path / "s.vcf")
    with open(p, "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            "##reference=GRCh99\n"
            '##FILTER=<ID=q10,Description="low qual">\n'
            '##contig=<ID=1,length=1000>\n'
            '##ALT=<ID=DEL,Description="deletion">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "2\t10\t.\tA\tC\t5\tPASS\t.\n"
            "10\t20\t.\tG\tT\t5\tq10\t.\n"
            "10\t30\t.\tG\tT\t5\tq10\t.\n"
            "X\t40\t.\tT\tA\t5\tPASS\t.\n"
        )
    ds = vcfmod.read_vcf(spark, p)
    assert agg.summary_var(ds, "variant.id") == {"length": 4}
    assert agg.summary_var(ds, "position") == {"length": 4}
    # numeric chroms first in numeric order (2 before 10), then X
    assert list(agg.summary_var(ds, "chromosome").items()) == [
        ("2", 1), ("10", 2), ("X", 1)
    ]
    assert agg.summary_var(ds, "$reference") == {"reference": "GRCh99"}
    assert agg.summary_var(ds, "$contig")["contig"][0]["ID"] == "1"
    assert agg.summary_var(ds, "$alt")["alt"][0]["ID"] == "DEL"
    flt = agg.summary_var(ds, "annotation/filter")["filter"]
    by_id = {d["ID"]: d for d in flt}
    assert by_id["q10"]["Count"] == 2 and by_id["q10"]["Description"] == "low qual"
    assert by_id["PASS"]["Count"] == 2  # observed but undeclared level
