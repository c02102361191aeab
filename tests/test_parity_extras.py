"""get_data index names, env splice, ragged helpers, summary profile,
interop (reference: seqGetData modes, seqNewVarData, seqSummary, seqAsVCF)."""

import pytest
from pyspark.sql import functions as F

from seqarray_spark.sources import testdata as td


@pytest.fixture(scope="module")
def ds(spark, sf_dir):
    return td.variant_dataset(spark, sf_dir)


def test_variant_index(ds):
    ds.reset_filter()
    ds.set_filter_chrom(["3"])
    idx = ds.get_data("$variant_index").collect()
    assert [r["variant_index"] for r in sorted(idx, key=lambda r: r["variant_id"])] == list(
        range(1, len(idx) + 1)
    )
    ds.reset_filter()


def test_sample_index(ds):
    idx = ds.get_data("$sample_index").collect()
    assert sorted(r["sample_index"] for r in idx) == list(range(1, len(idx) + 1))


def test_env_splice(ds, spark):
    ds.reset_filter()
    aux = spark.createDataFrame([(1, "x"), (3, "y")], "variant_id long, tag string")
    out = {r["variant_id"]: r["tag"] for r in ds.splice(aux).collect()}
    assert out[1] == "x" and out[3] == "y"
    assert sum(1 for v in out.values() if v is None) == len(out) - 2


def test_pad_na_and_lengths_data(spark):
    from seqarray_spark.functions.ragged import from_lengths_data, pad_na, to_lengths_data

    df = spark.createDataFrame(
        [(1, [10, 20]), (2, []), (3, None), (4, [7])],
        "variant_id long, vals array<int>",
    )
    padded = {r["variant_id"]: r["p"] for r in df.select("variant_id", pad_na("vals", 1).alias("p")).collect()}
    assert padded == {1: 10, 2: None, 3: None, 4: 7}
    padded2 = {r["variant_id"]: r["p"] for r in df.select("variant_id", pad_na("vals", 2).alias("p")).collect()}
    assert padded2[1] == [10, 20] and padded2[4] == [7, None]

    lengths, data = to_lengths_data(df, "vals")
    lens = {r["variant_id"]: r["length"] for r in lengths.collect()}
    assert lens == {1: 2, 2: 0, 3: 0, 4: 1}
    back = {r["variant_id"]: r["values"] for r in from_lengths_data(lengths, data).collect()}
    assert back[1] == [10, 20] and back[2] == [] and back[4] == [7]


def test_summary(ds):
    from seqarray_spark.operators.aggregates import summary

    ds.reset_filter()
    s = summary(ds)
    assert s["n_variants"] > 0 and s["n_samples"] > 0 and s["ploidy"] == 2
    assert s["by_chromosome"].count() == 22
    tab = {r["num_allele"]: r["n"] for r in s["allele_tab"].collect()}
    assert set(tab) == {2, 3, 4}
    q = s["qual_quantiles"].first()["q"]
    assert len(q) == 5 and q[0] <= q[2] <= q[4]


def test_as_pandas_and_guard(ds):
    from seqarray_spark.sources.interop import as_pandas

    ds.reset_filter()
    ds.set_filter_chrom(["1"])
    frames = as_pandas(ds)
    assert len(frames["variants"]) > 0
    assert set(frames) == {"variants", "calls", "samples"}
    with pytest.raises(ValueError):
        as_pandas(ds, max_rows=1)
    ds.reset_filter()


def test_read_bcf_no_external_binary(spark):
    """read_bcf is pure Python (sources/bcf.py) — no bcftools gate; a
    missing path fails as a file error, never NotImplementedError."""
    from seqarray_spark.sources.interop import read_bcf

    with pytest.raises((FileNotFoundError, OSError)):
        read_bcf(spark, "/nonexistent.bcf")


def test_as_pandas_info_geno_subsetting(spark):
    """seqAsVCF(info=, geno=) parity (R/asVCF.R:5-57; reference
    test_asVCF.R test_info_geno / test_info_geno_na): lists subset the
    INFO struct and FORMAT variables ('GT' names the genotype pair),
    None keeps nothing, unknown names raise."""
    from pyspark.sql import Row

    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.sources.interop import as_pandas

    v = spark.createDataFrame(
        [(1, "1", 100, "A", ["G"], Row(AN=4, DP=10, VT="snp"))],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, info struct<AN:int,DP:int,VT:string>",
    )
    c = spark.createDataFrame(
        [(1, "s1", [0, 1], [False], 0.5, 9)],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DS double, DP int",
    )
    s = spark.createDataFrame([("s1",)], "sample_id string")
    ds = SeqDataset(v, c, s)

    f = as_pandas(ds, info=["AN", "VT"], geno=["DS"])
    assert list(f["variants"]["info"][0]) == ["AN", "VT"]
    assert set(f["calls"].columns) == {"variant_id", "sample_id", "DS"}

    f2 = as_pandas(ds, info=["AN"], geno=["GT", "DP"])
    assert set(f2["calls"].columns) == {
        "variant_id", "sample_id", "alleles", "phased", "DP"}

    # the reference's info=NA / geno=NA: zero INFO, zero geno
    f3 = as_pandas(ds, info=None, geno=None)
    assert "info" not in f3["variants"].columns
    assert "calls" not in f3

    with pytest.raises(ValueError, match="unknown INFO"):
        as_pandas(ds, info=["NOPE"])
    with pytest.raises(ValueError, match="unknown FORMAT"):
        as_pandas(ds, geno=["NOPE"])


def test_accessors_granges_fixed_coldata(spark):
    """VariantAnnotation accessors (reference S4 methods
    R/Methods-SeqVarGDSClass.R:9-292): granges end = pos +
    max(nchar(REF),1) - 1 (indels span, empty REF clamps to 1); ref()
    scrubs non-IUPAC characters to '.'; colData numbers samples from 1
    in sample-id order and carries annotations; all honor the filter."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.functions import accessors as A

    v = spark.createDataFrame(
        [(1, "1", 100, "rs1", "A", ["G"], 50.0, "PASS"),
         (2, "1", 200, "rs2", "ACGT", ["A"], 60.0, "PASS"),   # indel: 4bp
         (3, "2", 300, None, "", ["T"], None, "q10"),         # empty REF
         (4, "2", 400, "rs4", "AXZ!", ["C"], 1.0, "PASS")],   # scrub
        "variant_id long, chromosome string, position int, id string, "
        "ref string, alt array<string>, qual double, filter string",
    )
    s = spark.createDataFrame(
        [("s1", 31), ("s2", 42)], "sample_id string, age int"
    )
    ds = SeqDataset(v, None, s)
    gr = {r["variant_id"]: (r["seqnames"], r["start"], r["end"])
          for r in A.granges(ds).collect()}
    assert gr[1] == ("1", 100, 100)
    assert gr[2] == ("1", 200, 203)
    assert gr[3] == ("2", 300, 300)   # reflen clamps to 1

    rr = {r["variant_id"]: r for r in A.row_ranges(ds).collect()}
    assert rr[4]["REF"] == "A..."     # X, Z, ! all outside IUPAC+indel
    assert rr[2]["ALT"] == "A" and rr[1]["QUAL"] == 50.0
    assert rr[3]["ID"] is None and rr[3]["FILTER"] == "q10"

    fx = {r["variant_id"]: r["REF"] for r in A.fixed(ds).collect()}
    assert fx[4] == "A..."

    cd = {r["sample_id"]: (r["Samples"], r["age"])
          for r in A.col_data(ds).collect()}
    assert cd == {"s1": (1, 31), "s2": (2, 42)}

    # accessors follow the variant filter (each reference method reads
    # through seqGetData, which honors the selection)
    ds.set_filter_chrom(["1"])
    assert {r["variant_id"] for r in A.granges(ds).collect()} == {1, 2}


def test_filter_chrom_vectorized_windows(spark):
    """seqSetFilterChrom full parity: per-entry bp windows with repeated-
    chromosome union (CRangeSet, src/SeqArray.cpp:808-815), NA->open bounds
    (src/SeqArray.cpp:810-812), is.num name-class selection
    (src/SeqArray.cpp:701-706,759-779)."""
    import pytest as _pt

    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 250), (3, "1", 900),
         (4, "2", 50), (5, "2", 500), (6, "X", 120), (7, "MT", 10)],
        "variant_id long, chromosome string, position int",
    )

    def ids(ds):
        return sorted(r["variant_id"] for r in ds.variants.select("variant_id").collect())

    # vectorized windows; chrom "1" repeated -> union of [90,110] and [240,260]
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(["1", "1", "2"], from_bp=[90, 240, 400], to_bp=[110, 260, 600])
    assert ids(ds) == [1, 2, 5]

    # None (NA) opens a side: chrom 2 from 100 up; chrom X fully open
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(["2", "X"], from_bp=[100, None], to_bp=[None, None])
    assert ids(ds) == [5, 6]

    # scalar bp broadcasts over every include entry (back-compat form)
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(["1", "2"], from_bp=100, to_bp=500)
    assert ids(ds) == [1, 2, 5]

    # is_num over an include list drops the non-numeric names
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(["1", "X", "MT"], is_num=True)
    assert ids(ds) == [1, 2, 3]

    # include=None + is_num: whole-file name-class selection
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(is_num=False)
    assert ids(ds) == [6, 7]
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom(is_num=True)
    assert ids(ds) == [1, 2, 3, 4, 5]

    # include=None, is_num=None selects everything (memset TRUE)
    ds = SeqDataset(v, None, None)
    ds.set_filter_chrom()
    assert ids(ds) == [1, 2, 3, 4, 5, 6, 7]

    # reference errors: bp without include; length mismatch
    ds = SeqDataset(v, None, None)
    with _pt.raises(ValueError):
        ds.set_filter_chrom(from_bp=100)
    with _pt.raises(ValueError):
        ds.set_filter_chrom(["1", "2"], from_bp=[1, 2, 3], to_bp=[4, 5, 6])


def test_add_value_node_paths(spark):
    """seqAddValue's node-path dispatch (R/AddValue.R:520-591): core
    variant nodes need replace=TRUE, annotation/info/<NAME> lands inside
    the info struct, allele strings split back into ref/alt, and
    sample.annotation/<NAME> adds a sample column."""
    import pytest as _pt

    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators import mutate as M

    v = spark.createDataFrame(
        [(1, "1", 100, "A", ["C"], 9.0, None),
         (2, "1", 200, "G", ["T"], 8.0, None)],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, qual double, id string",
    )
    s = spark.createDataFrame([("s1",), ("s2",)], "sample_id string")
    ds = SeqDataset(v, None, s)

    # replace guard on an existing core node
    with _pt.raises(ValueError):
        M.add_value(ds, "position", F.col("position") + 1)
    out = M.add_value(ds, "position", F.col("position") + 1, replace=True)
    assert [r["position"] for r in out.variants.orderBy("variant_id").collect()] == [101, 201]

    # annotation/qual via a keyed DataFrame (the vector path)
    qdf = spark.createDataFrame([(1, 1.5), (2, 2.5)], "variant_id long, q double")
    out = M.add_value(ds, "annotation/qual", qdf, replace=True)
    assert [r["qual"] for r in out.variants.orderBy("variant_id").collect()] == [1.5, 2.5]

    # allele string "REF,ALT1,ALT2" splits into ref/alt
    adf = spark.createDataFrame(
        [(1, "T,G,C"), (2, "C,A")], "variant_id long, allele string"
    )
    out = M.add_value(ds, "allele", adf, replace=True)
    rows = {r["variant_id"]: r for r in out.variants.collect()}
    assert rows[1]["ref"] == "T" and rows[1]["alt"] == ["G", "C"]
    assert rows[2]["ref"] == "C" and rows[2]["alt"] == ["A"]

    # new INFO field materializes an info struct; replacing needs the flag
    out = M.add_value(ds, "annotation/info/DP", F.lit(7))
    assert out.variants.select("info.DP").distinct().collect()[0][0] == 7
    with _pt.raises(ValueError):
        M.add_value(out, "annotation/info/DP", F.lit(8))
    out2 = M.add_value(out, "annotation/info/DP", F.lit(8), replace=True)
    assert out2.variants.select("info.DP").distinct().collect()[0][0] == 8

    # sample.annotation/<name>
    out = M.add_value(ds, "sample.annotation/pop", F.lit("CEU"))
    assert out.samples.columns == ["sample_id", "pop"]
    with _pt.raises(ValueError):
        M.add_value(out, "sample.annotation/pop", F.lit("YRI"))
    with _pt.raises(ValueError):
        M.add_value(ds, "not/a/node", F.lit(1))


def test_geno_gt_accessor_quirks(spark):
    """geno(x)$GT string assembly (R/Methods-SeqVarGDSClass.R:182-214):
    '|' separator when phased, missing slots render literal 'NA' (R
    paste semantics), and ONLY the exact unphased 'NA/NA' collapses to
    '.' — a phased all-missing 'NA|NA' stays as-is, matching the
    reference's `gt[gt == "NA/NA"] <- "."`."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.functions.accessors import geno_gt

    c = spark.createDataFrame(
        [(1, "s1", [0, 1], [True]),
         (1, "s2", [1, 1], [False]),
         (2, "s1", [None, 1], [False]),
         (2, "s2", [None, None], [False]),
         (3, "s1", [None, None], [True])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>",
    )
    v = spark.createDataFrame([(1,), (2,), (3,)], "variant_id long")
    out = {
        (r["variant_id"], r["sample_id"]): r["gt"]
        for r in geno_gt(SeqDataset(v, c, None)).collect()
    }
    assert out == {
        (1, "s1"): "0|1",
        (1, "s2"): "1/1",
        (2, "s1"): "NA/1",   # partial missing keeps the literal NA
        (2, "s2"): ".",      # unphased all-missing collapses
        (3, "s1"): "NA|NA",  # phased all-missing does NOT
    }


def test_info_df_accessor(spark):
    """info(x, infovar=) accessor (R/Methods-SeqVarGDSClass.R:132-179):
    per-variant INFO columns keyed by variant_id, optionally restricted;
    unknown names silently absent."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.functions.accessors import info_df

    v = spark.createDataFrame(
        [(1, {"DP": 3, "AF": [0.5]}), (2, {"DP": None, "AF": [0.25]})],
        "variant_id long, info struct<DP: int, AF: array<double>>",
    )
    ds = SeqDataset(v, None, None)
    full = {r["variant_id"]: r for r in info_df(ds).collect()}
    assert full[1]["DP"] == 3 and full[2]["AF"] == [0.25]
    sub = info_df(ds, ["DP", "NOPE"])
    assert sub.columns == ["variant_id", "DP"]


def test_add_value_id_remap(spark):
    """seqAddValue('variant.id'/'sample.id') vector replacement: the
    reference re-labels the id node and its positional genotype planes
    stay aligned for free (.r_variant_id/.r_sample_id, R/AddValue.R);
    the long-format analogue must remap calls consistently with the
    (old -> new) mapping."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators import mutate as M

    v = spark.createDataFrame([(1, "1", 10), (2, "1", 20)],
                              "variant_id long, chromosome string, position int")
    c = spark.createDataFrame(
        [(1, "s1", [0, 1]), (2, "s1", [1, 1])],
        "variant_id long, sample_id string, alleles array<smallint>",
    )
    s = spark.createDataFrame([("s1",)], "sample_id string")
    ds = SeqDataset(v, c, s)

    vid_map = spark.createDataFrame([(1, 101), (2, 102)],
                                    "variant_id long, new long")
    out = M.add_value(ds, "variant.id", vid_map, replace=True)
    assert sorted(r["variant_id"] for r in out.variants.collect()) == [101, 102]
    pairs = {(r["variant_id"], r["alleles"][1]) for r in out.calls.collect()}
    assert pairs == {(101, 1), (102, 1)}  # calls follow the new ids

    sid_map = spark.createDataFrame([("s1", "SAMP1")],
                                    "sample_id string, new string")
    out = M.add_value(ds, "sample.id", sid_map, replace=True)
    assert [r["sample_id"] for r in out.samples.collect()] == ["SAMP1"]
    assert {r["sample_id"] for r in out.calls.collect()} == {"SAMP1"}


def test_chrom_rle_get_data(spark):
    """seqGetData('$chromosome') RLE (src/GetData.cpp:199-240): maximal
    consecutive same-chromosome runs over the SELECTION in variant
    order — a chromosome reappearing later starts a NEW run (Rle, not
    group-by), and the RLE recomputes against the active filter."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1"), (2, "1"), (3, "2"), (4, "1"), (5, "1"), (6, "X")],
        "variant_id long, chromosome string",
    )
    ds = SeqDataset(v, None, None)
    runs = [(r["run_id"], r["chromosome"], r["run_length"])
            for r in ds.get_data("$chromosome").collect()]
    assert runs == [(1, "1", 2), (2, "2", 1), (3, "1", 2), (4, "X", 1)]

    # under a filter the runs re-derive over the selection: removing the
    # only chr2 variant fuses the two chr1 runs
    ds.set_filter_variant(F.col("variant_id") != 3)
    runs = [(r["run_id"], r["chromosome"], r["run_length"])
            for r in ds.get_data("$chromosome").collect()]
    assert runs == [(1, "1", 4), (2, "X", 1)]


def test_chrom_rle_partition_count_invariance(spark):
    """The distributed per-partition-fold + boundary-merge RLE equals a
    driver-computed reference RLE for EVERY partition count — including
    single-run-per-partition chains (one chromosome spanning many
    partitions) and 1-partition degenerate layouts."""
    import random

    from seqarray_spark.dataset import chrom_rle

    rng = random.Random(8)
    chroms, cur = [], "1"
    for _ in range(500):
        if rng.random() < 0.15:
            cur = rng.choice(["1", "2", "3", "X"])
        chroms.append(cur)
    rows = [(i + 1, c) for i, c in enumerate(chroms)]

    expect, prev = [], None
    for _, c in rows:
        if c != prev:
            expect.append([len(expect) + 1, c, 0])
            prev = c
        expect[-1][2] += 1
    expect = [tuple(e) for e in expect]

    v = spark.createDataFrame(rows, "variant_id long, chromosome string")
    # distributed fold (driver_threshold=0 forces it) across partition
    # counts, plus the bounded driver fast path — all identical
    for n_parts in (1, 3, 7, 16, 64):
        got = [
            (r["run_id"], r["chromosome"], r["run_length"])
            for r in chrom_rle(
                v, num_partitions=n_parts, driver_threshold=0
            ).collect()
        ]
        assert got == expect, f"mismatch at num_partitions={n_parts}"
    fast = [
        (r["run_id"], r["chromosome"], r["run_length"])
        for r in chrom_rle(v).collect()
    ]
    assert fast == expect
    # one-chromosome chain: every partition merges into ONE global run
    mono = spark.createDataFrame(
        [(i + 1, "7") for i in range(100)], "variant_id long, chromosome string"
    )
    got = [
        (r["run_id"], r["chromosome"], r["run_length"])
        for r in chrom_rle(mono, num_partitions=16, driver_threshold=0).collect()
    ]
    assert got == [(1, "7", 100)]


def test_get_data_pad_na_reference_semantics(spark):
    """seqGetData(.padNA=TRUE) (src/GetData.cpp:984-1037): flattens an
    info field ONLY when its FILE-WIDE max length is 1 (absent -> NA
    scalar); a Number=G field whose lengths vary (mixed ploidy) keeps
    the list form unpadded and UNTRUNCATED — and the file-wide rule
    means a selection that happens to see only short values still does
    NOT flatten."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, ([5], [1, 2, 3])),
         (2, "1", 200, ([], [9])),
         (3, "1", 300, (None, None))],
        "variant_id long, chromosome string, position int, "
        "info struct<AA: array<int>, GL: array<int>>",
    ).select("variant_id", "chromosome", "position", "info")
    ds = SeqDataset(v, None, None)

    flat = {r["variant_id"]: r["AA"]
            for r in ds.get_data("annotation/info/AA", pad_na=True).collect()}
    assert flat == {1: 5, 2: None, 3: None}

    ragged = {r["variant_id"]: r["GL"]
              for r in ds.get_data("annotation/info/GL", pad_na=True).collect()}
    assert ragged == {1: [1, 2, 3], 2: [9], 3: None}

    # file-wide rule: select only variant 2 (GL length 1 there) — still
    # list form, because the BASE frame's max is 3
    ds.set_filter_variant_id([2])
    only2 = ds.get_data("annotation/info/GL", pad_na=True).collect()
    assert len(only2) == 1 and only2[0]["GL"] == [9]
    ds.reset_filter()


def test_dosage_plus_dosage_alt_identity(spark, sf_dir):
    """Reference test.dosage_alt (inst/unitTests/test_func.R:336-357):
    $dosage (REF count) and $dosage_alt share EXACTLY the same missing
    cells, and wherever both are known their sum is the ploidy (2) —
    replayed on the derived diploid calls, including the
    partial-missing cells the derivation plants via l_discount."""
    from pyspark.sql import functions as F

    from seqarray_spark.functions.variant import dosage_alt, dosage_ref
    from seqarray_spark.sources import testdata as td

    c = td.gcalls(spark, sf_dir).select(
        dosage_ref("alleles").alias("dr"),
        dosage_alt("alleles", partial_missing=False).alias("da"),
    )
    bad = c.where(
        (F.col("dr").isNull() != F.col("da").isNull())
        | (F.col("dr").isNotNull() & (F.col("dr") + F.col("da") != 2))
    )
    assert bad.count() == 0
    # both branches of the identity are actually exercised
    stats = c.agg(
        F.sum(F.col("dr").isNull().cast("long")).alias("n_missing"),
        F.sum(F.col("dr").isNotNull().cast("long")).alias("n_known"),
    ).collect()[0]
    assert stats["n_missing"] > 0 and stats["n_known"] > 0
