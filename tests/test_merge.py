"""Merge modes (reference: R/UtilsMerge.R; FIXTURES.md fixture 5)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from seqarray_spark.dataset import SeqDataset
from seqarray_spark.operators import merge as M


def _mk(spark, variants, calls, samples):
    v = spark.createDataFrame(
        variants,
        "variant_id long, chromosome string, position int, ref string, alt array<string>",
    )
    c = spark.createDataFrame(
        calls, "variant_id long, sample_id string, alleles array<int>"
    )
    s = spark.createDataFrame([(x,) for x in samples], "sample_id string")
    return SeqDataset(v, c, s)


@pytest.fixture(scope="module")
def parts_variant_mode(spark):
    """same samples, disjoint variants"""
    a = _mk(
        spark,
        [(1, "1", 100, "A", ["C"]), (2, "1", 200, "G", ["T"])],
        [(1, "s1", [0, 1]), (1, "s2", [0, 0]), (2, "s1", [1, 1]), (2, "s2", [0, 1])],
        ["s1", "s2"],
    )
    b = _mk(
        spark,
        [(1, "2", 300, "T", ["A"]), (2, "2", 400, "C", ["G", "T"])],
        [(1, "s1", [0, 0]), (1, "s2", [0, 1]), (2, "s1", [0, 2]), (2, "s2", [1, 1])],
        ["s1", "s2"],
    )
    return a, b


def test_variant_mode_merge(parts_variant_mode):
    a, b = parts_variant_mode
    m = M.merge([a, b])
    assert m.variants.count() == 4
    assert m.calls.count() == 8
    assert m.samples.count() == 2
    # ids renumbered uniquely and calls follow
    assert m.variants.select("variant_id").distinct().count() == 4
    joined = m.calls.join(m.variants, "variant_id")
    assert joined.count() == 8


def test_sample_mode_merge(spark):
    """Disjoint samples, variants matched by the FULL $chrom_pos_allele
    key (reference: R/UtilsMerge.R:376) — a locus whose ALT lists differ
    between files yields DISTINCT variants, and allele codes never
    remap."""
    a = _mk(
        spark,
        [(1, "1", 100, "A", ["C"]), (2, "1", 200, "G", ["T"])],
        [(1, "s1", [0, 1]), (2, "s1", [1, 1])],
        ["s1"],
    )
    b = _mk(
        spark,
        # same locus 1:100 A but a DIFFERENT alt list -> distinct variant
        [(10, "1", 100, "A", ["G", "C"]), (20, "1", 200, "G", ["T"])],
        [(10, "s2", [1, 2]), (20, "s2", [0, 1])],
        ["s2"],
    )
    m = M.merge([a, b])
    # 1:200 G>T matches across files; the two 1:100 records stay apart
    assert m.variants.count() == 3
    v = {
        (r["chromosome"], r["position"], tuple(r["alt"])): r
        for r in m.variants.collect()
    }
    assert ("1", 100, ("C",)) in v and ("1", 100, ("G", "C")) in v
    calls = {
        (r["sample_id"], r["position"], tuple(r["alt"])): r["alleles"]
        for r in m.calls.join(m.variants, "variant_id").select(
            "sample_id", "position", "alt", "alleles"
        ).collect()
    }
    # codes pass through untouched on both sides
    assert calls[("s1", 100, ("C",))] == [0, 1]
    assert calls[("s2", 100, ("G", "C"))] == [1, 2]
    assert calls[("s1", 200, ("T",))] == [1, 1]
    assert calls[("s2", 200, ("T",))] == [0, 1]
    assert m.samples.count() == 2


def test_overlap_detection_error(spark, parts_variant_mode):
    a, _ = parts_variant_mode
    with pytest.raises(ValueError):
        M.merge([a, a])  # overlaps in both variants and samples


def test_merge_mode_autodetect(parts_variant_mode):
    a, b = parts_variant_mode
    assert M._overlap_mode([a, b]) == "variant"


def test_merge_mode_autodetect_sample(spark):
    a = _mk(
        spark,
        [(1, "1", 100, "A", ["C"])],
        [(1, "s1", [0, 1])],
        ["s1"],
    )
    b = _mk(
        spark,
        [(7, "1", 100, "A", ["C"])],  # same variant, different id/sample
        [(7, "s2", [1, 1])],
        ["s2"],
    )
    assert M._overlap_mode([a, b]) == "sample"
    m = M.merge([a, b])  # end-to-end through autodetect
    assert m.variants.count() == 1 and m.calls.count() == 2


def test_merge_unions_header_meta(spark, parts_variant_mode):
    """A merged dataset's metadata declares EVERY input's contigs/ALTs —
    not just the first file's (the regenerated VCF header must cover all
    records present)."""
    a, b = parts_variant_mode
    a.meta = {
        "fileformat": "VCFv4.1",
        "contigs": [{"ID": "1"}],
        "header_pairs": [("fileDate", "20240101")],
    }
    b.meta = {
        "reference": "GRCh38",
        "contigs": [{"ID": "1"}, {"ID": "X"}],
        "alts": [{"ID": "DEL", "Description": "Deletion"}],
        "header_pairs": [("fileDate", "20240101"), ("source", "imp")],
    }
    m = M.merge([a, b])
    assert m.meta["fileformat"] == "VCFv4.1"
    assert m.meta["reference"] == "GRCh38"
    assert m.meta["contigs"] == [{"ID": "1"}, {"ID": "X"}]
    assert m.meta["alts"] == [{"ID": "DEL", "Description": "Deletion"}]
    assert m.meta["header_pairs"] == [("fileDate", "20240101"), ("source", "imp")]


def test_merge_sample_info_conflict_first_file_wins_by_presence(spark):
    """SEQ_MergeInfo parity (src/FileMerge.cpp:326-347): the first file
    CONTAINING a variant supplies its INFO/annotation values — even when
    that value is NULL and the second file has one. A value-coalesce
    would wrongly patch file-1's missing QUAL/INFO from file 2."""
    from seqarray_spark.dataset import SeqDataset

    va = spark.createDataFrame(
        [(1, "1", 100, "A", ["G"], None, "rsA"),     # NULL qual in file 1
         (2, "1", 200, "C", ["T"], 30.0, None)],     # NULL id in file 1
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, qual double, id string",
    )
    vb = spark.createDataFrame(
        [(11, "1", 100, "A", ["G"], 99.0, "rsB"),    # conflicting values
         (12, "1", 200, "C", ["T"], 77.0, "rsX"),
         (13, "1", 300, "G", ["A"], 55.0, "rsOnlyB")],  # only in file 2
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, qual double, id string",
    )
    sa = spark.createDataFrame([("s1",)], "sample_id string")
    sb = spark.createDataFrame([("s2",)], "sample_id string")
    m = M.merge_samples_pair(
        SeqDataset(va, None, sa), SeqDataset(vb, None, sb)
    )
    got = {
        (r["chromosome"], r["position"]): (r["qual"], r["id"])
        for r in m.variants.collect()
    }
    # shared variants: file 1 present -> file 1's values verbatim,
    # including its NULLs
    assert got[("1", 100)] == (None, "rsA")
    assert got[("1", 200)] == (30.0, None)
    # file-2-only variant: file 2 supplies
    assert got[("1", 300)] == (55.0, "rsOnlyB")


def test_merge_sample_info_vars_union_across_files(spark):
    """Sample-mode INFO vars are the UNION across files
    (R/UtilsMerge.R:758-766): a var only file 2 carries appears in the
    merged schema, stays missing wherever file 1 CONTAINS the variant
    (SEQ_MergeInfo breaks at the first containing file, which lacks the
    var), and carries file 2's values at file-2-only variants."""
    from pyspark.sql import Row

    from seqarray_spark.dataset import SeqDataset

    va = spark.createDataFrame(
        [(1, "1", 100, "A", ["G"], Row(DP=7))],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, info struct<DP:int>",
    )
    vb = spark.createDataFrame(
        [(11, "1", 100, "A", ["G"], Row(DP=9, AF=0.25)),
         (12, "1", 300, "G", ["A"], Row(DP=3, AF=0.5))],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, info struct<DP:int,AF:double>",
    )
    sa = spark.createDataFrame([("s1",)], "sample_id string")
    sb = spark.createDataFrame([("s2",)], "sample_id string")
    m = M.merge_samples_pair(
        SeqDataset(va, None, sa), SeqDataset(vb, None, sb)
    )
    assert [f.name for f in m.variants.schema["info"].dataType.fields] == [
        "DP", "AF"]
    got = {
        r["position"]: (r["info"]["DP"], r["info"]["AF"])
        for r in m.variants.collect()
    }
    # shared variant: file 1 contains it -> DP from file 1, AF missing
    assert got[100] == (7, None)
    # file-2-only variant: file 2 supplies both
    assert got[300] == (3, 0.5)


def test_merge_format_number_disagreement(spark):
    """SEQ_MergeFormat parity (src/FileMerge.cpp:365-460): files that
    disagree on a FORMAT field's Number merge into ONE column — scalar
    (Number=1) sides promote to 1-element arrays ([x]; NULL scalar stays
    a NULL array, the reference's NA plane), and mixed numeric widths
    widen. Exercised on BOTH merge modes."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators.merge import merge_samples_pair, merge_variants

    va = spark.createDataFrame(
        [(1, "1", 100, "A", ["G"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    # file A: DP scalar int
    ca = spark.createDataFrame(
        [(1, "s1", [0, 1], [False], 7), (1, "s2", [0, 0], [False], None)],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP int",
    )
    sa = spark.createDataFrame([("s1",), ("s2",)], "sample_id string")
    # file B: DP array<double> (Number=2)
    vb = spark.createDataFrame(
        [(9, "1", 100, "A", ["G"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    cb = spark.createDataFrame(
        [(9, "s3", [0, 1], [False], [1.5, 2.5])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP array<double>",
    )
    sb = spark.createDataFrame([("s3",)], "sample_id string")

    merged = merge_samples_pair(SeqDataset(va, ca, sa), SeqDataset(vb, cb, sb))
    assert dict(merged.calls.dtypes)["DP"] == "array<double>"
    rows = {r["sample_id"]: r["DP"] for r in merged.calls.collect()}
    assert rows["s1"] == [7.0]
    assert rows["s2"] is None          # NULL scalar -> NULL array, not [NULL]
    assert rows["s3"] == [1.5, 2.5]

    # variant mode: same samples, disjoint variants, same disagreement
    vb2 = spark.createDataFrame(
        [(2, "1", 200, "C", ["T"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    cb2 = spark.createDataFrame(
        [(2, "s1", [1, 1], [False], [3.0])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP array<double>",
    )
    m2 = merge_variants(
        [SeqDataset(va, ca, sa), SeqDataset(vb2, cb2, sa)],
        reset_variant_id=False,
    )
    assert dict(m2.calls.dtypes)["DP"] == "array<double>"
    got = {(r["variant_id"], r["sample_id"]): r["DP"]
           for r in m2.calls.collect()}
    assert got[(1, "s1")] == [7.0] and got[(2, "s1")] == [3.0]


def test_merge_format_export_pads_to_variant_max_arity(spark, tmp_path):
    """After a Number-disagreement merge, the container writer pads each
    sample's FORMAT block to the per-variant max arity — the reference's
    step = max(len/SampNum) NA-padding (src/FileMerge.cpp:413-443)."""
    from seqarray_spark.dataset import SeqDataset
    from seqarray_spark.operators.merge import merge_samples_pair
    from seqarray_spark.sources.gds import GdsFile
    from seqarray_spark.sources.gds_write import write_gds

    va = spark.createDataFrame(
        [(1, "1", 100, "A", ["G"], None, 50.0, "PASS")],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, id string, qual double, filter string",
    )
    ca = spark.createDataFrame(
        [(1, "s1", [0, 1], [False], 7)],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP int",
    )
    sa = spark.createDataFrame([("s1",), ("s2",)], "sample_id string")
    # file A knows s2 but has no call for it at variant 1: absent row
    vb = spark.createDataFrame(
        [(9, "1", 100, "A", ["G"], None, 60.0, "PASS")],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>, id string, qual double, filter string",
    )
    cb = spark.createDataFrame(
        [(9, "s3", [0, 1], [False], [10, 20])],
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>, DP array<int>",
    )
    sb = spark.createDataFrame([("s3",)], "sample_id string")
    merged = merge_samples_pair(SeqDataset(va, ca, sa), SeqDataset(vb, cb, sb))
    path = str(tmp_path / "fmt_merge.gds")
    write_gds(merged, path)
    f = GdsFile(path)
    # one variant, 3 samples, max arity 2 -> idx [2], data 2x3 with NA
    # filling s1's second slot and s2's whole block
    assert list(f.read_array("annotation/format/DP/@data")) == [2]
    data = f.read_array("annotation/format/DP/data")
    import numpy as np

    arr = np.asarray(data, dtype=object).reshape(2, 3)
    sids = list(f.read_array("sample.id"))
    col = {s: i for i, s in enumerate(sids)}
    NA = -2147483648  # NA_INTEGER, the reference's int NA code

    def is_na(x):
        return x is None or x == NA

    assert arr[0][col["s1"]] == 7 and is_na(arr[1][col["s1"]])
    assert is_na(arr[0][col["s2"]]) and is_na(arr[1][col["s2"]])
    assert arr[0][col["s3"]] == 10 and arr[1][col["s3"]] == 20


def test_three_file_sample_merge_order_independent_values(spark):
    """VERDICT r9 item 7 parity review — the found-and-fixed divergence:
    N-way sample-mode merge must unify disagreeing FORMAT declarations
    over ALL files BEFORE the pairwise fold, like the reference's
    single-pass SEQ_MergeFormat (src/FileMerge.cpp:365-460), so every
    value converts ONCE. The pre-fix pairwise fold cast through
    intermediate types: with XX declared int/double/string across
    three files, ((A+B)+C) rendered A's 1 as '1.0' (int -> double ->
    string) while ((C+A)+B) rendered '1' — order-dependent values the
    reference never produces."""
    import itertools

    def mk(sid, xval, xtype):
        v = spark.createDataFrame(
            [(1, "1", 100, "rs1", "A", ["G"])],
            "variant_id long, chromosome string, position int, id string, "
            "ref string, alt array<string>",
        )
        c = spark.createDataFrame(
            [(1, sid, xval)],
            f"variant_id long, sample_id string, XX {xtype}",
        )
        s = spark.createDataFrame([(sid,)], "sample_id string")
        return SeqDataset(v, c, s)

    files = {
        "A": ("sA", 1, "int"),
        "B": ("sB", 1.5, "double"),
        "C": ("sC", "z", "string"),
    }
    want = {("sA", "1"), ("sB", "1.5"), ("sC", "z")}  # single conversion
    for order in itertools.permutations("ABC"):
        m = M.merge([mk(*files[k]) for k in order], mode="sample")
        got = {
            (r["sample_id"], r["XX"])
            for r in m.calls.select("sample_id", "XX").collect()
        }
        assert got == want, f"order {order}: {got}"


def test_preharmonized_sample_merge_respects_active_filters(spark):
    """r10 review fix: when sample-mode merge harmonizes disagreeing
    FORMAT declarations (the N-way single-pass rebuild), the rebuilt
    datasets must carry their ACTIVE selections — the pre-fix rebuild
    used a fresh full _Selection, so a filtered dataset's excluded
    variants silently reappeared in the merge, and ONLY when schemas
    disagreed (identity harmonize kept the filter). Reference
    seqMerge operates on each file's current filter
    (R/UtilsMerge.R seqMerge uses the open files' selections)."""

    def mk(sid, xtype, positions):
        v = spark.createDataFrame(
            [(i, "1", p, f"rs{p}", "A", ["G"]) for i, p in
             enumerate(positions, 1)],
            "variant_id long, chromosome string, position int, id string, "
            "ref string, alt array<string>",
        )
        c = spark.createDataFrame(
            [(i, sid, "1" if xtype == "string" else 1)
             for i in range(1, len(positions) + 1)],
            f"variant_id long, sample_id string, XX {xtype}",
        )
        s = spark.createDataFrame([(sid,)], "sample_id string")
        return SeqDataset(v, c, s)

    da = mk("sA", "int", [100, 200, 300])
    db = mk("sB", "string", [100, 200, 300])   # XX type disagrees -> harmonize
    # filter ds A to positions <= 200 through the public filter API
    da.set_filter_variant(F.col("position") <= 200)
    m = M.merge([da, db], mode="sample")
    pos = sorted(r["position"] for r in m.variants.select("position").collect())
    # A contributes only its SELECTED variants; 300 appears solely
    # because unfiltered B still carries it
    xa = {(r["sample_id"], r["position"]) for r in
          m.calls.join(m.variants.select("variant_id", "position"),
                       "variant_id")
          .select("sample_id", "position").collect()}
    assert ("sA", 300) not in xa, xa
    assert ("sB", 300) in xa
    assert pos == [100, 200, 300]


def test_allele_harmonize_classification(spark):
    """Hand-built panels pin every class: same / swap / flip /
    flip_swap / ambiguous (palindromic, classified FIRST even when a
    'same' reading exists) / mismatch; multiallelic and indel rows
    are excluded."""
    from pyspark.sql import functions as F  # noqa: F401

    from seqarray_spark.operators.merge import allele_harmonize

    def frame(rows):
        return spark.createDataFrame(
            rows,
            "variant_id long, chromosome string, position int, "
            "ref string, alt array<string>",
        )

    a = frame([
        (1, "1", 100, "A", ["G"]),   # same
        (2, "1", 200, "A", ["G"]),   # swap
        (3, "1", 300, "A", ["G"]),   # flip: T/C
        (4, "1", 400, "A", ["G"]),   # flip_swap: C/T
        (5, "1", 500, "A", ["T"]),   # palindromic -> ambiguous
        (6, "1", 600, "C", ["G"]),   # palindromic -> ambiguous
        (7, "1", 700, "A", ["G"]),   # mismatch: C/A
        (8, "1", 800, "A", ["G", "T"]),  # multiallelic: excluded
        (9, "1", 900, "AT", ["A"]),  # indel: excluded
    ])
    b = frame([
        (11, "1", 100, "A", ["G"]),
        (12, "1", 200, "G", ["A"]),
        (13, "1", 300, "T", ["C"]),
        (14, "1", 400, "C", ["T"]),
        (15, "1", 500, "A", ["T"]),
        (16, "1", 600, "C", ["G"]),
        (17, "1", 700, "C", ["A"]),
        (18, "1", 800, "A", ["G"]),
        (19, "1", 900, "A", ["T"]),
    ])
    got = {
        r["position"]: r["action"]
        for r in allele_harmonize(a, b).collect()
    }
    assert got == {
        100: "same", 200: "swap", 300: "flip", 400: "flip_swap",
        500: "ambiguous", 600: "ambiguous", 700: "mismatch",
    }
