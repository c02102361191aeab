"""SeqDataset filter-stack semantics (reference: TSelection stack,
src/SeqArray.cpp:77-124; seqSetFilter* R/Methods.R:106-420)."""

import pytest
from pyspark.sql import functions as F

from seqarray_spark.sources import testdata as td


@pytest.fixture(scope="module")
def ds(spark, sf_dir):
    return td.variant_dataset(spark, sf_dir)


def test_filter_chrom(ds):
    ds.reset_filter()
    n_all = ds.variants.count()
    ds.set_filter_chrom(["1", "2"])
    n = ds.variants.count()
    assert 0 < n < n_all
    assert ds.variants.select("chromosome").distinct().count() <= 2
    ds.reset_filter()


def test_filter_intersect_vs_replace(ds):
    ds.reset_filter()
    ds.set_filter_chrom(["1", "2", "3"])
    n1 = ds.variants.count()
    ds.set_filter_chrom(["1"], intersect=True)
    n2 = ds.variants.count()
    assert n2 < n1
    ds.set_filter_chrom(["1", "2", "3"], intersect=False)
    assert ds.variants.count() == n1
    ds.reset_filter()


def test_filter_stack_push_pop(ds):
    ds.reset_filter()
    n_all = ds.variants.count()
    ds.set_filter_chrom(["7"])
    n7 = ds.variants.count()
    ds.filter_push()
    ds.set_filter_variant(F.col("position") > 1000, intersect=True)
    assert ds.variants.count() <= n7
    ds.filter_pop()
    assert ds.variants.count() == n7
    ds.reset_filter()
    assert ds.variants.count() == n_all


def test_calls_follow_variant_filter(ds):
    ds.reset_filter()
    total = ds.calls.count()
    ds.set_filter_chrom(["1"])
    filtered = ds.calls.count()
    assert 0 < filtered < total
    # every surviving call belongs to a selected variant
    ids = {r[0] for r in ds.variants.select("variant_id").collect()}
    got = {r[0] for r in ds.calls.select("variant_id").distinct().collect()}
    assert got <= ids
    ds.reset_filter()


def test_sample_filter_reaches_calls(ds):
    ds.reset_filter()
    ds.set_filter_sample(F.col("population") == "POP1")
    pops = ds.calls.join(ds.samples, "sample_id").select("population").distinct().collect()
    assert [r[0] for r in pops] == ["POP1"]
    ds.reset_filter()


def test_random_subset_equivalence(ds, spark):
    """The reference's dominant test pattern: any filtered read equals the
    in-memory slice of the full read (inst/unitTests/test_func.R:92-117)."""
    import random

    random.seed(42)
    full = {r["variant_id"]: r["af"] for r in _af(ds).collect()}
    ids = random.sample(sorted(full), 25)
    ds.reset_filter()
    ds.set_filter_variant_id(ids)
    sub = {r["variant_id"]: r["af"] for r in _af(ds).collect()}
    assert set(sub) == set(ids) & set(full)
    for k, v in sub.items():
        assert v == pytest.approx(full[k])
    ds.reset_filter()


def _af(ds):
    from seqarray_spark.operators.aggregates import allele_freq

    return allele_freq(ds.calls, ref_allele=0)


def test_get_data_names(ds):
    ds.reset_filter()
    for name in ["position", "allele", "$num_allele", "$chrom_pos", "$chrom_pos_allele", "$dosage_alt", "genotype"]:
        df = ds.get_data(name)
        assert df.count() > 0


def test_filter_pos_multi_pos_first_hit(ds, spark):
    ds.reset_filter()
    probes = ds.variants.select("chromosome", "position").limit(5)
    ds.filter_push()
    ds.set_filter_pos(probes, match_alleles=False, multi_pos=False)
    out = ds.variants.groupBy("chromosome", "position").count().filter(F.col("count") > 1)
    assert out.count() == 0
    ds.filter_pop()


def test_dosage_sp_keeps_missing_as_na(ds):
    """Sparse dosage matches the reference dgCMatrix exactly
    (get_dosage_sp src/GetData.cpp:446, _sp2 :520): nonzero entries plus
    MISSING calls as explicit NA entries; zeros absent. sp treats any
    missing slot as missing; sp2 keeps partially-observed ALT counts."""
    ds.reset_filter()
    sp = ds.get_data("$dosage_sp")
    sp2 = ds.get_data("$dosage_sp2")
    assert sp.filter(F.col("dosage_alt") == 0).count() == 0
    assert sp2.filter(F.col("dosage_alt") == 0).count() == 0
    # NA entries exist in both (the testdata has missing calls)
    assert sp.filter(F.col("dosage_alt").isNull()).count() > 0
    assert sp2.filter(F.col("dosage_alt").isNull()).count() > 0
    # sp2's NA set (fully-missing only) is a strict subset of sp's NA
    # set (any-slot-missing), and the difference is partially-missing
    # calls resolved to observed counts
    na = lambda df: {
        (r["variant_id"], r["sample_id"])
        for r in df.filter(F.col("dosage_alt").isNull()).collect()
    }
    na_sp, na_sp2 = na(sp), na(sp2)
    assert na_sp2 < na_sp


def test_chrom_pos2_reference_suffixing(spark):
    """$chrom_pos2 leaves the FIRST occurrence of a duplicated position
    bare and suffixes later ones _1, _2 (reference: get_chrom_pos2
    src/GetData.cpp:710-748 — the dup counter increments only on
    repeats)."""
    from seqarray_spark.functions.variant import chrom_pos2

    v = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 100), (3, "1", 100), (4, "1", 200)],
        "variant_id long, chromosome string, position int",
    )
    got = {r["variant_id"]: r["chrom_pos2"] for r in chrom_pos2(v).collect()}
    assert got == {1: "1:100", 2: "1:100_1", 3: "1:100_2", 4: "1:200"}
    # NON-adjacent repeats stay bare: the reference's counter resets on
    # every key change in selection order
    v2 = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 200), (3, "1", 100)],
        "variant_id long, chromosome string, position int",
    )
    got2 = {r["variant_id"]: r["chrom_pos2"] for r in chrom_pos2(v2).collect()}
    assert got2 == {1: "1:100", 2: "1:200", 3: "1:100"}


def test_chrom_pos2_numbers_dups_over_the_selection(spark):
    """Under an active filter the dup walk runs over the SELECTION, not
    the file: two same-position variants separated by a filtered-out
    variant become ADJACENT in the selection and the second gets '_1'
    (reference: get_chrom_pos2 src/GetData.cpp:710-748 iterates
    Sel.pVariant and compares each SELECTED key to the previous SELECTED
    one). Conversely a run split by the filter loses its suffixes."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "A", ["T"]), (2, "1", 200, "A", ["G"]),
         (3, "1", 100, "A", ["C"]), (4, "1", 300, "A", ["T"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    ds = SeqDataset(v, ids_dense=True)
    # unfiltered: 1 and 3 are non-adjacent -> both bare
    got = {r["variant_id"]: r["chrom_pos2"]
           for r in ds.get_data("$chrom_pos2").collect()}
    # the reference's walk is strictly consecutive-previous: 1,2,3 ->
    # 3 compares against 2 ('1:200'), so 3 stays bare
    assert got == {1: "1:100", 2: "1:200", 3: "1:100", 4: "1:300"}
    # filter drops 2: now 1 and 3 are consecutive in the selection and
    # 3 must be suffixed _1
    ds.set_filter_variant_id([1, 3, 4])
    got_f = {r["variant_id"]: r["chrom_pos2"]
             for r in ds.get_data("$chrom_pos2").collect()}
    assert got_f == {1: "1:100", 3: "1:100_1", 4: "1:300"}


def test_filter_pos_matches_alt(spark):
    """match_alleles follows SEQ_FindMatchIndex (src/Methods.cpp:1363):
    the probe alt must equal the FULL comma-joined ALT remainder — a
    single alt 'T' does NOT match a multiallelic 'C,G,T' variant; the
    exact remainder 'G,T' does. NULL probe ref/alt matches anything."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(1, "1", 100, "A", ["T"]), (2, "1", 100, "A", ["G"]),
         (3, "1", 200, "C", ["G", "T"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    ds = SeqDataset(v, None, None)
    probes = spark.createDataFrame(
        [("1", 100, "A", "T"), ("1", 200, "C", "T")],
        "chromosome string, position int, ref string, alt_one string",
    )
    ds.set_filter_pos(probes, match_alleles=True)
    assert {r["variant_id"] for r in ds.variants.collect()} == {1}

    ds2 = SeqDataset(v, None, None)
    probes2 = spark.createDataFrame(
        [("1", 100, "A", "T"), ("1", 200, "C", "G,T")],
        "chromosome string, position int, ref string, alt_one string",
    )
    ds2.set_filter_pos(probes2, match_alleles=True)
    assert {r["variant_id"] for r in ds2.variants.collect()} == {1, 3}

    # NA ref/alt match any (the reference's is.na(ref) | ref==r)
    ds3 = SeqDataset(v, None, None)
    probes3 = spark.createDataFrame(
        [("1", 100, None, None)],
        "chromosome string, position int, ref string, alt_one string",
    )
    ds3.set_filter_pos(probes3, match_alleles=True)
    assert {r["variant_id"] for r in ds3.variants.collect()} == {1, 2}


def test_get_filter_masks(ds):
    """seqGetFilter parity (R/Methods.R:497-503): boolean masks over the
    FULL axes; selected count matches the filtered frame, mask row count
    matches the base, and an unfiltered axis is all-True."""
    ds.reset_filter()
    n_all = ds.variants.count()
    masks = ds.get_filter()
    v = masks["variant_sel"]
    assert v.count() == n_all
    assert v.filter("selected").count() == n_all  # no filter -> all True

    ds.set_filter_chrom(["3"])
    n3 = ds.variants.count()
    masks = ds.get_filter()
    v = masks["variant_sel"]
    assert v.count() == n_all  # mask covers the full axis
    assert v.filter("selected").count() == n3
    if "sample_sel" in masks:  # sample axis untouched -> all True
        s = masks["sample_sel"]
        assert s.filter("selected").count() == s.count()
    ds.reset_filter()


def test_filter_pos_ret_idx(spark):
    """seqSetFilterPos(ret.idx=TRUE) parity (R/Methods.R:414-419 +
    reference test_filterpos.R): every probe ROW gets the 1-based index
    of its first matching variant within the NEW selection
    (match(i1, $variant_index)), NULL for no-match; duplicated probes
    each get their own row; multi-chrom probes combine."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(10, "1", 100, "A", ["T"]),
         (20, "1", 100, "A", ["G"]),   # second variant at same pos
         (30, "1", 200, "C", ["G"]),
         (40, "2", 100, "T", ["C"]),
         (50, "2", 300, "G", ["A"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    ds = SeqDataset(v, None, None)
    probes = spark.createDataFrame(
        [(1, "1", 100), (2, "2", 300), (3, "1", 999),   # no match
         (4, "1", 100),                                  # duplicate probe
         (5, "2", 100)],
        "probe_ord int, chromosome string, position int",
    )
    idx = ds.set_filter_pos(probes, match_alleles=False, ret_idx=True)
    # selection (multi_pos=True) = {10,20,30?no(200 not probed)...}:
    # positions probed: (1,100) -> 10,20; (2,300) -> 50; (2,100) -> 40
    sel = sorted(r["variant_id"] for r in ds.variants.collect())
    assert sel == [10, 20, 40, 50]
    # ranks in selection order: 10->1, 20->2, 40->3, 50->4
    got = {r["probe_ord"]: r["idx"] for r in idx.collect()}
    assert got == {1: 1, 2: 4, 3: None, 4: 1, 5: 3}
    assert len(got) == 5  # one row per probe ROW, dups included


def test_filter_pos_ret_idx_multi_pos_false(spark):
    """multi.pos=FALSE keeps only first-hit representatives; ret.idx
    ranks within that smaller selection."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(10, "1", 100, "A", ["T"]), (20, "1", 100, "A", ["G"]),
         (30, "1", 200, "C", ["G"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    ds = SeqDataset(v, None, None)
    probes = spark.createDataFrame(
        [(1, "1", 100), (2, "1", 200)],
        "probe_ord int, chromosome string, position int",
    )
    idx = ds.set_filter_pos(
        probes, match_alleles=False, multi_pos=False, ret_idx=True
    )
    assert sorted(r["variant_id"] for r in ds.variants.collect()) == [10, 30]
    got = {r["probe_ord"]: r["idx"] for r in idx.collect()}
    assert got == {1: 1, 2: 2}


def test_filter_pos_ret_idx_with_alleles(spark):
    """ret.idx + ref/alt matching: the representative is the first
    variant whose ref AND full-alt-remainder match the probe's."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(10, "1", 100, "A", ["T"]), (20, "1", 100, "A", ["G"]),
         (30, "1", 100, "C", ["G", "T"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    ds = SeqDataset(v, None, None)
    probes = spark.createDataFrame(
        [(1, "1", 100, "A", "G"), (2, "1", 100, "C", "G,T"),
         (3, "1", 100, "A", "Z")],
        "probe_ord int, chromosome string, position int, ref string, "
        "alt_one string",
    )
    idx = ds.set_filter_pos(probes, match_alleles=True, ret_idx=True)
    assert sorted(r["variant_id"] for r in ds.variants.collect()) == [20, 30]
    got = {r["probe_ord"]: r["idx"] for r in idx.collect()}
    assert got == {1: 1, 2: 2, 3: None}


def test_filter_pos_ret_idx_requires_ord(spark):
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(10, "1", 100, "A", ["T"])],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )
    ds = SeqDataset(v, None, None)
    probes = spark.createDataFrame(
        [("1", 100)], "chromosome string, position int"
    )
    with pytest.raises(ValueError, match="probe_ord"):
        ds.set_filter_pos(probes, match_alleles=False, ret_idx=True)


def test_set_filter_id_ret_idx(spark):
    """seqSetFilter(variant.id=/sample.id=, ret.idx=TRUE)
    (R/Methods.R:153-183): for each REQUESTED id, the 1-based position of
    that id within the new selection's order — NULL for ids not present
    (unknown, or dropped by intersect with the prior filter)."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(10, "1"), (20, "1"), (30, "2"), (40, "2")],
        "variant_id long, chromosome string",
    )
    s = spark.createDataFrame([("sa",), ("sb",), ("sc",)], "sample_id string")
    ds = SeqDataset(v, None, s)

    out = ds.set_filter_variant_id([30, 10, 99], ret_idx=True)
    rows = [(r["req_ord"], r["variant_id"], r["idx"]) for r in out.collect()]
    # selection = {10, 30} in variant order -> 10 is #1, 30 is #2
    assert rows == [(1, 30, 2), (2, 10, 1), (3, 99, None)]

    # intersect with the prior filter: 20 was excluded above -> NULL
    out = ds.set_filter_variant_id([10, 20], intersect=True, ret_idx=True)
    rows = [(r["req_ord"], r["idx"]) for r in out.collect()]
    assert rows == [(1, 1), (2, None)]

    out = ds.set_filter_sample_id(["sc", "sa", "zz"], ret_idx=True)
    rows = [(r["req_ord"], r["sample_id"], r["idx"]) for r in out.collect()]
    assert rows == [(1, "sc", 2), (2, "sa", 1), (3, "zz", None)]
    ds.reset_filter()


def test_filter_cond_open_bounds(spark):
    """seqSetFilterCond one-sided bounds (R/Methods.R:448-458): the
    reference's c(NaN, hi) form — upper bound only — and c(lo, NaN) —
    lower only — must both work; boundary semantics are lo <= x < hi."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [(i, "1", i * 10) for i in range(1, 5)],
        "variant_id long, chromosome string, position int",
    )
    # variant i: i alt alleles of 4 slots -> folded maf = min(i,4-i)/4
    rows = []
    for i in range(1, 5):
        g = [1] * i + [0] * (4 - i)
        rows.append((i, "s1", [g[0], g[1]], [False]))
        rows.append((i, "s2", [g[2], g[3]], [False]))
    c = spark.createDataFrame(
        rows,
        "variant_id long, sample_id string, alleles array<smallint>, "
        "phased array<boolean>",
    )
    ds = SeqDataset(v, c, None)
    # maf by variant: 1:0.25 2:0.5 3:0.25 4:0.0
    ds.set_filter_cond(maf=(None, 0.5))   # maf < 0.5
    assert {r["variant_id"] for r in ds.variants.collect()} == {1, 3, 4}
    ds.reset_filter()
    ds.set_filter_cond(maf=(0.25, None))  # maf >= 0.25
    assert {r["variant_id"] for r in ds.variants.collect()} == {1, 2, 3}
    ds.reset_filter()
    ds.set_filter_cond(mac=(None, 2))     # mac < 2
    assert {r["variant_id"] for r in ds.variants.collect()} == {1, 3, 4}
    ds.reset_filter()


def test_filter_pos_reference_edge_table(spark):
    """Parity review r11 (VERDICT r10 item 8): the reference's whole
    seqSetFilterPos unit-test table (inst/unitTests/test_filterpos.R:
    10-206) replayed scenario by scenario on one planted dataset —
    basic / multi-chr / ref-alt (wrong ref, NA ref) / multi.pos FALSE
    <= TRUE / intersect-subset / no-match-empty / duplicated-input —
    with exact expected selections where the reference only asserts
    cardinality inequalities."""
    from seqarray_spark.dataset import SeqDataset

    v = spark.createDataFrame(
        [
            (1, "1", 100, "A", ["T"]),
            (2, "1", 100, "A", ["G"]),      # dup position, same chrom
            (3, "1", 200, "C", ["G", "T"]),  # multiallelic
            (4, "1", 300, "G", ["A"]),
            (5, "2", 100, "T", ["C"]),
            (6, "2", 150, "A", ["C"]),
            (7, "2", 150, "A", []),          # no ALT at all
        ],
        "variant_id long, chromosome string, position int, ref string, "
        "alt array<string>",
    )

    def probes(rows, with_alleles=False):
        schema = "probe_ord int, chromosome string, position int"
        if with_alleles:
            schema += ", ref string, alt_one string"
        return spark.createDataFrame(rows, schema)

    def sel(ds):
        return sorted(r["variant_id"] for r in ds.variants.collect())

    # 1. basic: single chr, all its positions -> exactly that chromosome
    ds = SeqDataset(v)
    ds.set_filter_pos(
        probes([(1, "1", 100), (2, "1", 200), (3, "1", 300)]),
        match_alleles=False,
    )
    assert sel(ds) == [1, 2, 3, 4]
    # basic: subset of positions -> returned positions within the query
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "1", 100)]), match_alleles=False)
    assert sel(ds) == [1, 2]

    # 2. multi-chr probes combine across chromosomes
    ds = SeqDataset(v)
    ds.set_filter_pos(
        probes([(1, "1", 200), (2, "2", 150)]), match_alleles=False
    )
    assert sel(ds) == [3, 6, 7]

    # 3. ref/alt: correct alleles match; the multiallelic variant needs
    # the FULL comma-joined ALT (SEQ_FindMatchIndex src/Methods.cpp:
    # 1363-1371 — 'G' alone must NOT match 'G,T')
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "1", 200, "C", "G,T")], True))
    assert sel(ds) == [3]
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "1", 200, "C", "G")], True))
    assert sel(ds) == []
    # wrong ref -> fewer matches (here: none)
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "1", 100, "ZZZ", "T")], True))
    assert sel(ds) == []
    # NA ref/alt matches anything (>= the strict form)
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "1", 100, None, None)], True))
    assert sel(ds) == [1, 2]
    # a variant with no ALT never alt-matches
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "2", 150, "A", "C")], True))
    assert sel(ds) == [6]

    # 4. multi.pos=FALSE keeps the first hit per probe: n_false <= n_true
    ds_t = SeqDataset(v)
    ds_t.set_filter_pos(probes([(1, "1", 100)]), match_alleles=False)
    ds_f = SeqDataset(v)
    ds_f.set_filter_pos(
        probes([(1, "1", 100)]), match_alleles=False, multi_pos=False
    )
    assert sel(ds_f) == [1] and len(sel(ds_f)) <= len(sel(ds_t))

    # 5. intersect=TRUE: result is a subset of the previous filter
    ds = SeqDataset(v)
    ds.set_filter_variant_id([2, 3, 5])
    ds.set_filter_pos(
        probes([(1, "1", 100), (2, "1", 200), (3, "2", 100)]),
        match_alleles=False,
        intersect=True,
    )
    assert sel(ds) == [2, 3, 5]

    # 6. no match -> empty selection
    ds = SeqDataset(v)
    ds.set_filter_pos(probes([(1, "1", 999999999)]), match_alleles=False)
    assert sel(ds) == []

    # 7. duplicated input positions: selection unaffected by probe
    # multiplicity; ret.idx returns one row PER PROBE ROW
    ds = SeqDataset(v)
    idx = ds.set_filter_pos(
        probes([(1, "1", 100), (2, "1", 100), (3, "1", 300), (4, "1", 300)]),
        match_alleles=False,
        ret_idx=True,
    )
    assert sel(ds) == [1, 2, 4]
    got = {r["probe_ord"]: r["idx"] for r in idx.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
