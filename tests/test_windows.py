"""Sliding-window units + unit algebra (reference: R/UnitList.R)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from seqarray_spark.operators import windows as W


@pytest.fixture(scope="module")
def variants(spark):
    rows = [
        Row(variant_id=i, chromosome=c, position=p)
        for i, (c, p) in enumerate(
            [("1", 100), ("1", 2600), ("1", 5100), ("1", 7400), ("2", 50), ("2", 9000)],
            start=1,
        )
    ]
    return spark.createDataFrame(rows)


def test_membership(variants):
    units = W.sliding_windows(variants, win_size=5000, win_shift=2500, win_start=1, dup_rm=False)
    rows = {(r["chromosome"], r["unit_start"], r["variant_id"]) for r in units.collect()}
    # pos=100 on chr1: only window starting at 1 covers it (k=0)
    assert ("1", 1, 1) in rows and ("1", 2501, 1) not in rows
    # pos=2600: windows starting at 1 and 2501
    assert ("1", 1, 2) in rows and ("1", 2501, 2) in rows
    # pos=5100: windows 2501 and 5001 (window 1..5000 excludes 5100)
    assert ("1", 1, 3) not in rows and ("1", 2501, 3) in rows and ("1", 5001, 3) in rows
    # chromosome separation
    assert not any(c == "2" and v in (1, 2, 3, 4) for c, s, v in rows)


def test_window_width_and_counts(variants):
    units = W.sliding_windows(variants, win_size=5000, win_shift=2500, dup_rm=False)
    w = units.select((F.col("unit_end") - F.col("unit_start") + 1).alias("w")).distinct().collect()
    assert [r["w"] for r in w] == [5000]
    counts = {
        (r["chromosome"], r["unit_start"]): r["n_variants"]
        for r in W.unit_counts(units).collect()
    }
    # reference grid starts at win.start=0 (R/UnitList.R seqUnit
    # SlidingWindows default): windows [0,5000), [2500,7500), ...
    assert counts[("1", 0)] == 2  # pos 100 and 2600
    assert counts[("1", 2500)] == 3  # pos 2600, 5100, 7400


def test_dup_rm(variants):
    """tumbling windows (shift=size) have no dups; overlapping windows with
    identical content collapse to the earliest start."""
    dup = W.sliding_windows(variants, win_size=10000, win_shift=100, dup_rm=False)
    ded = W.sliding_windows(variants, win_size=10000, win_shift=100, dup_rm=True)
    assert ded.count() < dup.count()
    # each retained (chrom, content) is unique
    per = (
        ded.groupBy("chromosome", "unit_start")
        .agg(F.sort_array(F.collect_list("variant_id")).alias("content"))
        .groupBy("chromosome", "content")
        .count()
    )
    assert per.filter(F.col("count") > 1).count() == 0


def test_unit_algebra(variants):
    u1 = W.sliding_windows(variants, win_size=5000, win_shift=5000, dup_rm=False)
    u2 = W.unit_subset(u1, chromosome="1")
    assert u2.select("chromosome").distinct().count() == 1
    merged = W.unit_merge(u2, u1)
    assert merged.count() == u1.distinct().count()
    diff = W.unit_set_diff(u1, u2)
    assert diff.filter(F.col("chromosome") == "1").count() == 0


def test_unit_filter_cond(spark, variants):
    calls = spark.createDataFrame(
        [
            Row(variant_id=v, sample_id=f"s{s}", alleles=[0, 1] if (v + s) % 2 else [0, 0])
            for v in range(1, 7)
            for s in range(4)
        ],
        "variant_id int, sample_id string, alleles array<int>",
    )
    units = W.sliding_windows(variants, win_size=5000, win_shift=2500, dup_rm=False)
    out = W.unit_filter_cond(units, calls, maf=0.2, min_num=2)
    # every surviving unit has >= 2 member variants
    sizes = out.groupBy("chromosome", "unit_start").count().collect()
    assert sizes and all(r["count"] >= 2 for r in sizes)


def test_unit_apply_agg(spark, variants):
    calls = spark.createDataFrame(
        [Row(variant_id=v, sample_id=f"s{s}", alleles=[0, 1]) for v in range(1, 7) for s in range(2)],
        "variant_id int, sample_id string, alleles array<int>",
    )
    units = W.sliding_windows(variants, win_size=5000, win_shift=5000, dup_rm=False)
    out = W.unit_apply_agg(units, calls, F.count(F.lit(1)).alias("n_calls"))
    assert out.filter(F.col("n_calls") <= 0).count() == 0


def test_unit_create_reference_sanitization(spark):
    """seqUnitCreate parity (R/UnitList.R:181-209): None/<1 entries
    dropped per unit, empty units keep a placeholder row, desp joins
    per unit, non-sequence units error."""
    import pytest as _pt

    from seqarray_spark.operators.windows import unit_create

    u = unit_create(
        spark,
        [[1, 2, None, 0, 3], [], [7]],
        desp=[{"name": "a"}, {"name": "b"}, {"name": "c"}],
    )
    rows = {(r["unit_id"], r["variant_id"], r["name"]) for r in u.collect()}
    assert rows == {(1, 1, "a"), (1, 2, "a"), (1, 3, "a"),
                    (2, None, "b"), (3, 7, "c")}
    # default desp = unit ids only
    u2 = unit_create(spark, [[5], [6]])
    assert dict(u2.dtypes) == {"unit_id": "int", "variant_id": "bigint"}
    with _pt.raises(ValueError):
        unit_create(spark, [42])
    with _pt.raises(ValueError):
        unit_create(spark, [[1]], desp=[{"x": 1}, {"x": 2}])
