"""Apply/UDF surface (reference: seqApply/seqBlockApply/seqUnitApply)."""

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from seqarray_spark.operators import apply as A


@pytest.fixture(scope="module")
def calls(spark):
    return spark.createDataFrame(
        [
            Row(variant_id=v, sample_id=f"s{s}", alleles=[v % 2, (v + s) % 2])
            for v in range(1, 21)
            for s in range(3)
        ],
        "variant_id int, sample_id string, alleles array<int>",
    )


def test_block_apply(calls):
    """blockwise kernel: alt-dosage per call, vectorized over Arrow batches
    (seqBlockApply parity)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "variant_id": pdf["variant_id"],
                "sample_id": pdf["sample_id"],
                "dos": pdf["alleles"].map(lambda a: int(sum(x != 0 for x in a))),
            }
        )

    out = A.block_apply(calls, kernel, "variant_id int, sample_id string, dos int")
    rows = {(r["variant_id"], r["sample_id"]): r["dos"] for r in out.collect()}
    assert rows[(1, "s0")] == 2  # alleles [1, 1]
    assert rows[(2, "s0")] == 0  # alleles [0, 0]
    assert len(rows) == 60


def test_apply_by_sample(calls):
    """per-sample fold (seqApply margin='by.sample' parity)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "sample_id": [pdf["sample_id"].iloc[0]],
                "n_alt": [int(pdf["alleles"].map(lambda a: sum(x != 0 for x in a)).sum())],
            }
        )

    out = A.apply_by_sample(calls, kernel, "sample_id string, n_alt long")
    assert out.count() == 3
    total = sum(r["n_alt"] for r in out.collect())
    # cross-check against declarative path
    expected = calls.select(
        F.aggregate("alleles", F.lit(0), lambda acc, x: acc + (x != 0).cast("int")).alias("d")
    ).agg(F.sum("d")).first()[0]
    assert total == expected


def test_unit_apply(spark, calls):
    variants = spark.createDataFrame(
        [Row(variant_id=v, chromosome="1", position=v * 100) for v in range(1, 21)]
    )
    from seqarray_spark.operators.windows import sliding_windows

    units = sliding_windows(variants, win_size=500, win_shift=500, dup_rm=False)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "chromosome": [pdf["chromosome"].iloc[0]],
                "unit_start": [pdf["unit_start"].iloc[0]],
                "n": [len(pdf)],
            }
        )

    out = A.unit_apply(units, calls, kernel, "chromosome string, unit_start long, n long")
    got = {r["unit_start"]: r["n"] for r in out.collect()}
    # reference grid starts at win.start=0: window [0,500) holds variants
    # 1..4 (pos 100..400) = 12 calls; [500,1000) variants 5..9 = 15
    assert got[0] == 12 and got[500] == 15


def test_par_reduce(calls):
    row = A.par_reduce(calls, F.count(F.lit(1)).alias("n"), F.countDistinct("variant_id").alias("nv"))
    assert row["n"] == 60 and row["nv"] == 20


def test_block_apply_var_index(calls):
    """var.index='relative' attaches a 1-based selection index
    (reference: seqApply var.index=, src/ReadByVariant.cpp:1071-1330)."""

    def f(pdf):
        return pdf[["variant_id", "variant_index"]]

    out = A.block_apply(
        calls.select("variant_id").distinct(),
        f,
        "variant_id int, variant_index int",
        var_index="relative",
    )
    got = {r["variant_id"]: r["variant_index"] for r in out.collect()}
    assert got[1] == 1 and got[20] == 20
    with pytest.raises(ValueError):
        A.block_apply(calls, f, "x int", var_index="bogus")


def test_block_apply_var_index_absolute_vs_relative(spark):
    """seqBlockApply var.index modes on a FILTERED selection (reference:
    R/Methods.R:690-769 -> SEQ_BApply_Variant src/ReadByVariant.cpp:
    1311-1316): 'relative' numbers the selection 1..k; 'absolute' is the
    pre-filter FILE ordinal (`NodeList[0]->Position + 1`) — for non-dense
    ids it is the rank in the base frame, NOT the id."""

    def f(pdf):
        return pdf[["variant_id", "variant_index"]]

    # non-dense ids: 10,20,...,100 in file order
    base = spark.createDataFrame(
        [(10 * i,) for i in range(1, 11)], "variant_id long"
    )
    sel = base.filter(F.col("variant_id").isin([30, 50, 90]))

    rel = A.block_apply(
        sel, f, "variant_id long, variant_index int", var_index="relative"
    )
    assert {r["variant_id"]: r["variant_index"] for r in rel.collect()} == {
        30: 1, 50: 2, 90: 3,
    }

    absolute = A.block_apply(
        sel, f, "variant_id long, variant_index int",
        var_index="absolute", base_df=base,
    )
    assert {r["variant_id"]: r["variant_index"] for r in absolute.collect()} == {
        30: 3, 50: 5, 90: 9,
    }

    # no base_df: df assumed unfiltered -> the two modes agree
    nof = A.block_apply(
        sel, f, "variant_id long, variant_index int", var_index="absolute"
    )
    assert {r["variant_id"]: r["variant_index"] for r in nof.collect()} == {
        30: 1, 50: 2, 90: 3,
    }


def test_block_apply_to_sink(calls, tmp_path):
    """as.is=<connection> parity: results stream to a sink, tasks write
    directly (no driver gather)."""
    out_dir = str(tmp_path / "sink")

    def f(pdf):
        import pandas as pd

        return pd.DataFrame(
            {"variant_id": pdf["variant_id"], "n": pdf["alleles"].map(len)}
        )

    A.block_apply_to(calls, f, "variant_id int, n int", out_dir)
    back = calls.sparkSession.read.parquet(out_dir)
    assert back.count() == 60 and back.agg(F.max("n")).first()[0] == 2
    # append mode really appends
    A.block_apply_to(calls, f, "variant_id int, n int", out_dir)
    assert calls.sparkSession.read.parquet(out_dir).count() == 120


def test_apply_by_sample_var_index_modes(calls):
    """seqApply(margin='by.sample', var.index=) parity (r10, the
    by-sample twin of the r9 block_apply audit — SEQ_Apply_Sample
    src/ReadBySample.cpp:612-645): 'relative' = 1-based position in the
    CURRENT sample selection (ans_index + 1); 'absolute' = the
    PRE-filter file ordinal (NodeList Position + 1). Pinned on a
    filtered, non-prefix selection so the two modes disagree."""
    base_order = ["s0", "s1", "s2"]  # file order
    # the reference iterates the selection in FILE order — a sample
    # filter keeps file order, so the selection is [s0, s2]
    selection = ["s0", "s2"]
    sel_calls = calls.where(F.col("sample_id").isin(selection))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "sample_id": [pdf["sample_id"].iloc[0]],
                "sample_index": [int(pdf["sample_index"].iloc[0])],
            }
        )

    rel = {
        r["sample_id"]: r["sample_index"]
        for r in A.apply_by_sample(
            sel_calls, kernel, "sample_id string, sample_index int",
            var_index="relative", sample_order=selection,
        ).collect()
    }
    assert rel == {"s0": 1, "s2": 2}
    ab = {
        r["sample_id"]: r["sample_index"]
        for r in A.apply_by_sample(
            sel_calls, kernel, "sample_id string, sample_index int",
            var_index="absolute", sample_order=selection,
            base_sample_order=base_order,
        ).collect()
    }
    assert ab == {"s0": 1, "s2": 3}  # s2 keeps its file ordinal
    with pytest.raises(ValueError, match="sample_order"):
        A.apply_by_sample(sel_calls, kernel, "x int", var_index="relative")
