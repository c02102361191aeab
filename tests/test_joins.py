"""as-of join and interval join (operators Spark lacks natively)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from seqarray_spark.operators.joins import asof_join, interval_join


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=ts(10, 0), qty=1),
            Row(sym="A", ts=ts(10, 30), qty=2),
            Row(sym="A", ts=ts(9, 0), qty=3),  # before any quote
            Row(sym="B", ts=ts(11, 0), qty=4),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts=ts(9, 30), px=100.0),
            Row(sym="A", ts=ts(10, 0), px=101.0),  # tie with trade -> matches
            Row(sym="A", ts=ts(10, 15), px=102.0),
            Row(sym="B", ts=ts(10, 59), px=200.0),
        ]
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        (r["sym"], r["ts"]): r["asof_px"]
        for r in asof_join(trades, quotes, on="ts", keys=["sym"]).collect()
    }
    assert out[("A", ts(10, 0))] == 101.0  # inclusive tie
    assert out[("A", ts(10, 30))] == 102.0
    assert out[("A", ts(9, 0))] is None  # nothing earlier
    assert out[("B", ts(11, 0))] == 200.0


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        (r["sym"], r["ts"]): r["asof_px"]
        for r in asof_join(trades, quotes, on="ts", keys=["sym"], direction="forward").collect()
    }
    assert out[("A", ts(9, 0))] == 100.0  # next quote after
    assert out[("A", ts(10, 30))] is None  # nothing later


def test_interval_join(spark):
    points = spark.createDataFrame(
        [
            Row(chromosome="1", position=150, variant_id=1),
            Row(chromosome="1", position=250_000, variant_id=2),
            Row(chromosome="2", position=150, variant_id=3),  # wrong chrom
            Row(chromosome="1", position=99, variant_id=4),  # before start
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(chromosome="1", start=100, end=200_000, gene="G1"),
            Row(chromosome="1", start=240_000, end=260_000, gene="G2"),
        ]
    )
    out = {
        (r["variant_id"], r["gene"])
        for r in interval_join(points, intervals, bin_size=1000).collect()
    }
    assert out == {(1, "G1"), (2, "G2")}
    # boundary inclusivity
    pts = spark.createDataFrame([Row(chromosome="1", position=200_000, variant_id=9)])
    got = interval_join(pts, intervals, bin_size=1000).collect()
    assert len(got) == 1 and got[0]["gene"] == "G1"


def test_interval_join_left_and_semi(spark):
    points = spark.createDataFrame(
        [
            Row(chromosome="1", position=150, variant_id=1),
            Row(chromosome="1", position=250_000, variant_id=2),
            Row(chromosome="2", position=150, variant_id=3),
            Row(chromosome="1", position=99, variant_id=4),
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(chromosome="1", start=100, end=200_000, gene="G1"),
            Row(chromosome="1", start=100, end=300_000, gene="G2"),  # overlaps both
        ]
    )
    # left outer: unmatched points survive null-extended, matched points
    # one row per overlapping interval
    left = interval_join(points, intervals, bin_size=1000, how="left")
    got = {(r["variant_id"], r["gene"]) for r in left.collect()}
    assert got == {(1, "G1"), (1, "G2"), (2, "G2"), (3, None), (4, None)}
    # left_semi with narrow key: one row per matched point, original width
    semi = interval_join(
        points, intervals, bin_size=1000, how="left_semi", point_keys=["variant_id"]
    )
    assert sorted(r["variant_id"] for r in semi.collect()) == [1, 2]
    assert semi.columns == points.columns
    with pytest.raises(ValueError):
        interval_join(points, intervals, how="right")


def test_interval_join_matches_nonequi(spark, sf_dir):
    """Binned equi-join == naive non-equi join on derived data."""
    from seqarray_spark.sources import testdata as td

    v = td.gvariants(spark, sf_dir).select("variant_id", "chromosome", "position")
    intervals = (
        td.load_table(spark, sf_dir, "supplier")
        .select(
            (1 + F.col("s_suppkey") % 22).cast("string").alias("chromosome"),
            ((F.col("s_suppkey") * 911) % 1000000).alias("start"),
        )
        .withColumn("end", F.col("start") + 50000)
        .withColumn("interval_id", F.monotonically_increasing_id())
    )
    fast = interval_join(v, intervals, bin_size=50000).select("variant_id", "start")
    naive = v.join(
        intervals,
        (v.chromosome == intervals.chromosome)
        & v.position.between(intervals.start, intervals.end),
    ).select("variant_id", "start")
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b and len(a) > 0
