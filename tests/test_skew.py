"""Salted aggregation/join equivalence (skew mitigation utilities)."""

import pytest
from pyspark.sql import functions as F

from seqarray_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(1, float(i % 7)) for i in range(9000)] + [
        (k, float(k)) for k in range(2, 1002)
    ]
    return spark.createDataFrame(rows, "k int, x double")


def test_salted_agg_matches_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in skewed.groupBy("k")
        .agg(F.sum("x").alias("s"), F.count("x").alias("c"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"])
        for r in salted_agg(
            skewed,
            "k",
            aggs=[F.sum("x").alias("s"), F.count("x").alias("c")],
            combine=[F.sum("s").alias("s"), F.sum("c").alias("c")],
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert salted[k][0] == pytest.approx(plain[k][0])


def test_salted_join_matches_plain(skewed, spark):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 1002)], "k int, name string"
    )
    plain = skewed.join(dim, "k").count()
    salted = salted_join(skewed, dim, "k").count()
    assert salted == plain
