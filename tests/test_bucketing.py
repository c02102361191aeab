"""Bucketed layout: variant-keyed join must run with no Exchange on
either side (the 100 TB co-location strategy)."""

import pytest
from pyspark.sql import functions as F

from seqarray_spark.operators.mutate import optimize_bucketed
from seqarray_spark.plans import explain as E
from seqarray_spark.sources import testdata as td


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    ds = td.variant_dataset(spark, sf_dir)
    optimize_bucketed(ds, "bt", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast so the plan must choose between shuffle and
    # bucket co-location (at 100 TB neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        calls = spark.table("bt_calls")
        variants = spark.table("bt_variants")
        joined = calls.join(variants, "variant_id").groupBy("chromosome").count()
        plan = E.plan_string(joined, "simple")
        # sort-merge join with zero exchanges below it: bucketing works
        assert E.sortmerge_join_count(joined) >= 1
        # the only allowed Exchange is the final groupBy aggregation
        assert plan.count("Exchange") <= 1
        # correctness unchanged
        assert joined.count() == 22
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_calls")
        spark.sql("DROP TABLE IF EXISTS bt_variants")
