"""Focused tests for the r13 optimization-round internals:

- sample_ids superset tolerance: the bitset-plane LD substrate and the
  pair-table estimators must return IDENTICAL results when handed any
  superset of the observed sample inventory (the dimension-sourced
  inventory optimization relies on exactly this invariance).
- lifecycle.tether: a composed plan must keep a release_on_gc'd
  intermediate's persist alive until the RESULT is dropped (the
  seq_grm_sketch / seq_pca_project double-build fix).
- gsample_ids_superset: provably a superset of the observed gcalls ids.
"""

import gc

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def small_calls(spark):
    # 3 variants x 3 observed samples, with a duplicate observation and
    # missing slots — exercises the MIN-dedupe and the NULL paths
    rows = [
        (1, "Sa", [0, 1], [False]),
        (1, "Sb", [1, 1], [False]),
        (1, "Sc", [None, 1], [False]),
        (2, "Sa", [0, 0], [False]),
        (2, "Sa", [1, 1], [False]),  # duplicate obs -> MIN dose wins
        (2, "Sb", [1, 0], [False]),
        (3, "Sb", [1, 1], [False]),
        (3, "Sc", [0, 1], [False]),
    ]
    return spark.createDataFrame(
        rows, "variant_id long, sample_id string, alleles array<int>, phased array<boolean>"
    )


@pytest.fixture(scope="module")
def small_variants(spark):
    return spark.createDataFrame(
        [(1, "1", 100), (2, "1", 600), (3, "1", 1100)],
        "variant_id long, chromosome string, position int",
    )


SUPERSET = ["Sa", "Sb", "Sc", "Sx", "Sy", "Sz"]  # 3 unobserved extras


def test_ld_pairs_superset_ids_identical(spark, small_variants, small_calls):
    from seqarray_spark.operators.ld import ld_pairs

    base = ld_pairs(small_variants, small_calls, bp_window=2000)
    sup = ld_pairs(
        small_variants, small_calls, bp_window=2000, sample_ids=SUPERSET
    )
    cols = ["va", "vb", "n_used", "r2"]
    assert _rows(base, cols) == _rows(sup, cols)


def test_ld_em_superset_ids_identical(spark, small_variants, small_calls):
    from seqarray_spark.operators.ld import ld_pairs_em

    base = ld_pairs_em(small_variants, small_calls, bp_window=2000)
    sup = ld_pairs_em(
        small_variants, small_calls, bp_window=2000, sample_ids=SUPERSET
    )
    cols = ["va", "vb", "n_used", "p_ab", "ld_r", "d_prime"]
    assert _rows(base, cols) == _rows(sup, cols)


def test_grm_pairs_superset_ids_identical(spark, small_calls):
    from seqarray_spark.operators.ld import grm_pairs

    base = grm_pairs(small_calls)
    sup = grm_pairs(small_calls, sample_ids=SUPERSET)
    cols = ["sample_i", "sample_j", "m_used", "grm"]
    assert _rows(base, cols) == _rows(sup, cols)


def test_grm_pairs_superset_ignored_at_min_m_zero(spark, small_calls):
    # min_m < 1 would surface zero-observation pairs — the operator must
    # fall back to the observed inventory, not trust the superset
    from seqarray_spark.operators.ld import grm_pairs

    base = grm_pairs(small_calls, min_m=0)
    sup = grm_pairs(small_calls, min_m=0, sample_ids=SUPERSET)
    cols = ["sample_i", "sample_j", "m_used", "grm"]
    assert _rows(base, cols) == _rows(sup, cols)


def test_eigmix_beta_superset_ids_identical(spark, small_calls):
    from seqarray_spark.operators.ancestry import beta_pairs, eigmix_pairs

    e0 = eigmix_pairs(small_calls, include_diag=True)
    e1 = eigmix_pairs(small_calls, include_diag=True, sample_ids=SUPERSET)
    cols = ["sample_i", "sample_j", "m_used", "eigmix"]
    assert _rows(e0, cols) == _rows(e1, cols)
    b0 = beta_pairs(small_calls)
    b1 = beta_pairs(small_calls, sample_ids=SUPERSET)
    cols = ["sample_i", "sample_j", "m_used", "beta"]
    cols = [c for c in b0.columns]
    assert _rows(b0, cols) == _rows(b1, cols)


def test_gsample_ids_superset_covers_observed(spark):
    import seqarray_spark.sources.testdata as td

    sup = td.gsample_ids_superset(SF_DIR)
    assert sup is not None
    observed = {
        r[0]
        for r in td.gcalls(spark, SF_DIR)
        .select("sample_id")
        .distinct()
        .collect()
    }
    assert observed <= set(sup)


def test_tether_keeps_persist_until_result_dropped(spark):
    from seqarray_spark.plans.lifecycle import release_on_gc, tether

    # isolate the cache manager from earlier tests' lingering persists
    gc.collect()
    spark.catalog.clearCache()
    inter = spark.range(10).select(F.col("id").alias("v")).persist()
    out = release_on_gc(inter, inter.select((F.col("v") * 2).alias("w")))
    result = tether(out.groupBy().sum("w"), out)
    # drop the intermediate reference exactly like a composing gate does
    del out, inter
    gc.collect()
    assert result._seqarray_tethered  # the pin is what keeps it alive
    jspark = spark._jsparkSession
    # the persisted plan must still be registered with the cache manager
    assert not jspark.sharedState().cacheManager().isEmpty()
    del result
    gc.collect()
    assert jspark.sharedState().cacheManager().isEmpty()


def test_pair_table_kernel_partials_spread(spark, small_calls):
    # the final pair agg must sit above a REPARTITION_BY_NUM exchange
    # (the AQE-coalescing fix); plan-shape assertion, no execution
    from seqarray_spark.operators.ld import grm_pairs

    plan = grm_pairs(small_calls)._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" in plan
