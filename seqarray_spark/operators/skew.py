"""Skew-mitigation utilities.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins;
these helpers cover the two cases AQE does not: skewed *aggregation* keys
and skewed *broadcast-ineligible* joins. At 100 TB a single hot variant
(e.g. a monomorphic site touched by every sample shard) or hot sample can
make one reducer run hours longer than the rest — salting bounds every
reducer at (hot-key rows / n_salts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    combine: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation: groupBy(key, salt) with `aggs`, then
    groupBy(key) with `combine` over the partials.

    `aggs` produce partial columns; `combine` must re-aggregate them (e.g.
    aggs=[sum(x).alias('s'), count(x).alias('c')],
    combine=[sum('s').alias('s'), sum('c').alias('c')]). Only algebraic
    aggregates qualify — exactly the reference's partial+final contract
    (seqParallel .combine, R/Utilities.R:1008-1124).

    Note: Spark's own hash aggregation already does map-side partials;
    reach for this only when the *reduce* side of one key overflows a
    task (observed straggler), not preemptively.
    """
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    partial = df.groupBy(F.col(key), salt).agg(*aggs)
    return partial.groupBy(key).agg(*combine)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side's key with a
    random suffix, replicate the small side across all suffixes, join on
    (key, salt). Hot keys spread over n_salts reducers; the small side
    grows n_salts-fold (must still be far smaller than the big side)."""
    big_salted = big.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    small_rep = small.crossJoin(F.broadcast(salts))
    return big_salted.join(small_rep, [key, "__salt"], how).drop("__salt")
