"""Fast small local relations.

`spark.createDataFrame(list_of_tuples)` goes through the Python
parallelize path: readRDDFromFile + a 16-task PythonRDD job with a
Python worker round-trip per slice — measured ~0.3-0.6s wall PER USE at
local[32] (profile r13: the sample-ordinal frames in the packed and
bitset-plane substrates paid it on every query). For driver-known
id lists the same relation is expressible natively as
`spark.range(n)` + element_at over a literal array: zero Python
workers, zero parallelize job, evaluated by codegen (guide §4.1:
prefer built-ins over the Python boundary — here for relation
CONSTRUCTION, not just row processing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ordinal_frame(
    spark: SparkSession,
    ids: list[str],
    id_col: str = "sample_id",
    ord_col: str = "__ord",
) -> DataFrame:
    """(id, ordinal) relation for a driver-known id list, built JVM-side.

    Equivalent to createDataFrame([(s, i) for i, s in enumerate(ids)])
    but with no Python-worker job. Intended for broadcast-join lookup
    sides bounded by a sample/feature axis (|ids| ~ 1e2..1e6)."""
    arr = F.array(*[F.lit(s) for s in ids])
    return spark.range(len(ids)).select(
        F.element_at(arr, (F.col("id") + 1).cast("int")).alias(id_col),
        F.col("id").cast("int").alias(ord_col),
    )
